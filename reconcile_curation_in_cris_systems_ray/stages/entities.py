"""Entity extraction + validation (reference ST1 / J6 / J7 analogues).

Reference: ``query_db/analysis/entity_extraction.py:5-69`` loads a
Flair NER model (``flair/ner-english-fast``) once per process (init at
``query_db/main.py:84-87``) and batch-predicts ORG spans; the
entity-discovery channel (``repository.py:351-378``) then theta-joins
the reference table against the extracted entity keys, and candidate
entities are validated against configured org-name variants with
``partial_ratio_udf >= threshold`` (``repository.py:569-581``).

Ray-Data-first re-expression:

- :class:`EntityExtractor` — the canonical stateful actor-pool stage
  (state compiled once in ``__init__``, batches in ``__call__``), with
  pluggable backends:

  * ``backend="gazetteer"`` (default): deterministic dictionary NER —
    vectorized substring search for a broadcast list of entity surface
    forms, emitting ``(id, entity, pos, n_hits)`` per match.  Exactly
    SQL-expressible, so the driver oracles it (``entity_extract``).
  * ``backend="model"``: import-try a real NER model (flair is not in
    this container); raises with the interface documented so a model
    backend slots in behind the identical schema.

- :func:`validate_entities` — J7 entity-validation cross join: every
  candidate entity scored against every org-name variant with
  :func:`..functions.similarity.partial_ratio`; both sides are
  config-scale (small), so this is a driver-side vectorized pass, as
  in the reference.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa


class EntityExtractor:
    """Actor-pool batch callable: text column -> entity-hit rows.

    Gazetteer semantics (deliberately identical to the reference's J6
    containment predicate ``LIKE '%' || entity || '%'``): an entity
    matches wherever its surface form appears as a substring of the
    text.  ``pos`` is the 1-based position of the FIRST occurrence
    (SQL ``position(entity IN text)``), ``n_hits`` the number of
    non-overlapping occurrences.

    Output schema: ``(id_col, entity: string, pos: int64,
    n_hits: int64)`` — one row per (input row, matched entity).
    """

    def __init__(self, entities_ref=None, entities=None,
                 id_col: str = "doc_id", text_col: str = "text",
                 backend: str = "gazetteer"):
        if backend == "model":
            raise NotImplementedError(
                "model backend: load the NER model here (e.g. flair "
                "Classifier.load('flair/ner-english-fast'), reference "
                "entity_extraction.py:19-24), predict in __call__ over "
                "batch.column(text_col), and emit the same "
                "(id, entity, pos, n_hits) schema; the library is not "
                "available in this environment")
        if backend != "gazetteer":
            raise ValueError(f"unknown backend: {backend!r}")
        if entities is None:
            import ray

            entities = ray.get(entities_ref)
        # state built once per actor/worker (ST1 load-once pattern)
        self.entities = [e for e in entities if e]
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch) -> pa.Table:
        if isinstance(batch, pa.Table):
            df = batch.select([self.id_col, self.text_col]).to_pandas()
        else:
            df = batch
        texts = df[self.text_col].astype("string").fillna("")
        ids = df[self.id_col]
        out_id, out_ent, out_pos, out_hits = [], [], [], []
        for ent in self.entities:
            # vectorized per entity: one find + one count pass
            pos = texts.str.find(ent)
            hit = pos >= 0
            if not hit.any():
                continue
            n_hits = texts[hit].str.count(re.escape(ent))
            out_id.append(ids[hit].to_numpy())
            out_ent.append(np.full(int(hit.sum()), ent, dtype=object))
            out_pos.append(pos[hit].to_numpy(dtype=np.int64) + 1)
            out_hits.append(n_hits.to_numpy(dtype=np.int64))
        if not out_id:
            return pa.table({
                self.id_col: pa.array([], pa.from_numpy_dtype(
                    ids.to_numpy().dtype) if len(ids) else pa.int64()),
                "entity": pa.array([], pa.string()),
                "pos": pa.array([], pa.int64()),
                "n_hits": pa.array([], pa.int64()),
            })
        return pa.table({
            self.id_col: pa.array(np.concatenate(out_id)),
            "entity": pa.array(np.concatenate(out_ent), pa.string()),
            "pos": pa.array(np.concatenate(out_pos), pa.int64()),
            "n_hits": pa.array(np.concatenate(out_hits), pa.int64()),
        })


def extract_entities(ds, entities: list[str], id_col: str = "doc_id",
                     text_col: str = "text", concurrency=(1, 8),
                     batch_size: int = 1024):
    """Run the gazetteer entity extractor as an actor pool over a
    Dataset; the entity list ships ONCE via ``ray.put`` (broadcast) and
    each actor compiles its state in ``__init__``."""
    import ray

    ref = ray.put(list(entities))
    return ds.select_columns([id_col, text_col]).map_batches(
        EntityExtractor,
        fn_constructor_kwargs={"entities_ref": ref, "id_col": id_col,
                               "text_col": text_col},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def validate_entities(entities: list[str], org_names: list[str],
                      threshold: float = 0.85) -> pd.DataFrame:
    """J7 validation cross join (``repository.py:569-581``): score every
    candidate entity against every configured org-name variant with
    :func:`partial_ratio`; keep entities whose best score clears the
    threshold (reference default 85/100, ``constants.py:22``).

    Both sides are config-scale, so this runs driver-side (the
    reference runs the same CROSS JOIN on one DuckDB connection).
    Returns (entity, best_org, best_score) for survivors.
    """
    from ..functions.similarity import partial_ratio

    rows = []
    for ent in entities:
        best_org, best = None, -1.0
        for org in org_names:
            s = partial_ratio(ent, org)
            if s > best:
                best_org, best = org, s
        if best >= threshold:
            rows.append((ent, best_org, round(best, 6)))
    return pd.DataFrame(rows, columns=["entity", "best_org", "best_score"])
