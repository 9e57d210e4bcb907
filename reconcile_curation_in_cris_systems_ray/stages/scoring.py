"""Pairwise scoring: exact shingle-Jaccard + Jaro-Winkler + Levenshtein.

Reference analogue: the fuzzy post-filter UDFs applied to join results
(``are_names_similar_udf`` / ``partial_ratio_udf``, ``query_db/udf.py:
11-59``, used in the linkage join ``repository.py:112-142``) — here
re-targeted to url/title/text per the north rule, vectorized:

- string kernels (Jaro-Winkler, Levenshtein) run inside an in-process
  DuckDB connection held by each scorer actor (``__init__``-once, the
  ST3 pattern) scanning the Arrow batch zero-copy — a C++ vectorized
  kernel, never a Python per-row loop;
- exact Jaccard is computed from the precomputed uint64 shingle sets.

Feature hydration: candidate pairs carry only urls + MinHash estimate;
features (title/text head/shingles) are joined back per side with
``Dataset.join`` (hash-partitioned equi-join) so the wide band-explode
shuffle never carries text.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import ScoringConfig
from ..functions.similarity import jaccard_from_sets


BROADCAST_FEATURE_ROWS = 2_000_000


def hydrate_pairs(pairs_ds, features_ds, num_partitions: int | None = None,
                  broadcast_threshold: int = BROADCAST_FEATURE_ROWS):
    """Join (url_a, url_b, est_jaccard) with per-side features.

    Adaptive join strategy (the Spark auto-broadcast idea): when the
    feature table is small enough to live in the object store
    (< ``broadcast_threshold`` rows), ship it ONCE via ``ray.put`` and
    hydrate both sides in a single map_batches pass — zero shuffles.
    Otherwise fall back to two hash-partitioned ``Dataset.join``s
    (``num_partitions`` defaults to half the cluster CPUs; each join
    partition is an aggregator actor and oversubscribing CPUs
    deadlocks a small cluster).
    """
    import ray

    feats = features_ds.select_columns(
        ["url", "title_norm", "text_head", "shingles"])

    n_feats = feats.count()
    if n_feats <= broadcast_threshold:
        feats_df = feats.to_pandas().set_index("url")
        ref = ray.put(feats_df)

        def merge(df, _ref=ref):
            small = ray.get(_ref)
            fa = small.reindex(df["url_a"])
            fb = small.reindex(df["url_b"])
            df = df.copy()
            df["title_a"] = fa["title_norm"].to_numpy()
            df["head_a"] = fa["text_head"].to_numpy()
            df["shingles_a"] = fa["shingles"].to_numpy()
            df["title_b"] = fb["title_norm"].to_numpy()
            df["head_b"] = fb["text_head"].to_numpy()
            df["shingles_b"] = fb["shingles"].to_numpy()
            return df[df["shingles_a"].notna() & df["shingles_b"].notna()]

        return pairs_ds.map_batches(merge, batch_format="pandas")

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, cpus // 2)
    a = pairs_ds.join(feats, join_type="inner",
                      num_partitions=num_partitions,
                      on=("url_a",), right_on=("url",))
    a = a.rename_columns({"title_norm": "title_a", "text_head": "head_a",
                          "shingles": "shingles_a"})
    b = a.join(feats, join_type="inner", num_partitions=num_partitions,
               on=("url_b",), right_on=("url",))
    return b.rename_columns({"title_norm": "title_b", "text_head": "head_b",
                             "shingles": "shingles_b"})


class PairScorer:
    """Actor-pool batch callable over hydrated pairs.

    Emits ``jaccard`` (exact, shingle sets), ``jw_title``, ``jw_url``,
    ``lev_head_sim`` (1 - lev/maxlen over normalized text heads),
    ``is_match`` (jaccard >= threshold) and ``match_status``
    (M14-analogue classification).
    """

    def __init__(self, cfg: ScoringConfig = ScoringConfig()):
        import duckdb

        self.cfg = cfg
        self.con = duckdb.connect()

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return _empty_scored()
        sh_a = batch.column("shingles_a").to_pylist()
        sh_b = batch.column("shingles_b").to_pylist()
        jac = np.fromiter(
            (jaccard_from_sets(np.frombuffer(a or b"", dtype=np.uint64),
                               np.frombuffer(b or b"", dtype=np.uint64))
             for a, b in zip(sh_a, sh_b)),
            dtype=np.float64, count=n)

        view = batch.select(["url_a", "url_b", "title_a", "title_b",
                             "head_a", "head_b"])
        self.con.register("pairs_batch", view)
        scored = self.con.execute(
            """
            SELECT
              jaro_winkler_similarity(coalesce(title_a,''), coalesce(title_b,'')) AS jw_title,
              jaro_winkler_similarity(url_a, url_b) AS jw_url,
              1.0 - levenshtein(coalesce(head_a,''), coalesce(head_b,''))
                    / greatest(length(coalesce(head_a,'')),
                               length(coalesce(head_b,'')), 1) AS lev_head_sim
            FROM pairs_batch
            """).arrow()
        self.con.unregister("pairs_batch")

        thresh = self.cfg.jaccard_threshold
        is_match = jac >= thresh
        status = np.where(jac >= 0.9, "near_exact",
                          np.where(is_match, "text_match", "no_match"))
        return pa.table({
            "url_a": batch.column("url_a"),
            "url_b": batch.column("url_b"),
            "est_jaccard": batch.column("est_jaccard"),
            "jaccard": pa.array(jac),
            "jw_title": scored.column("jw_title"),
            "jw_url": scored.column("jw_url"),
            "lev_head_sim": scored.column("lev_head_sim"),
            "is_match": pa.array(is_match),
            "match_status": pa.array(status.tolist(), pa.string()),
        })


def _empty_scored() -> pa.Table:
    return pa.table({
        "url_a": pa.array([], pa.string()),
        "url_b": pa.array([], pa.string()),
        "est_jaccard": pa.array([], pa.float64()),
        "jaccard": pa.array([], pa.float64()),
        "jw_title": pa.array([], pa.float64()),
        "jw_url": pa.array([], pa.float64()),
        "lev_head_sim": pa.array([], pa.float64()),
        "is_match": pa.array([], pa.bool_()),
        "match_status": pa.array([], pa.string()),
    })


def score_pairs(hydrated_ds, cfg: ScoringConfig = ScoringConfig(),
                batch_size: int = 4096, concurrency=(1, 8)):
    return hydrated_ds.map_batches(
        PairScorer, fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
