"""Incremental (delta) reconciliation: link NEW pages against an
existing run's state without re-scoring the whole corpus.

The production shape of the flagship at 10^12 docs is not "re-run
everything nightly" — it is "a crawl delta arrives; score only pairs
that touch it".  This module composes the flagship's stages into that
plan (reference analogue: the incremental run stats / re-entrant DB
workflow, `workflows.py:56-100` + `repository.py:516-525`, which
re-processes only new input files against the standing database):

1. extract + signature the delta (same fused task stages as
   :func:`..pipelines.reconcile.run_reconcile`, so features are
   byte-identical with a full run);
2. emit the delta's band keys; the distinct delta band_hash set
   key set is small (O(delta x num_bands)) and is broadcast once;
3. re-emit the BASE corpus's band keys (a narrow streaming recompute
   over the checkpointed features — cheaper at scale than persisting
   the exploded band table) and keep only rows in TOUCHED bands;
4. run the normal salted pair generator over touched bands only, then
   drop old-old pairs (already discovered by the base run: band keys
   are deterministic per row, so any old-old pair sharing a band now
   also shared it then);
5. hydrate + score surviving pairs (>= 1 new endpoint each);
6. contract old endpoints to their existing cluster_id and run
   connected components over the contracted delta graph — old
   clusters act as single nodes, so cluster merges caused by a new
   bridge page are found without touching old edges;
7. relabel: merged old clusters get the new component min (cluster
   ids ARE min-urls, so the merged label equals what a full run would
   assign), new urls get their component label, untouched base
   assignments stream through unchanged.

Equivalence with a from-scratch run over base+delta is pinned by
tests/test_pipeline.py (same clustering, pairwise-identical).

Scale notes: the only full passes over base data are streaming
map_batches (band re-emission, assignment relabel) — no base-sized
shuffle, no driver materialization of base data.  Driver-held state is
bounded by the DELTA: its band-key set, its url-hash set, and the
delta-touched edge/label maps.  For deltas too large to broadcast as
Python sets, swap the membership filters for the Bloom prefilter
(stages/bloom.py) or a distributed semi-join — same semantics.
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..config import ReconcileConfig
from ..functions.similarity import stable_hash_strings
from ..stages.blocking import emit_band_keys
from ..stages.cluster import connected_components
from ..stages.pairs import generate_candidate_pairs
from ..stages.scoring import build_feature_lookup, hydrate_pairs
from .reconcile import _extract_task, _scorer_task, _signature_task


def _delta_features(delta_corpus_ds, cfg: ReconcileConfig):
    base_cols = [c for c in ("url", "warc_ts", "html", "lang")
                 if c in delta_corpus_ds.schema().names]
    return (delta_corpus_ds.select_columns(base_cols)
            .map_batches(_extract_task, batch_format="pyarrow")
            .map_batches(partial(_signature_task, blocking=cfg.blocking,
                                 scoring=cfg.scoring),
                         batch_format="pyarrow"))


# band-row width crossover (same value as the flagship's): above this
# many touched band rows, ship narrow 16B rows + pair-key dedup
NARROW_THRESHOLD = 500_000


def _distinct_band_keys(band_ds) -> pd.DataFrame:
    """Driver-bounded distinct band_hash set of the DELTA (band_hash
    alone identifies a band group — the band index is mixed in)."""
    def part(df: pd.DataFrame) -> pd.DataFrame:
        return df[["band_hash"]].drop_duplicates()

    return (band_ds.select_columns(["band_hash"])
            .map_batches(part, batch_format="pandas").to_pandas()
            .drop_duplicates().reset_index(drop=True))


def run_incremental(base_features, base_assignments, delta_corpus_ds,
                    cfg: ReconcileConfig = ReconcileConfig()) -> dict:
    """Link a corpus delta against an existing run's state.

    ``base_features`` / ``base_assignments``: the ``features`` and
    ``assignments`` datasets of a prior :func:`run_reconcile` (live, or
    read back from its per-stage Parquet checkpoints).  Returns
    ``{"assignments": Dataset, "delta_features": Dataset, "metrics": dict}``
    where assignments covers base + delta urls with full-run-equivalent
    cluster ids.
    """
    t0 = time.time()
    metrics: dict = {}

    delta_feat = _delta_features(delta_corpus_ds, cfg).materialize()
    n_delta = delta_feat.count()
    metrics["delta_rows"] = n_delta

    # --- touched-band candidate generation -------------------------------
    # sizing is delta-driven: touched rows ~= delta bands plus the base
    # rows sharing those keys (a small multiple of the delta for
    # non-pathological corpora — hot boilerplate keys are capped by the
    # pair stage's salting/clique guard regardless)
    touched_hint = n_delta * cfg.blocking.num_bands * 4
    narrow = touched_hint >= NARROW_THRESHOLD
    delta_bands = emit_band_keys(delta_feat, cfg.blocking,
                                 include_bands=not narrow)
    touched_keys = _distinct_band_keys(delta_bands)
    metrics["touched_bands"] = len(touched_keys)
    keys_ref = ray.put(touched_keys[["band_hash"]])

    def touched_only(batch: pa.Table) -> pa.Table:
        # vectorized semi-join against the broadcast delta key table;
        # emits ARROW so the union with delta_bands stays one block type
        keys = ray.get(keys_ref)
        kept = batch.to_pandas().merge(keys, on=["band_hash"],
                                       how="inner")
        return pa.Table.from_pandas(kept, schema=batch.schema,
                                    preserve_index=False)

    base_touched = emit_band_keys(base_features, cfg.blocking,
                                  include_bands=not narrow) \
        .map_batches(touched_only, batch_format="pyarrow")
    touched = base_touched.union(delta_bands)

    pairs = generate_candidate_pairs(
        touched, cfg.blocking, cfg.scoring,
        n_rows_hint=touched_hint, dedup_pairs=narrow)

    # --- keep only pairs with >= 1 NEW endpoint --------------------------
    new_urls = [r["url"] for r in
                delta_feat.select_columns(["url"]).take_all()]
    new_uh = ray.put(set(stable_hash_strings(
        np.asarray(new_urls, dtype=object)).tolist()))

    def has_new(df: pd.DataFrame) -> pd.DataFrame:
        s = ray.get(new_uh)
        return df[(df["uh_a"].isin(s) | df["uh_b"].isin(s)).to_numpy()]

    pairs_new = pairs.map_batches(has_new, batch_format="pandas")

    # --- hydrate + score ---------------------------------------------------
    features_all = base_features.union(delta_feat)
    prebuilt = build_feature_lookup(features_all)
    scored = hydrate_pairs(pairs_new, features_all,
                           est_prefilter=cfg.scoring.est_prefilter,
                           prebuilt=prebuilt) \
        .map_batches(partial(_scorer_task, scoring=cfg.scoring),
                     batch_format="pyarrow")

    def to_edges(batch: pa.Table) -> pa.Table:
        m = batch.filter(batch.column("is_match"))
        return pa.table({"u": m.column("url_a"), "v": m.column("url_b")})

    edge_rows = scored.map_batches(to_edges, batch_format="pyarrow") \
        .take_all()
    metrics["delta_edges"] = len(edge_rows)

    # --- contract old endpoints to their cluster ids ----------------------
    new_set = set(new_urls)
    old_involved = {r[k] for r in edge_rows for k in ("u", "v")
                    if r[k] not in new_set}
    inv_ref = ray.put(old_involved)

    def involved_only(df: pd.DataFrame) -> pd.DataFrame:
        inv = ray.get(inv_ref)
        return df[df["url"].isin(inv)]

    old_map = {r["url"]: r["cluster_id"] for r in
               base_assignments.map_batches(
                   involved_only, batch_format="pandas").take_all()} \
        if old_involved else {}

    contracted = [(old_map.get(r["u"], r["u"]), old_map.get(r["v"], r["v"]))
                  for r in edge_rows]
    label_map: dict[str, str] = {}
    if contracted:
        import ray.data as rd

        edges_ds = rd.from_arrow(pa.table({
            "u": pa.array([u for u, _ in contracted], pa.string()),
            "v": pa.array([v for _, v in contracted], pa.string()),
        }))
        star = connected_components(edges_ds, cfg.cluster)
        label_map = {r["u"]: r["v"] for r in star.take_all()}
    metrics["merged_labels"] = len(label_map)

    # --- relabel old clusters + label new urls -----------------------------
    old_cluster_ids = set(old_map.values())
    cluster_relabel = {u: v for u, v in label_map.items()
                       if u in old_cluster_ids}
    relabel_ref = ray.put(cluster_relabel)

    def relabel(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(relabel_ref)
        if m:
            df = df.copy()
            df["cluster_id"] = df["cluster_id"].map(lambda c: m.get(c, c))
        return df

    old_updated = base_assignments.map_batches(relabel,
                                               batch_format="pandas")

    label_ref = ray.put(label_map)

    def label_new(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(label_ref)
        return pd.DataFrame({
            "url": df["url"].to_numpy(),
            "cluster_id": df["url"].map(lambda u: m.get(u, u)).to_numpy(),
        })

    new_assign = delta_feat.select_columns(["url"]).map_batches(
        label_new, batch_format="pandas")

    metrics["total_wall_sec"] = round(time.time() - t0, 3)
    return {"assignments": old_updated.union(new_assign),
            "delta_features": delta_feat, "metrics": metrics}
