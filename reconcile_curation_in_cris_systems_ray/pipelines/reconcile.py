"""The flagship pipeline: web-page reconciliation (entity resolution).

Composition (each stage checkpointable via
:class:`..state.manifest.CheckpointManager`):

    corpus (url, warc_ts, html, text, lang)
      -> extract        actor-pool map_batches, html -> extracted_text
      -> features       actor-pool map_batches: normalize + MinHash sigs
      -> bands          explode to (band_hash, uh[, band_id, bands])
      -> pairs          salted groupby-pairing + cross-band dedup
      -> scored         hydrate (hash join) + duckdb fuzzy kernels
      -> edges          is_match filter
      -> components     large/small-star fixpoint rounds
      -> assignments    (url, cluster_id = min url of component)

Reference lifecycle analogue: §3.3 of SURVEY.md (prescan -> linkage ->
discovery -> combine), re-expressed Ray-Data-first.
"""

from __future__ import annotations

import time
from functools import partial

import pyarrow as pa

from ..config import ReconcileConfig, pool_size
from ..state.manifest import CheckpointManager, fingerprint
from ..stages.blocking import SignatureStage, emit_band_keys
from ..stages.cluster import assign_clusters, connected_components
from ..stages.extract import HtmlTextExtractor
from ..stages.pairs import generate_candidate_pairs
from ..stages.scoring import (
    PairScorer, build_feature_lookup, hydrate_pairs, hydrate_score_pairs,
    score_pairs,
)

# Per-worker-process stage cache for task-mode stages: Ray reuses
# worker processes across tasks and stages, so state built here (parser
# tables, MinHash permutations, DuckDB connections) is constructed once
# per worker — the same load-once semantics as an actor pool's
# ``__init__``, but with two wins measured on this pipeline: task
# operators FUSE (extract+signature run in one task, no inter-operator
# object-store hop) and there is no pool ramp-up latency.  Actor pools
# remain available via ``ExecConfig.use_actor_pools`` for genuinely
# heavyweight state (an ML model that takes seconds to load), where
# bounding the number of loaded copies matters more than fusion.
_WORKER_STATE: dict = {}

# band-row width crossover: below this, band rows carry the full band
# vector (min-band emission, no pair-key exchange); above it, narrow
# 16B rows + a pair-key dedup exchange (measured 2.5-3x at 2.1M rows)
NARROW_THRESHOLD = 500_000


def _extract_task(batch: pa.Table) -> pa.Table:
    st = _WORKER_STATE.get("extractor")
    if st is None:
        st = _WORKER_STATE["extractor"] = HtmlTextExtractor()
    return st(batch)


def _signature_task(batch: pa.Table, blocking=None, scoring=None) -> pa.Table:
    key = ("signature", blocking, scoring)
    st = _WORKER_STATE.get(key)
    if st is None:
        st = _WORKER_STATE[key] = SignatureStage(blocking, scoring)
    return st(batch)


def _scorer_task(batch: pa.Table, scoring=None) -> pa.Table:
    key = ("scorer", scoring)
    st = _WORKER_STATE.get(key)
    if st is None:
        st = _WORKER_STATE[key] = PairScorer(scoring)
    return st(batch)


def run_reconcile(corpus_ds, cfg: ReconcileConfig = ReconcileConfig(),
                  checkpoint_root: str | None = None, resume: bool = True,
                  input_fingerprint: str = "corpus") -> dict:
    """Run the full reconcile pipeline; returns stage datasets + metrics."""
    t_start = time.time()
    ckpt = CheckpointManager(checkpoint_root, resume=resume)
    cfg_fp = fingerprint(cfg)

    base_cols = [c for c in ("url", "warc_ts", "html", "lang")
                 if c in corpus_ds.schema().names]
    corpus = corpus_ds.select_columns(base_cols)

    fp_ex = fingerprint(input_fingerprint, cfg_fp, "extract")
    # without a checkpoint root, extraction streams straight into the
    # signature stage with no barrier; in task mode the two stages FUSE
    # into a single map task per block
    if cfg.exec.use_actor_pools:
        extract_stage = lambda: corpus.map_batches(  # noqa: E731
            HtmlTextExtractor, batch_format="pyarrow",
            batch_size=cfg.exec.extract_batch_size,
            concurrency=pool_size(cfg.exec.extract_concurrency))
    else:
        extract_stage = lambda: corpus.map_batches(  # noqa: E731
            _extract_task, batch_format="pyarrow")
    extracted = ckpt.run_stage("extracted", fp_ex, extract_stage,
                               materialize=checkpoint_root is not None)

    fp_ft = fingerprint(fp_ex, "features")
    if cfg.exec.use_actor_pools:
        feature_stage = lambda: extracted.map_batches(  # noqa: E731
            SignatureStage,
            fn_constructor_kwargs={"blocking": cfg.blocking,
                                   "scoring": cfg.scoring},
            batch_format="pyarrow", batch_size=cfg.exec.signature_batch_size,
            concurrency=pool_size(cfg.exec.signature_concurrency))
    else:
        feature_stage = lambda: extracted.map_batches(  # noqa: E731
            partial(_signature_task, blocking=cfg.blocking,
                    scoring=cfg.scoring),
            batch_format="pyarrow")
    features = ckpt.run_stage("features", fp_ft, feature_stage)

    fp_pr = fingerprint(fp_ft, "pairs")
    try:
        feat_blocks = features.num_blocks()
    except Exception:
        feat_blocks = None

    # launch the broadcast hydration lookup build (one remote task,
    # non-blocking) BEFORE the pair stage so it overlaps that stage's
    # execution; the scorer's merge blocks on the refs naturally
    prebuilt = build_feature_lookup(features)

    # scale-adaptive dedup mode (measured crossover, re-measured on a
    # clean box round 2): below ~500k band rows ship the per-row band
    # vector and dedup via min-band emission (no second exchange);
    # above it, narrow 16B rows + a pair-key dedup exchange win 2.5-3x
    # (2.1M band rows: 4.5-4.9s wide vs 1.8-1.9s narrow at 32 CPUs —
    # pair rows are ~10x fewer than band rows, so deduping pairs costs
    # less than shipping a 128B band vector through the big shuffle)
    band_rows_hint = features.count() * cfg.blocking.num_bands
    narrow = band_rows_hint >= NARROW_THRESHOLD
    pairs = ckpt.run_stage("pairs", fp_pr, lambda: generate_candidate_pairs(
        emit_band_keys(features, cfg.blocking, include_bands=not narrow),
        cfg.blocking, cfg.scoring,
        n_rows_hint=band_rows_hint,
        dedup_pairs=narrow, num_blocks_hint=feat_blocks))

    fp_sc = fingerprint(fp_pr, "scored")
    # scored streams straight into edge extraction + clustering when not
    # checkpointing (consumed exactly once; CC materializes the edges)
    if cfg.exec.use_actor_pools:
        scored_stage = lambda: score_pairs(  # noqa: E731
            hydrate_pairs(pairs, features,
                          est_prefilter=cfg.scoring.est_prefilter,
                          prebuilt=prebuilt),
            cfg.scoring,
            batch_size=cfg.exec.score_batch_size,
            concurrency=pool_size(cfg.exec.score_concurrency))
    else:
        # fused hydrate+score: one task stage emitting the scored
        # schema directly — the ~2.4 KB/row hydrated intermediate
        # (shingles/title/head per side) never crosses an operator
        # boundary, and the est-prefilter runs before the wide gathers
        scored_stage = lambda: hydrate_score_pairs(  # noqa: E731
            pairs, features, cfg.scoring,
            est_prefilter=cfg.scoring.est_prefilter,
            prebuilt=prebuilt)
    scored = ckpt.run_stage("scored", fp_sc, scored_stage,
                            materialize=checkpoint_root is not None)

    def to_edges(batch: pa.Table) -> pa.Table:
        m = batch.filter(batch.column("is_match"))
        return pa.table({"u": m.column("url_a"), "v": m.column("url_b")})

    edges = scored.map_batches(to_edges, batch_format="pyarrow")
    # the scored dataset streams (no barrier), so the CC edge
    # materialization below pulls the whole hydrate+score execution
    # through — time it explicitly so the segment is visible in stage
    # metrics (it was the untimed 40-55% of the wall in round-2 bench)
    t_cc = time.time()
    cc_metrics: dict = {}
    # with a checkpoint root, every CC contraction round + the final
    # union-find star become resumable stages of their own (round-4:
    # a crash mid-closure no longer restarts the whole fixpoint)
    star = connected_components(edges, cfg.cluster, metrics_out=cc_metrics,
                                ckpt=ckpt if checkpoint_root else None,
                                fp_base=fingerprint(fp_sc, "cc"))
    ckpt.lineage.append({
        "stage": "score+components", "fingerprint": fp_sc, "rows": None,
        "wall_sec": round(time.time() - t_cc, 3), "resumed": False,
        **cc_metrics,
    })

    fp_as = fingerprint(fp_sc, "assignments")
    assignments = ckpt.run_stage("assignments", fp_as, lambda: assign_clusters(
        features, star, num_buckets=cfg.cluster.num_buckets))

    ckpt.write_lineage()
    metrics = {
        "stages": ckpt.lineage,
        "total_wall_sec": round(time.time() - t_start, 3),
        "candidate_pairs": next(
            (s["rows"] for s in ckpt.lineage if s["stage"] == "pairs"), None),
        # when scored streams, its row count equals the (materialized)
        # candidate-pair count — the scorer flags rather than drops rows
        "scored_pairs": next(
            (s["rows"] for s in ckpt.lineage
             if s["stage"] == "scored" and s["rows"] is not None),
            next((s["rows"] for s in ckpt.lineage
                  if s["stage"] == "pairs"), None)),
    }
    return {
        "extracted": extracted, "features": features, "pairs": pairs,
        "scored": scored, "assignments": assignments, "metrics": metrics,
    }
