"""The flagship pipeline: web-page reconciliation (entity resolution).

Composition (each stage checkpointable via
:class:`..state.manifest.CheckpointManager`):

    corpus (url, warc_ts, html, text, lang)
      -> extract        actor-pool map_batches, html -> extracted_text
      -> features       actor-pool map_batches: normalize + MinHash sigs
      -> bands          explode to (band_id, band_hash, url, sig)
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

import pyarrow as pa

from ..config import ReconcileConfig, pool_size
from ..state.manifest import CheckpointManager, fingerprint
from ..stages.blocking import SignatureStage, emit_band_keys
from ..stages.cluster import assign_clusters, connected_components
from ..stages.extract import HtmlTextExtractor
from ..stages.pairs import generate_candidate_pairs
from ..stages.scoring import hydrate_pairs, score_pairs


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
    # signature stage (both actor pools run concurrently, no barrier)
    extracted = ckpt.run_stage(
        "extracted", fp_ex,
        lambda: corpus.map_batches(
            HtmlTextExtractor, batch_format="pyarrow",
            batch_size=cfg.exec.extract_batch_size,
            concurrency=pool_size(cfg.exec.extract_concurrency)),
        materialize=checkpoint_root is not None)

    fp_ft = fingerprint(fp_ex, "features")
    features = ckpt.run_stage("features", fp_ft, lambda: extracted.map_batches(
        SignatureStage,
        fn_constructor_kwargs={"blocking": cfg.blocking,
                               "scoring": cfg.scoring},
        batch_format="pyarrow", batch_size=cfg.exec.signature_batch_size,
        concurrency=pool_size(cfg.exec.signature_concurrency)))

    fp_pr = fingerprint(fp_ft, "pairs")
    pairs = ckpt.run_stage("pairs", fp_pr, lambda: generate_candidate_pairs(
        emit_band_keys(features, cfg.blocking), cfg.blocking, cfg.scoring,
        n_rows_hint=features.count() * cfg.blocking.num_bands))

    fp_sc = fingerprint(fp_pr, "scored")
    # scored streams straight into edge extraction + clustering when not
    # checkpointing (consumed exactly once; CC materializes the edges)
    scored = ckpt.run_stage("scored", fp_sc, lambda: score_pairs(
        hydrate_pairs(pairs, features), cfg.scoring,
        batch_size=cfg.exec.score_batch_size,
        concurrency=pool_size(cfg.exec.score_concurrency)),
        materialize=checkpoint_root is not None)

    def to_edges(batch: pa.Table) -> pa.Table:
        m = batch.filter(batch.column("is_match"))
        return pa.table({"u": m.column("url_a"), "v": m.column("url_b")})

    edges = scored.map_batches(to_edges, batch_format="pyarrow")
    star = connected_components(edges, cfg.cluster)

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
