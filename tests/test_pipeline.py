"""End-to-end reconcile pipeline: F1 gate, checkpoint resume,
permutation invariance, salting pair-set equivalence (SURVEY §5)."""
import collections

import pytest

from reconcile_curation_in_cris_systems_ray.config import (
    BlockingConfig, ReconcileConfig, ScoringConfig,
)
from reconcile_curation_in_cris_systems_ray.pipelines.reconcile import run_reconcile
from reconcile_curation_in_cris_systems_ray.sources.corpus import (
    CorpusConfig, corpus_table, true_pairs,
)

CORPUS_CFG = CorpusConfig(n_families=40, giant_family_variants=24)


def _pairwise_f1(assigns, truth):
    pred = collections.defaultdict(list)
    for r in assigns:
        pred[r["cluster_id"]].append(r["url"])
    pred_pairs = set()
    for urls in pred.values():
        urls = sorted(urls)
        for i in range(len(urls)):
            for j in range(i + 1, len(urls)):
                pred_pairs.add((urls[i], urls[j]))
    tp = len(pred_pairs & truth)
    fp = len(pred_pairs - truth)
    fn = len(truth - pred_pairs)
    prec = tp / max(1, tp + fp)
    rec = tp / max(1, tp + fn)
    return 2 * prec * rec / max(1e-9, prec + rec), prec, rec


@pytest.fixture(scope="module")
def corpus(ray_session):
    return corpus_table(CORPUS_CFG)


def test_pipeline_f1_gate(ray_session, corpus):
    import ray.data as rd

    out = run_reconcile(rd.from_arrow(corpus))
    assigns = out["assignments"].take_all()
    assert len(assigns) == corpus.num_rows
    f1, prec, rec = _pairwise_f1(assigns, true_pairs(corpus))
    assert f1 >= 0.99, (f1, prec, rec)


def test_permutation_invariance(ray_session, corpus):
    """Row order must not change cluster assignments (determinism)."""
    import numpy as np
    import ray.data as rd

    rng = np.random.default_rng(11)
    perm = corpus.take(rng.permutation(corpus.num_rows))
    out1 = run_reconcile(rd.from_arrow(corpus))
    out2 = run_reconcile(rd.from_arrow(perm))
    a1 = {r["url"]: r["cluster_id"] for r in out1["assignments"].take_all()}
    a2 = {r["url"]: r["cluster_id"] for r in out2["assignments"].take_all()}
    assert a1 == a2


def test_checkpoint_resume_equals_single_run(ray_session, corpus, tmp_path):
    import ray.data as rd

    root = str(tmp_path / "ckpt")
    out1 = run_reconcile(rd.from_arrow(corpus), checkpoint_root=root,
                         input_fingerprint="corpus-v1")
    a1 = {r["url"]: r["cluster_id"] for r in out1["assignments"].take_all()}
    # resume: every stage should be read back, not recomputed
    out2 = run_reconcile(rd.from_arrow(corpus), checkpoint_root=root,
                         input_fingerprint="corpus-v1")
    a2 = {r["url"]: r["cluster_id"] for r in out2["assignments"].take_all()}
    assert a1 == a2
    resumed = [s for s in out2["metrics"]["stages"] if s.get("resumed")]
    assert len(resumed) >= 4


def test_salting_preserves_pair_set(ray_session, corpus):
    """Aggressively-salted hot keys must produce the identical candidate
    pair set as the unsalted groupby (FIXTURES §5.3)."""
    import ray.data as rd

    from reconcile_curation_in_cris_systems_ray.stages.blocking import (
        SignatureStage, emit_band_keys,
    )
    from reconcile_curation_in_cris_systems_ray.stages.pairs import (
        generate_candidate_pairs,
    )

    cfg = ReconcileConfig()
    ds = rd.from_arrow(corpus)
    feats = ds.map_batches(
        SignatureStage,
        fn_constructor_kwargs={"blocking": cfg.blocking,
                               "scoring": cfg.scoring,
                               "text_col": "text"},
        batch_format="pyarrow", concurrency=(1, 2))
    feats = feats.materialize()

    def pair_set(blocking_cfg):
        bands = emit_band_keys(feats, blocking_cfg)
        pairs = generate_candidate_pairs(bands, blocking_cfg, cfg.scoring)
        return {(r["uh_a"], r["uh_b"]) for r in pairs.take_all()}

    no_salt = pair_set(BlockingConfig(hot_key_cap=10**9))
    aggressive = pair_set(BlockingConfig(hot_key_cap=4, max_salts=5))
    assert no_salt == aggressive


def test_min_band_emission_yields_unique_pairs(ray_session, corpus):
    """Without any pair-key dedup exchange, min-band emission must
    already produce globally-unique canonical pairs."""
    import ray.data as rd

    from reconcile_curation_in_cris_systems_ray.stages.blocking import (
        SignatureStage, emit_band_keys,
    )
    from reconcile_curation_in_cris_systems_ray.stages.pairs import (
        generate_candidate_pairs,
    )

    cfg = ReconcileConfig()
    feats = rd.from_arrow(corpus).map_batches(
        SignatureStage,
        fn_constructor_kwargs={"blocking": cfg.blocking,
                               "scoring": cfg.scoring,
                               "text_col": "text"},
        batch_format="pyarrow", concurrency=(1, 2)).materialize()
    pairs = generate_candidate_pairs(
        emit_band_keys(feats, cfg.blocking), cfg.blocking, cfg.scoring,
        dedup_pairs=False).take_all()
    keys = [(r["uh_a"], r["uh_b"]) for r in pairs]
    assert len(keys) == len(set(keys)), "duplicate pairs emitted"
    assert all(a < b for a, b in keys), "pairs not canonical"


def test_config_from_yaml(tmp_path):
    from reconcile_curation_in_cris_systems_ray.config import ReconcileConfig

    p = tmp_path / "cfg.yaml"
    p.write_text(
        "blocking:\n  num_bands: 8\n  rows_per_band: 8\n"
        "scoring:\n  jaccard_threshold: 0.7\n"
        "exec:\n  use_actor_pools: true\n"
        "  extract_concurrency: [2, 4]\n")
    cfg = ReconcileConfig.from_yaml(str(p))
    assert cfg.blocking.num_bands == 8
    assert cfg.scoring.jaccard_threshold == 0.7
    assert cfg.exec.use_actor_pools is True
    assert cfg.exec.extract_concurrency == (2, 4)
    assert cfg.cluster.max_rounds == 30  # untouched section: defaults

    import pytest as _pytest
    with _pytest.raises(ValueError):
        ReconcileConfig.from_dict({"blocking": {"num_bandz": 3}})
    with _pytest.raises(ValueError):
        ReconcileConfig.from_dict({"blocked": {}})


def test_actor_pool_mode_matches_task_mode(ray_session, corpus):
    """ExecConfig.use_actor_pools=True must produce identical clusters
    to the default fused-task mode."""
    import ray.data as rd

    from reconcile_curation_in_cris_systems_ray.config import ExecConfig

    out_t = run_reconcile(rd.from_arrow(corpus))
    out_a = run_reconcile(
        rd.from_arrow(corpus),
        ReconcileConfig(exec=ExecConfig(use_actor_pools=True,
                                        extract_concurrency=(1, 2),
                                        signature_concurrency=(1, 2),
                                        score_concurrency=(1, 2))))
    a_t = {r["url"]: r["cluster_id"] for r in out_t["assignments"].take_all()}
    a_a = {r["url"]: r["cluster_id"] for r in out_a["assignments"].take_all()}
    assert a_t == a_a


def test_cli_reconcile_from_parquet(ray_session, corpus, tmp_path):
    """CLI path: corpus Parquet in -> (url, cluster_id) Parquet out,
    identical clusters to the in-memory pipeline."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from reconcile_curation_in_cris_systems_ray.cli import main

    src = tmp_path / "corpus"
    src.mkdir()
    pq.write_table(corpus.drop_columns(["text", "cluster_id"]),
                   src / "part-0.parquet")
    dst = tmp_path / "assignments"
    rc = main(["reconcile", "--input", str(src), "--output", str(dst)])
    assert rc == 0
    back = rd.read_parquet(str(dst))
    a_cli = {r["url"]: r["cluster_id"] for r in back.take_all()}
    out = run_reconcile(rd.from_arrow(corpus))
    a_mem = {r["url"]: r["cluster_id"] for r in out["assignments"].take_all()}
    assert a_cli == a_mem


def test_incremental_equals_full_run(ray_session, corpus):
    """Delta linkage against a base run must produce the SAME clustering
    as a from-scratch run over base+delta (url->cluster identical)."""
    import numpy as np
    import ray.data as rd

    from reconcile_curation_in_cris_systems_ray.functions.similarity import (
        stable_hash_strings,
    )
    from reconcile_curation_in_cris_systems_ray.pipelines.incremental import (
        run_incremental,
    )

    urls = np.asarray(corpus.column("url").to_pylist(), dtype=object)
    # deterministic ~20% delta, split orthogonal to families so many
    # delta pages must join existing base clusters
    is_delta = stable_hash_strings(urls) % np.uint64(5) == 0
    base_tbl = corpus.filter(~is_delta)
    delta_tbl = corpus.filter(is_delta)
    assert 0 < delta_tbl.num_rows < corpus.num_rows

    base = run_reconcile(rd.from_arrow(base_tbl))
    inc = run_incremental(base["features"], base["assignments"],
                          rd.from_arrow(delta_tbl))
    got = {r["url"]: r["cluster_id"]
           for r in inc["assignments"].take_all()}

    full = run_reconcile(rd.from_arrow(corpus))
    want = {r["url"]: r["cluster_id"]
            for r in full["assignments"].take_all()}
    assert len(got) == corpus.num_rows
    assert got == want
    # the delta actually linked into base clusters (non-vacuous)
    assert inc["metrics"]["delta_edges"] > 0


def test_incremental_narrow_mode_equals_full_run(ray_session, corpus,
                                                 monkeypatch):
    """Force the NARROW incremental path (16B band_hash-only rows +
    band_hash semi-join + pair-key dedup): clustering must still equal
    a from-scratch run over base+delta."""
    import numpy as np
    import ray.data as rd

    from reconcile_curation_in_cris_systems_ray.functions.similarity import (
        stable_hash_strings,
    )
    from reconcile_curation_in_cris_systems_ray.pipelines import incremental

    monkeypatch.setattr(incremental, "NARROW_THRESHOLD", 0)

    urls = np.asarray(corpus.column("url").to_pylist(), dtype=object)
    is_delta = stable_hash_strings(urls) % np.uint64(5) == 0
    base = run_reconcile(rd.from_arrow(corpus.filter(~is_delta)))
    inc = incremental.run_incremental(
        base["features"], base["assignments"],
        rd.from_arrow(corpus.filter(is_delta)))
    got = {r["url"]: r["cluster_id"]
           for r in inc["assignments"].take_all()}
    full = run_reconcile(rd.from_arrow(corpus))
    want = {r["url"]: r["cluster_id"]
            for r in full["assignments"].take_all()}
    assert got == want


def test_flagship_narrow_mode_f1(ray_session, corpus, monkeypatch):
    """Force the flagship's NARROW band path (no band vectors, pair-key
    dedup exchange, task shuffle) on the small corpus: F1 gate must
    still hold and pair sets stay canonical-unique."""
    import ray.data as rd

    from reconcile_curation_in_cris_systems_ray.pipelines import (
        reconcile as rmod,
    )

    monkeypatch.setattr(rmod, "NARROW_THRESHOLD", 0)
    out = rmod.run_reconcile(rd.from_arrow(corpus))
    assigns = out["assignments"].take_all()
    f1, prec, rec = _pairwise_f1(assigns, true_pairs(corpus))
    assert f1 >= 0.99, (f1, prec, rec)
    keys = [(r["uh_a"], r["uh_b"]) for r in out["pairs"].take_all()]
    assert len(keys) == len(set(keys))
    assert all(a < b for a, b in keys)


def test_partial_resume_recomputes_only_invalidated_stage(
        ray_session, corpus, tmp_path):
    """Mid-pipeline resume: wipe ONE stage's checkpoint; the rerun must
    reuse every stage upstream of it, rebuild the wiped stage and its
    descendants, and produce identical assignments (north-rule
    'resumes mid-pipeline' evidence beyond the full-resume test)."""
    import shutil

    import ray.data as rd

    root = str(tmp_path / "ckpt")
    out1 = run_reconcile(rd.from_arrow(corpus), checkpoint_root=root,
                         input_fingerprint="corpus-v1")
    a1 = {r["url"]: r["cluster_id"] for r in out1["assignments"].take_all()}

    shutil.rmtree(f"{root}/pairs")          # invalidate one mid stage
    out2 = run_reconcile(rd.from_arrow(corpus), checkpoint_root=root,
                         input_fingerprint="corpus-v1")
    a2 = {r["url"]: r["cluster_id"] for r in out2["assignments"].take_all()}
    assert a1 == a2

    by_name = {s["stage"]: s for s in out2["metrics"]["stages"]}
    assert by_name["features"].get("resumed") is True
    assert not by_name["pairs"].get("resumed")


def test_flagship_crash_after_pairs_resumes_to_identical_assignments(
        ray_session, corpus, tmp_path, monkeypatch):
    """Round-5 (verdict task 6): KILL the flagship right after the
    pairs checkpoint commits (injected failure at the start of the
    scoring stage), then resume with a fresh run_reconcile on the same
    root: extracted/features/pairs must come back from their Parquet
    checkpoints (resumed=True), score+CC+assignments recompute, and
    the final assignments equal an uncheckpointed reference run —
    end-to-end kill-resume beyond the CC-round test in
    test_cluster.py (north-rule resumability evidence)."""
    import os

    import ray.data as rd

    from reconcile_curation_in_cris_systems_ray.pipelines import (
        reconcile as rmod,
    )

    ref = run_reconcile(rd.from_arrow(corpus))
    a_ref = {r["url"]: r["cluster_id"]
             for r in ref["assignments"].take_all()}

    root = str(tmp_path / "ckpt")
    real = rmod.hydrate_score_pairs

    def boom(*a, **k):
        raise RuntimeError("injected crash after pairs checkpoint")

    monkeypatch.setattr(rmod, "hydrate_score_pairs", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        run_reconcile(rd.from_arrow(corpus), checkpoint_root=root,
                      input_fingerprint="corpus-v2")
    monkeypatch.setattr(rmod, "hydrate_score_pairs", real)

    # the kill landed after pairs committed, before scored existed
    for st in ("extracted", "features", "pairs"):
        assert os.path.exists(os.path.join(root, st, "manifest.json")), st
    assert not os.path.exists(os.path.join(root, "scored"))

    out = run_reconcile(rd.from_arrow(corpus), checkpoint_root=root,
                        input_fingerprint="corpus-v2")
    by_name = {s["stage"]: s for s in out["metrics"]["stages"]}
    for st in ("extracted", "features", "pairs"):
        assert by_name[st].get("resumed") is True, st
    assert not by_name["scored"].get("resumed")
    assert not by_name["assignments"].get("resumed")
    a2 = {r["url"]: r["cluster_id"]
          for r in out["assignments"].take_all()}
    assert a2 == a_ref
