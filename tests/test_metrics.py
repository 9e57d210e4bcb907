"""Pairwise cluster metrics: contingency identity vs brute-force pairs."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd

from reconcile_curation_in_cris_systems_ray.stages.metrics import (
    pairwise_cluster_metrics,
)


def _brute(df: pd.DataFrame, pred: str, true: str):
    idx = list(df.index)
    pred_pairs = truth_pairs = tp = 0
    for a, b in itertools.combinations(idx, 2):
        sp = df.loc[a, pred] == df.loc[b, pred]
        st = df.loc[a, true] == df.loc[b, true]
        pred_pairs += sp
        truth_pairs += st
        tp += sp and st
    return int(tp), int(pred_pairs), int(truth_pairs)


def test_metrics_match_brute_force(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "pred": rng.integers(0, 6, 200).astype(str),
        "truth": rng.integers(0, 4, 200).astype(str),
    })
    got = pairwise_cluster_metrics(rd.from_pandas(df), "pred", "truth")
    tp, pp, tt = _brute(df, "pred", "truth")
    row = got.iloc[0]
    assert (row["tp_pairs"], row["pred_pairs"], row["true_pairs"]) == \
        (tp, pp, tt)
    assert row["precision"] == round(tp / pp, 6)
    assert row["recall"] == round(tp / tt, 6)


def test_metrics_perfect_and_disjoint(ray_session):
    import ray.data as rd

    same = pd.DataFrame({"pred": ["a"] * 5 + ["b"] * 5,
                         "truth": ["x"] * 5 + ["y"] * 5})
    row = pairwise_cluster_metrics(
        rd.from_pandas(same), "pred", "truth").iloc[0]
    assert row["f1"] == 1.0
    singletons = pd.DataFrame({"pred": [str(i) for i in range(10)],
                               "truth": ["x"] * 10})
    row = pairwise_cluster_metrics(
        rd.from_pandas(singletons), "pred", "truth").iloc[0]
    assert row["tp_pairs"] == 0 and row["pred_pairs"] == 0
    assert row["precision"] == 1.0 and row["recall"] == 0.0


def test_flagship_f1_via_distributed_metrics(ray_session):
    """The distributed contingency-metric reproduces the flagship's
    driver-side pairwise F1 gate (scale-path twin of the test oracle)."""
    import pyarrow as pa
    import ray.data as rd

    from reconcile_curation_in_cris_systems_ray.pipelines.reconcile import (
        run_reconcile,
    )
    from reconcile_curation_in_cris_systems_ray.sources.corpus import (
        CorpusConfig, corpus_table,
    )

    tbl = corpus_table(CorpusConfig(n_families=40))
    out = run_reconcile(rd.from_arrow(tbl))
    truth = tbl.select(["url", "cluster_id"]).rename_columns(
        ["url", "true_family"])
    pred = out["assignments"].to_pandas()
    joined = pred.merge(truth.to_pandas(), on="url")
    assert len(joined) == tbl.num_rows
    row = pairwise_cluster_metrics(
        rd.from_pandas(joined.rename(columns={"cluster_id": "pred"})),
        "pred", "true_family").iloc[0]
    assert row["f1"] == 1.0
