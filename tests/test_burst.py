"""burst_viterbi pin: the cross-user vectorized Viterbi must equal a
per-user sequential reference (same rates, penalty and tie rule)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _seq_viterbi(gaps: np.ndarray) -> tuple[int, int]:
    lam0 = len(gaps) / gaps.sum()
    lam1 = 3.0 * lam0
    gamma = 1.0
    big = 1e18
    c0, c1 = 0.0, big
    bp = []
    for g in gaps:
        e0 = -np.log(lam0) + lam0 * g
        e1 = -np.log(lam1) + lam1 * g
        p0 = 1 if c1 < c0 else 0
        n0 = min(c0, c1) + e0
        p1 = 1 if c1 < c0 + gamma else 0
        n1 = min(c0 + gamma, c1) + e1
        bp.append((p0, p1))
        c0, c1 = n0, n1
    state = 1 if c1 < c0 else 0
    n_burst = 0
    for p0, p1 in reversed(bp):
        n_burst += state
        state = p1 if state == 1 else p0
    return len(gaps), n_burst


def test_burst_matches_sequential(ray_session):
    from reconcile_curation_in_cris_systems_ray.pipelines.queries import (
        q_burst_viterbi,
    )

    got = q_burst_viterbi(SF).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas() \
        .sort_values(["user_id", "ts", "event_id"])
    want = []
    for u, g in ev.groupby("user_id"):
        t = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        gaps = np.diff(t).astype(np.float64) / 1e6
        if len(gaps):
            n, nb = _seq_viterbi(gaps)
            want.append((int(u), n, nb))
    assert list(zip(got["user_id"], got["n_steps"],
                    got["n_burst"])) == want
    # bursts are a strict subset of steps
    assert (got["n_burst"] <= got["n_steps"]).all()
