"""huber_location pin: the distributed IRLS must equal a sequential
numpy reference (same median/MAD scale, same 3 rounds, same weights)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _seq_huber(v: np.ndarray) -> float:
    med = np.quantile(v, 0.5)
    mad = np.quantile(np.abs(v - med), 0.5)
    sigma = 1.4826 * mad
    k = 1.345
    mu = med
    for _ in range(3):
        r = (v - mu) / (k * sigma)
        w = np.minimum(1.0, 1.0 / np.maximum(np.abs(r), 1e-300))
        mu = (w * v).sum() / w.sum()
    return round(float(mu), 6)


def test_huber_matches_sequential(ray_session):
    from reconcile_curation_in_cris_systems_ray.pipelines.queries import (
        q_huber_location,
    )

    got = q_huber_location(SF)
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    for _, r in got.iterrows():
        v = ev.loc[ev["event_type"] == r["event_type"], "value"] \
            .to_numpy(np.float64)
        want = _seq_huber(v)
        assert abs(r["huber_mu"] - want) < 2e-6, (r["event_type"],
                                                  r["huber_mu"], want)
