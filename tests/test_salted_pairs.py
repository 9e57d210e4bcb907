"""Mega-source memory pin for ``_salted_source_pairs`` (round-5
verdict task 1): one source holding 50x the median docs must be split
by triangle salting so no bucket task ever holds a dense m x m pair
enumeration — and the pair set must equal the unsalted brute force
exactly (every pair exactly once)."""

import numpy as np
import pandas as pd

from reconcile_curation_in_cris_systems_ray.pipelines.queries._shared import (
    _expand_source_salts, _minhash_block_pairs, _salted_source_pairs,
)


def _mk_sigs(rng, n, source, k, base):
    return pd.DataFrame({
        "doc_id": np.arange(base, base + n, dtype=np.int64),
        "source": source,
        **{f"mh{s}": rng.integers(0, 8, size=n).astype(np.uint64)
           for s in range(k)}})


def test_salted_source_pairs_mega_source(ray_session):
    import ray.data as rd

    k, cap = 4, 64
    rng = np.random.default_rng(7)
    parts, base = [], 0
    for i, n in enumerate([20, 20, 20, 1000]):   # mega = 50x median
        parts.append(_mk_sigs(rng, n, f"s{i}", k, base))
        base += n
    df = pd.concat(parts, ignore_index=True)

    # --- flat-memory pin: no (source, salt_i, salt_j) group exceeds
    # ~2*cap members, even though the mega source holds 1000 docs
    s = -(-1000 // cap)
    salted = _expand_source_salts(df, {"s3": s})
    sizes = salted.groupby(["source", "salt_i", "salt_j"]).size()
    assert sizes.max() <= 2 * cap * 1.5      # headroom for salt skew
    # replication: s copies per hot row, 1 per cold row
    assert len(salted) == 60 + 1000 * s

    # --- exactness: distributed salted pairs == per-source brute force
    ds = rd.from_pandas(df).repartition(8)
    got = (_salted_source_pairs(ds, k, cap=cap, min_eq=2)
           .to_pandas().sort_values(["id_a", "id_b"])
           .reset_index(drop=True))
    exp_parts = []
    for _, g in df.groupby("source"):
        g = g.sort_values("doc_id")
        iu, ju, eq = _minhash_block_pairs(g, k)
        keep = eq >= 2
        ids = g["doc_id"].to_numpy(np.int64)
        exp_parts.append(pd.DataFrame({
            "id_a": ids[iu[keep]], "id_b": ids[ju[keep]],
            "eq": eq[keep]}))
    exp = (pd.concat(exp_parts, ignore_index=True)
           .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # exactly-once: triangle replication never duplicates a pair
    assert not got.duplicated(["id_a", "id_b"]).any()
