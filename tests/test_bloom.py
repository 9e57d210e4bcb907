"""Bloom-filter prefilter semantics: no false negatives ever, bounded
false positives at design size, and EXACT anti-join results even with a
deliberately tiny (FP-saturated) bitmap."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _build_local(keys, num_bits, num_hashes):
    from reconcile_curation_in_cris_systems_ray.stages.bloom import (
        _bit_positions, _key_hashes,
    )

    bitmap = np.zeros(num_bits // 8, dtype=np.uint8)
    h = _key_hashes(np.asarray(keys))
    pos = _bit_positions(h, num_bits, num_hashes).ravel()
    np.bitwise_or.at(bitmap, pos >> 3,
                     np.uint8(1) << (pos & 7).astype(np.uint8))
    return bitmap


def test_no_false_negatives_and_low_fp_rate():
    from reconcile_curation_in_cris_systems_ray.stages.bloom import (
        DEFAULT_NUM_BITS, DEFAULT_NUM_HASHES, bloom_might_contain,
    )

    members = [f"key-{i}" for i in range(50000)]
    others = np.array([f"other-{i}" for i in range(20000)], dtype=object)
    bm = _build_local(members, DEFAULT_NUM_BITS, DEFAULT_NUM_HASHES)
    assert bloom_might_contain(
        bm, np.asarray(members, dtype=object)).all()
    fp = bloom_might_contain(bm, others).mean()
    assert fp < 0.05, fp


def test_anti_join_exact_even_with_saturated_bitmap(ray_session):
    """A 64-bit bitmap forces massive false positives; the exact
    verification pass must still produce the true anti-join."""
    import ray.data as rd

    from reconcile_curation_in_cris_systems_ray.stages.bloom import bloom_anti_join

    rng = np.random.default_rng(11)
    left = pd.DataFrame({
        "k": rng.integers(0, 400, size=1000),
        "payload": np.arange(1000),
    })
    keys = pd.DataFrame({"k": rng.choice(400, size=120, replace=False)})
    out = bloom_anti_join(rd.from_pandas(left), rd.from_pandas(keys),
                          on="k", num_bits=64, num_hashes=2).to_pandas()
    expect = left[~left["k"].isin(set(keys["k"]))]
    got = out.sort_values("payload").reset_index(drop=True)
    want = expect.sort_values("payload").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "payload"]], want[["k", "payload"]])


def test_anti_join_empty_key_set_keeps_everything(ray_session):
    import ray.data as rd

    from reconcile_curation_in_cris_systems_ray.stages.bloom import bloom_anti_join

    left = pd.DataFrame({"k": ["a", "b", "c"], "v": [1, 2, 3]})
    keys = pd.DataFrame({"k": pd.Series([], dtype=object)})
    out = bloom_anti_join(rd.from_pandas(left), rd.from_pandas(keys),
                          on="k").to_pandas()
    assert sorted(out["v"].tolist()) == [1, 2, 3]


def test_string_and_int_keys_hash_consistently():
    """Build over ints, probe over the same ints — membership holds
    regardless of the numpy dtype the column arrives in."""
    from reconcile_curation_in_cris_systems_ray.stages.bloom import (
        bloom_might_contain,
    )

    ints = list(range(1000))
    bm = _build_local(np.array(ints, dtype=np.int64), 1 << 16, 5)
    assert bloom_might_contain(
        bm, np.array(ints, dtype=np.int64)).all()
    assert bloom_might_contain(bm, np.array(ints, dtype=np.int32)).all()
