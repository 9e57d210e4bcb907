"""Perceptual-hash operator: real DCT hash math + the actor-pool
stage + Hamming pair recovery of planted payload duplicates."""

from __future__ import annotations

import numpy as np
import pandas as pd


def test_phash_locality_on_pixels():
    """Real hash math: small pixel noise moves few bits, unrelated
    images differ in ~half."""
    from reconcile_curation_in_cris_systems_ray.stages.multimodal import phash64

    rng = np.random.default_rng(0)
    base = rng.random((32, 32)) * 0.5 + 0.25
    noisy = base + rng.normal(0, 0.01, base.shape)
    other = rng.random((32, 32))
    h = phash64(np.stack([base, noisy, other]))
    bits = np.unpackbits(h, axis=1)
    assert int((bits[0] != bits[1]).sum()) <= 4
    assert int((bits[0] != bits[2]).sum()) >= 16


def test_phash_dups_recovers_exact_payload_duplicates(ray_session):
    import ray.data as rd

    from reconcile_curation_in_cris_systems_ray.stages.multimodal import (
        phash_media,
    )
    from reconcile_curation_in_cris_systems_ray.stages.pairs import (
        hamming_pairs,
    )

    payloads = [f"unique media payload {i}".encode() for i in range(40)]
    # plant 3 exact duplicates of payload 0
    rows = [{"media_id": f"m{i}", "kind": "image", "payload": p,
             "mime": "application/octet-stream"}
            for i, p in enumerate(payloads)]
    for j in range(3):
        rows.append({"media_id": f"d{j}", "kind": "image",
                     "payload": payloads[0],
                     "mime": "application/octet-stream"})
    hashed = phash_media(rd.from_pandas(pd.DataFrame(rows)))
    got = hamming_pairs(hashed, "media_id", "phash", max_dist=2) \
        .to_pandas()
    dup_ids = {"m0", "d0", "d1", "d2"}
    exact = got[got["dist"] == 0]
    pairs = {tuple(sorted((a, b)))
             for a, b in zip(exact["id_a"], exact["id_b"])}
    import itertools
    want = {tuple(sorted(p))
            for p in itertools.combinations(sorted(dup_ids), 2)}
    assert want <= pairs
    # no exact-distance pair outside the planted clique
    assert all(a in dup_ids and b in dup_ids for a, b in pairs)
