"""Pins for the embedding-clustering operators (kmeans / SemDeDup).

The embeddings test table carries random (non-clustered) vectors, so
purity-vs-label is meaningless; instead the distributed k-means is
pinned EXACTLY against a single-node numpy reference with identical
semantics, and SemDeDup is pinned on planted near-duplicate recovery.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _load_embeddings():
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    X = np.vstack([np.asarray(v, dtype=np.float64)
                   for v in t["embedding"].to_pylist()])
    return ids, X


def test_kmeans_matches_single_node_reference(ray_session):
    import ray.data as rd

    from reconcile_curation_in_cris_systems_ray.stages.embcluster import (
        kmeans, kmeans_reference)

    ids, X = _load_embeddings()
    ref_C, ref_assign = kmeans_reference(ids, X, k=10, iters=10)

    ds = rd.read_parquet(f"{SF}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    C, assigned = kmeans(ds, k=10, iters=10)
    got = assigned.to_pandas().set_index("vec_id")["cluster"]

    # same init and tie-break semantics => cluster indices correspond
    # one-to-one; only summation order differs (float tolerance)
    assert np.allclose(C, ref_C, atol=1e-8)
    expect = pd.Series(ref_assign, index=ids)
    assert (got.reindex(expect.index) == expect).all()


def test_kmeans_objective_decreases(ray_session):
    """Lloyd's invariant: more iterations never increase the summed
    within-cluster distance (checked on the reference, which the
    distributed path is pinned to above)."""
    from reconcile_curation_in_cris_systems_ray.stages.embcluster import (
        _assign, kmeans_reference)

    ids, X = _load_embeddings()
    prev = None
    for iters in (1, 3, 6, 10):
        C, a = kmeans_reference(ids, X, k=10, iters=iters)
        obj = float(((X - C[a]) ** 2).sum())
        if prev is not None:
            assert obj <= prev + 1e-9
        prev = obj
    assert a.shape == ids.shape and set(a) <= set(range(10))
    assert (_assign(X, C) == a).all()


@pytest.fixture()
def planted_dir(tmp_path):
    """120 well-separated random vectors + 6 planted near-identical
    probes (copies of vectors 3, 40, 77 with tiny noise, cosine
    > 0.999).  Random 16-d unit vectors sit near cosine 0 of each
    other, so threshold 0.9 isolates exactly the planted pairs."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(120, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    probes = []
    for src in (3, 40, 77):
        v = base[src] + rng.normal(scale=1e-4, size=16)
        probes.append(v / np.linalg.norm(v))
        w = base[src] + rng.normal(scale=1e-4, size=16)
        probes.append(w / np.linalg.norm(w))
    X = np.vstack([base] + [np.vstack(probes)])
    ids = np.arange(len(X), dtype=np.int64)
    t = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([list(map(float, r)) for r in X],
                              type=pa.list_(pa.float32())),
    })
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_semdedup_recovers_planted_duplicates(ray_session, planted_dir):
    import ray.data as rd

    from reconcile_curation_in_cris_systems_ray.stages.embcluster import (
        semdedup)

    ds = rd.read_parquet(f"{planted_dir}/embeddings.parquet")
    out = semdedup(ds, k=8, iters=5, threshold=0.9).to_pandas()
    assert len(out) == 126
    dropped = set(out.loc[~out["keep"], "vec_id"])
    # every planted probe (ids 120..125) is similar to a lower-id
    # original; the originals themselves must survive
    assert {120, 121, 122, 123, 124, 125} == dropped
    # k-means must put each probe in its source's cluster for the
    # within-cluster comparison to see the pair
    cl = out.set_index("vec_id")["cluster"]
    for probe, src in ((120, 3), (121, 3), (122, 40), (123, 40),
                       (124, 77), (125, 77)):
        assert cl[probe] == cl[src]


def test_pca_matches_reference_exactly(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    import ray.data as rd
    from reconcile_curation_in_cris_systems_ray.stages.embcluster import (
        _matrix, pca, pca_reference,
    )

    tbl = pq.read_table("/root/testdata/sf0.001/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    W, mean, ev, projected = pca(rd.from_arrow(tbl), k=8)
    got = projected.to_pandas().sort_values("vec_id").reset_index(drop=True)

    ids = tbl.column("vec_id").to_numpy()
    X = _matrix(tbl.column("embedding"))
    order = np.argsort(ids, kind="stable")
    Wr, mr, evr, Pr = pca_reference(X[order], k=8)

    np.testing.assert_allclose(W, Wr, atol=1e-9)
    np.testing.assert_allclose(mean, mr, atol=1e-12)
    np.testing.assert_allclose(ev, evr, atol=1e-9)
    P = got[[f"p{j}" for j in range(8)]].to_numpy()
    np.testing.assert_allclose(P, Pr, atol=1e-9)
    # variance actually concentrates: top-8 explain more than 8/64 uniform
    total_var = X.var(axis=0, ddof=1).sum()
    assert ev.sum() / total_var > 8 / 64
