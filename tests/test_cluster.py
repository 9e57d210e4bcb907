"""Distributed connected components vs driver union-find oracle."""
import numpy as np
import pytest

from reconcile_curation_in_cris_systems_ray.config import ClusterConfig
from reconcile_curation_in_cris_systems_ray.stages.cluster import (
    assign_clusters, connected_components, union_find_oracle,
)


def _random_edges(seed: int, n_nodes: int, n_edges: int):
    rng = np.random.default_rng(seed)
    nodes = [f"n{i:04d}" for i in range(n_nodes)]
    edges = set()
    while len(edges) < n_edges:
        a, b = rng.choice(n_nodes, 2, replace=False)
        edges.add((nodes[min(a, b)], nodes[max(a, b)]))
    return nodes, sorted(edges)


@pytest.mark.parametrize("seed,n_nodes,n_edges", [
    (1, 40, 20), (2, 100, 60), (3, 200, 220), (4, 50, 49),
])
def test_connected_components_matches_union_find(ray_session, seed, n_nodes,
                                                 n_edges):
    import ray.data as rd

    nodes, edges = _random_edges(seed, n_nodes, n_edges)
    oracle = union_find_oracle(edges, nodes)

    edges_ds = rd.from_items([{"u": u, "v": v} for u, v in edges])
    star = connected_components(edges_ds, ClusterConfig(num_buckets=16))
    urls = rd.from_items([{"url": n} for n in nodes])
    got = {r["url"]: r["cluster_id"]
           for r in assign_clusters(urls, star, num_buckets=16).take_all()}
    assert got == oracle


def test_chain_graph(ray_session):
    """Long chain — worst case for propagation depth."""
    import ray.data as rd

    n = 64
    nodes = [f"c{i:03d}" for i in range(n)]
    edges = [(nodes[i], nodes[i + 1]) for i in range(n - 1)]
    edges_ds = rd.from_items([{"u": u, "v": v} for u, v in edges])
    star = connected_components(edges_ds, ClusterConfig(num_buckets=8))
    urls = rd.from_items([{"url": x} for x in nodes])
    got = {r["url"]: r["cluster_id"]
           for r in assign_clusters(urls, star, num_buckets=8).take_all()}
    assert set(got.values()) == {nodes[0]}
