"""pseudo_diameter pin: the distributed double-sweep must equal a
sequential double-sweep BFS on the same undirected graph."""

from __future__ import annotations

import collections

import numpy as np
import pandas as pd


def _bfs(adj: dict[int, set[int]], seed: int):
    lvl = {seed: 0}
    q = collections.deque([seed])
    far, ecc = seed, 0
    while q:
        v = q.popleft()
        for w in sorted(adj[v]):
            if w not in lvl:
                lvl[w] = lvl[v] + 1
                if lvl[w] > ecc or (lvl[w] == ecc and w < far):
                    # farthest = max level, tie -> min id: track below
                    pass
                q.append(w)
    ecc = max(lvl.values())
    far = min(n for n, l in lvl.items() if l == ecc)
    return far, ecc


def test_pseudo_diameter_matches_sequential(ray_session):
    import ray.data as rd

    from reconcile_curation_in_cris_systems_ray.stages.graph import pseudo_diameter

    rng = np.random.default_rng(11)
    n = 300
    src = rng.integers(0, n, 500)
    dst = rng.integers(0, n, 500)
    # plant a long path so the diameter is nontrivial
    path = np.arange(1000, 1012)
    src = np.concatenate([src, path[:-1], [0]])
    dst = np.concatenate([dst, path[1:], [1000]])
    edges = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst})) \
        .repartition(5)
    got = pseudo_diameter(edges)

    adj: dict[int, set[int]] = collections.defaultdict(set)
    for s, d in zip(src.tolist(), dst.tolist()):
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    seed = min(adj)
    far1, _ = _bfs(adj, seed)
    far2, ecc2 = _bfs(adj, far1)
    assert int(got["seed"].iloc[0]) == seed
    assert int(got["far_node"].iloc[0]) == far2
    assert int(got["pseudo_diameter"].iloc[0]) == ecc2
