"""scc_labels pin: the trim + remote-Tarjan hybrid must equal an
independent sequential Kosaraju on the same directed edge fixture
(different algorithm, same (node, min-id SCC label) contract)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _kosaraju(src: np.ndarray, dst: np.ndarray) -> dict[int, int]:
    nodes = sorted(set(src.tolist()) | set(dst.tolist()))
    adj: dict[int, list[int]] = {n: [] for n in nodes}
    radj: dict[int, list[int]] = {n: [] for n in nodes}
    for s, d in zip(src.tolist(), dst.tolist()):
        if s == d:
            continue
        adj[s].append(d)
        radj[d].append(s)
    seen: set[int] = set()
    order: list[int] = []
    for n in nodes:
        if n in seen:
            continue
        stack = [(n, iter(adj[n]))]
        seen.add(n)
        while stack:
            v, it = stack[-1]
            nxt = next(it, None)
            if nxt is None:
                order.append(v)
                stack.pop()
            elif nxt not in seen:
                seen.add(nxt)
                stack.append((nxt, iter(adj[nxt])))
    comp: dict[int, int] = {}
    for n in reversed(order):
        if n in comp:
            continue
        members = [n]
        comp[n] = n
        stack2 = [n]
        while stack2:
            v = stack2.pop()
            for w in radj[v]:
                if w not in comp:
                    comp[w] = n
                    members.append(w)
                    stack2.append(w)
        lbl = min(members)
        for m in members:
            comp[m] = lbl
    return comp


def test_scc_matches_kosaraju(ray_session):
    import ray.data as rd

    from reconcile_curation_in_cris_systems_ray.stages.graph import scc_labels

    rng = np.random.default_rng(7)
    n = 400
    # random sparse directed graph + planted 3-cycles so nontrivial
    # SCCs certainly exist
    src = rng.integers(0, n, 900)
    dst = rng.integers(0, n, 900)
    extra_s, extra_d = [], []
    for base in (10, 50, 111):
        extra_s += [base, base + 1, base + 2]
        extra_d += [base + 1, base + 2, base]
    src = np.concatenate([src, np.array(extra_s)])
    dst = np.concatenate([dst, np.array(extra_d)])
    edges = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst})) \
        .repartition(7)
    got = scc_labels(edges).sort_values("node").reset_index(drop=True)
    want = _kosaraju(src, dst)
    assert dict(zip(got["node"], got["scc"])) == want
    # every node present exactly once
    assert got["node"].is_unique


def test_scc_on_link_fixture(ray_session):
    from reconcile_curation_in_cris_systems_ray.pipelines.queries import q_scc_labels

    out = q_scc_labels("/root/testdata/sf0.001")
    assert out["node"].is_unique and len(out) > 0
    # labels are canonical: every SCC label is a member node <= all members
    assert (out["scc"] <= out["node"]).all()
