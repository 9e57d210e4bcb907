"""Transitive clustering: connected components as iterative
groupby-aggregate rounds to fixpoint.

Replaces the reference's single-hop window dedup (``repository.py:
456-509``) with true transitive closure per the north rule.  The
algorithm is alternating **large-star / small-star** contraction
(public algorithm; Kiveris et al., "Connected Components in MapReduce
and Beyond"), which converges in O(log n) rounds and is expressed here
entirely as bucketed hash-shuffle rounds:

- large-star: for each node u, m = min(N(u) ∪ {u}); emit (v, m) for
  v in N(u), v > u.
- small-star: orient edges (h -> l), h > l; for each h,
  m = min(N(h)); emit (l, m) for l != m plus (h, m).

Each round is a ``bucketed_map_groups`` (vectorized pandas inside
buckets — no per-group Python calls), followed by canonical dedup.
Convergence = (edge count, order-independent checksum) unchanged.
Rounds are materialized so lineage does not grow unboundedly; node ids
are urls (strings) and the cluster label is the lexicographic min url
of the component — deterministic under any parallelism.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..config import ClusterConfig
from ..functions.similarity import stable_hash_strings
from .shuffle import bucketed_map_groups

logger = logging.getLogger(__name__)

_EMPTY = pd.DataFrame({"u": pd.Series([], dtype=object),
                       "v": pd.Series([], dtype=object)})


def _large_star(edges_ds, num_buckets: int):
    def bidirect(batch: pa.Table) -> pa.Table:
        u, v = batch.column("u"), batch.column("v")
        return pa.table({"u": pa.concat_arrays([u.combine_chunks(), v.combine_chunks()]),
                         "v": pa.concat_arrays([v.combine_chunks(), u.combine_chunks()])})

    bi = edges_ds.map_batches(bidirect, batch_format="pyarrow")

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _EMPTY
        mins = df.groupby("u", sort=False)["v"].transform("min")
        m = np.minimum(mins.to_numpy(dtype=object),
                       df["u"].to_numpy(dtype=object))
        keep = df["v"].to_numpy(dtype=object) > df["u"].to_numpy(dtype=object)
        out = pd.DataFrame({"u": df["v"].to_numpy(dtype=object)[keep],
                            "v": m[keep]})
        out = out[out["u"] != out["v"]]
        return out.drop_duplicates()

    return bucketed_map_groups(bi, ["u"], fn, num_buckets)


def _small_star(edges_ds, num_buckets: int):
    def orient(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_pandas().to_numpy(dtype=object)
        v = batch.column("v").to_pandas().to_numpy(dtype=object)
        h = np.maximum(u, v)
        l = np.minimum(u, v)
        keep = h != l
        return pa.table({"u": pa.array(h[keep], pa.string()),
                         "v": pa.array(l[keep], pa.string())})

    oriented = edges_ds.map_batches(orient, batch_format="pyarrow")

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _EMPTY
        m = df.groupby("u", sort=False)["v"].transform("min")
        l_arr = df["v"].to_numpy(dtype=object)
        m_arr = m.to_numpy(dtype=object)
        keep = l_arr != m_arr
        part1 = pd.DataFrame({"u": l_arr[keep], "v": m_arr[keep]})
        part2 = pd.DataFrame({"u": df["u"].to_numpy(dtype=object),
                              "v": m_arr}).drop_duplicates()
        out = pd.concat([part1, part2], ignore_index=True)
        out = out[out["u"] != out["v"]]
        return out.drop_duplicates()

    return bucketed_map_groups(oriented, ["u"], fn, num_buckets)


def _edge_stats(edges_ds) -> tuple[int, int]:
    """(count, order-independent checksum) in one pass."""

    def partial(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_pandas().to_numpy(dtype=object)
        v = batch.column("v").to_pandas().to_numpy(dtype=object)
        if len(u) == 0:
            return pa.table({"n": pa.array([0], pa.int64()),
                             "c": pa.array([0], pa.int64())})
        h = (stable_hash_strings(np.char.add(
            np.char.add(u.astype(str), "\x00"), v.astype(str)).astype(object))
            % np.uint64(1 << 32))
        return pa.table({"n": pa.array([len(u)], pa.int64()),
                         "c": pa.array([int(h.sum())], pa.int64())})

    parts = edges_ds.map_batches(partial, batch_format="pyarrow").take_all()
    return (sum(p["n"] for p in parts), sum(p["c"] for p in parts))


def _uf_star_task(*blocks) -> pa.Table:
    """Remote body: union-find over a small edge set -> star edges.

    Runs as ONE Ray task rather than on the driver: the loop is
    inherently sequential either way, but the driver process shares
    its GIL with Ray's client threads (heartbeats, object-store
    callbacks) — measured 6x slower there (2.2 s vs 0.37 s for 193k
    edges) under load.  A worker process runs it at full speed and the
    block refs resolve zero-copy on the same node.
    """
    blocks = [b.select(["u", "v"]) for b in blocks if b.num_rows]
    empty = pa.table({"u": pa.array([], pa.string()),
                      "v": pa.array([], pa.string())})
    if not blocks:
        return empty
    tbl = pa.concat_tables(blocks, promote_options="default").combine_chunks()
    n_edges = tbl.num_rows
    if n_edges == 0:
        return empty
    # integer-coded union-find: dictionary-encode urls once in Arrow
    # (C++ hash factorize, ~2x pandas factorize on object strings and
    # no object-array materialization), run UF on int arrays
    both = pa.chunked_array([tbl.column("u").combine_chunks(),
                             tbl.column("v").combine_chunks()])
    d = pc.dictionary_encode(both).combine_chunks()
    codes = d.indices.to_numpy()
    uniq_arr = d.dictionary
    n = len(uniq_arr)
    cu, cv = codes[:n_edges], codes[n_edges:]
    # plain Python list: scalar indexing on a list is ~4x faster than
    # on a numpy array inside this (inherently sequential) loop
    parent = list(range(n))

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(cu.tolist(), cv.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    roots = np.array([find(i) for i in range(n)], dtype=np.int64)
    # deterministic label = lexicographic MIN url per component,
    # recovered without a string groupby: rank urls once (Arrow string
    # sort), take the min RANK per root (integer scatter-min), map
    # back.  Group-count-independent and ~4x the pandas groupby-min.
    order = pc.sort_indices(uniq_arr).to_numpy().astype(np.int64)
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n)
    min_rank = np.full(n, n, dtype=np.int64)
    np.minimum.at(min_rank, roots, rank)
    label_idx = order[min_rank[roots]]
    # uniques are distinct, so label_idx != i  <=>  label url != node url
    nonself = np.flatnonzero(label_idx != np.arange(n))
    return pa.table({
        "u": uniq_arr.take(pa.array(nonself)),
        "v": uniq_arr.take(pa.array(label_idx[nonself])),
    })


def _driver_finish(edges_ds, metrics_out: dict | None = None):
    """Finish a small edge set with union-find in ONE remote task,
    returning star edges (node -> component min) as a Dataset."""
    import time as _time

    import ray
    import ray.data as rd

    t0 = _time.time()
    refs = list(edges_ds.materialize().to_arrow_refs())
    star_tbl = ray.get(ray.remote(_uf_star_task).remote(*refs))
    if metrics_out is not None:
        metrics_out["uf_task_sec"] = round(_time.time() - t0, 3)
    return rd.from_arrow(star_tbl)


def connected_components(edges_ds, cfg: ClusterConfig = ClusterConfig(),
                         metrics_out: dict | None = None,
                         ckpt=None, fp_base: str | None = None):
    """Edges (u, v: string) -> star edges (u=node, v=component min url).

    Input may be in any orientation; self-loops are dropped.  Returns a
    materialized Dataset of final star edges.

    Hybrid execution (the standard distributed-CC design): star
    contraction rounds run only while the edge set exceeds
    ``cfg.driver_finish_edges``; once it fits comfortably on the
    driver the remaining closure is a single union-find pass there.
    Both paths produce identical star edges (pinned by tests), and
    each contraction round shrinks edges toward (#nodes - #components)
    so multi-billion-edge inputs still converge distributed.

    Checkpointed resume (round-4): pass a
    :class:`..state.manifest.CheckpointManager` (with a root) plus
    ``fp_base`` and EVERY contraction round becomes a resumable stage
    (``cc_round_<i>`` Parquet + manifest, fingerprint chained off the
    previous round) and the union-find finish a final ``cc_star``
    stage — a crash mid-closure resumes at the first incomplete round
    instead of restarting the whole fixpoint.  Convergence stats are
    recomputed from the resumed Parquet (one narrow pass), so resumed
    and fresh runs take identical branch decisions.

    ``metrics_out`` (optional dict) receives sub-stage walls: the
    edge-materialize wall (which, when the upstream scored dataset
    streams, includes the whole hydrate+score execution), round count,
    and the driver-finish wall.
    """
    import time as _time

    t0 = _time.time()
    checkpointing = ckpt is not None and getattr(ckpt, "root", None)
    edges = edges_ds.select_columns(["u", "v"]).materialize()
    if metrics_out is not None:
        metrics_out["edges_materialize_sec"] = round(_time.time() - t0, 3)
        metrics_out["input_edges"] = edges.count()
    from ..state.manifest import fingerprint as _fp

    fp_prev = _fp(fp_base or "cc", _fp(cfg))
    prev = (-1, -1)
    for round_no in range(cfg.max_rounds):
        if edges.count() <= cfg.driver_finish_edges:
            t1 = _time.time()
            if checkpointing:
                out = ckpt.run_stage(
                    "cc_star", _fp(fp_prev, "star"),
                    lambda: _driver_finish(edges,
                                           metrics_out=metrics_out))
            else:
                out = _driver_finish(edges,
                                     metrics_out=metrics_out).materialize()
            if metrics_out is not None:
                metrics_out["rounds"] = round_no
                metrics_out["driver_finish_sec"] = round(_time.time() - t1, 3)
            return out
        fp_round = _fp(fp_prev, "round", round_no)
        if checkpointing:
            # one resumable stage per round: large-star + small-star
            # fused into the stage body; a matching manifest skips both
            edges = ckpt.run_stage(
                f"cc_round_{round_no}", fp_round,
                lambda e=edges: _small_star(
                    _large_star(e, cfg.num_buckets), cfg.num_buckets))
        else:
            edges = _large_star(edges, cfg.num_buckets).materialize()
            edges = _small_star(edges, cfg.num_buckets).materialize()
        fp_prev = fp_round
        stats = _edge_stats(edges)
        logger.info("cc round %d: %d edges (checksum %d)",
                    round_no, stats[0], stats[1])
        if stats == prev:
            if metrics_out is not None:
                metrics_out["rounds"] = round_no + 1
            return edges
        prev = stats
    logger.warning("connected_components: no fixpoint after %d rounds",
                   cfg.max_rounds)
    if metrics_out is not None:
        metrics_out["rounds"] = cfg.max_rounds
    return edges


def _star_lookup_task(*blocks):
    """Remote body: concat star-edge blocks, sort by node-url hash,
    return (sorted hash array, row-aligned table) for broadcast."""
    tbl = pa.concat_tables([b for b in blocks]).combine_chunks()
    uh = stable_hash_strings(
        tbl.column("u").to_pandas().to_numpy(dtype=object))
    order = np.argsort(uh, kind="mergesort")
    return (np.ascontiguousarray(uh[order]),
            tbl.take(pa.array(order)).combine_chunks())


def assign_clusters(urls_ds, star_edges_ds, num_buckets: int = 256,
                    broadcast_threshold: int = 2_000_000):
    """All urls + star edges -> (url, cluster_id) with singleton=self.

    Star edges already map each non-root node to its component min, so
    when that map is small it is broadcast once (``ray.put``) and
    applied in a shuffle-free ``map_batches`` over the url stream.
    Past ``broadcast_threshold`` edges it falls back to
    ``groupby(url).min(label)`` over the union of self-labels and star
    labels; deterministic (min) rather than order-dependent FIRST
    (reference A2 divergence, documented in SURVEY §2.5).  Both paths
    produce identical assignments (pinned by tests).
    """
    import ray
    from ray.data.aggregate import Min

    star_edges_ds = star_edges_ds.materialize()
    if star_edges_ds.count() <= broadcast_threshold:
        # broadcast as (sorted uint64 hash, row-aligned Arrow table):
        # both deserialize zero-copy on every ray.get, unlike a Python
        # dict whose unpickle cost is paid per TASK (measured ~3s of
        # aggregate dict-decode on a 700-block url stream); lookup is a
        # vectorized searchsorted + equality verify.  The build (concat
        # + hash + sort) runs as one remote task, not on the driver —
        # same rationale as _uf_star_task.
        h_ref, t_ref = ray.remote(num_returns=2)(_star_lookup_task).remote(
            *star_edges_ds.to_arrow_refs())

        def apply_map(batch: pa.Table, _h=h_ref, _t=t_ref) -> pa.Table:
            h = ray.get(_h)
            star = ray.get(_t)
            urls_arr = batch.column("url").combine_chunks().cast(pa.string())
            urls = urls_arr.to_pandas().to_numpy(dtype=object)
            cluster = urls.copy()  # default: singleton = self
            if len(h) and len(urls):
                qh = stable_hash_strings(urls)
                idx = np.clip(np.searchsorted(h, qh), 0, len(h) - 1)
                cand = idx[h[idx] == qh]
                pos = np.flatnonzero(h[idx] == qh)
                if pos.size:
                    u_match = star.column("u").take(pa.array(cand)) \
                        .to_pandas().to_numpy(dtype=object)
                    ok = u_match == urls[pos]
                    v_match = star.column("v").take(pa.array(cand[ok])) \
                        .to_pandas().to_numpy(dtype=object)
                    cluster[pos[ok]] = v_match
            return pa.table({
                "url": urls_arr,
                "cluster_id": pa.array(cluster, pa.string()),
            })

        return urls_ds.select_columns(["url"]).map_batches(
            apply_map, batch_format="pyarrow")

    def self_label(batch: pa.Table) -> pa.Table:
        return pa.table({"url": batch.column("url"),
                         "label": batch.column("url")})

    selfs = urls_ds.select_columns(["url"]).map_batches(
        self_label, batch_format="pyarrow")

    def edge_label(batch: pa.Table) -> pa.Table:
        return pa.table({"url": batch.column("u"),
                         "label": batch.column("v")})

    labels = selfs.union(
        star_edges_ds.map_batches(edge_label, batch_format="pyarrow"))
    out = labels.groupby("url").aggregate(Min("label", alias_name="cluster_id"))
    return out


def union_find_oracle(edges: list[tuple[str, str]],
                      nodes: list[str]) -> dict[str, str]:
    """Driver-side union-find — the test oracle for the distributed
    algorithm (never used in pipelines)."""
    parent: dict[str, str] = {n: n for n in nodes}

    def find(x: str) -> str:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        for n in (a, b):
            parent.setdefault(n, n)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {n: find(n) for n in parent}
