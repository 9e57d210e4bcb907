"""Keyless global ordered prefix scan (Blelloch two-phase scan).

``cumulative_agg`` (stages/temporal.py) covers PARTITION BY windows —
the per-key accumulation rides the bucketed shuffle.  A *keyless*
``SUM(x) OVER (ORDER BY ...)`` has no partitioning key to shuffle on;
the classic distributed plan is the two-phase scan:

1. range-sort the dataset on the order columns (Ray's distributed
   sort; blocks come back globally ordered),
2. reduce each block to its value-sum (one scalar per block to the
   driver — driver state is O(blocks), never O(rows)),
3. exclusive-scan the block sums driver-side and re-map each block
   with its offset, computing the within-block cumsum vectorized.

Reference shape: SURVEY §2.4 O1/O2 (external sort + ordered output)
composed with the A4 combiner discipline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def global_scan(ds, order_cols: list[str], value_col: str, out_col: str,
                lead_of: str | None = None, lead_col: str | None = None):
    """Append ``out_col`` = running sum of ``value_col`` in global
    ``order_cols`` order.  Rows with equal keys form deterministic
    prefix *sets*: any permutation of identical rows yields the same
    multiset of running values, so order-insensitive consumers
    (aggregates, the driver's value-hash) see a deterministic result.

    ``lead_of``/``lead_col``: also append the NEXT row's ``lead_of``
    value in the same global order (SQL ``lead(x) OVER (ORDER BY
    ...)``) — the cross-block handoff ships exactly one scalar per
    block boundary (each block's head value, gathered in the same
    O(blocks) driver pass as the sums); the global last row gets null.
    """
    import ray
    import ray.data as rd

    mat = ds.sort(order_cols).materialize()
    refs = mat.to_arrow_refs()

    @ray.remote
    def block_meta(tbl: pa.Table):
        import pyarrow.compute as pc

        s = pc.sum(tbl[value_col]).as_py()
        head = None
        if lead_of is not None and tbl.num_rows:
            head = tbl[lead_of][0]
        return (0 if s is None else s, tbl.num_rows, head)

    metas = ray.get([block_meta.remote(r) for r in refs])
    sums = np.array([m[0] for m in metas])
    offsets = np.concatenate([[sums.dtype.type(0)], np.cumsum(sums)[:-1]])
    # head of the NEXT non-empty block, per block (None past the end)
    next_heads = [None] * len(metas)
    if lead_of is not None:
        upcoming = None
        for i in range(len(metas) - 1, -1, -1):
            next_heads[i] = upcoming
            if metas[i][1]:
                upcoming = metas[i][2]

    @ray.remote
    def with_prefix(tbl: pa.Table, off, nxt):
        v = tbl[value_col].to_numpy(zero_copy_only=False)
        tbl = tbl.append_column(out_col, pa.array(off + np.cumsum(v)))
        if lead_of is not None:
            col = tbl[lead_of]
            name = lead_col or f"{lead_of}_next"
            if tbl.num_rows == 0:     # range sort can emit empty blocks
                tbl = tbl.append_column(name, pa.array([], type=col.type))
            else:
                shifted = col.slice(1)
                tail = pa.array([nxt.as_py() if nxt is not None else None],
                                type=col.type)
                tbl = tbl.append_column(
                    name,
                    pa.concat_arrays([shifted.combine_chunks(), tail]))
        return tbl

    out_refs = [with_prefix.remote(r, o, h)
                for r, o, h in zip(refs, offsets, next_heads)]
    return rd.from_arrow_refs(out_refs)


def global_rolling_mean(ds, order_cols: list[str], value_col: str,
                        window: int, out_col: str):
    """Keyless trailing-window mean in global ``order_cols`` order
    (SQL ``avg(x) OVER (ORDER BY ... ROWS window-1 PRECEDING)``) — the
    third keyless-window primitive next to the scan and the lead.

    The cross-block dependency is a HALO EXCHANGE: each block needs
    the (window-1) rows that precede it.  One metadata pass gathers
    every block's value tail (<= window-1 scalars per block, O(blocks
    x window) driver state, never rows); each block's halo is stitched
    from as many preceding tails as needed (short blocks may
    contribute fewer than window-1 rows), then the rolling mean runs
    vectorized over [halo + block] and the halo rows are dropped."""
    import ray
    import ray.data as rd

    mat = ds.sort(order_cols).materialize()
    refs = mat.to_arrow_refs()
    h = window - 1

    @ray.remote
    def tail(tbl: pa.Table):
        v = tbl[value_col].to_numpy(zero_copy_only=False)
        return v[-h:] if h else v[:0]

    tails = ray.get([tail.remote(r) for r in refs])

    halos = []
    for i in range(len(refs)):
        parts, need = [], h
        j = i - 1
        while need > 0 and j >= 0:
            t = tails[j]
            take = t[-need:]
            parts.append(take)
            need -= len(take)
            j -= 1
        halos.append(np.concatenate(parts[::-1]) if parts
                     else np.array([], dtype=np.float64))

    @ray.remote
    def roll(tbl: pa.Table, halo):
        import pandas as pd

        v = tbl[value_col].to_numpy(zero_copy_only=False)
        s = pd.Series(np.concatenate([halo, v.astype(np.float64)]))
        m = s.rolling(window, min_periods=1).mean() \
            .to_numpy()[len(halo):]
        return tbl.append_column(out_col, pa.array(m))

    out_refs = [roll.remote(r, hl) for r, hl in zip(refs, halos)]
    return rd.from_arrow_refs(out_refs)


def global_running_max(ds, order_cols: list[str], value_col: str,
                       out_col: str):
    """Keyless running MAX in global ``order_cols`` order (SQL
    ``max(x) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)``) — the
    same two-phase scan as :func:`global_scan` with (max, -inf) as the
    monoid instead of (+, 0): per-block maxes to the driver
    (O(blocks)), exclusive prefix-max over them, per-block cummax
    seeded with the offset.  The watermark primitive for streaming
    late-event accounting."""
    import ray
    import ray.data as rd

    mat = ds.sort(order_cols).materialize()
    refs = mat.to_arrow_refs()

    @ray.remote
    def block_max(tbl: pa.Table):
        import pyarrow.compute as pc

        m = pc.max(tbl[value_col]).as_py()
        return -np.inf if m is None else float(m)

    maxes = np.array(ray.get([block_max.remote(r) for r in refs]))
    offsets = np.concatenate([[-np.inf],
                              np.maximum.accumulate(maxes)[:-1]])

    @ray.remote
    def with_prefix(tbl: pa.Table, off):
        v = tbl[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        run = np.maximum.accumulate(np.maximum(v, off)) \
            if len(v) else v
        return tbl.append_column(out_col, pa.array(run))

    out_refs = [with_prefix.remote(r, o) for r, o in zip(refs, offsets)]
    return rd.from_arrow_refs(out_refs)


def strict_inversions(values: "np.ndarray") -> int:
    """Number of index pairs i < j with ``values[i] > values[j]``
    (STRICT — ties are not inversions), counted by a bottom-up merge
    in O(n log^2 n) NUMPY ops with no per-element Python loop: the
    array is rank-compressed, padded to a power of two with a
    max-rank sentinel (sentinels live in the tail, so they never sit
    left of a real element at any merge level), and each level
    processes ALL segment pairs at once — keys ``rank*2 + is_right``
    make a row-wise ``np.sort`` of the merged halves place left-half
    elements before right-half elements on rank ties, so for every
    right element the count of STRICTLY greater left elements is
    ``w - (left elements seen so far)``, a cumsum.

    This is the distributed Kendall-tau workhorse: each co-located
    group pays one call, and the call is pure vectorized kernel work.
    """
    n = len(values)
    if n < 2:
        return 0
    # rank-compress to int64 (float/timestamp safe, ties preserved)
    ranks = np.unique(values, return_inverse=True)[1].astype(np.int64)
    p = 1 << int(np.ceil(np.log2(n)))
    sentinel = ranks.max() + 1
    arr = np.full(p, sentinel, dtype=np.int64)
    arr[:n] = ranks
    total = 0
    width = 1
    while width < p:
        m = p // (2 * width)
        a = arr.reshape(m, 2 * width)
        # keys: rank*2 + flag; flag 0 = left half, 1 = right half
        flags = np.zeros((m, 2 * width), dtype=np.int64)
        flags[:, width:] = 1
        keys = a * 2 + flags
        keys.sort(axis=1)
        fl = keys & 1                       # 1 where right-half element
        cum_left = np.cumsum(1 - fl, axis=1)
        # right element at merged pos: strictly-greater lefts = width - cum_left
        total += int(((width - cum_left) * fl).sum())
        arr = (keys >> 1).ravel()
        width *= 2
    return total


def global_rolling_stats(ds, order_cols: list[str], value_col: str,
                         window: int, prefix: str = "w"):
    """Keyless trailing-window count/sum/sum-of-squares in one halo
    pass (the global_rolling_mean machinery generalized): appends
    ``{prefix}_n``, ``{prefix}_sum``, ``{prefix}_sum2`` so callers can
    close any moment-derived window statistic (rolling z-score,
    rolling CV) from a single exchange."""
    import ray
    import ray.data as rd

    mat = ds.sort(order_cols).materialize()
    refs = mat.to_arrow_refs()
    h = window - 1

    @ray.remote
    def tail(tbl: pa.Table):
        v = tbl[value_col].to_numpy(zero_copy_only=False)
        return v[-h:] if h else v[:0]

    tails = ray.get([tail.remote(r) for r in refs])
    halos = []
    for i in range(len(refs)):
        parts, need = [], h
        j = i - 1
        while need > 0 and j >= 0:
            t = tails[j]
            take = t[-need:]
            parts.append(take)
            need -= len(take)
            j -= 1
        halos.append(np.concatenate(parts[::-1]) if parts
                     else np.array([], dtype=np.float64))

    @ray.remote
    def roll(tbl: pa.Table, halo):
        import pandas as pd

        v = tbl[value_col].to_numpy(zero_copy_only=False)
        s = pd.Series(np.concatenate([halo, v.astype(np.float64)]))
        n = s.rolling(window, min_periods=1).count() \
            .to_numpy()[len(halo):]
        sx = s.rolling(window, min_periods=1).sum() \
            .to_numpy()[len(halo):]
        sx2 = (s * s).rolling(window, min_periods=1).sum() \
            .to_numpy()[len(halo):]
        tbl = tbl.append_column(f"{prefix}_n",
                                pa.array(n.astype(np.int64)))
        tbl = tbl.append_column(f"{prefix}_sum", pa.array(sx))
        return tbl.append_column(f"{prefix}_sum2", pa.array(sx2))

    out_refs = [roll.remote(r, hl) for r, hl in zip(refs, halos)]
    return rd.from_arrow_refs(out_refs)
