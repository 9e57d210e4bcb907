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


def global_scan(ds, order_cols: list[str], value_col: str, out_col: str):
    """Append ``out_col`` = running sum of ``value_col`` in global
    ``order_cols`` order.  Rows with equal keys form deterministic
    prefix *sets*: any permutation of identical rows yields the same
    multiset of running values, so order-insensitive consumers
    (aggregates, the driver's value-hash) see a deterministic result.
    """
    import ray
    import ray.data as rd

    mat = ds.sort(order_cols).materialize()
    refs = mat.to_arrow_refs()

    @ray.remote
    def block_sum(tbl: pa.Table):
        import pyarrow.compute as pc

        s = pc.sum(tbl[value_col]).as_py()
        return 0 if s is None else s

    sums = np.array(ray.get([block_sum.remote(r) for r in refs]))
    offsets = np.concatenate([[sums.dtype.type(0)], np.cumsum(sums)[:-1]])

    @ray.remote
    def with_prefix(tbl: pa.Table, off):
        v = tbl[value_col].to_numpy(zero_copy_only=False)
        return tbl.append_column(out_col, pa.array(off + np.cumsum(v)))

    out_refs = [with_prefix.remote(r, o) for r, o in zip(refs, offsets)]
    return rd.from_arrow_refs(out_refs)
