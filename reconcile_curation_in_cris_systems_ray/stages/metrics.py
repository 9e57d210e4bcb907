"""Clustering-evaluation metrics: pairwise precision/recall/F1 between
two labelings, computed from contingency counts — never from enumerated
pairs.

The north rule grades the flagship on pairwise F1; at test scale that
is computed by enumerating pairs driver-side (tests), but at 10^12
rows the pair sets are quadratic and must never exist.  The classic
identity makes the metric a pure counting problem:

    pred_pairs = Σ_i C(a_i, 2)   (a_i = size of predicted cluster i)
    true_pairs = Σ_j C(b_j, 2)
    tp_pairs   = Σ_ij C(n_ij, 2) (n_ij = contingency cell)

so the whole evaluation is: per-batch (pred, true) count partials →
one co-location shuffle to exact contingency cells → bounded
re-groupings of the CELLS (never the rows) for the margins → scalar
sums.  Three shuffles over O(#clusters) rows, zero pair
materialization.

int64 bound: C(n, 2) overflows past n ≈ 4.3e9 rows in ONE cluster;
beyond that switch the pair-count dtype to float64 (documented cap,
not enforced — a 4-billion-row cluster upstream is already a bug).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .shuffle import bucketed_map_groups


def _c2(n: np.ndarray) -> np.ndarray:
    n = n.astype(np.int64)
    return n * (n - 1) // 2


def _contingency_cells(ds, pred_col: str, true_col: str):
    """Exact (pred, truth, n) contingency cells: per-batch count
    partials + ONE co-location shuffle.  Bounded by cluster overlap,
    never row count — shared by pairwise and B-Cubed metrics."""

    def part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([pred_col, true_col], sort=False).size()
        out = g.reset_index()
        out.columns = ["pred", "truth", "n"]
        return out

    parts = ds.map_batches(part, batch_format="pandas")

    def cell_sum(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["pred", "truth"], sort=False, as_index=False)["n"].sum()
        return g

    return bucketed_map_groups(parts, ["pred", "truth"],
                               cell_sum).materialize()


def pairwise_cluster_metrics(ds, pred_col: str, true_col: str) -> pd.DataFrame:
    """One-row DataFrame: tp_pairs, pred_pairs, true_pairs, precision,
    recall, f1 (ratios rounded to 6, SQL-oracle discipline)."""
    cells = _contingency_cells(ds, pred_col, true_col)

    def tp_part(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"v": [_c2(df["n"].to_numpy()).sum()]})

    tp = int(cells.map_batches(tp_part, batch_format="pandas")
             .to_pandas()["v"].sum())

    def margin_pairs(key: str) -> int:
        def mpart(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby(key, sort=False, as_index=False)["n"].sum()
            return g

        margins = bucketed_map_groups(cells, [key], mpart)

        def psum(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"v": [_c2(df["n"].to_numpy()).sum()]})

        return int(margins.map_batches(psum, batch_format="pandas")
                   .to_pandas()["v"].sum())

    pred_pairs = margin_pairs("pred")
    true_pairs = margin_pairs("truth")

    precision = tp / pred_pairs if pred_pairs else 1.0
    recall = tp / true_pairs if true_pairs else 1.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return pd.DataFrame({
        "tp_pairs": [tp],
        "pred_pairs": [pred_pairs],
        "true_pairs": [true_pairs],
        "precision": [round(precision, 6)],
        "recall": [round(recall, 6)],
        "f1": [round(f1, 6)],
    })


def bcubed_metrics(ds, pred_col: str, true_col: str) -> pd.DataFrame:
    """B-Cubed precision/recall/F (Bagga & Baldwin 1998; the
    extrinsic clustering metric Amigó et al. 2009 show uniquely
    satisfies all four formal constraints — the standard ER
    complement to pairwise F1, insensitive to its quadratic
    large-cluster bias).  Same zero-pair-enumeration discipline via
    the item-weighted identity:

        P = (1/N) Σ_cells n_pt^2 / n_p      (n_p = pred-cluster size)
        R = (1/N) Σ_cells n_pt^2 / n_t      (n_t = true-cluster size)

    One contingency shuffle (shared :func:`_contingency_cells`), then
    a driver finish over the BOUNDED cell table.  Ratios rounded to 6
    (SQL-oracle discipline)."""
    cells = _contingency_cells(ds, pred_col, true_col).to_pandas()
    if len(cells) == 0:
        return pd.DataFrame({"bcubed_precision": [1.0],
                             "bcubed_recall": [1.0],
                             "bcubed_f1": [1.0]})
    n = cells["n"].to_numpy(np.float64)
    n_p = cells.groupby("pred")["n"].sum()
    n_t = cells.groupby("truth")["n"].sum()
    total = float(n.sum())
    sp = float((n * n / cells["pred"].map(n_p).to_numpy(np.float64)).sum())
    sr = float((n * n / cells["truth"].map(n_t).to_numpy(np.float64)).sum())
    prec = sp / total
    rec = sr / total
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return pd.DataFrame({"bcubed_precision": [round(prec, 6)],
                         "bcubed_recall": [round(rec, 6)],
                         "bcubed_f1": [round(f1, 6)]})


def blocking_quality(ds, block_col: str, label_col: str) -> pd.DataFrame:
    """Blocking-scheme evaluation (the standard ER triple): candidate
    pairs Σ C(n_block, 2), **reduction ratio** 1 - cand/C(N, 2),
    **pairs completeness** (recall: fraction of true-match pairs that
    share a block) and **pairs quality** (precision) — all from the
    same contingency-count identities as
    :func:`pairwise_cluster_metrics`, so 10^12 rows never enumerate a
    single pair.  Single-key blocking contract: one block per record
    (multi-key schemes need a distinct-pair correction this closed
    form deliberately excludes)."""
    # consumed twice (count + metrics pass) — materialize so the
    # upstream derivation runs once
    ds = ds.materialize()
    n = int(ds.count())
    if n == 0:
        return pd.DataFrame({
            "n_records": [0], "cand_pairs": [0], "true_pairs": [0],
            "tp_pairs": [0], "reduction_ratio": [1.0],
            "pairs_completeness": [1.0], "pairs_quality": [1.0]})
    m = pairwise_cluster_metrics(ds, block_col, label_col)
    total_pairs = n * (n - 1) // 2
    cand = int(m["pred_pairs"].iloc[0])
    rr = 1.0 - cand / total_pairs if total_pairs else 1.0
    return pd.DataFrame({
        "n_records": [n],
        "cand_pairs": [cand],
        "true_pairs": [int(m["true_pairs"].iloc[0])],
        "tp_pairs": [int(m["tp_pairs"].iloc[0])],
        "reduction_ratio": [round(rr, 6)],
        "pairs_completeness": [m["recall"].iloc[0]],
        "pairs_quality": [m["precision"].iloc[0]],
    })


def pava_isotonic(y: "np.ndarray", w: "np.ndarray") -> "np.ndarray":
    """Weighted non-decreasing isotonic fit via Pool-Adjacent-
    Violators (Ayer et al. 1955) — linear-time stack form.  Input is
    the per-cell mean vector in ascending key order with cell
    weights; output is the fitted value per cell.  Used driver-side
    on BOUNDED score-quantized cell frames (distinct rounded scores),
    the heavy lifting having been done by the distributed cell
    combiner."""
    import numpy as np

    vals: list[float] = []
    wts: list[float] = []
    cnt: list[int] = []
    for yi, wi in zip(np.asarray(y, np.float64), np.asarray(w, np.float64)):
        vals.append(float(yi))
        wts.append(float(wi))
        cnt.append(1)
        while len(vals) > 1 and vals[-2] > vals[-1]:
            tw = wts[-2] + wts[-1]
            nv = (vals[-2] * wts[-2] + vals[-1] * wts[-1]) / tw
            vals[-2:] = [nv]
            wts[-2:] = [tw]
            cnt[-2:] = [cnt[-2] + cnt[-1]]
    return np.repeat(np.array(vals, np.float64), np.array(cnt, np.int64))


def hungarian_min(cost) -> "np.ndarray":
    """O(n^3) Hungarian algorithm (Kuhn-Munkres, potentials/shortest
    augmenting path formulation) for the rectangular min-cost
    assignment with n rows <= m columns; returns the assigned column
    per row.  Driver-side on BOUNDED panels (the Gale-Shapley /
    greedy-match contract) — the expensive part, scoring the panel,
    happens distributed upstream."""
    import numpy as np

    c = np.asarray(cost, np.float64)
    n, m = c.shape
    assert n <= m
    INF = float("inf")
    u = [0.0] * (n + 1)
    v = [0.0] * (m + 1)
    p = [0] * (m + 1)
    way = [0] * (m + 1)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = [INF] * (m + 1)
        used = [False] * (m + 1)
        while True:
            used[j0] = True
            i0 = p[j0]
            delta = INF
            j1 = -1
            for j in range(1, m + 1):
                if not used[j]:
                    cur = c[i0 - 1][j - 1] - u[i0] - v[j]
                    if cur < minv[j]:
                        minv[j] = cur
                        way[j] = j0
                    if minv[j] < delta:
                        delta = minv[j]
                        j1 = j
            for j in range(m + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while True:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
            if j0 == 0:
                break
    ans = np.zeros(n, np.int64)
    for j in range(1, m + 1):
        if p[j]:
            ans[p[j] - 1] = j - 1
    return ans
