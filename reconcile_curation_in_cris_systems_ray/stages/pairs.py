"""Candidate-pair generation from banded LSH keys, with hot-key salting.

Reference analogue: candidate generation was an equi-join on the exact
blocking key (``repository.py:297-314``); here it is
``groupby(block_key) -> within-group pairing`` with explicit skew
control, per the north rule:

- **hot-key detection**: a narrow per-batch ``value_counts`` pre-pass
  (locally-unique keys dropped before the driver merge); keys whose
  group exceeds ``hot_key_cap`` are broadcast via ``ray.put``.
- **salting**: members of a hot key get ``salt = hash(url) % s`` and are
  replicated into the s "triangle" groups ``(min(salt,t), max(salt,t))``
  so every cross-salt pair is generated exactly once while the work is
  spread over s*(s+1)/2 independent groups (pair-set identical to the
  unsalted groupby — pinned by tests).
- **degenerate-clique guard**: a group side larger than ``max_side``
  (an identical-boilerplate band bucket) switches to star+chain pairing
  (connect to min member + sorted-adjacent window) — bounded O(m*w)
  instead of O(m^2); connectivity for true duplicate cliques is
  preserved.

Shuffle discipline: narrow band rows carry just ``(band_hash, uh)``
(16B — the band index is mixed into the hash, so no band_id column
travels); wide rows add ``band_id`` and ``bands``, the doc's full
band-hash vector (128B at defaults) — 4x narrower than the MinHash
signature, and sufficient for shuffle-free global pair dedup: each
pair is emitted only by the first band where the two vectors agree
(min-band emission), so no pair-key exchange is needed.  The MinHash
Jaccard estimate is attached later, during pair hydration, from the
broadcast feature table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from ..config import BlockingConfig, ScoringConfig
from .shuffle import bucketed_map_groups, bucketed_map_groups_tasks

_PAIR_COLS = ["uh_a", "uh_b"]
MAX_SIDE = 2000          # degenerate-clique guard
CHAIN_WINDOW = 3


DRIVER_MERGE_MAX_ROWS = 20_000_000


def find_hot_keys(band_ds, cfg: BlockingConfig,
                  n_rows_hint: int | None = None) -> dict[int, int]:
    """Narrow count pre-pass; returns {band_hash: count}.

    Keys on ``band_hash`` ALONE: the band index is already mixed into
    the hash (``MinHasher.band_keys``), so one int64 identifies the
    (band, content) group — halving the count rows' width and the
    broadcast dict's size vs the former (band_id, band_hash) tuples.

    Two physical plans for the same counts:

    - small inputs (< ``DRIVER_MERGE_MAX_ROWS`` band rows): per-batch
      partial ``value_counts`` merged on the driver — one narrow map,
      NO shuffle (the combiner pattern; hot-key detection was the only
      consumer of the full groupby).  Keys that never repeat within any
      single batch are dropped BEFORE the driver merge: almost all band
      keys are unique, so this shrinks the merged frame by ~100x.  A
      key can only be missed this way if its members are spread one-
      per-batch, bounding its size by the batch count — far below any
      cap where salting matters, and the degenerate-clique guard in the
      pair stage bounds residual skew regardless.  Hot-key detection is
      a load-balancing heuristic; the emitted pair set is identical
      either way (pinned by tests).
    - large inputs: distributed ``groupby().count()`` (all-to-all on
      two int columns), since the distinct-key set itself may not fit
      the driver at web scale.
    """
    narrow = band_ds.select_columns(["band_hash"])
    if n_rows_hint is None or n_rows_hint <= DRIVER_MERGE_MAX_ROWS:
        def partial(df: pd.DataFrame) -> pd.DataFrame:
            c = df["band_hash"].value_counts(sort=False)
            c = c[c > 1]
            return pd.DataFrame({"band_hash": c.index.to_numpy(),
                                 "n": c.to_numpy()})

        parts = narrow.map_batches(partial, batch_format="pandas").to_pandas()
        if parts.empty:
            return {}
        totals = parts.groupby("band_hash", sort=False)["n"].sum()
        hot = totals[totals > cfg.hot_key_cap]
        return {int(k): int(v) for k, v in hot.items()}

    counts = narrow.groupby("band_hash").count()

    def only_hot(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["count()"] > cfg.hot_key_cap]

    hot = counts.map_batches(only_hot, batch_format="pandas").take_all()
    return {int(r["band_hash"]): int(r["count()"]) for r in hot}


def expand_salts(band_ds, hot_keys: dict[int, int],
                 cfg: BlockingConfig):
    """Assign salts and replicate hot-key members into triangle groups."""
    hot_ref = ray.put(hot_keys)
    cap, max_salts = cfg.hot_key_cap, cfg.max_salts

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        hot = ray.get(hot_ref)
        if not hot:
            out = df.copy()
            out["salt_i"] = np.int32(0)
            out["salt_j"] = np.int32(0)
            out["member_salt"] = np.int32(0)
            return out
        counts = (df["band_hash"].map(hot).fillna(0)
                  .to_numpy(dtype=np.int64))
        is_hot = counts > 0
        cold = df[~is_hot].copy()
        cold["salt_i"] = np.int32(0)
        cold["salt_j"] = np.int32(0)
        cold["member_salt"] = np.int32(0)
        if not is_hot.any():
            return cold
        hot_df = df[is_hot]
        s = np.minimum(np.maximum((counts[is_hot] + cap - 1) // cap, 2),
                       max_salts)
        member_salt = (hot_df["uh"].to_numpy().astype(np.uint64)
                       % s.astype(np.uint64)).astype(np.int64)
        # replicate each hot row s times; "other" salt enumerates 0..s-1
        rep = np.repeat(np.arange(len(hot_df)), s)
        csum = np.cumsum(s) - s
        other = np.arange(int(s.sum())) - np.repeat(csum, s)
        mine = member_salt[rep]
        out_hot = hot_df.iloc[rep].copy()
        out_hot["salt_i"] = np.minimum(mine, other).astype(np.int32)
        out_hot["salt_j"] = np.maximum(mine, other).astype(np.int32)
        out_hot["member_salt"] = mine.astype(np.int32)
        return pd.concat([cold, out_hot], ignore_index=True)

    return band_ds.map_batches(expand, batch_format="pandas")


def _decode_bands(col: pd.Series) -> np.ndarray:
    """binary bands column (num_bands int64 LE per row) -> (n, num_bands)."""
    return np.frombuffer(b"".join(col.tolist()),
                         dtype=np.int64).reshape(len(col), -1)


def _emit(urls_i: np.ndarray, urls_j: np.ndarray,
          bands_i, bands_j, band_id,
          out_a: list, out_b: list) -> None:
    """Min-band dedup + canonicalize (a < b) + drop self-pairs.

    Min-band (when band vectors travel with the rows): both docs' full
    band-hash vectors are at hand, so each pair is emitted only by the
    FIRST band where the vectors agree — every other band that would
    also collide sees argmax != band_id and stays silent.  Globally-
    unique pairs with no pair-key exchange.  Without band vectors
    (narrow emit), duplicates across bands are kept and removed by the
    pair-key dedup exchange instead."""
    if bands_i is None:
        keep = urls_i != urls_j
    else:
        eq = bands_i == bands_j
        keep = (eq.argmax(axis=1) == band_id) & (urls_i != urls_j)
    a, b = urls_i[keep], urls_j[keep]
    swap = a > b
    out_a.append(np.where(swap, b, a))
    out_b.append(np.where(swap, a, b))


def _pairs_within(urls: np.ndarray, bands, band_id: int,
                  out_a: list, out_b: list) -> None:
    m = len(urls)
    if m < 2:
        return
    if m > MAX_SIDE:  # degenerate clique: star + chain
        order = np.argsort(urls)
        urls = urls[order]
        bands = bands[order] if bands is not None else None
        ii: list[int] = []
        jj: list[int] = []
        for w in range(1, CHAIN_WINDOW + 1):
            ii.extend(range(m - w))
            jj.extend(range(w, m))
        ii.extend([0] * (m - CHAIN_WINDOW - 1))
        jj.extend(range(CHAIN_WINDOW + 1, m))
        i_idx, j_idx = np.array(ii), np.array(jj)
    else:
        i_idx, j_idx = np.triu_indices(m, k=1)
    _emit(urls[i_idx], urls[j_idx],
          bands[i_idx] if bands is not None else None,
          bands[j_idx] if bands is not None else None,
          band_id, out_a, out_b)


def _pairs_cross(urls_a: np.ndarray, bands_a,
                 urls_b: np.ndarray, bands_b, band_id: int,
                 out_a: list, out_b: list) -> None:
    if len(urls_a) == 0 or len(urls_b) == 0:
        return
    if len(urls_a) > MAX_SIDE or len(urls_b) > MAX_SIDE:
        # degenerate: pair each A member with first CHAIN_WINDOW B members
        k = min(len(urls_b), CHAIN_WINDOW)
        order_b = np.argsort(urls_b)[:k]
        i_idx = np.repeat(np.arange(len(urls_a)), k)
        j_idx = np.tile(order_b, len(urls_a))
    else:
        i_idx = np.repeat(np.arange(len(urls_a)), len(urls_b))
        j_idx = np.tile(np.arange(len(urls_b)), len(urls_a))
    _emit(urls_a[i_idx], urls_b[j_idx],
          bands_a[i_idx] if bands_a is not None else None,
          bands_b[j_idx] if bands_b is not None else None,
          band_id, out_a, out_b)


def _dedup_pair_arrays(a: np.ndarray, b: np.ndarray):
    """Distinct (a, b) pairs via lexsort + adjacent-unique — the
    numpy-native replacement for pandas drop_duplicates on the pair
    exchange (no object/index machinery; output sorted by (a, b),
    which downstream consumers don't depend on)."""
    if a.size == 0:
        return a, b
    order = np.lexsort((b, a))
    a2, b2 = a[order], b[order]
    keep = np.empty(a2.size, dtype=bool)
    keep[0] = True
    keep[1:] = (a2[1:] != a2[:-1]) | (b2[1:] != b2[:-1])
    return a2[keep], b2[keep]


def generate_candidate_pairs(band_ds, blocking: BlockingConfig,
                             scoring: ScoringConfig | None = None,
                             n_rows_hint: int | None = None,
                             dedup_pairs: bool = False,
                             num_blocks_hint: int | None = None):
    """Salted groupby-pairing: band rows -> globally-unique candidate
    pairs ``(url_a, url_b)`` with ``url_a < url_b``.

    Returns ``(uh_a, uh_b)`` uint64 url-hash pairs, ``uh_a < uh_b``;
    pair hydration maps hashes back to urls and features.  Pairs are
    already unique thanks to min-band emission (see :func:`_emit`);
    ``dedup_pairs=True`` adds a belt-and-braces pair-key exchange (an
    extra all-to-all — only for callers that must be robust to
    band-hash collisions)."""
    if n_rows_hint is not None and n_rows_hint <= DRIVER_MERGE_MAX_ROWS:
        # small inputs: materialize the band explode once so the
        # hot-key scan and the pairing shuffle don't each recompute it;
        # at web scale (hint above the cap) recomputing the narrow
        # explode is cheaper than persisting an exploded copy.
        # Materialize ALREADY coalesced to the bucket count: the
        # hot-key scan then runs over a few fat blocks (vs one tiny
        # task per upstream block — measured 2.9s -> 0.9s at 6.4M band
        # rows) and the pairing shuffle skips its own pre-coalesce
        # exchange (num_blocks_hint below).
        from .shuffle import effective_buckets

        nb = effective_buckets(blocking.num_buckets)
        band_ds = band_ds.repartition(nb).materialize()
        num_blocks_hint = nb
    hot = find_hot_keys(band_ds, blocking, n_rows_hint)
    # grouping key is band_hash ALONE (band_id is mixed into the hash;
    # narrow rows don't even carry a band_id column — 20% fewer bytes
    # through the pipeline's hottest exchange)
    if hot:
        salted = expand_salts(band_ds, hot, blocking)
        group_cols = ["band_hash", "salt_i", "salt_j"]
    else:
        # no hot keys (the common case on non-skewed corpora): skip the
        # salting map entirely — one fewer full pass/copy over the band
        # rows; bucket_pairs treats absent salt columns as all-zero
        salted = band_ds
        group_cols = ["band_hash"]

    def bucket_pairs(data):
        """Vectorized across groups: a bucket holds ~1e5 tiny band
        groups, so a per-group Python loop is the bottleneck, not the
        pair math.  Groups are boundary-detected on a lexsort, then all
        groups of equal size m generate their triangle pairs in ONE
        batched numpy expression.

        Dual-format (round-4): accepts a pandas DataFrame (sort-based
        groupby path) OR a pa.Table (task-shuffle path, Arrow
        end-to-end — numeric columns view zero-copy into numpy and the
        result goes back as an Arrow table, skipping both copies of
        the former to_pandas/from_pandas round-trip on the pipeline's
        hottest exchange)."""
        import pyarrow as pa

        is_tbl = isinstance(data, pa.Table)
        names = set(data.schema.names) if is_tbl else set(data.columns)
        n = data.num_rows if is_tbl else len(data)

        def npcol(name, dtype=None):
            if is_tbl:
                c = data.column(name)
                c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) \
                    else c
                v = c.to_numpy(zero_copy_only=False)
            else:
                v = data[name].to_numpy()
            if dtype is not None and v.dtype != dtype:
                # int64<->uint64 reinterpret is a view, not a copy
                v = v.view(dtype) \
                    if v.dtype.kind in "iu" and v.dtype.itemsize == 8 \
                    and np.dtype(dtype).itemsize == 8 else v.astype(dtype)
            return v

        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []

        has_bands = "bands" in names
        has_bid = "band_id" in names
        has_salt = "salt_i" in names
        cross_mask = (
            (npcol("salt_i") != npcol("salt_j"))
            if has_salt else np.zeros(n, dtype=bool))
        main_mask = None
        if cross_mask.any():
            # hot-key cross-salt groups: rare; pandas group iteration
            # over just the affected subset
            sub = (data.filter(pa.array(cross_mask)).to_pandas()
                   if is_tbl else data[cross_mask])
            for (_, si, _), g in sub.groupby(
                    ["band_hash", "salt_i", "salt_j"], sort=False):
                urls = g["uh"].to_numpy().astype(np.uint64)
                bands = _decode_bands(g["bands"]) if has_bands else None
                bid = int(g["band_id"].iloc[0]) if has_bid else 0
                ma = g["member_salt"].to_numpy() == si
                _pairs_cross(urls[ma],
                             bands[ma] if has_bands else None,
                             urls[~ma],
                             bands[~ma] if has_bands else None,
                             bid, out_a, out_b)
            main_mask = ~cross_mask

        def masked(v):
            return v if main_mask is None else v[main_mask]

        n_main = n if main_mask is None else int(main_mask.sum())
        if n_main >= 2:
            bh = masked(npcol("band_hash", np.int64))
            si = (masked(npcol("salt_i")).astype(np.int64)
                  if has_salt else np.zeros(n_main, dtype=np.int64))
            order = np.lexsort((si, bh))
            h2, s2 = bh[order], si[order]
            # band_id is constant within a band_hash group (the hash
            # mixes it in), so it never splits groups — only min-band
            # emission reads it, positionally
            b2 = (masked(npcol("band_id")).astype(np.int64)[order]
                  if has_bid else np.zeros(len(order), dtype=np.int64))
            new = np.empty(len(order), dtype=bool)
            new[0] = True
            new[1:] = (h2[1:] != h2[:-1]) | (s2[1:] != s2[:-1])
            counts = np.diff(np.append(np.flatnonzero(new), len(order)))
            starts = np.append(0, np.cumsum(counts))[:-1]
            urls_s = masked(npcol("uh", np.uint64))[order]
            if has_bands:
                bcol = (pd.Series(data.column("bands").to_pylist())
                        if is_tbl else data["bands"])
                if main_mask is not None:
                    bcol = bcol[main_mask].reset_index(drop=True) \
                        if not is_tbl else bcol[pd.Series(main_mask)] \
                        .reset_index(drop=True)
                bands_s = _decode_bands(bcol)[order]
            else:
                bands_s = None
            for m in np.unique(counts):
                if m < 2:
                    continue
                g_idx = np.flatnonzero(counts == m)
                if m > MAX_SIDE:
                    for g in g_idx:
                        s = starts[g]
                        _pairs_within(
                            urls_s[s:s + m],
                            bands_s[s:s + m] if has_bands else None,
                            int(b2[s]), out_a, out_b)
                    continue
                pairs_per_group = int(m) * (int(m) - 1) // 2
                tri_i, tri_j = np.triu_indices(int(m), k=1)
                step = max(1, 2_000_000 // pairs_per_group)
                for c0 in range(0, len(g_idx), step):
                    base = starts[g_idx[c0:c0 + step]]
                    gi = (base[:, None] + tri_i[None, :]).ravel()
                    gj = (base[:, None] + tri_j[None, :]).ravel()
                    if has_bands:
                        eq = bands_s[gi] == bands_s[gj]
                        keep = ((eq.argmax(axis=1) == b2[gi])
                                & (urls_s[gi] != urls_s[gj]))
                    else:
                        keep = urls_s[gi] != urls_s[gj]
                    a, b = urls_s[gi[keep]], urls_s[gj[keep]]
                    swap = a > b
                    out_a.append(np.where(swap, b, a))
                    out_b.append(np.where(swap, a, b))

        if not out_a:
            if is_tbl:
                return pa.table({c: pa.array([], pa.uint64())
                                 for c in _PAIR_COLS})
            return pd.DataFrame({c: pd.Series([], dtype="uint64")
                                 for c in _PAIR_COLS})
        a = np.concatenate(out_a).astype(np.uint64, copy=False)
        b = np.concatenate(out_b).astype(np.uint64, copy=False)
        # in-bucket dedup removes same-band/same-bucket repeats cheaply;
        # cross-band repeats are removed by the pair-key shuffle below
        a, b = _dedup_pair_arrays(a, b)
        if is_tbl:
            return pa.table({"uh_a": pa.array(a, pa.uint64()),
                             "uh_b": pa.array(b, pa.uint64())})
        return pd.DataFrame({"uh_a": a, "uh_b": b})

    _empty_pairs = pd.DataFrame({c: pd.Series([], dtype="uint64")
                                 for c in _PAIR_COLS})
    # exchange implementation: below the driver-merge cap the band rows
    # are already materialized into ~bucket-count blocks, and the
    # two-stage TASK shuffle (one split map + one merge reduce, Arrow
    # end-to-end) measured ~2x faster than Ray's sort-based groupby at
    # BOTH 4 and 16 CPUs (4.2 s vs 9.0 s / 1.8 s vs 3.6-5.0 s on 1.9M
    # band rows — the sort's sample + range-partition rounds don't
    # amortize on an int32 bucket domain).  Above the cap keep the
    # sort-based operator: it pipelines and spills, which an
    # all-refs-at-once task shuffle does not.
    use_tasks = (n_rows_hint is not None
                 and n_rows_hint <= DRIVER_MERGE_MAX_ROWS)
    exchange = (bucketed_map_groups_tasks if use_tasks
                else bucketed_map_groups)
    if use_tasks:
        # arrow_fn: bucket kernels consume/produce pa.Table directly
        pairs = exchange(salted, group_cols, bucket_pairs,
                         num_buckets=blocking.num_buckets,
                         empty_like=_empty_pairs, arrow_fn=True)
    else:
        pairs = bucketed_map_groups(
            salted, group_cols,
            bucket_pairs, num_buckets=blocking.num_buckets,
            num_blocks_hint=num_blocks_hint, empty_like=_empty_pairs)

    if not dedup_pairs:
        return pairs

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(_PAIR_COLS)

    def dedup_arrow(tbl) -> "pa.Table":
        import pyarrow as pa

        def u64(name):
            c = tbl.column(name)
            c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            v = c.to_numpy(zero_copy_only=False)
            return v.view(np.uint64) \
                if v.dtype.kind in "iu" and v.dtype.itemsize == 8 \
                else v.astype(np.uint64)

        a, b = _dedup_pair_arrays(u64("uh_a"), u64("uh_b"))
        return pa.table({"uh_a": pa.array(a, pa.uint64()),
                         "uh_b": pa.array(b, pa.uint64())})

    # global dedup of cross-band duplicates: a second shuffle, but over
    # pair rows (~2 orders of magnitude fewer than band rows); the
    # input already has ~bucket-count blocks, so skip the pre-coalesce.
    # Aggregator count scales with the EXPECTED PAIR rows, not the band
    # rows: at mid scale the pair set is small and each extra sort
    # partition is pure per-actor overhead (the 4->16-CPU efficiency
    # loss lived here) — ~250k pair rows per aggregator, floor 8.
    if use_tasks:
        # full bucket count: a task-shuffle bucket is ONE task (no
        # aggregator actor), and the dedup output's block count is the
        # downstream hydrate+score stage's parallelism — shrinking it
        # would cap a 32-CPU score stage at 8 tasks
        return exchange(pairs, _PAIR_COLS, dedup_arrow,
                        num_buckets=blocking.num_buckets,
                        empty_like=_empty_pairs, arrow_fn=True)
    # sort path: aggregator count scales with the EXPECTED PAIR rows,
    # not the band rows — at mid scale each extra sort partition is
    # pure per-actor overhead (~250k pair rows per aggregator, floor 8)
    dedup_buckets = blocking.num_buckets
    if n_rows_hint is not None:
        pairs_hint = max(1, n_rows_hint // 8)
        dedup_buckets = min(dedup_buckets,
                            max(8, pairs_hint // 250_000))
    return bucketed_map_groups(pairs, _PAIR_COLS, dedup,
                               num_buckets=dedup_buckets,
                               num_blocks_hint=blocking.num_buckets,
                               empty_like=_empty_pairs)


def hamming_pairs(ds, id_col: str, key_col: str, max_dist: int = 2,
                  num_buckets: int = 64, leaf_cap: int = 512):
    """Exact Hamming-distance pair join for FIXED-LENGTH keys: all
    pairs whose strings differ in at most ``max_dist`` positions —
    the identifier-typo case (account numbers, zero-padded ids,
    fixed-format codes) where edit distance degenerates to position
    flips.

    Pigeonhole blocking (the SimHash-band trick on raw strings): the
    key splits into ``max_dist + 1`` contiguous segments; two keys
    within distance d <= max_dist must agree on at least one WHOLE
    segment, so candidates come from grouping on (segment_index,
    segment_bytes) — one co-location shuffle.  Fixed-format keys
    defeat a single level (a constant prefix puts the whole table in
    one group), so oversized groups recurse MULTI-INDEX style (Liu et
    al.'s multi-index Hamming idea): the pigeonhole lemma holds for
    ANY position partition, so each level re-partitions under a
    rotated segmentation until groups fit ``leaf_cap``; leaves verify
    with a vectorized byte-matrix comparison.  Groups whose keys are
    ALL equal stop recursing and emit their (distance-0) pairs
    directly — the one case where quadratic output is the exact
    answer.  A pair found via several agreeing segments dedups in a
    second bounded exchange.  Mixed-length inputs never pair (a
    length difference is not a Hamming relation); self-pairs
    excluded; output ``(id_a, id_b, dist)`` with id_a < id_b."""
    from .shuffle import bucketed_map_groups

    n_seg = int(max_dist) + 1
    sch = ds.schema()
    id_t = dict(zip(sch.names, sch.types))[id_col]
    id_dtype = id_t.to_pandas_dtype() if hasattr(id_t, "to_pandas_dtype") \
        else id_t

    def empty_pairs() -> pd.DataFrame:
        return pd.DataFrame({
            "id_a": pd.Series([], dtype=id_dtype),
            "id_b": pd.Series([], dtype=id_dtype),
            "dist": pd.Series([], dtype="int64")})

    def pieces_of(keys: pd.Series, L: int):
        """Level-0 contiguous segmentation."""
        bounds = np.linspace(0, L, n_seg + 1, dtype=np.int64)
        return [keys.str.slice(int(bounds[s]), int(bounds[s + 1]))
                for s in range(n_seg)]

    def verify(m: pd.DataFrame, L: int, outs: list) -> None:
        ba = "".join(m["key_a"]).encode("utf-8")
        bb = "".join(m["key_b"]).encode("utf-8")
        if len(ba) == len(m) * L and len(bb) == len(m) * L:
            ka = np.frombuffer(ba, dtype=np.uint8).reshape(len(m), L)
            kb = np.frombuffer(bb, dtype=np.uint8).reshape(len(m), L)
            dist = (ka != kb).sum(axis=1)
        else:
            dist = np.array(
                [sum(x != y for x, y in zip(a, b))
                 for a, b in zip(m["key_a"], m["key_b"])],
                dtype=np.int64)
        keep = dist <= max_dist
        if keep.any():
            outs.append(pd.DataFrame({
                "id_a": m["id_a"].to_numpy()[keep],
                "id_b": m["id_b"].to_numpy()[keep],
                "dist": dist[keep].astype(np.int64)}))

    def emit_group(g: pd.DataFrame, L: int, depth: int,
                   outs: list) -> None:
        n = len(g)
        if n < 2:
            return
        if n <= leaf_cap or depth > 32:
            # small group (or the pathological depth cap): direct
            # quadratic merge + vectorized verify
            m = g.merge(g, on="__one", suffixes=("_a", "_b"))
            m = m[m["id_a"] < m["id_b"]]
            if len(m):
                verify(m, L, outs)
            return
        # multi-index recursion (Liu et al.): within the group, all
        # <= max_dist diffs of a qualifying pair lie in the VARIABLE
        # positions, so partitioning those into max_dist+1 parts
        # guarantees agreement on one whole part — and every part is
        # non-constant, so every subgroup strictly shrinks
        # (termination).  Needs the uniform-byte-length fast path;
        # multibyte groups this large fall back to the direct merge.
        ba = "".join(g["key"]).encode("utf-8")
        if len(ba) != n * L:
            m = g.merge(g, on="__one", suffixes=("_a", "_b"))
            m = m[m["id_a"] < m["id_b"]]
            if len(m):
                verify(m, L, outs)
            return
        mat = np.frombuffer(ba, dtype=np.uint8).reshape(n, L)
        var_cols = np.where((mat != mat[0]).any(axis=0))[0]
        if len(var_cols) <= max_dist:
            # diffs are confined to <= max_dist positions, so EVERY
            # pair in the group qualifies (incl. the all-equal /
            # duplicate-clique case) — the quadratic output IS the
            # exact answer; distances come from the variable columns
            ia, ib = np.triu_indices(n, k=1)
            ids = g["id"].to_numpy()
            if len(var_cols):
                sub = mat[:, var_cols]
                dist = (sub[ia] != sub[ib]).sum(axis=1).astype(
                    np.int64)
            else:
                dist = np.zeros(len(ia), np.int64)
            a, b = ids[ia], ids[ib]
            outs.append(pd.DataFrame({
                "id_a": np.minimum(a, b), "id_b": np.maximum(a, b),
                "dist": dist}))
            return
        # |V| >= max_dist+1: pigeonhole over exactly n_seg parts of
        # the variable positions — a qualifying pair agrees on one
        # whole part, and every part is non-constant so every
        # subgroup strictly shrinks
        for part in np.array_split(var_cols, n_seg):
            if len(part) == 0:
                continue
            sub = np.ascontiguousarray(mat[:, part])
            _, labels = np.unique(sub, axis=0, return_inverse=True)
            for lab in np.unique(labels):
                emit_group(g.iloc[labels == lab], L, depth + 1, outs)

    def segments(df: pd.DataFrame) -> pd.DataFrame:
        key = df[key_col].astype("string").fillna("")
        ln = key.str.len().to_numpy(np.int64)
        frames = []
        for L in np.unique(ln):
            if L < n_seg:
                continue
            sub = key[ln == L]
            ids = df[id_col].to_numpy()[ln == L]
            for s, piece in enumerate(pieces_of(sub, int(L))):
                frames.append(pd.DataFrame({
                    "seg": np.int64(s),
                    "L": np.int64(L),
                    "piece": piece.to_numpy(dtype=object),
                    "id": ids,
                    "key": sub.to_numpy(dtype=object)}))
        if not frames:
            return pd.DataFrame({
                "seg": pd.Series([], dtype="int64"),
                "L": pd.Series([], dtype="int64"),
                "piece": pd.Series([], dtype="string"),
                "id": df[id_col].iloc[:0],
                "key": pd.Series([], dtype="string")})
        return pd.concat(frames, ignore_index=True)

    segged = ds.map_batches(segments, batch_format="pandas")

    def pairgen(df: pd.DataFrame) -> pd.DataFrame:
        outs: list = []
        for (_, L, _), g in df.groupby(["seg", "L", "piece"],
                                       sort=False):
            gg = g[["id", "key"]].assign(__one=np.int8(1))
            # recurse from depth 1 (depth 0 produced this group)
            emit_group(gg, int(L), 1, outs)
        if not outs:
            return empty_pairs()
        return pd.concat(outs, ignore_index=True)

    empty = empty_pairs()
    cand = bucketed_map_groups(segged, ["seg", "piece"], pairgen,
                               num_buckets, empty_like=empty)
    return bucketed_map_groups(
        cand, ["id_a", "id_b"],
        lambda df: df.drop_duplicates(["id_a", "id_b"]),
        num_buckets, empty_like=empty)
