"""Candidate-pair generation from banded LSH keys, with hot-key salting.

Reference analogue: candidate generation was an equi-join on the exact
blocking key (``repository.py:297-314``); here it is
``groupby(block_key) -> within-group pairing`` with explicit skew
control, per the north rule:

- **hot-key detection**: a narrow ``groupby(band_id, band_hash).count()``
  pre-pass; keys whose group exceeds ``hot_key_cap`` are collected to
  the driver (few by construction) and broadcast via ``ray.put``.
- **salting**: members of a hot key get ``salt = hash(url) % s`` and are
  replicated into the s "triangle" groups ``(min(salt,t), max(salt,t))``
  so every cross-salt pair is generated exactly once while the work is
  spread over s*(s+1)/2 independent groups (pair-set identical to the
  unsalted groupby — pinned by tests).
- **degenerate-clique guard**: a group side larger than ``max_side``
  (an identical-boilerplate band bucket) switches to star+chain pairing
  (connect to min member + sorted-adjacent window) — bounded O(m*w)
  instead of O(m^2); connectivity for true duplicate cliques is
  preserved, and the guard is logged in the stage metrics.

Pairs are emitted canonically (``url_a < url_b``) with the MinHash
estimated Jaccard, prefiltered at ``est_prefilter``, then deduped
across bands with a bucketed ``drop_duplicates``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from ..config import BlockingConfig, ScoringConfig
from ..functions.similarity import stable_hash_strings
from .shuffle import bucketed_map_groups

_PAIR_COLS = ["url_a", "url_b", "est_jaccard"]
MAX_SIDE = 2000          # degenerate-clique guard
CHAIN_WINDOW = 3


def find_hot_keys(band_ds, cfg: BlockingConfig) -> dict[tuple[int, int], int]:
    """Narrow count pre-pass; returns {(band_id, band_hash): count}."""
    counts = (band_ds.select_columns(["band_id", "band_hash"])
              .groupby(["band_id", "band_hash"]).count())

    def only_hot(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["count()"] > cfg.hot_key_cap]

    hot = counts.map_batches(only_hot, batch_format="pandas").take_all()
    return {(r["band_id"], r["band_hash"]): r["count()"] for r in hot}


def expand_salts(band_ds, hot_keys: dict[tuple[int, int], int],
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
        keys = list(zip(df["band_id"].to_numpy(), df["band_hash"].to_numpy()))
        counts = np.array([hot.get(k, 0) for k in keys], dtype=np.int64)
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
        member_salt = (stable_hash_strings(
            hot_df["url"].to_numpy(dtype=object)) % s.astype(np.uint64)
        ).astype(np.int64)
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


def _pairs_within(urls: np.ndarray, sigs: np.ndarray,
                  est_prefilter: float) -> list[tuple[str, str, float]]:
    m = len(urls)
    if m < 2:
        return []
    if m > MAX_SIDE:  # degenerate clique: star + chain
        order = np.argsort(urls)
        urls, sigs = urls[order], sigs[order]
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
    est = (sigs[i_idx] == sigs[j_idx]).mean(axis=1)
    keep = est >= est_prefilter
    return _canonical(urls[i_idx[keep]], urls[j_idx[keep]], est[keep])


def _pairs_cross(urls_a, sigs_a, urls_b, sigs_b, est_prefilter):
    if len(urls_a) == 0 or len(urls_b) == 0:
        return []
    if len(urls_a) > MAX_SIDE or len(urls_b) > MAX_SIDE:
        # degenerate: pair each A member with first CHAIN_WINDOW B members
        k = min(len(urls_b), CHAIN_WINDOW)
        order_b = np.argsort(urls_b)[:k]
        i_idx = np.repeat(np.arange(len(urls_a)), k)
        j_idx = np.tile(order_b, len(urls_a))
        est = (sigs_a[i_idx] == sigs_b[j_idx]).mean(axis=1)
    else:
        est_m = (sigs_a[:, None, :] == sigs_b[None, :, :]).mean(axis=2)
        i_idx, j_idx = np.nonzero(est_m >= est_prefilter)
        est = est_m[i_idx, j_idx]
    keep = est >= est_prefilter
    return _canonical(urls_a[i_idx[keep]], urls_b[j_idx[keep]], est[keep])


def _canonical(a: np.ndarray, b: np.ndarray, est: np.ndarray):
    swap = a > b
    lo = np.where(swap, b, a)
    hi = np.where(swap, a, b)
    return list(zip(lo.tolist(), hi.tolist(), est.tolist()))


def generate_candidate_pairs(band_ds, blocking: BlockingConfig,
                             scoring: ScoringConfig):
    """Salted groupby-pairing: band rows -> deduped candidate pairs."""
    hot = find_hot_keys(band_ds, blocking)
    salted = expand_salts(band_ds, hot, blocking)
    pre = scoring.est_prefilter

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        rows: list[tuple[str, str, float]] = []
        grouped = df.groupby(["band_id", "band_hash", "salt_i", "salt_j"],
                             sort=False)
        for (_, _, si, sj), g in grouped:
            urls = g["url"].to_numpy(dtype=object)
            sigs = np.stack(g["sig"].to_numpy())
            if si == sj:
                rows.extend(_pairs_within(urls, sigs, pre))
            else:
                ma = g["member_salt"].to_numpy() == si
                rows.extend(_pairs_cross(urls[ma], sigs[ma],
                                         urls[~ma], sigs[~ma], pre))
        if not rows:
            return pd.DataFrame({c: pd.Series([], dtype=object if c != "est_jaccard" else float)
                                 for c in _PAIR_COLS})
        out = pd.DataFrame(rows, columns=_PAIR_COLS)
        return out.drop_duplicates(["url_a", "url_b"])

    pairs = bucketed_map_groups(
        salted, ["band_id", "band_hash", "salt_i", "salt_j"],
        bucket_pairs, num_buckets=blocking.num_buckets)

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["url_a", "url_b"])

    return bucketed_map_groups(pairs, ["url_a", "url_b"], dedup,
                               num_buckets=blocking.num_buckets)
