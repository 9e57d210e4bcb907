"""Bloom-filter membership prefilter for scale-path exclusion joins.

Reference analogue: the exclusion anti-joins J4/J5 (``repository.py:
309-313, 369-375``) exclude already-known IDs from discoveries.  The
engine's exact implementation broadcasts the key set
(:func:`..stages.relational.broadcast_anti_join`); at 100 TB the
exclusion set itself can outgrow a broadcast.  The standard fix is a
Bloom-filter prefilter: a bitmap of ``num_bits`` is ~1 byte per 2 keys
at 1% false-positive rate, orders of magnitude smaller than the key
set, and a negative answer is EXACT ("definitely not a member").

Anti-join semantics with a Bloom prefilter stay exact:

- rows whose key the filter rejects are definite non-members — they
  pass the anti-join immediately, no shuffle, no lookup;
- rows the filter accepts ("possibly member") are true members plus a
  ~FP-rate sliver of the stream; only THIS shrunken subset goes
  through the exact anti-join (broadcast below the threshold, a
  hash-shuffle anti-join above it).

Build is the combiner pattern: one partial bitmap per batch (packed
uint8), OR-reduced in a single remote task — no shuffle, and the
driver never touches a bitmap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.similarity import stable_hash_strings

DEFAULT_NUM_BITS = 1 << 22      # 512 KiB bitmap: ~1% FP at ~400k keys
DEFAULT_NUM_HASHES = 5


def _key_hashes(values: np.ndarray) -> np.ndarray:
    """uint64 stable hash of a key column (string or integer)."""
    if values.dtype == object or values.dtype.kind in ("U", "S"):
        return stable_hash_strings(values.astype(object))
    return stable_hash_strings(
        values.astype(np.int64).astype(str).astype(object))


def _bit_positions(h: np.ndarray, num_bits: int,
                   num_hashes: int) -> np.ndarray:
    """(n, num_hashes) bit indices via double hashing h1 + i*h2."""
    h1 = h
    h2 = (h >> np.uint64(17)) | np.uint64(1)     # odd => full-period
    i = np.arange(num_hashes, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            % np.uint64(num_bits)).astype(np.int64)


def _or_bitmaps(*bitmaps: bytes) -> np.ndarray:
    out = np.frombuffer(bitmaps[0], dtype=np.uint8).copy()
    for b in bitmaps[1:]:
        out |= np.frombuffer(b, dtype=np.uint8)
    return out


def build_bloom(keys_ds, col: str, num_bits: int = DEFAULT_NUM_BITS,
                num_hashes: int = DEFAULT_NUM_HASHES):
    """Build a Bloom bitmap from a key column; returns an ObjectRef to
    a packed uint8 bitmap of ``num_bits // 8`` bytes.

    One narrow map over the keys emits a partial bitmap per batch
    (each OR-able, so no shuffle is ever needed); a single remote task
    ORs them.  At cluster scale the partials total
    ``num_batches x num_bits/8`` bytes — tree-reduce the OR if that
    ever dominates; at 512 KiB per partial it does not.
    """
    import ray

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        bitmap = np.zeros(num_bits // 8, dtype=np.uint8)
        if len(df):
            h = _key_hashes(df[col].to_numpy())
            pos = _bit_positions(h, num_bits, num_hashes).ravel()
            np.bitwise_or.at(bitmap, pos >> 3,
                             np.uint8(1) << (pos & 7).astype(np.uint8))
        return pd.DataFrame({"bitmap": [bitmap.tobytes()]})

    parts = keys_ds.map_batches(partial, batch_format="pandas")
    blocks = parts.to_arrow_refs()
    return ray.remote(_reduce_blocks).remote(num_bits, *blocks)


def _reduce_blocks(num_bits: int, *blocks) -> np.ndarray:
    payloads = []
    for b in blocks:
        # empty input blocks can pass through map_batches unchanged,
        # keeping the key schema — skip anything without a bitmap
        if "bitmap" in b.schema.names:
            payloads.extend(b.column("bitmap").to_pylist())
    if not payloads:
        return np.zeros(num_bits // 8, dtype=np.uint8)
    return _or_bitmaps(*payloads)


def bloom_might_contain(bitmap: np.ndarray, values: np.ndarray,
                        num_hashes: int = DEFAULT_NUM_HASHES) -> np.ndarray:
    """Vectorized membership test: bool mask, True = possibly member."""
    num_bits = len(bitmap) * 8
    if len(values) == 0:
        return np.zeros(0, dtype=bool)
    h = _key_hashes(values)
    pos = _bit_positions(h, num_bits, num_hashes)
    bits = (bitmap[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return bits.all(axis=1)


def bloom_anti_join(ds, keys_ds, on: str, key_col: str | None = None,
                    num_bits: int = DEFAULT_NUM_BITS,
                    num_hashes: int = DEFAULT_NUM_HASHES):
    """EXACT anti-join (keep ``ds`` rows whose ``on`` is absent from
    ``keys_ds[key_col]``) with a Bloom prefilter.

    Definite non-members stream straight through; only the
    possibly-member sliver is verified against the exact key set.  The
    verification set here is a broadcast (test scale); above the
    broadcast threshold swap in the hash-shuffle anti-join over the
    same shrunken subset — the Bloom stage is unchanged.
    """
    import ray

    key_col = key_col or on
    keys_mat = keys_ds.materialize()
    bitmap_ref = build_bloom(keys_mat, key_col, num_bits, num_hashes)
    # exact verification set for the sliver the filter cannot clear,
    # assembled in a remote task (never on the driver) and shipped once
    exact_ref = ray.remote(_collect_key_set).remote(
        key_col, *keys_mat.to_arrow_refs())

    def flt(df: pd.DataFrame, _bm=bitmap_ref, _ex=exact_ref) -> pd.DataFrame:
        bitmap = ray.get(_bm)
        exact = ray.get(_ex)
        maybe = bloom_might_contain(bitmap, df[on].to_numpy(), num_hashes)
        # definite non-members pass; possible members get exact check
        sliver = df[maybe]
        keep_sliver = sliver[~sliver[on].isin(exact)]
        out = pd.concat([df[~maybe], keep_sliver])
        out = out.sort_index()
        if len(out) == 0:
            out = out.astype({c: "string" for c in out.columns
                              if out[c].dtype == object})
        return out

    return ds.map_batches(flt, batch_format="pandas")


def _collect_key_set(key_col: str, *blocks) -> frozenset:
    vals: list = []
    for b in blocks:
        if key_col in b.schema.names:
            vals.extend(b.column(key_col).to_pylist())
    return frozenset(vals)
