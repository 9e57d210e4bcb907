"""Similarity kernels: shingles, MinHash, LSH bands, SimHash, Jaccard.

The reference has no near-dup machinery (``datasketch`` is declared in
``build_db/requirements.txt:1`` but never imported); these are new,
Ray-Data-first designs per the north rule: everything here is batch
NumPy over stable 64-bit hashes so a ``map_batches`` stage can compute
signatures for thousands of documents per call without Python-per-row
loops in the hot path.

Determinism: shingle-token hashing uses DuckDB's vectorized ``hash()``
(xxhash-family, identical across processes and workers for the pinned
DuckDB build — see :func:`hash_strings_fast`); url/bucket keys use
``pandas.util.hash_array`` (stable SipHash with a fixed key).  MinHash
permutations are affine maps ``x -> a*x + b (mod 2**64)`` with odd
``a`` drawn from a seeded RNG (odd multiplier => bijection on Z_2^64,
so each map is a true permutation and min-stability holds).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_MIX = np.uint64(0x9E3779B97F4A7C15)  # 64-bit golden-ratio mixing constant


def stable_hash_strings(values) -> np.ndarray:
    """Stable uint64 hash of an iterable of strings (vectorized)."""
    arr = np.asarray(values, dtype=object)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(arr, categorize=False)


_DUCK_HASH = None


def _hash_con():
    """Lazy per-process DuckDB connection for the vectorized string
    hash (threads=1: each Ray map task owns one CPU)."""
    global _DUCK_HASH
    if _DUCK_HASH is None:
        import duckdb

        _DUCK_HASH = duckdb.connect()
        _DUCK_HASH.execute("PRAGMA threads=1")
    return _DUCK_HASH


def hash_strings_fast(values) -> np.ndarray:
    """Stable uint64 hash of a string array via DuckDB's vectorized
    ``hash()`` kernel — measured ~4x faster than
    ``pandas.util.hash_array`` on short tokens, with zero
    Python-object churn when fed an Arrow array (the shingle path's
    dominant cost was hash_array over millions of token objects).

    Deterministic across processes and workers for the environment's
    pinned DuckDB build.  Used for shingle/equality tokens and (since
    round 5) for the ANN index samples (stages/ann.py IVF centroids /
    PQ training rows), which makes those index builds SQL-replayable
    by the DuckDB oracles.  Caveat that use inherits: a DuckDB upgrade
    may change ``hash()``, so a PERSISTED IVF/PQ index must be rebuilt
    when the engine's DuckDB build changes (the index manifest should
    record the build; assignments are otherwise silently different).
    ``stable_hash_strings`` remains the hash for url/bucket keys.
    """
    import pyarrow as pa

    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if not isinstance(values, pa.Array):
        arr = np.asarray(values, dtype=object)
        if arr.size == 0:
            return np.empty(0, dtype=np.uint64)
        values = pa.array(arr, pa.string())
    if len(values) == 0:
        return np.empty(0, dtype=np.uint64)
    con = _hash_con()
    con.register("__hash_in", pa.table({"s": values}))
    # single-threaded projection over one sequential scan: row order is
    # preserved (pinned by tests)
    out = con.execute("SELECT hash(s) AS h FROM __hash_in").arrow()
    con.unregister("__hash_in")
    return out.column("h").to_numpy(zero_copy_only=False).astype(np.uint64)


def token_shingles(tokens: list[str], k: int = 3) -> list[str]:
    """Contiguous token k-shingles (w-shingling); whole doc if < k tokens."""
    if len(tokens) < k:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i:i + k]) for i in range(len(tokens) - k + 1)]


def _rolling_combine(hashes: np.ndarray, k: int) -> np.ndarray:
    """Combine k consecutive element hashes into one shingle hash via a
    polynomial rolling mix mod 2**64 (vectorized; no string joins)."""
    n = hashes.size
    if n == 0:
        return hashes
    if n < k:
        acc = np.zeros(1, dtype=np.uint64)
        for j in range(n):
            acc = acc * _MIX + hashes[j]
        return acc
    m = n - k + 1
    acc = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        acc = acc * _MIX + hashes[j:j + m]
    return acc


def shingle_hash_set(text_tokens: list[str], k: int = 3) -> np.ndarray:
    """Sorted unique uint64 shingle hashes for one tokenized document.

    Shingle hash = rolling combine of per-token hashes — equivalent
    discrimination to hashing the joined string, ~10x cheaper at batch
    scale (one vectorized hash call over tokens, zero string builds).
    """
    if not text_tokens:
        return np.empty(0, dtype=np.uint64)
    return np.unique(_rolling_combine(hash_strings_fast(text_tokens), k))


def shingle_hash_set_text(text: str, k_tokens: int = 3,
                          k_chars: int = 5) -> np.ndarray:
    """Shingle set for raw (normalized) text with a script-aware rule.

    Whitespace-delimited scripts get token ``k_tokens``-shingles.  When
    the mean token length exceeds 10 (CJK and other unsegmented
    scripts tokenize into whole glued runs), fall back to character
    ``k_chars``-grams over the de-spaced text — token shingles would
    flip entirely on a single char edit (char grams also decay ~2x
    faster per edit than word shingles, hence the smaller k).
    Deterministic; pinned by tests.  Delegates to the batch kernel so
    per-doc and batch outputs are identical by construction.
    """
    return batch_shingle_sets([text], k_tokens, k_chars)[0]


def batch_shingle_sets(texts, k_tokens: int = 3,
                       k_chars: int = 5) -> list[np.ndarray]:
    """Shingle sets for a whole batch, fully vectorized:

    - ONE Arrow ``utf8_split_whitespace`` tokenize over the batch
      (zero Python string objects for the common word-script path);
    - ONE DuckDB ``hash()`` call over all kept tokens;
    - the same per-doc rolling k-gram combine + unique as before.

    Accepts a list of strings, a pandas Series, or an Arrow string
    array.  Identical output to calling :func:`shingle_hash_set_text`
    per doc (pinned by tests — that function delegates here).  The
    unsegmented-script (CJK) fallback hashes the de-spaced text's
    characters, batched across all such docs in one hash call.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, pd.Series):
        ta = pa.Array.from_pandas(texts.fillna(""), type=pa.string())
    elif isinstance(texts, (pa.Array, pa.ChunkedArray)):
        ta = pc.fill_null(texts, "")
        if isinstance(ta, pa.ChunkedArray):
            ta = ta.combine_chunks()
    else:
        ta = pa.array(["" if t is None else t for t in texts], pa.string())
    n = len(ta)
    if n == 0:
        return []
    tok = pc.utf8_split_whitespace(ta)
    offs = tok.offsets.to_numpy().astype(np.int64)
    offs = offs - offs[0]
    raw_counts = np.diff(offs)
    flat = tok.values
    # Arrow's split emits empty tokens at boundaries / repeated
    # whitespace where Python str.split drops them — mask them out
    mask = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    doc_of = np.repeat(np.arange(n), raw_counts)
    ntok = np.bincount(doc_of[mask], minlength=n).astype(np.int64)
    charlen = pc.utf8_length(ta).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    # mean token length > 10 (strict) -> unsegmented-script char grams
    cjk = (ntok > 0) & (charlen > 10 * ntok)

    word_docs = (~cjk) & (ntok > 0)
    keep = mask & word_docs[doc_of]
    tok_hashes = hash_strings_fast(flat.filter(pa.array(keep)))
    kofs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(doc_of[keep], minlength=n), out=kofs[1:])

    # batch the rare CJK docs' char units into one hash call too
    cjk_idx = np.flatnonzero(cjk)
    cjk_units: list[str] = []
    cjk_spans = np.zeros(cjk_idx.size + 1, dtype=np.int64)
    cjk_slot = np.full(n, -1, dtype=np.int64)
    for j, i in enumerate(cjk_idx):
        cjk_slot[i] = j
        cjk_units.extend("".join(ta[int(i)].as_py().split()))
        cjk_spans[j + 1] = len(cjk_units)
    cjk_hashes = (hash_strings_fast(cjk_units) if cjk_units
                  else np.empty(0, dtype=np.uint64))

    empty = np.empty(0, dtype=np.uint64)
    out: list[np.ndarray] = []
    for i in range(n):
        if ntok[i] == 0:
            out.append(empty)
        elif cjk_slot[i] >= 0:
            j = cjk_slot[i]
            h = cjk_hashes[cjk_spans[j]:cjk_spans[j + 1]]
            out.append(np.unique(_rolling_combine(h, k_chars)))
        else:
            h = tok_hashes[kofs[i]:kofs[i + 1]]
            out.append(np.unique(_rolling_combine(h, k_tokens)))
    return out


def packed_u64_column(col, dtype=np.uint64) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy ``(values, lengths)`` view of an Arrow binary column
    holding packed unsigned-int sets (one ``arr.tobytes()`` blob per
    row, ``dtype`` elements).  Avoids ``to_pylist`` + per-row
    ``np.frombuffer`` in hot scoring stages: the concatenated payload
    is viewed in place from the Arrow data buffer."""
    import pyarrow as pa
    import pyarrow.compute as pc

    dtype = np.dtype(dtype)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        col = pc.fill_null(col, b"")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
    if len(col) == 0:
        return (np.empty(0, dtype=dtype), np.empty(0, dtype=np.int64))
    off_dtype = np.int64 if pa.types.is_large_binary(col.type) else np.int32
    offs = np.frombuffer(col.buffers()[1], dtype=off_dtype)[
        col.offset: col.offset + len(col) + 1].astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    vals = np.ascontiguousarray(data[offs[0]:offs[-1]]).view(dtype)
    lens = (np.diff(offs) // dtype.itemsize).astype(np.int64)
    return vals, lens


def pairwise_jaccard_packed(vals_a: np.ndarray, lens_a: np.ndarray,
                            vals_b: np.ndarray, lens_b: np.ndarray) -> np.ndarray:
    """Exact Jaccard for n pairs of packed sorted-unique uint64 sets.

    Identical output to calling :func:`jaccard_from_sets` per pair
    (pinned by tests).  Per-pair binary search of the smaller side into
    the larger (both already sorted-unique): each step touches only the
    two cache-resident sets.  A batch-global lexsort over (pair, value)
    tags was tried and REJECTED: it allocates multi-MB temporaries per
    task, and under 32-way task concurrency those allocations saturate
    the shared memory bus (measured 17x slower single-task and a 4.5x
    flagship wall regression at sf0.1 — same pathology as the MinHash
    chunking note above).
    """
    n = lens_a.size
    out = np.empty(n, dtype=np.float64)
    if n == 0:
        return out
    off_a = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens_a, out=off_a[1:])
    off_b = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens_b, out=off_b[1:])
    for i in range(n):
        a = vals_a[off_a[i]:off_a[i + 1]]
        b = vals_b[off_b[i]:off_b[i + 1]]
        if a.size == 0 or b.size == 0:
            # either side empty -> 0.0 by fiat (content-free pages must
            # not cluster on similarity they don't have)
            out[i] = 0.0
            continue
        if a.size > b.size:
            a, b = b, a
        pos = np.searchsorted(b, a)
        pos[pos == b.size] = b.size - 1
        inter = int(np.count_nonzero(b[pos] == a))
        out[i] = inter / (a.size + b.size - inter)
    return out


def jaccard_pairs_from_binary(col_a, col_b, dtype=np.uint64) -> np.ndarray:
    """Exact Jaccard per row for two Arrow binary columns of packed
    shingle-token sets (the hot path of pair scoring / near-dup
    verify)."""
    va, la = packed_u64_column(col_a, dtype)
    vb, lb = packed_u64_column(col_b, dtype)
    return pairwise_jaccard_packed(va, la, vb, lb)


def partial_lev_distance(pattern: str, text: str) -> int:
    """Minimum Levenshtein distance between ``pattern`` and ANY
    contiguous substring of ``text`` (semi-global / Sellers-1980
    alignment: deletions at both ends of the text are free).

    Reference analogue: rapidfuzz ``fuzz.partial_ratio``
    (``query_db/udf.py:43-59``) — the "best local match" scorer used
    for entity validation against long affiliation strings
    (``repository.py:569-581``).  Documented divergence: rapidfuzz
    scores Indel similarity over alignments of the shorter string;
    this uses full Levenshtein over all substrings — same role, exact
    SQL-expressible semantics (min over substrings of
    ``levenshtein()``), pinned by a brute-force unit oracle and the
    driver's ``partial_ratio`` query.

    Vectorized DP: one numpy pass over the text axis per pattern char;
    the in-row dependency ``D[j] = min(D[j], D[j-1]+1)`` is a min-plus
    prefix scan, computed as ``cummin(D - j) + j``.
    """
    m, n = len(pattern), len(text)
    if m == 0:
        return 0
    if n == 0:
        return m
    t = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    steps = np.arange(n + 1, dtype=np.int64)
    prev = np.zeros(n + 1, dtype=np.int64)  # D[0][j] = 0: free start
    full = np.empty(n + 1, dtype=np.int64)
    for i, ch in enumerate(pattern, 1):
        code = np.uint32(ord(ch))
        full[0] = i  # D[i][0]: pattern prefix vs empty substring
        np.minimum(prev[:-1] + (t != code), prev[1:] + 1, out=full[1:])
        prev = np.minimum.accumulate(full - steps) + steps
        full = np.empty(n + 1, dtype=np.int64)
    return int(prev.min())


def partial_ratio(s1: str, s2: str) -> float:
    """Best-local-match similarity in [0, 1]:
    ``1 - partial_lev_distance(shorter, longer) / len(shorter)``.
    Empty-vs-empty is 1.0, empty-vs-nonempty 0.0 (the reference wraps
    the UDF with the same null/blank -> 0.0 guard, udf.py:50-53)."""
    if not s1 and not s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    short, long_ = (s1, s2) if len(s1) <= len(s2) else (s2, s1)
    return 1.0 - partial_lev_distance(short, long_) / len(short)


def gotoh_local_similarity(names_a, names_b,
                           match: float = 2.0, mismatch: float = -1.0,
                           gap_open: float = -2.0,
                           gap_extend: float = -0.5) -> np.ndarray:
    """Batched Smith-Waterman local alignment with affine gaps (Gotoh
    1982), normalized to [0, 1] by the perfect-match score of the
    shorter string — the alignment-aware name similarity that survives
    internal insertions/deletions where whole-string edit ratios decay.

    Vectorized ACROSS THE PAIR AXIS: the i/j DP loops run over the
    (padded) max name lengths only, with every cell update a numpy op
    over all pairs at once — len_a x len_b Python iterations total for
    the whole batch, not per pair.  Padded positions use disjoint
    sentinels (0 vs 255, outside ASCII text) so they can never match
    and, under negative mismatch/gap scores, can never raise a local
    maximum; the global cell-max is therefore the valid-region max.
    """
    n_pairs = len(names_a)
    if n_pairs == 0:
        return np.zeros(0, dtype=np.float64)
    enc_a = [str(s).encode("latin-1", "replace") for s in names_a]
    enc_b = [str(s).encode("latin-1", "replace") for s in names_b]
    la = np.array([len(s) for s in enc_a], dtype=np.int64)
    lb = np.array([len(s) for s in enc_b], dtype=np.int64)
    n, m = int(la.max(initial=1)), int(lb.max(initial=1))
    A = np.zeros((n_pairs, n), dtype=np.uint8)          # pad sentinel 0
    B = np.full((n_pairs, m), 255, dtype=np.uint8)      # pad sentinel 255
    for r, s in enumerate(enc_a):
        A[r, :len(s)] = np.frombuffer(s, dtype=np.uint8)
    for r, s in enumerate(enc_b):
        B[r, :len(s)] = np.frombuffer(s, dtype=np.uint8)

    neg = -1e18
    h_prev = np.zeros((n_pairs, m + 1))                 # H[i-1][*]
    f_row = np.full((n_pairs, m + 1), neg)              # F[i][*]
    best = np.zeros(n_pairs)
    for i in range(n):
        h_cur = np.zeros((n_pairs, m + 1))
        e = np.full(n_pairs, neg)                       # E[i][j] running
        np.maximum(h_prev + gap_open, f_row + gap_extend, out=f_row)
        sub = np.where(B == A[:, i:i + 1], match, mismatch)
        for j in range(1, m + 1):
            e = np.maximum(h_cur[:, j - 1] + gap_open, e + gap_extend)
            h = np.maximum.reduce([np.zeros(n_pairs),
                                   h_prev[:, j - 1] + sub[:, j - 1],
                                   e, f_row[:, j]])
            h_cur[:, j] = h
        np.maximum(best, h_cur.max(axis=1), out=best)
        h_prev = h_cur
    denom = match * np.maximum(np.minimum(la, lb), 1)
    out = best / denom
    both_empty = (la == 0) & (lb == 0)
    out[both_empty] = 1.0
    return np.clip(out, 0.0, 1.0)


def jaccard_from_sets(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted-unique uint64 shingle sets."""
    if a.size == 0 or b.size == 0:
        # empty vs empty is 0.0 by fiat: content-free pages must not
        # cluster together on "similarity" they don't have
        return 0.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    return inter / (a.size + b.size - inter)


class MinHasher:
    """Seeded MinHash + banded-LSH key emitter, vectorized over a batch.

    ``num_perm = bands * rows``; with the defaults (16 bands x 4 rows)
    the LSH S-curve threshold is ~(1/16)^(1/4) ~= 0.50 Jaccard.
    """

    def __init__(self, num_bands: int = 16, rows_per_band: int = 4,
                 seed: int = 2024):
        self.num_bands = num_bands
        self.rows_per_band = rows_per_band
        self.num_perm = num_bands * rows_per_band
        rng = np.random.default_rng(seed)
        self.a = (rng.integers(1, 2**63, self.num_perm, dtype=np.uint64)
                  * np.uint64(2) + np.uint64(1))  # odd multipliers
        self.b = rng.integers(0, 2**63, self.num_perm, dtype=np.uint64)

    def signatures(self, shingle_sets: list[np.ndarray]) -> np.ndarray:
        """(n_docs, num_perm) uint64 MinHash signature matrix.

        Fully vectorized: concat all docs' shingle hashes, apply all
        permutations at once, reduce per-doc with ``minimum.reduceat``.
        Empty docs get an all-max sentinel signature.
        """
        n = len(shingle_sets)
        out = np.full((n, self.num_perm), np.iinfo(np.uint64).max,
                      dtype=np.uint64)
        lens = np.array([s.size for s in shingle_sets], dtype=np.int64)
        nonempty = np.flatnonzero(lens)
        if nonempty.size == 0:
            return out
        concat = np.concatenate([shingle_sets[i] for i in nonempty])
        offsets = np.zeros(nonempty.size, dtype=np.int64)
        np.cumsum(lens[nonempty][:-1], out=offsets[1:])
        # chunk the shingle axis so the (chunk x num_perm) temp matrix
        # stays L2-resident (~512 KiB): measured 4x faster single-core
        # and ~19x faster aggregate at 32 parallel workers than a 32
        # MiB chunk, which saturates memory bandwidth (the temp is
        # written+read once per chunk, so traffic ~= matrix size)
        chunk = max(1, (1 << 16) // self.num_perm)
        mins = np.full((nonempty.size, self.num_perm), np.iinfo(np.uint64).max,
                       dtype=np.uint64)
        starts = offsets
        ends = np.append(offsets[1:], concat.size)
        pos = 0
        while pos < concat.size:
            hi = min(pos + chunk, concat.size)
            h = concat[pos:hi, None] * self.a[None, :] + self.b[None, :]
            # docs overlapping [pos, hi)
            d0 = int(np.searchsorted(ends, pos, side="right"))
            d1 = int(np.searchsorted(starts, hi, side="left"))
            local = np.clip(starts[d0:d1] - pos, 0, None)
            part = np.minimum.reduceat(h, local, axis=0)
            np.minimum(mins[d0:d1], part, out=mins[d0:d1])
            pos = hi
        out[nonempty] = mins
        return out

    def band_keys(self, sigs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Collapse each band of the signature matrix to one int64 key.

        Returns ``(band_id, band_hash)`` arrays of shape
        (n_docs * num_bands,), laid out doc-major. The per-band rows are
        mixed with a polynomial rolling hash mod 2**64 (collision prob
        ~n^2/2**64 — negligible even at 10^12 docs per band).
        """
        n = sigs.shape[0]
        bands = sigs.reshape(n, self.num_bands, self.rows_per_band)
        key = np.zeros((n, self.num_bands), dtype=np.uint64)
        for r in range(self.rows_per_band):
            key = key * _MIX + bands[:, :, r]
        key += np.arange(self.num_bands, dtype=np.uint64)[None, :] * _MIX
        band_id = np.tile(np.arange(self.num_bands, dtype=np.int32), n)
        return band_id, key.reshape(-1).view(np.int64)

    def estimate_jaccard(self, sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray:
        """Row-wise estimated Jaccard of two (n, num_perm) sig matrices."""
        return (sig_a == sig_b).mean(axis=1)


def simhash64(shingle_sets: list[np.ndarray]) -> np.ndarray:
    """64-bit SimHash per document (vectorized bit-count reduction)."""
    n = len(shingle_sets)
    out = np.zeros(n, dtype=np.uint64)
    lens = np.array([s.size for s in shingle_sets], dtype=np.int64)
    nonempty = np.flatnonzero(lens)
    if nonempty.size == 0:
        return out
    concat = np.concatenate([shingle_sets[i] for i in nonempty])
    offsets = np.zeros(nonempty.size, dtype=np.int64)
    np.cumsum(lens[nonempty][:-1], out=offsets[1:])
    shifts = np.arange(64, dtype=np.uint64)
    bits = ((concat[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
    sums = np.add.reduceat(bits, offsets, axis=0)  # (n_nonempty, 64)
    majority = (2 * sums) > lens[nonempty][:, None]
    vals = (majority.astype(np.uint64) << shifts[None, :]).sum(
        axis=1, dtype=np.uint64)
    out[nonempty] = vals
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise Hamming distance between two uint64 arrays."""
    x = np.bitwise_xor(a, b)
    # popcount via byte-view lookup (numpy<2 has no bit_count ufunc)
    byte_counts = np.unpackbits(x.view(np.uint8)).reshape(x.size, 8 * 8)
    return byte_counts.sum(axis=1)


# --------------------------------------------------------------------------
# Byte-matrix string kernels: bounded-distance Damerau-Levenshtein and
# character-set Jaccard.  Both operate on a padded (n, W) uint8 matrix
# built in ONE vectorized pass (no Python loop over rows), so a
# map_batches verify stage stays numpy-bound.  Contract: 1-byte-per-char
# encodable text (latin-1; chars > U+00FF are replaced) with no NUL
# bytes — the webtext/TPC-H name columns these serve are ASCII.
# --------------------------------------------------------------------------

def byte_matrix(strings, width: int | None = None
                ) -> tuple[np.ndarray, np.ndarray]:
    """Padded (n, W) uint8 byte matrix + per-row lengths for a string
    series.  Right-padded with NUL; latin-1 keeps one byte per char so
    column j is character j for every row."""
    s = pd.Series(strings).astype("string").fillna("")
    lens = s.str.len().to_numpy(np.int64)
    n = len(s)
    w = int(lens.max()) if n and lens.size else 0
    if width is not None:
        w = max(w, width)
    if w == 0 or n == 0:
        return np.zeros((n, w), np.uint8), lens
    padded = s.str.pad(w, side="right", fillchar="\x00")
    buf = "".join(padded.tolist()).encode("latin-1", errors="replace")
    return np.frombuffer(buf, np.uint8).reshape(n, w).copy(), lens


def damerau_leq1(a, b) -> np.ndarray:
    """Row-wise full Damerau-Levenshtein distance CAPPED at 1: returns
    0, 1, or 2 (meaning "> 1") per pair.  At threshold 1 the full DL
    metric (DuckDB ``damerau_levenshtein``, Lowrance-Wagner 1975) has a
    closed form — equal length: one substitution OR one adjacent
    transposition; length diff 1: one indel (prefix+suffix match covers
    the shorter string); else > 1 — so no DP matrix is needed and the
    whole pair batch vectorizes.  Parity with DuckDB is pinned in
    tests/test_similarity.py on randomized mutation pairs."""
    sa = pd.Series(a).astype("string").fillna("")
    sb = pd.Series(b).astype("string").fillna("")
    n = len(sa)
    out = np.full(n, 2, dtype=np.int64)
    if n == 0:
        return out
    la = sa.str.len().to_numpy(np.int64)
    lb = sb.str.len().to_numpy(np.int64)
    w = int(max(la.max(), lb.max(), 1))
    A, _ = byte_matrix(sa, width=w)
    B, _ = byte_matrix(sb, width=w)

    eqlen = la == lb
    if eqlen.any():
        Ae, Be = A[eqlen], B[eqlen]
        neq = Ae != Be                       # padding compares equal
        m = neq.sum(axis=1)
        i1 = neq.argmax(axis=1)
        second = neq & (np.cumsum(neq, axis=1) == 2)
        i2 = second.argmax(axis=1)
        r = np.arange(len(Ae))
        swapped = ((m == 2) & (i2 == i1 + 1)
                   & (Ae[r, i1] == Be[r, i2]) & (Ae[r, i2] == Be[r, i1]))
        out[eqlen] = np.where(m == 0, 0,
                              np.where((m == 1) | swapped, 1, 2))

    gap = np.abs(la - lb) == 1
    if gap.any():
        Ag, Bg = A[gap], B[gap]
        lag, lbg = la[gap], lb[gap]
        longer_b = (lbg > lag)[:, None]
        L = np.where(longer_b, Bg, Ag)
        S = np.where(longer_b, Ag, Bg)
        ls = np.minimum(lag, lbg)
        idx = np.arange(w)
        valid = idx[None, :] < ls[:, None]
        # p: leading equal run of S vs L
        neq_d = (S != L) & valid
        p = np.where(neq_d.any(axis=1), neq_d.argmax(axis=1), ls)
        # t: trailing equal run of S[j] vs L[j+1] ending at ls-1
        neq_s = (S[:, : w - 1] != L[:, 1:]) & valid[:, : w - 1]
        cand = np.where(neq_s, idx[None, : w - 1], -1).max(axis=1) \
            if w > 1 else np.full(len(S), -1, np.int64)
        t = ls - 1 - cand
        out[gap] = np.where(p + t >= ls, 1, 2)
    return out


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def charset_masks(strings) -> np.ndarray:
    """(n, 4) uint64 bitmask of each string's DISTINCT byte set —
    the exact set DuckDB's ``jaccard()`` compares (char-set Jaccard,
    case-sensitive).  Bit 0 of word 0 (NUL, the pad byte) is always
    cleared; real text never contains NUL."""
    M, _ = byte_matrix(strings)
    n = len(M)
    masks = np.zeros((n, 4), dtype=np.uint64)
    if M.shape[1] == 0:
        return masks
    word = M >> 6
    bit = np.uint64(1) << (M & np.uint8(63)).astype(np.uint64)
    for wd in range(4):
        sel = np.where(word == wd, bit, np.uint64(0))
        masks[:, wd] = np.bitwise_or.reduce(sel, axis=1)
    masks[:, 0] &= ~np.uint64(1)
    return masks


def popcount_rows(x: np.ndarray) -> np.ndarray:
    """Per-row popcount of a (n, k) uint64 array (byte-LUT; numpy<2
    has no bit_count ufunc)."""
    if x.size == 0:
        return np.zeros(x.shape[0], dtype=np.int64)
    b = x.view(np.uint8).reshape(x.shape[0], -1)
    return _POP8[b].sum(axis=1, dtype=np.int64)
