"""Deduplication family for training-data curation pipelines.

The reference only has exact SQL dedup (D1-D4); these are the
scale-path designs the north rule adds:

- :func:`exact_dedup` — hash-partition by content, keep min id.
- :func:`near_dup_pairs` — MinHash + banded LSH blocking -> salted
  within-key pairing -> exact shingle-Jaccard verify (reuses the
  flagship blocking/pair stages by mapping (id, text) onto the
  pipeline's (url, text) column contract).
- :func:`simhash_dup_pairs` — 64-bit SimHash, 4x16-bit band blocking
  (guarantees recall for Hamming distance <= 3), Hamming verify.
- :func:`embedding_dup_pairs` — random-hyperplane LSH buckets over an
  embedding column + exact cosine verify.

All return canonical pair tables (``id_a < id_b``) or keep-lists;
every stage is map_batches / bucketed-groupby (no driver loops).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import BlockingConfig, ScoringConfig
from ..functions.similarity import (
    MinHasher, batch_shingle_sets, hamming64,
    jaccard_pairs_from_binary, simhash64, stable_hash_strings,
)
from ..functions.textnorm import normalize_text_series
from .shuffle import bucketed_map_groups


def exact_dedup(ds, text_col: str, id_col: str, num_buckets: int = 64):
    """Keep one row per distinct ``text_col`` value: the min ``id_col``
    (deterministic, not order-dependent FIRST). Returns (id, text)."""
    projected = ds.select_columns([id_col, text_col])

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values([text_col, id_col], kind="mergesort")
                  .drop_duplicates([text_col], keep="first"))

    return bucketed_map_groups(projected, [text_col], pick, num_buckets)


def _doc_features(ds, id_col: str, text_col: str, blocking: BlockingConfig,
                  normalize: bool = True):
    """(id, shingles binary, sig binary) features for near-dup search.

    Stored shingle/sig values are uint32 equality tokens (same storage
    contract as the flagship ``SignatureStage`` — see its docstring)."""
    hasher = MinHasher(blocking.num_bands, blocking.rows_per_band,
                       blocking.minhash_seed)
    k = blocking.shingle_k

    def feats(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pandas()
        if normalize:
            texts = normalize_text_series(texts).fillna("")
        else:
            texts = texts.fillna("")
        sets = batch_shingle_sets(texts.tolist(), k)
        sigs = hasher.signatures(sets).astype(np.uint32)
        sets32 = [np.unique(s.astype(np.uint32)) for s in sets]
        return pa.table({
            "url": batch.column(id_col).cast(pa.string()),
            "shingles": pa.array([s.tobytes() for s in sets32], pa.binary()),
            # fixed-size binary: zero-copy matrix reads downstream
            "sig": pa.Array.from_buffers(
                pa.binary(sigs.shape[1] * 4), len(sigs),
                [None, pa.py_buffer(np.ascontiguousarray(sigs)
                                    .tobytes())]),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        feats, batch_format="pyarrow")


def near_dup_pairs(ds, id_col: str, text_col: str,
                   blocking: BlockingConfig = BlockingConfig(),
                   scoring: ScoringConfig = ScoringConfig(),
                   normalize: bool = True):
    """MinHash-LSH near-duplicate pairs with exact-Jaccard verify.

    Returns (id_a, id_b, est_jaccard, jaccard) for pairs with
    ``jaccard >= scoring.jaccard_threshold``. Ids are compared as
    strings — zero-pad numeric ids upstream if ordering matters.
    """
    from .blocking import emit_band_keys
    from .pairs import generate_candidate_pairs
    from .scoring import hydrate_pairs

    features = _doc_features(ds, id_col, text_col, blocking,
                             normalize).materialize()
    bands = emit_band_keys(features, blocking, include_bands=False)
    # row hint (free: features is materialized) lets the pair stage
    # pick the materialize-once + task-shuffle plan below the cap
    pairs = generate_candidate_pairs(
        bands, blocking, scoring,
        n_rows_hint=features.count() * blocking.num_bands,
        dedup_pairs=True)

    feats_join = features.map_batches(
        lambda t: pa.table({"url": t.column("url"),
                            "title_norm": pa.nulls(len(t), pa.string()),
                            "text_head": pa.nulls(len(t), pa.string()),
                            "shingles": t.column("shingles"),
                            "sig": t.column("sig")}),
        batch_format="pyarrow")
    hydrated = hydrate_pairs(pairs, feats_join,
                             est_prefilter=scoring.est_prefilter)

    thresh = scoring.jaccard_threshold

    def verify(batch: pa.Table) -> pa.Table:
        jac = jaccard_pairs_from_binary(batch.column("shingles_a"),
                                        batch.column("shingles_b"),
                                        dtype=np.uint32)
        out = pa.table({
            "id_a": batch.column("url_a"),
            "id_b": batch.column("url_b"),
            "est_jaccard": batch.column("est_jaccard"),
            "jaccard": pa.array(jac),
        })
        return out.filter(pa.compute.greater_equal(out.column("jaccard"),
                                                   pa.scalar(thresh)))

    return hydrated.map_batches(verify, batch_format="pyarrow")


def dedup_keep_list(ds, id_col: str, text_col: str, **kwargs):
    """Near-dup dedup decision: cluster dup pairs transitively and keep
    the min id per component; returns (id, keep: bool)."""
    from ..config import ClusterConfig
    from .cluster import assign_clusters, connected_components

    pairs = near_dup_pairs(ds, id_col, text_col, **kwargs)
    edges = pairs.map_batches(
        lambda t: pa.table({"u": t.column("id_a"), "v": t.column("id_b")}),
        batch_format="pyarrow")
    star = connected_components(edges, ClusterConfig())
    ids = ds.select_columns([id_col]).map_batches(
        lambda t: pa.table({"url": t.column(id_col).cast(pa.string())}),
        batch_format="pyarrow")
    assigns = assign_clusters(ids, star)

    def keep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "id": batch.column("url"),
            "cluster_id": batch.column("cluster_id"),
            "keep": pa.compute.equal(batch.column("url"),
                                     batch.column("cluster_id")),
        })

    return assigns.map_batches(keep, batch_format="pyarrow")


def simhash_dup_pairs(ds, id_col: str, text_col: str,
                      max_hamming: int = 3, num_buckets: int = 128,
                      normalize: bool = True):
    """SimHash near-dup pairs: 4x16-bit band blocking + Hamming verify.

    Splitting the 64-bit fingerprint into 4 bands guarantees that any
    pair within Hamming distance 3 shares at least one exact band
    (pigeonhole) — recall 1.0 for the advertised radius.
    """

    def sim_features(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pandas()
        texts = (normalize_text_series(texts) if normalize else texts).fillna("")
        sets = batch_shingle_sets(texts.tolist())
        sh = simhash64(sets)
        n = len(batch)
        ids = batch.column(id_col).cast(pa.string())
        band_id = np.tile(np.arange(4, dtype=np.int32), n)
        chunks = np.column_stack([
            (sh >> np.uint64(16 * b)) & np.uint64(0xFFFF) for b in range(4)
        ]).reshape(-1)
        idx = np.repeat(np.arange(n), 4)
        return pa.table({
            "band_id": pa.array(band_id),
            "band_hash": pa.array(chunks.astype(np.int64)),
            "id": ids.take(pa.array(idx)),
            "simhash": pa.array(np.repeat(sh.view(np.int64), 4)),
        })

    bands = ds.select_columns([id_col, text_col]).map_batches(
        sim_features, batch_format="pyarrow")

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        rows_a, rows_b, hams = [], [], []
        for _, g in df.groupby(["band_id", "band_hash"], sort=False):
            if len(g) < 2:
                continue
            ids = g["id"].to_numpy(dtype=object)
            sims = g["simhash"].to_numpy().astype(np.int64).view(np.uint64)
            i, j = np.triu_indices(len(g), k=1)
            d = hamming64(sims[i], sims[j])
            ok = d <= max_hamming
            a, b = ids[i[ok]], ids[j[ok]]
            swap = a > b
            rows_a.extend(np.where(swap, b, a).tolist())
            rows_b.extend(np.where(swap, a, b).tolist())
            hams.extend(d[ok].tolist())
        return pd.DataFrame({"id_a": pd.Series(rows_a, dtype=object),
                             "id_b": pd.Series(rows_b, dtype=object),
                             "hamming": pd.Series(hams, dtype="int64")})

    _empty = pd.DataFrame({"id_a": pd.Series([], dtype="string"),
                           "id_b": pd.Series([], dtype="string"),
                           "hamming": pd.Series([], dtype="int64")})
    pairs = bucketed_map_groups(bands, ["band_id", "band_hash"],
                                bucket_pairs, num_buckets,
                                empty_like=_empty)

    def dd(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["id_a", "id_b"])

    return bucketed_map_groups(pairs, ["id_a", "id_b"], dd, num_buckets,
                               empty_like=_empty)


def embedding_dup_pairs(ds, id_col: str, vec_col: str,
                        cosine_threshold: float = 0.95,
                        n_planes: int = 12, n_tables: int = 4,
                        seed: int = 7, num_buckets: int = 128):
    """Embedding near-dup: random-hyperplane LSH buckets + exact cosine.

    Each table hashes the normalized vector to an ``n_planes``-bit
    sign key; candidates share a key in any table; verify exact cosine.
    """
    def feats(batch: pa.Table) -> pa.Table:
        vecs = np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float64)
        n, d = vecs.shape
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        unit = vecs / np.maximum(norms, 1e-12)
        local_rng = np.random.default_rng(seed)
        keys, tables, ids_rep, vec_rep = [], [], [], []
        ids = batch.column(id_col).cast(pa.string())
        for t in range(n_tables):
            pl = local_rng.standard_normal((d, n_planes))
            bits = (unit @ pl) > 0
            key = np.zeros(n, dtype=np.int64)
            for b in range(n_planes):
                key = key * 2 + bits[:, b]
            keys.append(key)
            tables.append(np.full(n, t, dtype=np.int32))
        idx = np.tile(np.arange(n), n_tables)
        return pa.table({
            "band_id": pa.array(np.concatenate(tables)),
            "band_hash": pa.array(np.concatenate(keys)),
            "id": ids.take(pa.array(idx)),
            "vec": pa.array([unit[i].tobytes() for i in idx], pa.binary()),
        })

    bands = ds.select_columns([id_col, vec_col]).map_batches(
        feats, batch_format="pyarrow")

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        rows_a, rows_b, sims_out = [], [], []
        for _, g in df.groupby(["band_id", "band_hash"], sort=False):
            if len(g) < 2:
                continue
            ids = g["id"].to_numpy(dtype=object)
            vecs = np.stack([np.frombuffer(b, dtype=np.float64)
                             for b in g["vec"]])
            sims = vecs @ vecs.T
            i, j = np.triu_indices(len(g), k=1)
            ok = sims[i, j] >= cosine_threshold
            a, b = ids[i[ok]], ids[j[ok]]
            swap = a > b
            rows_a.extend(np.where(swap, b, a).tolist())
            rows_b.extend(np.where(swap, a, b).tolist())
            sims_out.extend(sims[i, j][ok].tolist())
        return pd.DataFrame({"id_a": pd.Series(rows_a, dtype=object),
                             "id_b": pd.Series(rows_b, dtype=object),
                             "cosine": pd.Series(sims_out, dtype="float64")})

    _empty = pd.DataFrame({"id_a": pd.Series([], dtype="string"),
                           "id_b": pd.Series([], dtype="string"),
                           "cosine": pd.Series([], dtype="float64")})
    pairs = bucketed_map_groups(bands, ["band_id", "band_hash"],
                                bucket_pairs, num_buckets,
                                empty_like=_empty)

    def dd(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["id_a", "id_b"])

    return bucketed_map_groups(pairs, ["id_a", "id_b"], dd, num_buckets,
                               empty_like=_empty)


def ngram_jaccard_pairs(ds, id_col: str, text_col: str, block_col: str,
                        n: int = 1, threshold: float = 0.5,
                        num_buckets: int = 64, rows_hint: int | None = None,
                        broadcast_threshold: int = 2_000_000):
    """Token n-gram Jaccard near-dup pairs within an exact blocking key.

    Routed through the SALTED candidate-pair generator
    (``stages/pairs.py``): a skewed ``block_col`` key above the hot-key
    cap is split into salt triangle groups (pair set identical to the
    plain groupby — pinned by tests), and degenerate groups above
    ``MAX_SIDE`` fall back to star+chain pairing (bounded, documented
    recall cap).  The round-1 version ran an unsalted O(m^2) Python
    loop per block — a scale-killer on skewed keys.

    Verification hydrates the (id, token-set) features adaptively —
    below ``broadcast_threshold`` docs from a broadcast sorted-hash
    lookup (``ray.put`` once, zero-copy per task), above it via two
    hash-partitioned ``Dataset.join``s (the same crossover the
    flagship's ``scoring.hydrate_pairs`` makes) — and computes exact
    Jaccard with the vectorized packed-pair kernel.  Both strategies
    produce identical pairs (pinned by tests).

    Returns (id_a, id_b, jac) for within-block pairs with token
    n-gram-set Jaccard >= ``threshold``; pair order = ascending id.
    Reference analogue: equi-key candidate join
    ``query_db/repository.py:297-314`` + fuzzy post-filter.
    """
    import ray

    from ..functions.similarity import _rolling_combine
    from .pairs import generate_candidate_pairs

    def feats(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        sets = []
        for t in texts:
            toks = (t or "").split()
            if not toks:
                sets.append(b"")
                continue
            h = np.unique(_rolling_combine(stable_hash_strings(toks), n))
            sets.append(h.tobytes())
        ids = batch.column(id_col)
        uh = stable_hash_strings(
            np.array([str(v) for v in ids.to_pylist()], dtype=object))
        bh = stable_hash_strings(
            batch.column(block_col).cast(pa.string()).to_pandas()
            .fillna("").to_numpy(dtype=object)).view(np.int64)
        return pa.table({
            "id": ids,
            "uh": pa.array(uh, pa.uint64()),
            "band_hash": pa.array(bh, pa.int64()),
            "toks": pa.array(sets, pa.binary()),
        })

    prepped = ds.select_columns([id_col, text_col, block_col]).map_batches(
        feats, batch_format="pyarrow").materialize()

    blocking = BlockingConfig(num_buckets=num_buckets)
    bands = prepped.select_columns(["band_hash", "uh"])
    pairs = generate_candidate_pairs(
        bands, blocking,
        n_rows_hint=rows_hint if rows_hint is not None else prepped.count(),
        dedup_pairs=False)

    def _finish(ids_a: np.ndarray, ids_b: np.ndarray,
                toks_a, toks_b) -> pa.Table:
        jac = jaccard_pairs_from_binary(toks_a, toks_b)
        keep = jac >= threshold
        a, b, j = ids_a[keep], ids_b[keep], jac[keep]
        swap = a > b
        return pa.table({
            "id_a": pa.array(np.where(swap, b, a)),
            "id_b": pa.array(np.where(swap, a, b)),
            "jac": pa.array(np.round(j, 6), pa.float64()),
        })

    _EMPTY = pa.table({"id_a": pa.array([], pa.int64()),
                       "id_b": pa.array([], pa.int64()),
                       "jac": pa.array([], pa.float64())})

    if prepped.count() <= broadcast_threshold:
        # broadcast hydration: sorted uh + row-aligned (id, toks)
        tbl = pa.concat_tables(
            ray.get(list(prepped.to_arrow_refs()))).combine_chunks()
        uh_all = tbl.column("uh").to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        order = np.argsort(uh_all, kind="mergesort")
        h_ref = ray.put(np.ascontiguousarray(uh_all[order]))
        t_ref = ray.put(
            tbl.select(["id", "toks"]).take(pa.array(order))
            .combine_chunks())

        def verify(batch: pa.Table, _h=h_ref, _t=t_ref) -> pa.Table:
            if len(batch) == 0:
                return _EMPTY
            h = ray.get(_h)
            look = ray.get(_t)
            idx = {}
            for side in ("a", "b"):
                q = batch.column(f"uh_{side}").to_numpy(
                    zero_copy_only=False).astype(np.uint64)
                i = np.clip(np.searchsorted(h, q), 0, len(h) - 1)
                idx[side] = pa.array(i)
            return _finish(
                look.column("id").take(idx["a"]).to_numpy(
                    zero_copy_only=False),
                look.column("id").take(idx["b"]).to_numpy(
                    zero_copy_only=False),
                look.column("toks").take(idx["a"]),
                look.column("toks").take(idx["b"]))

        return pairs.map_batches(verify, batch_format="pyarrow")

    # distributed crossover: two hash-partitioned joins hydrate the
    # (id, toks) features per side — no whole-table driver collect
    cpus = int(ray.cluster_resources().get("CPU", 8))
    nparts = max(2, cpus // 2)
    feats = prepped.select_columns(["id", "uh", "toks"])
    a = pairs.join(feats, join_type="inner", num_partitions=nparts,
                   on=("uh_a",), right_on=("uh",))
    a = a.rename_columns({"id": "id_a", "toks": "toks_a"})
    b = a.join(feats, join_type="inner", num_partitions=nparts,
               on=("uh_b",), right_on=("uh",))
    b = b.rename_columns({"id": "id_b", "toks": "toks_b"})

    def verify_joined(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _EMPTY
        return _finish(
            batch.column("id_a").to_numpy(zero_copy_only=False),
            batch.column("id_b").to_numpy(zero_copy_only=False),
            batch.column("toks_a"), batch.column("toks_b"))

    return b.map_batches(verify_joined, batch_format="pyarrow")
