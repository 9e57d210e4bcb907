"""Pairwise scoring: exact shingle-Jaccard + Jaro-Winkler + Levenshtein.

Reference analogue: the fuzzy post-filter UDFs applied to join results
(``are_names_similar_udf`` / ``partial_ratio_udf``, ``query_db/udf.py:
11-59``, used in the linkage join ``repository.py:112-142``) — here
re-targeted to url/title/text per the north rule, vectorized:

- string kernels (Jaro-Winkler, Levenshtein) run inside an in-process
  DuckDB connection held by each scorer actor (``__init__``-once, the
  ST3 pattern) scanning the Arrow batch zero-copy — a C++ vectorized
  kernel, never a Python per-row loop;
- exact Jaccard is computed from the precomputed uint64 shingle sets.

Feature hydration: candidate pairs carry only urls + MinHash estimate;
features (title/text head/shingles) are joined back per side with
``Dataset.join`` (hash-partitioned equi-join) so the wide band-explode
shuffle never carries text.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import ScoringConfig
from ..functions.similarity import jaccard_pairs_from_binary


BROADCAST_FEATURE_ROWS = 2_000_000


def _build_lookup_task(cols, *blocks):
    """Remote body: concat feature blocks, sort by url hash, return
    (sorted hash array, row-aligned table)."""
    from ..functions.similarity import stable_hash_strings

    # combine_chunks: a 300-chunk concat makes every downstream .take
    # a per-index chunk walk (measured ~10x slower merges); one
    # contiguous chunk turns them into vectorized gathers
    tbl = pa.concat_tables(
        [b.select(cols) for b in blocks]).combine_chunks()
    key_hash = stable_hash_strings(
        tbl.column("url").to_pandas().to_numpy(dtype=object))
    order = np.argsort(key_hash, kind="mergesort")
    return (np.ascontiguousarray(key_hash[order]),
            tbl.take(pa.array(order)).combine_chunks())


def build_feature_lookup(features_ds,
                         broadcast_threshold: int = BROADCAST_FEATURE_ROWS):
    """Start building the broadcast (sorted-hash, row-aligned table)
    lookup for pair hydration; returns ``(h_ref, t_ref)`` object refs
    or None when the feature table is too large to broadcast.

    NON-BLOCKING: the build runs as one remote task (block refs are
    resolved zero-copy on the worker), so the driver can launch it
    before the candidate-pair stage and the build overlaps that
    stage's execution; consumers block on the refs naturally.
    """
    import ray

    cols = ["url", "title_norm", "text_head", "shingles", "sig"]
    feats = features_ds.materialize()
    if feats.count() > broadcast_threshold:
        return None
    fn = ray.remote(num_returns=2)(_build_lookup_task)
    h_ref, t_ref = fn.remote(cols, *feats.to_arrow_refs())
    return h_ref, t_ref


def hydrate_pairs(pairs_ds, features_ds, num_partitions: int | None = None,
                  broadcast_threshold: int = BROADCAST_FEATURE_ROWS,
                  est_prefilter: float | None = None,
                  prebuilt=None):
    """Join (url_a, url_b, est_jaccard) with per-side features.

    Adaptive join strategy (the Spark auto-broadcast idea): when the
    feature table is small enough to live in the object store
    (< ``broadcast_threshold`` rows), ship it ONCE via ``ray.put`` and
    hydrate both sides in a single map_batches pass — zero shuffles.
    Otherwise fall back to two hash-partitioned ``Dataset.join``s
    (``num_partitions`` defaults to half the cluster CPUs; each join
    partition is an aggregator actor and oversubscribing CPUs
    deadlocks a small cluster).
    """
    import ray

    from ..functions.similarity import stable_hash_strings

    cols = ["url", "title_norm", "text_head", "shingles", "sig"]

    lookup = prebuilt
    if lookup is None:
        lookup = build_feature_lookup(features_ds, broadcast_threshold)
    if lookup is not None:
        # two plasma objects, both zero-copy on every ray.get: a sorted
        # uint64 key array (searchsorted lookup) and the row-aligned
        # Arrow feature table.  Keeping `merge` a plain function lets
        # Ray fuse it into the scorer stage (no extra hop).
        h_ref, t_ref = lookup

        def merge(batch: pa.Table, _h=h_ref, _t=t_ref) -> pa.Table:
            h = ray.get(_h)
            tbl = ray.get(_t)
            n = len(batch) if len(h) else 0
            # resolve both hash sides against the sorted lookup, keep
            # rows where both hashes are present
            idx = {}
            ok = np.ones(n, dtype=bool)
            for side in ("a", "b"):
                uh = (batch.column(f"uh_{side}").to_numpy(
                    zero_copy_only=False).astype(np.uint64)[:n]
                    if n else np.empty(0, dtype=np.uint64))
                i = (np.clip(np.searchsorted(h, uh), 0, len(h) - 1)
                     if len(h) else np.zeros(0, dtype=np.int64))
                idx[side] = i
                if n:
                    ok &= h[i] == uh
            ia, ib = idx["a"][ok], idx["b"][ok]
            # restore urls and re-canonicalize lexicographically (the
            # pair stage canonicalized by hash value)
            url_a = tbl.column("url").take(pa.array(ia)).to_pandas() \
                .to_numpy(dtype=object)
            url_b = tbl.column("url").take(pa.array(ib)).to_pandas() \
                .to_numpy(dtype=object)
            swap = url_a > url_b
            ia2 = np.where(swap, ib, ia)
            ib2 = np.where(swap, ia, ib)
            out = pa.table({
                "url_a": pa.array(np.where(swap, url_b, url_a),
                                  pa.string()),
                "url_b": pa.array(np.where(swap, url_a, url_b),
                                  pa.string()),
            })
            from .blocking import binary_matrix

            sigs = {}
            for side, rows_idx in (("a", ia2), ("b", ib2)):
                rows = tbl.take(pa.array(rows_idx))
                sigs[side] = binary_matrix(rows.column("sig"))
                out = (out.append_column(f"title_{side}",
                                         rows.column("title_norm"))
                          .append_column(f"head_{side}",
                                         rows.column("text_head"))
                          .append_column(f"shingles_{side}",
                                         rows.column("shingles")))
            # MinHash Jaccard estimate, attached here rather than
            # shuffled with the band explode (bytes discipline)
            est = ((sigs["a"] == sigs["b"]).mean(axis=1)
                   if len(out) else np.empty(0, dtype=np.float64))
            out = out.append_column("est_jaccard",
                                    pa.array(est, pa.float64()))
            if est_prefilter is not None and len(out):
                out = out.filter(pa.array(est >= est_prefilter))
            return out

        return pairs_ds.map_batches(merge, batch_format="pyarrow")

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, cpus // 2)

    def add_uh(t: pa.Table) -> pa.Table:
        uh = stable_hash_strings(
            t.column("url").to_pandas().to_numpy(dtype=object))
        return t.append_column("uh", pa.array(uh, pa.uint64()))

    feats = features_ds.materialize().select_columns(cols).map_batches(
        add_uh, batch_format="pyarrow")
    a = pairs_ds.join(feats, join_type="inner",
                      num_partitions=num_partitions,
                      on=("uh_a",), right_on=("uh",))
    a = a.rename_columns({"title_norm": "title_a", "text_head": "head_a",
                          "shingles": "shingles_a", "sig": "sig_a",
                          "url": "url_a"})
    b = a.join(feats, join_type="inner", num_partitions=num_partitions,
               on=("uh_b",), right_on=("uh",))
    b = b.rename_columns({"title_norm": "title_b", "text_head": "head_b",
                          "shingles": "shingles_b", "sig": "sig_b",
                          "url": "url_b"})

    def add_est(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n:
            # re-canonicalize lexicographically by url: the pair stage
            # ordered by uh hash value, and the broadcast path swaps to
            # url_a < url_b — both join strategies must produce the
            # identical pair orientation (determinism across the
            # broadcast/distributed crossover)
            import pyarrow.compute as pc

            swap = pc.greater(batch.column("url_a"), batch.column("url_b"))
            if pc.any(swap).as_py():
                cols = {}
                for name in batch.schema.names:
                    if name.endswith("_a"):
                        other = name[:-2] + "_b"
                        cols[name] = pc.if_else(swap, batch.column(other),
                                                batch.column(name))
                    elif name.endswith("_b"):
                        other = name[:-2] + "_a"
                        cols[name] = pc.if_else(swap, batch.column(other),
                                                batch.column(name))
                    else:
                        cols[name] = batch.column(name)
                batch = pa.table(cols)
        if n == 0:
            est = np.empty(0, dtype=np.float64)
        else:
            from .blocking import binary_matrix

            sa = binary_matrix(batch.column("sig_a"))
            sb = binary_matrix(batch.column("sig_b"))
            est = (sa == sb).mean(axis=1)
        drop = [c for c in ("sig_a", "sig_b", "uh_a", "uh_b")
                if c in batch.schema.names]
        out = batch.drop_columns(drop).append_column(
            "est_jaccard", pa.array(est, pa.float64()))
        if est_prefilter is not None and len(out):
            out = out.filter(pa.compute.greater_equal(
                out.column("est_jaccard"), pa.scalar(est_prefilter)))
        return out

    return b.map_batches(add_est, batch_format="pyarrow")


# per-worker-process scorer cache for task-mode fused scoring (same
# load-once semantics as an actor pool __init__; ScoringConfig is a
# frozen dataclass, so it keys the cache directly)
_FUSED_STATE: dict = {}


def _cached_scorer(scoring):
    sc = _FUSED_STATE.get(scoring)
    if sc is None:
        sc = _FUSED_STATE[scoring] = PairScorer(scoring or ScoringConfig())
    return sc


def _task_score(batch: pa.Table, scoring=None) -> pa.Table:
    return _cached_scorer(scoring)(batch)


def _fused_hydrate_score(batch: pa.Table, h_ref=None, t_ref=None,
                         scoring=None, est_prefilter=None) -> pa.Table:
    """Fused broadcast-hydrate + score over one candidate-pair batch.

    Identical semantics to ``hydrate_pairs``'s broadcast ``merge``
    followed by ``PairScorer``, but the wide hydrated intermediate
    (shingles/title/head per side, ~2.4 KB/row measured on the bench
    corpus vs ~0.15 KB/row scored) lives only in this task's heap — it
    is never written to the object store.  The est-prefilter runs
    BEFORE the wide gathers, so filtered pairs never gather their
    shingle/text payloads at all.  Measured motivation: the gather +
    intermediate materialization was the dominant cost of the
    score+components segment (hydrate 9.9 s vs score 0.6 s + CC 0.4 s
    on 198k pairs at 32 CPUs).
    """
    import ray

    h = ray.get(h_ref)
    tbl = ray.get(t_ref)
    n = len(batch) if len(h) else 0
    idx = {}
    ok = np.ones(n, dtype=bool)
    for side in ("a", "b"):
        uh = (batch.column(f"uh_{side}").to_numpy(
            zero_copy_only=False).astype(np.uint64)[:n]
            if n else np.empty(0, dtype=np.uint64))
        i = (np.clip(np.searchsorted(h, uh), 0, len(h) - 1)
             if len(h) else np.zeros(0, dtype=np.int64))
        idx[side] = i
        if n:
            ok &= h[i] == uh
    ia, ib = idx["a"][ok], idx["b"][ok]
    urls = tbl.column("url")
    url_a = urls.take(pa.array(ia)).to_pandas().to_numpy(dtype=object)
    url_b = urls.take(pa.array(ib)).to_pandas().to_numpy(dtype=object)
    # re-canonicalize lexicographically (the pair stage ordered by hash)
    swap = url_a > url_b
    ia2 = np.where(swap, ib, ia)
    ib2 = np.where(swap, ia, ib)
    ua = np.where(swap, url_b, url_a)
    ub = np.where(swap, url_a, url_b)

    from .blocking import binary_matrix

    sig_a = binary_matrix(tbl.column("sig").take(pa.array(ia2)))
    sig_b = binary_matrix(tbl.column("sig").take(pa.array(ib2)))
    est = ((sig_a == sig_b).mean(axis=1)
           if len(ia2) else np.empty(0, dtype=np.float64))
    if est_prefilter is not None and len(ia2):
        keep = est >= est_prefilter
        ia2, ib2, ua, ub, est = (ia2[keep], ib2[keep], ua[keep],
                                 ub[keep], est[keep])
    iarr_a, iarr_b = pa.array(ia2), pa.array(ib2)
    hydrated = pa.table({
        "url_a": pa.array(ua, pa.string()),
        "url_b": pa.array(ub, pa.string()),
        "title_a": tbl.column("title_norm").take(iarr_a),
        "title_b": tbl.column("title_norm").take(iarr_b),
        "head_a": tbl.column("text_head").take(iarr_a),
        "head_b": tbl.column("text_head").take(iarr_b),
        "shingles_a": tbl.column("shingles").take(iarr_a),
        "shingles_b": tbl.column("shingles").take(iarr_b),
        "est_jaccard": pa.array(est, pa.float64()),
    })
    return _cached_scorer(scoring)(hydrated)


def hydrate_score_pairs(pairs_ds, features_ds, scoring=None,
                        est_prefilter: float | None = None, prebuilt=None,
                        broadcast_threshold: int = BROADCAST_FEATURE_ROWS):
    """Hydrate candidate pairs and score them in ONE fused map_batches.

    Broadcast path: resolves both pair sides against the shared
    (sorted-hash, row-aligned-table) lookup and emits the final scored
    schema directly — the wide hydrated intermediate never crosses an
    operator boundary.  When the feature table exceeds the broadcast
    threshold, falls back to the distributed ``hydrate_pairs`` joins
    followed by a per-worker-cached ``PairScorer`` task stage (still no
    actor-pool ramp; the scorer fuses onto the join output).
    """
    from functools import partial

    lookup = prebuilt
    if lookup is None:
        lookup = build_feature_lookup(features_ds, broadcast_threshold)
    if lookup is None:
        hyd = hydrate_pairs(pairs_ds, features_ds,
                            est_prefilter=est_prefilter)
        return hyd.map_batches(partial(_task_score, scoring=scoring),
                               batch_format="pyarrow")
    h_ref, t_ref = lookup
    fn = partial(_fused_hydrate_score, h_ref=h_ref, t_ref=t_ref,
                 scoring=scoring, est_prefilter=est_prefilter)
    return pairs_ds.map_batches(fn, batch_format="pyarrow")


class PairScorer:
    """Actor-pool batch callable over hydrated pairs.

    Emits ``jaccard`` (exact, shingle sets), ``jw_title``, ``jw_url``,
    ``lev_head_sim`` (1 - lev/maxlen over normalized text heads),
    ``is_match`` (jaccard >= threshold) and ``match_status``
    (M14-analogue classification).
    """

    def __init__(self, cfg: ScoringConfig = ScoringConfig()):
        import duckdb

        self.cfg = cfg
        self.con = duckdb.connect()
        # one DuckDB thread per scorer worker: each Ray task owns one
        # CPU, and letting every task's DuckDB spawn a full thread pool
        # oversubscribes the node ~32x at the scoring stage (the
        # reference pins the same pragma, query_db/db.py:13)
        self.con.execute("PRAGMA threads=1")

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return _empty_scored()
        jac = jaccard_pairs_from_binary(batch.column("shingles_a"),
                                        batch.column("shingles_b"),
                                        dtype=np.uint32)

        view = batch.select(["url_a", "url_b", "title_a", "title_b",
                             "head_a", "head_b"])
        self.con.register("pairs_batch", view)
        scored = self.con.execute(
            """
            SELECT
              jaro_winkler_similarity(coalesce(title_a,''), coalesce(title_b,'')) AS jw_title,
              jaro_winkler_similarity(url_a, url_b) AS jw_url,
              1.0 - levenshtein(coalesce(head_a,''), coalesce(head_b,''))
                    / greatest(length(coalesce(head_a,'')),
                               length(coalesce(head_b,'')), 1) AS lev_head_sim
            FROM pairs_batch
            """).arrow()
        self.con.unregister("pairs_batch")

        thresh = self.cfg.jaccard_threshold
        is_match = jac >= thresh
        status = np.where(jac >= 0.9, "near_exact",
                          np.where(is_match, "text_match", "no_match"))
        return pa.table({
            "url_a": batch.column("url_a"),
            "url_b": batch.column("url_b"),
            "est_jaccard": batch.column("est_jaccard"),
            "jaccard": pa.array(jac),
            "jw_title": scored.column("jw_title"),
            "jw_url": scored.column("jw_url"),
            "lev_head_sim": scored.column("lev_head_sim"),
            "is_match": pa.array(is_match),
            "match_status": pa.array(status.tolist(), pa.string()),
        })


def _empty_scored() -> pa.Table:
    return pa.table({
        "url_a": pa.array([], pa.string()),
        "url_b": pa.array([], pa.string()),
        "est_jaccard": pa.array([], pa.float64()),
        "jaccard": pa.array([], pa.float64()),
        "jw_title": pa.array([], pa.float64()),
        "jw_url": pa.array([], pa.float64()),
        "lev_head_sim": pa.array([], pa.float64()),
        "is_match": pa.array([], pa.bool_()),
        "match_status": pa.array([], pa.string()),
    })


def score_pairs(hydrated_ds, cfg: ScoringConfig = ScoringConfig(),
                batch_size: int = 4096, concurrency=(1, 8)):
    return hydrated_ds.map_batches(
        PairScorer, fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


class BroadcastFuzzyJoin:
    """Fuzzy theta-join of a stream against a SMALL broadcast string list
    (reference J7 entity-validation cross join, ``repository.py:569-581``,
    and the F1/F2 fuzzy-UDF slot).

    The right side ships once via ``ray.put``; each actor loads it into
    an in-process DuckDB table in ``__init__`` and cross-joins every
    Arrow batch against it with the C++ ``jaro_winkler_similarity``
    kernel — no shuffle, no per-row Python.
    """

    def __init__(self, names_ref, threshold: float = 0.85,
                 col: str = "name"):
        import duckdb
        import ray

        self.con = duckdb.connect()
        self.con.execute("PRAGMA threads=1")
        self.col = col
        self.threshold = float(threshold)
        names = ray.get(names_ref)
        self.con.register(
            "rhs", pa.table({"name_b": pa.array(names, pa.string())}))

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"name_a": pa.array([], pa.string()),
                             "name_b": pa.array([], pa.string()),
                             "jw": pa.array([], pa.float64())})
        self.con.register("lhs", batch.select([self.col]))
        out = self.con.execute(
            f"""
            SELECT {self.col} AS name_a, name_b,
                   round(jaro_winkler_similarity({self.col}, name_b), 6) AS jw
            FROM lhs, rhs
            WHERE {self.col} < name_b
              AND jaro_winkler_similarity({self.col}, name_b) >= {self.threshold}
            """).arrow()
        self.con.unregister("lhs")
        return out


def fellegi_sunter(pairs, spec, upper: float, lower: float,
                   weight_col: str = "fs_weight",
                   decision_col: str = "decision"):
    """Fellegi-Sunter probabilistic record linkage (Fellegi & Sunter
    1969, the canonical ER decision model; public algorithm) over a
    candidate-pair Dataset that already carries boolean per-field
    agreement indicators.

    ``spec``: ``{indicator_col: (m, u)}`` — m = P(agree | match),
    u = P(agree | non-match).  Weight = Σ_field log2(m/u) on agreement
    else log2((1-m)/(1-u)); decision = link / possible / non_link by
    the (upper, lower) thresholds.  Map-only and vectorized — candidate
    generation (the expensive part) stays in the blocking machinery,
    which is the reference's own factoring (J1 joins feed the fuzzy
    filter, SURVEY §2.4).

    Determinism: the per-field log weights are computed ONCE here and
    added left-to-right in ``spec`` order, so a SQL oracle embedding
    the same literals in the same order sums bit-identically.
    """
    import numpy as np

    logs = [(c, float(np.log2(m / u)), float(np.log2((1 - m) / (1 - u))))
            for c, (m, u) in spec.items()]

    def score(df: pd.DataFrame) -> pd.DataFrame:
        w = np.zeros(len(df), dtype=np.float64)
        for c, la, ld in logs:
            w = w + np.where(df[c].to_numpy(dtype=bool), la, ld)
        out = df.copy()
        out[weight_col] = w
        out[decision_col] = np.where(
            w >= upper, "link",
            np.where(w >= lower, "possible", "non_link"))
        return out

    return pairs.map_batches(score, batch_format="pandas")


def fs_log_weights(spec) -> list[tuple[str, float, float]]:
    """The (col, agree, disagree) log2 weights ``fellegi_sunter`` uses —
    exposed so oracles can embed the identical literals."""
    import numpy as np

    return [(c, float(np.log2(m / u)),
             float(np.log2((1 - m) / (1 - u))))
            for c, (m, u) in spec.items()]


class BroadcastAttrPairJoin:
    """Candidate pairs with BOTH sides' attributes: the stream cross-
    joins a small broadcast attribute table per actor (DuckDB C++
    kernels, the BroadcastFuzzyJoin pattern) under an ``a < b`` name
    ordering and a Jaro-Winkler gate, emitting per-field agreement
    indicators ready for :func:`fellegi_sunter`."""

    def __init__(self, rhs_ref, gate: float = 0.9,
                 name_eq_threshold: float = 0.97):
        import duckdb
        import ray

        self.con = duckdb.connect()
        self.con.execute("PRAGMA threads=1")
        self.gate = float(gate)
        self.thr = float(name_eq_threshold)
        self.con.register("rhs", ray.get(rhs_ref))

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({
                "name_a": pa.array([], pa.string()),
                "name_b": pa.array([], pa.string()),
                "jw": pa.array([], pa.float64()),
                "ind_name": pa.array([], pa.bool_()),
                "ind_nation": pa.array([], pa.bool_()),
                "ind_seg": pa.array([], pa.bool_()),
            })
        self.con.register("lhs", batch)
        out = self.con.execute(f"""
            SELECT l.name AS name_a, r.name AS name_b,
                   round(jaro_winkler_similarity(l.name, r.name), 6) AS jw,
                   (jaro_winkler_similarity(l.name, r.name)
                        >= {self.thr}) AS ind_name,
                   (l.nation = r.nation) AS ind_nation,
                   (l.seg = r.seg) AS ind_seg
            FROM lhs l, rhs r
            WHERE l.name < r.name
              AND jaro_winkler_similarity(l.name, r.name) >= {self.gate}
            """).arrow()
        self.con.unregister("lhs")
        return out


def fs_em(pairs, indicator_cols, iters: int = 100, tol: float = 1e-12,
          init_m: float = 0.8, init_u: float = 0.1,
          init_lambda: float = 0.1):
    """EM estimation of Fellegi-Sunter m/u/λ parameters (Winkler 1988;
    the Splink-style public formulation) from boolean agreement
    indicators.

    Scale shape: the boolean-pattern likelihood depends on rows only
    through their agreement PATTERN, so the sufficient statistic is the
    2^k pattern histogram — ONE distributed combiner pass (per-batch
    bincount partials, driver merge of ≤ 2^k × blocks tiny rows), then
    EM iterates entirely on the k-field pattern table driver-side.
    10^12 candidate pairs cost exactly one data pass.

    Returns ``(params, patterns)``: params dict with ``m``, ``u``
    (np.ndarray per field), ``lambda_``, ``n_pairs``, ``n_iter``;
    patterns the (pattern_id, count) DataFrame.
    """
    import numpy as np
    import pandas as pd

    from .relational import partial_groupby_agg

    k = len(indicator_cols)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        pid = np.zeros(len(df), dtype=np.int64)
        for i, c in enumerate(indicator_cols):
            pid |= df[c].to_numpy(dtype=bool).astype(np.int64) << i
        counts = np.bincount(pid, minlength=2 ** k)
        nz = np.flatnonzero(counts)
        return pd.DataFrame({"pattern": nz, "n": counts[nz]})

    patterns = partial_groupby_agg(pairs.map_batches(part,
                                                     batch_format="pandas"),
                                   ["pattern"], {"n": ("n", "sum")})
    pid = patterns["pattern"].to_numpy(np.int64)
    n_g = patterns["n"].to_numpy(np.float64)
    bits = ((pid[:, None] >> np.arange(k)[None, :]) & 1).astype(np.float64)
    n_total = n_g.sum()

    m = np.full(k, init_m)
    u = np.full(k, init_u)
    lam = float(init_lambda)
    it = 0
    for it in range(1, iters + 1):
        pm = np.prod(np.where(bits == 1, m[None, :], 1 - m[None, :]),
                     axis=1)
        pu = np.prod(np.where(bits == 1, u[None, :], 1 - u[None, :]),
                     axis=1)
        w = lam * pm / (lam * pm + (1 - lam) * pu)
        wm = (n_g * w)
        wu = (n_g * (1 - w))
        new_lam = wm.sum() / n_total
        new_m = (wm[:, None] * bits).sum(axis=0) / max(wm.sum(), 1e-300)
        new_u = (wu[:, None] * bits).sum(axis=0) / max(wu.sum(), 1e-300)
        delta = max(abs(new_lam - lam), np.abs(new_m - m).max(),
                    np.abs(new_u - u).max())
        lam, m, u = new_lam, new_m, new_u
        if delta < tol:
            break
    return ({"m": m, "u": u, "lambda_": lam,
             "n_pairs": int(n_total), "n_iter": it}, patterns)


class ValueStandardizer:
    """Attribute standardization against a canonical dictionary — the
    classic ER preprocessing step (country/org/category names with
    typos folded onto their canonical spelling before blocking).

    The canonical list ships once via ``ray.put``; each actor loads it
    into an in-process DuckDB table in ``__init__`` (the ST3
    per-worker-state pattern) and resolves each batch's DISTINCT
    values with one cross join + argmax on the C++
    ``jaro_winkler_similarity`` kernel — ties by the smallest
    canonical, values below ``threshold`` pass through unchanged.
    Because the scorer IS DuckDB's kernel, a SQL oracle reproduces the
    operator bit-for-bit.  Contract: ``col`` non-null (coalesce
    upstream); canonical list config-scale (every distinct batch value
    is compared to all of it).
    """

    def __init__(self, canon_ref, col: str = "val", out_col: str = "std",
                 threshold: float = 0.85):
        import duckdb
        import ray

        self.con = duckdb.connect()
        self.con.execute("PRAGMA threads=1")
        self.col = col
        self.out_col = out_col
        self.threshold = float(threshold)
        canon = ray.get(canon_ref)
        self.con.register(
            "canon", pa.table({"canon": pa.array(canon, pa.string())}))

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column(
                self.out_col, pa.array([], pa.string())).append_column(
                "std_jw", pa.array([], pa.float64())).append_column(
                "std_matched", pa.array([], pa.bool_()))
        self.con.register("lhs", batch)
        out = self.con.execute(f"""
            WITH vals AS (SELECT DISTINCT {self.col} AS val FROM lhs),
            best AS (
              SELECT val, canon,
                     jaro_winkler_similarity(val, canon) AS jw,
                     row_number() OVER (PARTITION BY val
                         ORDER BY jaro_winkler_similarity(val, canon)
                             DESC, canon) AS rk
              FROM vals CROSS JOIN canon)
            SELECT l.*,
                   CASE WHEN b.jw >= {self.threshold} THEN b.canon
                        ELSE l.{self.col} END AS {self.out_col},
                   round(b.jw, 6) AS std_jw,
                   b.jw >= {self.threshold} AS std_matched
            FROM lhs l JOIN best b ON b.val = l.{self.col} AND b.rk = 1
            """).arrow()
        self.con.unregister("lhs")
        return out


def standardize_values(ds, canon: list[str], col: str, out_col: str = "std",
                       threshold: float = 0.85, batch_size: int = 8192,
                       concurrency=(1, 8)):
    """Actor-pool wrapper for :class:`ValueStandardizer` (canonical
    list broadcast once, loaded per actor)."""
    import ray

    canon_ref = ray.put(list(canon))
    return ds.map_batches(
        ValueStandardizer,
        fn_constructor_kwargs={"canon_ref": canon_ref, "col": col,
                               "out_col": out_col, "threshold": threshold},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


class MongeElkanScorer:
    """Monge-Elkan token-level name similarity (Monge & Elkan 1996):
    ``ME(A, B) = mean over A's tokens of max_b JW(tok_a, tok_b)`` —
    the token-alignment scorer that survives word reorder and partial
    corruption where whole-string JW collapses.  Distinct-token
    semantics (duplicate tokens in A collapse before the mean — the
    same GROUP BY the oracle uses).

    ST3 pattern: per-worker in-process DuckDB; each batch registers
    once and one SQL pass does split -> unnest -> per-token max JW ->
    per-pair mean on the C++ kernel, so the oracle reproduces scores
    bit-for-bit (same engine)."""

    def __init__(self, a_col: str = "name_a", b_col: str = "name_b",
                 id_col: str = "pair_id"):
        import duckdb

        self.con = duckdb.connect()
        self.con.execute("PRAGMA threads=1")
        self.a, self.b, self.id = a_col, b_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({self.id: pa.array([], pa.int64()),
                             "monge_elkan": pa.array([], pa.float64())})
        self.con.register("lhs", batch)
        out = self.con.execute(f"""
            WITH ta AS (SELECT {self.id} AS pid,
                               unnest(string_split({self.a}, ' ')) AS tok
                        FROM lhs),
            tb AS (SELECT {self.id} AS pid,
                          unnest(string_split({self.b}, ' ')) AS tok
                   FROM lhs),
            best AS (SELECT ta.pid, ta.tok,
                            max(jaro_winkler_similarity(ta.tok, tb.tok))
                                AS b
                     FROM ta JOIN tb ON tb.pid = ta.pid
                     GROUP BY 1, 2)
            SELECT pid AS {self.id}, round(avg(b), 6) AS monge_elkan
            FROM best GROUP BY 1
            """).arrow()
        self.con.unregister("lhs")
        return out


def monge_elkan_scores(pairs, a_col: str = "name_a",
                       b_col: str = "name_b", id_col: str = "pair_id",
                       batch_size: int = 8192, concurrency=(1, 8)):
    """Actor-pool wrapper for :class:`MongeElkanScorer`."""
    return pairs.map_batches(
        MongeElkanScorer,
        fn_constructor_kwargs={"a_col": a_col, "b_col": b_col,
                               "id_col": id_col},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


class SoftTfidfScorer:
    """Soft TF-IDF hybrid name similarity (Cohen, Ravikumar &
    Fienberg 2003): ``sum over a in A with max-JW partner >= theta of
    V(a,A) * V(b*,B) * JW(a,b*)`` where V are L2-normalized
    log-TF x log-IDF token weights over the NAME CORPUS — the hybrid
    scorer that beats both pure-token (TF-IDF cosine) and pure-edit
    (JW) metrics on noisy person/org names in the published ER
    comparisons.

    ST3 pattern with a BROADCAST model: the per-token document
    frequency table (integers — exact) is computed distributedly by a
    combiner pass, ``ray.put`` once, and registered into each
    worker's in-process DuckDB at construction; each batch is one SQL
    pass (split -> TF -> weight -> per-token argmax JW with a fully
    ordered window -> normalized dot) on DuckDB's C++ kernels, so the
    oracle — the same SQL over the same integer inputs — reproduces
    scores bit-for-bit.  The argmax tie-break is total
    (s DESC, wb DESC, btok) so actor-vs-oracle row order cannot
    diverge."""

    def __init__(self, df_ref, n_names: int, theta: float = 0.9,
                 a_col: str = "name_a", b_col: str = "name_b",
                 id_col: str = "pair_id"):
        import duckdb
        import pandas as pd
        import ray

        self.con = duckdb.connect()
        self.con.execute("PRAGMA threads=1")
        df_tbl = ray.get(df_ref) if not isinstance(df_ref,
                                                   pd.DataFrame) else df_ref
        self.con.register("idf", pa.Table.from_pandas(df_tbl))
        self.n = int(n_names)
        self.theta = float(theta)
        self.a, self.b, self.id = a_col, b_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({self.id: pa.array([], pa.int64()),
                             "soft_tfidf": pa.array([], pa.float64())})
        self.con.register("lhs", batch)
        out = self.con.execute(f"""
            WITH ta AS (
              SELECT pid, tok, count(*) AS tf FROM (
                SELECT {self.id} AS pid,
                       unnest(string_split({self.a}, ' ')) AS tok
                FROM lhs) GROUP BY 1, 2),
            tb AS (
              SELECT pid, tok, count(*) AS tf FROM (
                SELECT {self.id} AS pid,
                       unnest(string_split({self.b}, ' ')) AS tok
                FROM lhs) GROUP BY 1, 2),
            va AS (SELECT pid, tok,
                          ln(tf + 1.0) * ln(1.0 + {self.n}.0
                              / coalesce(i.dfn, 1)) AS w
                   FROM ta LEFT JOIN idf i USING (tok)),
            vb AS (SELECT pid, tok,
                          ln(tf + 1.0) * ln(1.0 + {self.n}.0
                              / coalesce(i.dfn, 1)) AS w
                   FROM tb LEFT JOIN idf i USING (tok)),
            na AS (SELECT pid, sqrt(sum(w * w)) AS nrm FROM va
                   GROUP BY pid),
            nb AS (SELECT pid, sqrt(sum(w * w)) AS nrm FROM vb
                   GROUP BY pid),
            jw AS (SELECT va.pid, va.tok AS atok, va.w AS wa,
                          vb.tok AS btok, vb.w AS wb,
                          jaro_winkler_similarity(va.tok, vb.tok) AS s
                   FROM va JOIN vb ON vb.pid = va.pid),
            best AS (SELECT *, row_number() OVER (
                       PARTITION BY pid, atok
                       ORDER BY s DESC, wb DESC, btok) AS rn FROM jw)
            SELECT b.pid AS {self.id},
                   round(coalesce(sum((b.wa / na.nrm) * (b.wb / nb.nrm)
                                      * b.s)
                           FILTER (WHERE b.s >= {self.theta}), 0.0), 6)
                     AS soft_tfidf
            FROM best b
            JOIN na ON na.pid = b.pid
            JOIN nb ON nb.pid = b.pid
            WHERE b.rn = 1 GROUP BY b.pid
            """).arrow()
        self.con.unregister("lhs")
        return out


def soft_tfidf_scores(pairs, df_ref, n_names: int, theta: float = 0.9,
                      a_col: str = "name_a", b_col: str = "name_b",
                      id_col: str = "pair_id", batch_size: int = 8192,
                      concurrency=(1, 8)):
    """Actor-pool wrapper for :class:`SoftTfidfScorer`."""
    return pairs.map_batches(
        SoftTfidfScorer,
        fn_constructor_kwargs={"df_ref": df_ref, "n_names": n_names,
                               "theta": theta, "a_col": a_col,
                               "b_col": b_col, "id_col": id_col},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
