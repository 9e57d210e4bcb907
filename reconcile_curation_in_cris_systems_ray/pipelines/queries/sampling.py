"""Sampling, resampling & validation designs: bootstrap, dual-system
estimation, cross-validation, optimal stratified allocation.

Split out of pipelines/queries/stats.py (round-5 task 7: keep every
family module under 3k lines)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ...stages import relational as rel
from ...stages import textstats as ts
from ._shared import _rp


# Poisson(1) inverse-CDF thresholds (cumulative e^-1 * 1/k!, k=0..5) —
# full-precision float64 literals mirrored verbatim in SQL_BOOTSTRAP_MEAN
# so both engines derive identical integer weights from the same hash.
_POIS1_CDF = np.array([0.36787944117144233, 0.7357588823428847,
                       0.9196986029286058, 0.9810118431238463,
                       0.9963401531726563, 0.9994058151824183])


def q_bootstrap_mean(sf_dir: str):
    """Poisson bootstrap of mean(value): 20 resample replicates in ONE
    streaming pass (Chamandy et al. 2012, "Estimating uncertainty for
    massive data streams" — the standard web-scale bootstrap: row i's
    multiplicity in replicate r is Poisson(1), drawn independently per
    (row, replicate), so no replicate ever needs a global N or a
    shuffled resample).  Weights are DETERMINISTIC — DuckDB
    ``hash(event_id || ':' || rep)`` mapped through the Poisson(1)
    inverse CDF — so the SQL oracle rebuilds them bit-for-bit.  Each
    batch emits 20 (rep, Σw, Σw·x) partials; the combiner merge is
    O(replicates), never O(rows) — at 10^12 rows this is one narrow
    map + a 20-group reduce."""
    from ...functions.similarity import hash_strings_fast

    ev = _rp(sf_dir, "events", ["event_id", "value"])
    n_reps = 20
    two64 = np.float64(2.0) ** 64

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["event_id"].astype(str)
        x = df["value"].to_numpy(np.float64)
        rows = []
        for r in range(n_reps):
            h = hash_strings_fast(
                (ids + f":{r}").to_numpy(object)).astype(np.float64)
            w = np.searchsorted(_POIS1_CDF, h / two64,
                                side="right").astype(np.float64)
            rows.append((r, w.sum(), (w * x).sum()))
        return pd.DataFrame(rows, columns=["rep", "sw", "swx"])

    agg = rel.partial_groupby_agg(
        ev.map_batches(partial, batch_format="pandas"),
        ["rep"], {"sw": ("sw", "sum"), "swx": ("swx", "sum")})
    agg = agg.sort_values("rep").reset_index(drop=True)
    return pd.DataFrame({
        "rep": agg["rep"].to_numpy(np.int64),
        "n_eff": agg["sw"].to_numpy(np.float64).astype(np.int64),
        "boot_mean": np.round(agg["swx"].to_numpy(np.float64)
                              / agg["sw"].to_numpy(np.float64), 6)})


SQL_BOOTSTRAP_MEAN = """
WITH reps AS (SELECT unnest(generate_series(0, 19)) AS rep),
u AS (SELECT rep, value,
        CAST(hash(CAST(event_id AS VARCHAR) || ':'
                  || CAST(rep AS VARCHAR)) AS DOUBLE)
          / 18446744073709551616.0 AS u
      FROM events CROSS JOIN reps),
c AS (SELECT rep, value,
        CASE WHEN u < 0.36787944117144233 THEN 0
             WHEN u < 0.7357588823428847  THEN 1
             WHEN u < 0.9196986029286058  THEN 2
             WHEN u < 0.9810118431238463  THEN 3
             WHEN u < 0.9963401531726563  THEN 4
             WHEN u < 0.9994058151824183  THEN 5
             ELSE 6 END AS w
      FROM u)
SELECT CAST(rep AS BIGINT) AS rep,
       CAST(sum(w) AS BIGINT) AS n_eff,
       round(sum(w * value) / sum(w), 6) AS boot_mean
FROM c GROUP BY rep
"""




def q_capture_recapture(sf_dir: str):
    """Lincoln-Petersen capture-recapture estimate of the distinct
    user population from TWO independent deterministic hash samples
    (hash(uid:a) % 2, hash(uid:b) % 2) — the sampling-based
    distinct-count estimator beside the HLL sketch, reproduced exactly
    by the oracle through DuckDB hash() parity.  One bucketed distinct
    on user_id, then membership-flag combiner sums; closed form
    N_hat = n1*n2/m on the driver."""
    from ...functions.similarity import hash_strings_fast

    ev = _rp(sf_dir, "events", ["user_id"])
    users = rel.distinct(ev, ["user_id"], num_buckets=32)

    def flags(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].astype(str)
        h1 = hash_strings_fast((u + ":a").tolist()) % np.uint64(2) == 0
        h2 = hash_strings_fast((u + ":b").tolist()) % np.uint64(2) == 0
        return pd.DataFrame({
            "n1": [np.int64(h1.sum())], "n2": [np.int64(h2.sum())],
            "m": [np.int64((h1 & h2).sum())],
            "n_true": [np.int64(len(df))]})

    p = users.map_batches(flags, batch_format="pandas").to_pandas().sum()
    n1, n2, m = float(p["n1"]), float(p["n2"]), float(p["m"])
    return pd.DataFrame({
        "n1": [np.int64(p["n1"])], "n2": [np.int64(p["n2"])],
        "m": [np.int64(p["m"])], "n_true": [np.int64(p["n_true"])],
        "n_hat": [np.round(n1 * n2 / m, 6)]})


SQL_CAPTURE_RECAPTURE = """
WITH u AS (SELECT DISTINCT user_id FROM events),
f AS (SELECT (hash(CAST(user_id AS VARCHAR) || ':a') % 2 = 0) AS h1,
             (hash(CAST(user_id AS VARCHAR) || ':b') % 2 = 0) AS h2
      FROM u),
agg AS (SELECT count(*) FILTER (WHERE h1) AS n1,
               count(*) FILTER (WHERE h2) AS n2,
               count(*) FILTER (WHERE h1 AND h2) AS m,
               count(*) AS n_true
        FROM f)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       CAST(m AS BIGINT) AS m, CAST(n_true AS BIGINT) AS n_true,
       round(CAST(n1 AS DOUBLE) * n2 / m, 6) AS n_hat
FROM agg
"""


def q_crossval_nb(sf_dir: str):
    """5-fold cross-validated Naive Bayes (fold = doc_id % 5) — the
    train/test-discipline evaluation of the oracled naive_bayes
    classifier, WITHOUT retraining five times: per-(term, lang, fold)
    counts are one combiner pass, and each fold's training model is
    the TOTAL minus that fold's cells (leave-one-fold-out by
    subtraction); margins (per-fold lang totals, vocabulary, priors)
    close on the bounded cell frame and the scoring pass applies each
    doc's own fold model.  Same add-one smoothing, round-9 argmax and
    broadcast-model contract as naive_bayes (hash-join hydration is
    the documented web-scale swap).  Output: per fold
    (n_docs, n_correct)."""
    from ...stages.shuffle import bucketed_map_groups

    docs = _rp(sf_dir, "documents", ["doc_id", "text", "lang"])
    k = 5

    def cnt_partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = ts._ws_tokens(df["text"]).reset_index(drop=True) \
            .explode().dropna()
        if len(ex) == 0:
            return pd.DataFrame({"term": pd.Series([], dtype="string"),
                                 "lang": pd.Series([], dtype=object),
                                 "fold": pd.Series([], dtype="int64"),
                                 "c": pd.Series([], dtype="int64")})
        lang = df["lang"].to_numpy(object)
        fold = df["doc_id"].to_numpy(np.int64) % k
        idx = ex.index.to_numpy()
        t = pd.DataFrame({"term": ex.to_numpy(object),
                          "lang": lang[idx], "fold": fold[idx],
                          "c": np.int64(1)})
        return t.groupby(["term", "lang", "fold"], sort=False).sum() \
            .reset_index()

    cells = bucketed_map_groups(
        docs.map_batches(cnt_partial, batch_format="pandas"),
        ["term"],
        lambda df: df.groupby(["term", "lang", "fold"], sort=False)["c"]
        .sum().reset_index(),
        num_buckets=64).materialize().to_pandas()

    langs = sorted(cells["lang"].unique())
    # model maps: total and per-fold (term -> count), per lang
    tot = cells.groupby(["lang", "term"])["c"].sum()
    tot_map = {lg: tot.xs(lg).to_dict() for lg in langs}
    fold_map = {(lg, f): g.set_index("term")["c"].to_dict()
                for (lg, f), g in cells.groupby(["lang", "fold"])}
    nl_tot = {lg: float(sum(tot_map[lg].values())) for lg in langs}
    nl_fold = {(lg, f): float(sum(m.values()))
               for (lg, f), m in fold_map.items()}
    # per-fold vocabulary: terms with any training (non-fold) count
    term_tot = cells.groupby("term")["c"].sum()
    term_fold = cells.groupby(["term", "fold"])["c"].sum()
    v_f = {}
    for f in range(k):
        tf = term_fold.xs(f, level="fold") \
            if f in cells["fold"].unique() else pd.Series(dtype="int64")
        train_term = term_tot.subtract(tf, fill_value=0)
        v_f[f] = float((train_term > 0).sum()) + 1.0

    nd = docs.map_batches(
        lambda df: df.assign(fold=df["doc_id"] % k)
        .groupby(["lang", "fold"], sort=False).size().reset_index(name="n"),
        batch_format="pandas")
    nd = rel.partial_groupby_agg(nd, ["lang", "fold"], {"n": ("n", "sum")})
    nd_lang = nd.groupby("lang")["n"].sum().to_dict()
    nd_lf = nd.set_index(["lang", "fold"])["n"].to_dict()
    n_all = float(sum(nd_lang.values()))
    n_fold = nd.groupby("fold")["n"].sum().to_dict()
    prior = {(lg, f): np.log(
        (float(nd_lang[lg]) - float(nd_lf.get((lg, f), 0)))
        / (n_all - float(n_fold.get(f, 0))))
        for lg in langs for f in range(k)}

    def score(df: pd.DataFrame) -> pd.DataFrame:
        toks = ts._ws_tokens(df["text"]).reset_index(drop=True)
        ex = toks.explode().dropna()
        n = len(df)
        fold = df["doc_id"].to_numpy(np.int64) % k
        true_lang = df["lang"].to_numpy(object)
        idx = ex.index.to_numpy()
        terms = pd.Series(ex.to_numpy(object))
        row_fold = fold[idx]
        scores = np.zeros((n, len(langs)))
        for li, lg in enumerate(langs):
            ct = terms.map(tot_map[lg]).fillna(0.0).to_numpy(np.float64)
            cf = np.zeros(len(terms))
            for f in range(k):
                m = row_fold == f
                if m.any():
                    fm = fold_map.get((lg, f), {})
                    cf[m] = terms[m].map(fm).fillna(0.0) \
                        .to_numpy(np.float64)
            train_c = ct - cf
            nlv = np.array([nl_tot[lg] - nl_fold.get((lg, f), 0.0)
                            + v_f[f] for f in row_fold])
            val = np.log((train_c + 1.0) / nlv)
            s = np.zeros(n)
            np.add.at(s, idx, val)
            pr = np.array([prior[(lg, f)] for f in fold])
            scores[:, li] = np.round(s + pr, 9)
        pred = np.array(langs, dtype=object)[np.argmax(scores, axis=1)]
        out = pd.DataFrame({"fold": fold, "n_docs": np.int64(1),
                            "n_correct": (pred == true_lang)
                            .astype(np.int64)})
        return out.groupby("fold", sort=False).sum().reset_index()

    g = rel.partial_groupby_agg(
        docs.map_batches(score, batch_format="pandas"),
        ["fold"], {"n_docs": ("n_docs", "sum"),
                   "n_correct": ("n_correct", "sum")})
    return pd.DataFrame({
        "fold": g["fold"].to_numpy(np.int64),
        "n_docs": g["n_docs"].to_numpy(np.int64),
        "n_correct": g["n_correct"].to_numpy(np.int64)})


SQL_CROSSVAL_NB = r"""
WITH toks AS (
  SELECT doc_id, doc_id % 5 AS fold, lang,
         unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
             AS term
  FROM documents WHERE trim(coalesce(text, '')) <> ''),
cells AS (SELECT term, lang, fold, count(*) AS c FROM toks
          GROUP BY 1, 2, 3),
tot AS (SELECT term, lang, sum(c) AS ct FROM cells GROUP BY 1, 2),
folds AS (SELECT DISTINCT fold FROM toks),
train AS (SELECT f.fold, t.term, t.lang,
                 CAST(t.ct - coalesce(c.c, 0) AS DOUBLE) AS c
          FROM tot t CROSS JOIN folds f
          LEFT JOIN cells c ON c.term = t.term AND c.lang = t.lang
                           AND c.fold = f.fold),
nlf AS (SELECT fold, lang, sum(c) AS nl FROM train GROUP BY 1, 2),
vf AS (SELECT fold, CAST(count(*) AS DOUBLE) + 1.0 AS v FROM (
         SELECT fold, term FROM train GROUP BY 1, 2
         HAVING sum(c) > 0)
       GROUP BY 1),
ndlf AS (SELECT lang, doc_id % 5 AS fold, count(*) AS n
         FROM documents GROUP BY 1, 2),
ndl AS (SELECT lang, sum(n) AS nd FROM ndlf GROUP BY 1),
ndf AS (SELECT fold, sum(n) AS nf FROM ndlf GROUP BY 1),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS na FROM documents),
pri AS (SELECT l.lang, f.fold,
               ln((l.nd - coalesce(x.n, 0))
                  / (nn.na - ndf.nf)) AS lp
        FROM ndl l CROSS JOIN folds f
        LEFT JOIN ndlf x ON x.lang = l.lang AND x.fold = f.fold
        JOIN ndf ON ndf.fold = f.fold CROSS JOIN nn),
sc AS (
  SELECT t.doc_id, t.fold, d.lang AS true_lang, nlf.lang AS cand,
         round(sum(ln((coalesce(tr.c, 0) + 1.0) / (nlf.nl + vf.v)))
               + any_value(pri.lp), 9) AS s
  FROM toks t
  JOIN documents d USING (doc_id)
  JOIN nlf ON nlf.fold = t.fold
  JOIN vf ON vf.fold = t.fold
  LEFT JOIN train tr ON tr.term = t.term AND tr.lang = nlf.lang
                    AND tr.fold = t.fold
  JOIN pri ON pri.lang = nlf.lang AND pri.fold = t.fold
  GROUP BY t.doc_id, t.fold, d.lang, nlf.lang, nlf.nl, vf.v),
pred AS (SELECT doc_id, fold, true_lang, cand,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY s DESC, cand) AS rn
         FROM sc)
SELECT CAST(fold AS BIGINT) AS fold, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN cand = true_lang THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct
FROM pred WHERE rn = 1 GROUP BY 1
"""


def q_neyman_allocation(sf_dir: str):
    """Neyman optimal stratified-sampling allocation (the
    variance-minimizing budget split a curation pipeline uses to
    decide how many documents to audit per stratum): allocation
    fraction w_h = N_h·σ_h / Σ N_h·σ_h per event type, σ from the
    explicit sum/sumsq population formula so both engines share the
    exact float expression (one combiner pass — count/sum/sumsq are
    the sufficient statistics; no shuffle of values)."""
    from ...stages.shuffle import bucketed_map_groups

    ev = _rp(sf_dir, "events", ["event_type", "value"])

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(np.float64)
        g = df.assign(v=v, v2=v * v).groupby(
            "event_type", sort=False, as_index=False).agg(
            n=("v", "size"), s=("v", "sum"), s2=("v2", "sum"))
        return g

    parts = rel.partial_groupby_agg(
        ev.map_batches(moments, batch_format="pandas"),
        ["event_type"],
        {"n": ("n", "sum"), "s": ("s", "sum"), "s2": ("s2", "sum")})
    n = parts["n"].to_numpy(np.float64)
    s = parts["s"].to_numpy(np.float64)
    s2 = parts["s2"].to_numpy(np.float64)
    sigma = np.sqrt((s2 - s * s / n) / n)
    w = n * sigma
    w = w / w.sum()
    out = pd.DataFrame({
        "event_type": parts["event_type"].to_numpy(object),
        "stratum_n": parts["n"].to_numpy(np.int64),
        "alloc_frac": np.round(w, 6)})
    return out.sort_values("event_type").reset_index(drop=True)


SQL_NEYMAN_ALLOCATION = """
WITH m AS (SELECT event_type, count(*) AS n, sum(value) AS s,
                  sum(value * value) AS s2
           FROM events GROUP BY 1),
w AS (SELECT event_type, n,
             n * sqrt((s2 - s * s / n) / n) AS nh_sigma
      FROM m)
SELECT event_type, CAST(n AS BIGINT) AS stratum_n,
       round(nh_sigma / (SELECT sum(nh_sigma) FROM w), 6) AS alloc_frac
FROM w
"""
