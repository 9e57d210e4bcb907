"""Distributed BPE merge learning (Sennrich, Haddow & Birch 2016).

The industrial map-reduce formulation: the CORPUS is touched exactly
once (a bucketed word-count shuffle); every merge round then operates
on the distinct-word VOCAB dataset only —

1. pair stats: each vocab batch emits weighted adjacent-symbol-pair
   partial counts (overlapping positions, the standard BPE statistic);
   the shuffle-free combiner sums them, and the resulting stats table
   is bounded by the live symbol-pair vocabulary, which is small by
   construction (that boundedness is WHY BPE training scales),
2. the driver picks the argmax pair (ties: lexicographically smallest
   (left, right) — deterministic across engines and partitionings),
3. the merge is applied vocab-wide as a vectorized regex replace
   (left-to-right non-overlapping, the standard application order).

Driver state = the learned rules (n_merges rows) + the per-round pair
stats table; the vocab dataset is materialized once per round so round
r+1 does not re-execute rounds 1..r (lineage cut, one vocab-sized pass
per round).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# symbol-start anchor is load-bearing: a bare lookahead matches at
# every character offset INSIDE a multi-char merged symbol ("er g"
# would also yield ("r", "g"))
_PAIR_RE = re.compile(r"(?<!\S)(?=(\S+) (\S+))")


def _word_counts(docs, text_col: str, num_buckets: int = 64):
    def toks(df: pd.DataFrame) -> pd.DataFrame:
        ex = (df[text_col].astype("string").fillna("").str.lower()
              .str.findall(r"[a-z0-9]+").explode().dropna())
        vc = ex.value_counts()
        return pd.DataFrame({"word": vc.index.to_numpy(dtype=object),
                             "n": vc.to_numpy(np.int64)})

    counts = docs.map_batches(toks, batch_format="pandas")
    # combiner + ONE bucketed word shuffle: (word, n) distinct vocab
    from .shuffle import bucketed_map_groups

    empty = pd.DataFrame({"word": pd.Series([], dtype="object"),
                          "n": pd.Series([], dtype="int64")})

    def collapse(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("word", sort=False)["n"].sum()
        return pd.DataFrame({"word": g.index.to_numpy(dtype=object),
                             "n": g.to_numpy(np.int64)})

    return bucketed_map_groups(counts, ["word"], collapse,
                               num_buckets=num_buckets, empty_like=empty)


def learn_bpe(docs, text_col: str = "text", n_merges: int = 8,
              end_marker: str = "</w>") -> pd.DataFrame:
    """Learn ``n_merges`` BPE merges; returns (step, left, right,
    pair_count) with step starting at 1.  Stops early if no adjacent
    pair remains."""
    vocab = _word_counts(docs, text_col)

    def to_syms(df: pd.DataFrame) -> pd.DataFrame:
        words = df["word"].astype("string")
        syms = words.map(lambda w: " ".join(list(w) + [end_marker]))
        return pd.DataFrame({"syms": syms.to_numpy(dtype=object),
                             "n": df["n"].to_numpy(np.int64)})

    ds = vocab.map_batches(to_syms, batch_format="pandas").materialize()

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        pairs = df["syms"].astype("string").str.findall(_PAIR_RE)
        ex = pairs.explode().dropna()
        if not len(ex):
            return pd.DataFrame({"left": pd.Series([], dtype="object"),
                                 "right": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        w = df["n"].reindex(ex.index).to_numpy(np.int64)
        out = pd.DataFrame({"left": ex.str[0].to_numpy(dtype=object),
                            "right": ex.str[1].to_numpy(dtype=object),
                            "n": w})
        g = out.groupby(["left", "right"], sort=False)["n"].sum()
        return g.reset_index()

    from . import relational as rel

    rules = []
    for step in range(1, n_merges + 1):
        stats = rel.partial_groupby_agg(
            ds.map_batches(pair_partial, batch_format="pandas"),
            ["left", "right"], {"n": ("n", "sum")})
        if not len(stats):
            break
        stats = stats.sort_values(["n", "left", "right"],
                                  ascending=[False, True, True],
                                  kind="mergesort")
        best = stats.iloc[0]
        left, right, cnt = str(best["left"]), str(best["right"]), \
            int(best["n"])
        rules.append((step, left, right, cnt))
        pat = rf"(?<!\S){re.escape(left)} {re.escape(right)}(?!\S)"
        merged = left + right

        def apply(df: pd.DataFrame, pat=pat, merged=merged) -> pd.DataFrame:
            out = df.copy()
            out["syms"] = (out["syms"].astype("string")
                           .str.replace(pat, merged, regex=True)
                           .to_numpy(dtype=object))
            return out

        ds = ds.map_batches(apply, batch_format="pandas").materialize()

    return pd.DataFrame(rules, columns=["step", "left", "right",
                                        "pair_count"])
