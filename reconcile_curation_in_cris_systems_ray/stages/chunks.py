"""Chunk-granularity curation operators (paragraph-level dedup family).

Web-curation pipelines dedupe and filter at sub-document granularity:
C4 removes boilerplate lines that repeat across pages, CCNet dedupes
paragraph hashes corpus-wide.  The synthetic documents have no line
structure, so the unit here is a fixed ``chunk_tokens``-token window —
the operators are granularity-agnostic (swap the emitter for a line
splitter on real web text).

- :func:`chunk_dedup` — corpus-wide exact dedup of chunks: one owner
  (min ``(doc_id, chunk_id)``) per distinct chunk content, plus its
  global copy count.  One content-keyed exchange, same plan shape as
  :func:`..stages.dedup.exact_dedup` but at sub-document grain.
- :func:`boilerplate_stats` — per-document count of chunks that recur
  in >= ``min_docs`` distinct documents (the C4 boilerplate-line rule).
  The boilerplate set is tiny relative to the corpus (it is the point
  of the filter), so it is broadcast once via ``ray.put``; above
  ``broadcast_cap`` distinct boilerplate chunks the operator switches
  to a distributed join + bucketed count instead (no driver set).

Both operators stream the corpus; nothing document-shaped is ever
driver-materialized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from . import relational as rel
from .shuffle import bucketed_map_groups


def _chunk_frame(df: pd.DataFrame, id_col: str, text_col: str,
                 chunk_tokens: int) -> pd.DataFrame:
    """Vectorized (id, chunk_id, chunk) emission for one doc batch.

    Token explode is numpy (repeat/cumsum over per-doc counts); the
    final per-chunk join is the one unavoidable string pass and runs
    through pandas' C groupby machinery, not a Python doc loop.
    """
    texts = (df[text_col].astype("string").fillna("")
             .str.strip().str.lower())
    keep = (texts != "").to_numpy()
    ids = df[id_col].to_numpy()[keep]
    empty = pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                          "chunk_id": pd.Series([], dtype="int64"),
                          "chunk": pd.Series([], dtype="string")})
    if not len(ids):
        return empty
    tok_lists = texts[keep].str.split().to_numpy()
    ntok = np.fromiter((len(t) for t in tok_lists), dtype=np.int64,
                       count=len(tok_lists))
    flat = np.concatenate(tok_lists)
    doc_pos = np.arange(len(flat)) - np.repeat(
        np.concatenate(([0], np.cumsum(ntok)[:-1])), ntok)
    out = pd.DataFrame({
        id_col: np.repeat(ids, ntok),
        "chunk_id": doc_pos // chunk_tokens,
        "tok": flat,
    })
    chunks = (out.groupby([id_col, "chunk_id"], sort=False)["tok"]
              .agg(" ".join).reset_index(name="chunk"))
    chunks["chunk"] = chunks["chunk"].astype("string")
    return chunks


def chunk_dedup(docs, id_col: str, text_col: str, chunk_tokens: int = 32,
                num_buckets: int = 64):
    """Exact chunk-level dedup: (id, chunk_id, n_copies) for the owner
    — min ``(id, chunk_id)`` — of every distinct chunk content.

    Chunk strings ship exactly once through one bucketed exchange keyed
    on content (hash-partitioned), the CCNet paragraph-dedup plan; the
    grouped pick is a mergesort-stable drop_duplicates, deterministic
    at any block order.
    """
    chunks = docs.select_columns([id_col, text_col]).map_batches(
        lambda df: _chunk_frame(df, id_col, text_col, chunk_tokens),
        batch_format="pandas")

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_col, "chunk_id"], kind="mergesort")
        g = df.groupby("chunk", sort=False)
        out = g.head(1).copy()
        out["n_copies"] = g.size().reindex(out["chunk"]).to_numpy()
        return out[[id_col, "chunk_id", "n_copies"]]

    return bucketed_map_groups(chunks, ["chunk"], pick, num_buckets)


def boilerplate_stats(docs, id_col: str, text_col: str,
                      chunk_tokens: int = 32, min_docs: int = 2,
                      num_buckets: int = 64,
                      broadcast_cap: int = 2_000_000):
    """Per-doc boilerplate occurrence counts (C4 line-frequency rule).

    Pass 1 counts, per distinct chunk content, the number of distinct
    documents containing it (per-batch distinct pre-aggregation, then
    one content-keyed exchange).  Chunks in >= ``min_docs`` docs form
    the boilerplate set.  Pass 2 re-streams the documents and counts
    boilerplate chunk occurrences per doc — broadcast-membership when
    the set fits ``broadcast_cap``, else a distributed chunk join +
    per-doc bucketed count.  Returns (id, n_chunks, n_boiler) for docs
    with n_boiler > 0.
    """
    def emit_distinct(df: pd.DataFrame) -> pd.DataFrame:
        return (_chunk_frame(df, id_col, text_col, chunk_tokens)
                [[id_col, "chunk"]].drop_duplicates())

    pairs = docs.select_columns([id_col, text_col]).map_batches(
        emit_distinct, batch_format="pandas")

    def df_count(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("chunk", sort=False)[id_col].size()
               .reset_index(name="n_docs"))
        return out[out["n_docs"] >= min_docs]

    # the filtered count table is corpus-small (that's the point of the
    # filter); materialize so count() + consume don't re-run the exchange
    boiler = bucketed_map_groups(pairs, ["chunk"], df_count, num_buckets,
                                 empty_like=pd.DataFrame({
                                     "chunk": pd.Series([], dtype="string"),
                                     "n_docs": pd.Series([], dtype="int64"),
                                 })).materialize()

    n_boiler_rows = boiler.count()

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        c = _chunk_frame(df, id_col, text_col, chunk_tokens)
        return (c.groupby(id_col, sort=False)
                .agg(n_chunks=("chunk", "size"))
                .reset_index())

    totals = docs.select_columns([id_col, text_col]).map_batches(
        per_doc, batch_format="pandas")

    if n_boiler_rows <= broadcast_cap:
        boiler_set = frozenset(
            pd.concat([b["chunk"] for b in
                       boiler.iter_batches(batch_format="pandas")],
                      ignore_index=True)
            if n_boiler_rows else pd.Series([], dtype="string"))
        ref = ray.put(boiler_set)

        def per_doc_counts(df: pd.DataFrame) -> pd.DataFrame:
            bset = ray.get(ref)
            c = _chunk_frame(df, id_col, text_col, chunk_tokens)
            c["is_b"] = c["chunk"].isin(bset).astype("int64")
            out = (c.groupby(id_col, sort=False)
                   .agg(n_chunks=("chunk", "size"), n_boiler=("is_b", "sum"))
                   .reset_index())
            return out[out["n_boiler"] > 0]

        return docs.select_columns([id_col, text_col]).map_batches(
            per_doc_counts, batch_format="pandas")

    # scale path: boilerplate set too large to broadcast — join chunk
    # occurrences against it, count hits per doc, re-attach totals
    occ = docs.select_columns([id_col, text_col]).map_batches(
        lambda df: _chunk_frame(df, id_col, text_col, chunk_tokens)
        [[id_col, "chunk"]], batch_format="pandas")
    hits = rel.hash_join(occ, boiler.drop_columns(["n_docs"]),
                         on=("chunk",))

    def count_hits(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(id_col, sort=False).size()
                .reset_index(name="n_boiler"))

    per_doc_hits = bucketed_map_groups(
        hits, [id_col], count_hits, num_buckets,
        empty_like=pd.DataFrame({
            id_col: pd.Series([], dtype="int64"),
            "n_boiler": pd.Series([], dtype="int64")}))
    joined = rel.hash_join(per_doc_hits, totals, on=(id_col,))
    return joined.map_batches(
        lambda df: df[df["n_boiler"] > 0][[id_col, "n_chunks", "n_boiler"]],
        batch_format="pandas")
