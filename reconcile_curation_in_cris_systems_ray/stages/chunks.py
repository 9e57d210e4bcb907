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

Bytes discipline: chunk TEXT never enters an exchange.  Each batch
hashes its chunks to a 128-bit digest (two independent vectorized
64-bit hashes — pandas siphash + DuckDB ``hash()``), and only
``(doc_id, chunk_id, h1, h2)`` rows (~32 B) travel; a 32-token chunk
averages ~200 B, so the shuffle is ~6x lighter and, unlike truncated
hashing schemes, 128 bits keeps the collision probability negligible
at web scale (~10^13 chunks -> P(any collision) < 10^-12).

Both operators stream the corpus; nothing document-shaped is ever
driver-materialized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from ..functions.similarity import hash_strings_fast, stable_hash_strings
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


def _digest_frame(df: pd.DataFrame, id_col: str, text_col: str,
                  chunk_tokens: int) -> pd.DataFrame:
    """(id, chunk_id, h1, h2) rows: chunk content reduced map-side to a
    128-bit digest so no exchange ever carries chunk text."""
    c = _chunk_frame(df, id_col, text_col, chunk_tokens)
    vals = c["chunk"].to_numpy(dtype=object)
    return pd.DataFrame({
        id_col: c[id_col].to_numpy(),
        "chunk_id": c["chunk_id"].to_numpy(),
        "h1": stable_hash_strings(vals),
        "h2": hash_strings_fast(vals),
    })


def chunk_dedup(docs, id_col: str, text_col: str, chunk_tokens: int = 32,
                num_buckets: int = 64):
    """Exact chunk-level dedup: (id, chunk_id, n_copies) for the owner
    — min ``(id, chunk_id)`` — of every distinct chunk content.

    One bucketed exchange keyed on the content digest (the CCNet
    paragraph-dedup plan); the grouped pick is a mergesort-stable
    drop_duplicates, deterministic at any block order.
    """
    chunks = docs.select_columns([id_col, text_col]).map_batches(
        lambda df: _digest_frame(df, id_col, text_col, chunk_tokens),
        batch_format="pandas")

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_col, "chunk_id"], kind="mergesort")
        df["n_copies"] = (df.groupby(["h1", "h2"], sort=False)[id_col]
                          .transform("size"))
        out = df.drop_duplicates(["h1", "h2"], keep="first")
        return out[[id_col, "chunk_id", "n_copies"]]

    return bucketed_map_groups(chunks, ["h1"], pick, num_buckets)


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
        return (_digest_frame(df, id_col, text_col, chunk_tokens)
                [[id_col, "h1", "h2"]].drop_duplicates())

    pairs = docs.select_columns([id_col, text_col]).map_batches(
        emit_distinct, batch_format="pandas")

    def df_count(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["h1", "h2"], sort=False)[id_col].size()
               .reset_index(name="n_docs"))
        return out[out["n_docs"] >= min_docs]

    _h_empty = pd.DataFrame({"h1": pd.Series([], dtype="uint64"),
                             "h2": pd.Series([], dtype="uint64"),
                             "n_docs": pd.Series([], dtype="int64")})
    # the filtered count table is corpus-small (that's the point of the
    # filter); materialize so count() + consume don't re-run the exchange
    boiler = bucketed_map_groups(pairs, ["h1"], df_count, num_buckets,
                                 empty_like=_h_empty).materialize()

    n_boiler_rows = boiler.count()

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        c = _digest_frame(df, id_col, text_col, chunk_tokens)
        return (c.groupby(id_col, sort=False)
                .agg(n_chunks=("h1", "size"))
                .reset_index())

    totals = docs.select_columns([id_col, text_col]).map_batches(
        per_doc, batch_format="pandas")

    if n_boiler_rows <= broadcast_cap:
        bt = (pd.concat(list(boiler.iter_batches(batch_format="pandas")),
                        ignore_index=True)[["h1", "h2"]]
              if n_boiler_rows else _h_empty[["h1", "h2"]])
        ref = ray.put(bt)

        def per_doc_counts(df: pd.DataFrame) -> pd.DataFrame:
            bdf = ray.get(ref)
            c = _digest_frame(df, id_col, text_col, chunk_tokens)
            # indicator merge: vectorized C hash join on the two digest
            # halves (row order of c is preserved under how="left")
            hit = c.merge(bdf.assign(__b=np.int64(1)), on=["h1", "h2"],
                          how="left")["__b"].fillna(0).astype("int64")
            c["is_b"] = hit.to_numpy()
            out = (c.groupby(id_col, sort=False)
                   .agg(n_chunks=("h1", "size"), n_boiler=("is_b", "sum"))
                   .reset_index())
            return out[out["n_boiler"] > 0]

        return docs.select_columns([id_col, text_col]).map_batches(
            per_doc_counts, batch_format="pandas")

    # scale path: boilerplate set too large to broadcast — join chunk
    # digest occurrences against it, count hits per doc, re-attach totals
    occ = docs.select_columns([id_col, text_col]).map_batches(
        lambda df: _digest_frame(df, id_col, text_col, chunk_tokens)
        [[id_col, "h1", "h2"]], batch_format="pandas")
    hits = rel.hash_join(occ, boiler.drop_columns(["n_docs"]),
                         on=("h1", "h2"))

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


def source_overlap(docs, id_col: str, text_col: str, source_col: str,
                   chunk_tokens: int = 32, num_buckets: int = 64):
    """Cross-source duplicate-content matrix: for every source pair
    (s1 < s2), the number of DISTINCT chunk contents both sources
    contain — the "which crawl duplicates which" curation report that
    decides dedup ordering and source weights.

    Same digest discipline as :func:`chunk_dedup` (chunk text never
    enters an exchange, 128-bit digests do); each digest group lives
    wholly in one bucket, so the per-bucket distinct (digest, source)
    self-merge emits each (digest, pair) exactly once and only the
    bounded per-pair counts reach the driver (<= |sources|^2 rows)."""
    from .relational import partial_groupby_agg
    from .shuffle import bucketed_map_groups

    def digest_src(df: pd.DataFrame) -> pd.DataFrame:
        d = _digest_frame(df, id_col, text_col, chunk_tokens)
        src = dict(zip(df[id_col].to_numpy(), df[source_col].to_numpy()))
        d["src"] = d[id_col].map(src)
        return d[["h1", "h2", "src"]].drop_duplicates(ignore_index=True)

    cells = docs.select_columns([id_col, text_col, source_col]) \
        .map_batches(digest_src, batch_format="pandas")

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["h1", "h2", "src"])
        m = d.merge(d, on=["h1", "h2"])
        m = m[m["src_x"] < m["src_y"]]
        if len(m) == 0:
            return pd.DataFrame({"s1": pd.Series([], dtype="string"),
                                 "s2": pd.Series([], dtype="string"),
                                 "n": pd.Series([], dtype="int64")})
        g = m.groupby(["src_x", "src_y"], sort=False).size() \
            .rename("n").reset_index()
        return g.rename(columns={"src_x": "s1", "src_y": "s2"})

    parts = bucketed_map_groups(cells, ["h1"], pairs,
                                num_buckets=num_buckets)
    out = partial_groupby_agg(parts, ["s1", "s2"], {"n": ("n", "sum")})
    return out.rename(columns={"n": "shared_chunks"}) \
        .sort_values(["s1", "s2"]).reset_index(drop=True)
