"""Shared helpers used by multiple query-family modules.

Split out of the former monolithic pipelines/queries.py (round-4 task 2).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ...config import BlockingConfig, ScoringConfig
from ...stages import relational as rel
from ...stages import textstats as ts
from ...stages.ann import brute_force_topk, ivf_topk
from ...stages.dedup import (
    embedding_dup_pairs, exact_dedup, near_dup_pairs, simhash_dup_pairs,
)
from ...stages.fields import extract_fields



def _rp(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _doc_count(sf_dir: str) -> int:
    """Row count from parquet metadata (free; no read)."""
    import os

    import pyarrow.parquet as pq

    return pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")).metadata.num_rows


def _link_graph_inputs(sf_dir: str):
    from ...stages.graph import derive_link_edges

    docs = _rp(sf_dir, "documents", ["doc_id"])
    n = _doc_count(sf_dir)
    edges = derive_link_edges(docs, n_nodes=n)
    nodes = docs.map_batches(
        lambda df: df.rename(columns={"doc_id": "node"}),
        batch_format="pandas")
    return edges, nodes, n


# shared edge-fixture SQL: must mirror derive_link_edges bit-for-bit
_SQL_EDGES_CTE = """
n AS (SELECT count(*) AS nv FROM documents),
raw AS (
  SELECT d.doc_id AS src,
         CAST(hash(CAST(d.doc_id AS VARCHAR) || ':'
                   || CAST(t.j AS VARCHAR))
              % (SELECT nv FROM n) AS BIGINT) AS dst
  FROM documents d,
       unnest(generate_series(1, d.doc_id % 4)) AS t(j)),
edges AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
outd AS (SELECT src AS node, count(*) AS c FROM edges GROUP BY 1)
"""


_SCD2_SENTINEL = pd.Timestamp("2100-01-01")


def _corrupted_twin_pairs(df: pd.DataFrame,
                          id_out: str = "pair_id") -> pd.DataFrame:
    """Fixture builder shared by monge_elkan / soft_tfidf: each part
    name paired with its word-REORDERED, first-token-one-char-
    corrupted twin.  Names with fewer than two space-separated words
    or an empty first word are dropped — mirrored by the
    ``len(arr) >= 2 AND length(arr[1]) > 0`` WHERE in both SQL twins —
    so the pair set is engine-independent for ANY input corpus, not
    just multi-word TPC-H part names (review finding: the unguarded
    variants diverged on one-word names, where SQL's NULL arr[2]
    nulls the whole concat while Python emitted a row)."""
    arr = df["p_name"].astype("string").str.split(" ")
    ok = ((arr.str.len() >= 2) & (arr.str[0].str.len() > 0)).fillna(False)
    df = df[ok.to_numpy(bool)]
    arr = arr[ok]
    w1 = arr.str[0]
    w2 = arr.str[1]
    k = df["p_partkey"].to_numpy(np.int64)
    pos = k % w1.str.len().to_numpy(np.int64)
    w1c = [s[:p] + s[p + 1:] for s, p in zip(w1.to_numpy(), pos)]
    return pd.DataFrame({
        id_out: k,
        "name_a": df["p_name"].to_numpy(dtype=object),
        "name_b": (w2 + " " + pd.Series(w1c, index=w2.index))
        .to_numpy(dtype=object)})


def _md5_lower64(s: bytes) -> int:
    """DuckDB md5_number_lower twin: lower 8 digest bytes, little-endian."""
    import hashlib

    return int.from_bytes(hashlib.md5(s).digest()[8:16], "little")


def _minhash_signatures(ds, k: int):
    """Map-only md5 MinHash signature stage shared by minhash_pairs /
    greedy_match: one md5 per unique token per seed (the oracle's
    md5_number_lower(tok || '#' || seed) twin), per-row min via
    np.minimum.at; empty-token docs are dropped (no signature)."""

    def sign(df: pd.DataFrame) -> pd.DataFrame:
        texts = (df["text"].astype("string").fillna("")
                 .str.lower().reset_index(drop=True))
        toks = texts.str.findall(r"[a-z0-9]+").explode().dropna()
        rt = pd.DataFrame({"r": toks.index.to_numpy(),
                           "t": toks.to_numpy()}).drop_duplicates()
        out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                            "source": df["source"].to_numpy()})
        if not len(rt):
            return out.iloc[:0].assign(**{f"mh{s}": np.uint64(0)
                                          for s in range(k)})
        uniq, codes = np.unique(rt["t"].to_numpy(dtype=object),
                                return_inverse=True)
        hs = np.array([[_md5_lower64(f"{t}#{s}".encode())
                        for s in range(k)] for t in uniq],
                      dtype=np.uint64)
        sig = np.full((len(df), k), np.iinfo(np.uint64).max,
                      dtype=np.uint64)
        np.minimum.at(sig, rt["r"].to_numpy(), hs[codes])
        has = np.zeros(len(df), dtype=bool)
        has[rt["r"].to_numpy()] = True
        out = out[has].reset_index(drop=True)
        for s in range(k):
            out[f"mh{s}"] = sig[has, s]
        return out

    return ds.map_batches(sign, batch_format="pandas")


def _minhash_block_pairs(g: pd.DataFrame, k: int):
    """All within-group signature pairs: (iu, ju, matching-component
    counts) — one vectorized (m x m x k) broadcast compare."""
    sig = g[[f"mh{s}" for s in range(k)]].to_numpy(dtype=np.uint64)
    iu, ju = np.triu_indices(len(g), 1)
    eq = (sig[iu] == sig[ju]).sum(axis=1).astype(np.int64)
    return iu, ju, eq
