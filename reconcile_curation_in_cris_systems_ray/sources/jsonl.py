"""Gzipped-JSONL ingest with quarantine semantics + partitioned sink.

Reference analogues (SURVEY §2.1):
- S2 (gzip JSONL reader, ``openalex-fast-field-parse/src/main.rs:546-685``):
  stream-decode ``*.jsonl.gz`` shards, parse records, skip-and-count bad
  lines. Here each shard is one Ray task (``read_binary_files`` →
  ``map_batches(parse)``), the fast path is ``pyarrow.json.read_json``
  over the whole decompressed buffer (vectorized), and only shards
  containing corrupt lines fall back to per-line parsing.
- S6/S8 (error-tolerant load + ``import_errors`` side table,
  ``build_db.py:199-308``): bad lines are not dropped silently — they
  are emitted as quarantine rows (``_error`` populated) so the caller
  can split them off to an ``errors/`` Parquet prefix.
- S4 (partitioned "organized" sink, ``openalex .../src/main.rs:1014-1107``):
  ``write_partitioned`` replaces the hand-rolled LRU open-file cache
  with Arrow dataset partitioning (one directory per key value) — the
  resumable output layout.

At 100 TB scale each shard is bounded (a WARC-style segment); one task
per shard keeps memory flat and the streaming executor pipelines
decompress → parse → downstream transforms with backpressure.
"""

from __future__ import annotations

import gzip
import io
import json

import pyarrow as pa

ERROR_COL = "_error"


def _schema_with_error(schema: pa.Schema) -> pa.Schema:
    return schema.append(pa.field(ERROR_COL, pa.string()))


def _null_row(schema: pa.Schema) -> dict:
    return {f.name: None for f in schema}


def _parse_shard(payload: bytes, path: str, schema: pa.Schema) -> pa.Table:
    """One gz shard -> typed table with an ``_error`` quarantine column."""
    from pyarrow import json as pa_json

    # Ray's read_binary_files auto-decompresses *.gz via the Arrow
    # filesystem layer; decompress only when the payload is still gzip
    if payload[:2] == b"\x1f\x8b":
        raw = gzip.decompress(payload)
    else:
        raw = payload
    parse_opts = pa_json.ParseOptions(
        explicit_schema=schema,
        unexpected_field_behavior="ignore")
    try:
        tbl = pa_json.read_json(io.BytesIO(raw), parse_options=parse_opts)
        err = pa.nulls(tbl.num_rows, pa.string())
        return tbl.append_column(ERROR_COL, err)
    except pa.ArrowInvalid:
        pass  # corrupt shard: per-line slow path with quarantine

    rows: list[dict] = []
    for lineno, line in enumerate(raw.splitlines()):
        line = line.strip()
        if not line:
            continue
        try:
            obj = json.loads(line)
            if not isinstance(obj, dict):
                raise ValueError("not a JSON object")
            row = {f.name: obj.get(f.name) for f in schema}
            row[ERROR_COL] = None
        except (ValueError, TypeError) as exc:
            row = _null_row(schema)
            row[ERROR_COL] = f"{path}:{lineno}: {exc}"
        rows.append(row)
    out_schema = _schema_with_error(schema)
    if not rows:
        return out_schema.empty_table()
    try:
        return pa.Table.from_pylist(rows, schema=out_schema)
    except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError):
        pass
    # slow-slow path: a syntactically-valid JSON line carried a value
    # that violates the declared schema (e.g. {"id": "abc"} for an
    # int64 field).  Coerce row-by-row so the offending rows land in
    # quarantine instead of crashing the whole shard task (reference
    # S6/S8 semantics: skip-and-count, never abort the load).
    coerced: list[dict] = []
    for rowno, row in enumerate(rows):
        if row.get(ERROR_COL) is not None:
            coerced.append(row)
            continue
        try:
            pa.Table.from_pylist([row], schema=out_schema)
            coerced.append(row)
        except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError) as exc:
            bad = _null_row(schema)
            bad[ERROR_COL] = f"{path}:row{rowno}: schema mismatch: {exc}"
            coerced.append(bad)
    return pa.Table.from_pylist(coerced, schema=out_schema)


def read_jsonl_gz(paths, schema: pa.Schema):
    """Read ``*.jsonl.gz`` shards into a Dataset with quarantine rows.

    Returns a Dataset with ``schema`` columns plus ``_error: string``
    (null for valid rows). Use :func:`split_quarantine` to separate.
    """
    import ray.data as rd

    files = rd.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        parts = [
            _parse_shard(payload.as_py(), path.as_py(), schema)
            for payload, path in zip(batch.column("bytes"),
                                     batch.column("path"))
        ]
        if not parts:
            return _schema_with_error(schema).empty_table()
        return pa.concat_tables(parts, promote_options="default")

    # one shard per task is the memory-bounding unit; batch_size=1 keeps
    # decompressed buffers from stacking up in a single task heap
    return files.map_batches(parse, batch_format="pyarrow", batch_size=1)


def split_quarantine(ds):
    """Split an ingest Dataset into (valid_without_error_col, errors)."""
    import pyarrow.compute as pc

    def good(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t[ERROR_COL])).drop_columns([ERROR_COL])

    def bad(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t[ERROR_COL]))

    return (ds.map_batches(good, batch_format="pyarrow"),
            ds.map_batches(bad, batch_format="pyarrow"))


def write_partitioned(ds, path: str, partition_cols: list[str]):
    """S4 sink: one directory per partition-column value (resumable
    layout — a rerun skips or overwrites whole partitions, never a
    single giant file)."""
    ds.write_parquet(path, partition_cols=partition_cols)
