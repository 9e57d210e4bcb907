"""Columnar container sources/sinks beyond Parquet: ORC and Arrow IPC.

Extends the engine's source matrix (SURVEY §2.1 S1-S8; Parquet/CSV/
JSONL-gz/WARC already covered) with the two remaining columnar wire
formats a lake-adjacent pipeline meets: Apache ORC (Hive/Trino lakes)
and Arrow IPC a.k.a. Feather v2 (zero-copy inter-process handoff).
Both ride pyarrow's C++ readers — no Python row loops.

Scale shape: one file = one Ray task (``read_binary_files`` →
``map_batches`` decode), the bounded-shard model shared with the
JSONL and WARC sources; the streaming executor pipelines decode with
downstream stages under backpressure.  A corrupt file quarantines
into a single all-null row with ``_error`` set (S6/S8 semantics)
rather than failing the task; pass ``schema`` so quarantine rows can
be typed when the first file is the broken one.
"""

from __future__ import annotations

import pyarrow as pa


def _quarantine(schema: pa.Schema | None, path: str,
                exc: Exception) -> pa.Table:
    cols: dict = {}
    if schema is not None:
        for f in schema:
            cols[f.name] = pa.nulls(1, f.type)
    cols["_error"] = pa.array([f"{path}: {exc}"], pa.string())
    return pa.table(cols)


def _with_error_col(tbl: pa.Table) -> pa.Table:
    if "_error" in tbl.column_names:
        return tbl
    return tbl.append_column("_error", pa.nulls(tbl.num_rows, pa.string()))


def _reader_source(paths, decode_one, schema: pa.Schema | None):
    import ray.data as rd

    files = rd.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        tables = []
        for payload, path in zip(batch.column("bytes"),
                                 batch.column("path")):
            p = path.as_py()
            try:
                tables.append(_with_error_col(decode_one(payload.as_py())))
            except Exception as exc:
                tables.append(_quarantine(schema, p, exc))
        return pa.concat_tables(tables, promote_options="default")

    return files.map_batches(parse, batch_format="pyarrow")


def read_orc(paths, columns: list[str] | None = None,
             schema: pa.Schema | None = None):
    """Dataset from ORC files/dirs; ``columns`` prunes at the decode."""

    def decode(raw: bytes) -> pa.Table:
        import pyarrow.orc as orc

        return orc.ORCFile(pa.BufferReader(raw)).read(columns=columns)

    return _reader_source(paths, decode, schema)


def write_orc_file(path: str, table: pa.Table) -> None:
    import pyarrow.orc as orc

    orc.write_table(table, path)


def read_ipc(paths, schema: pa.Schema | None = None):
    """Dataset from Arrow IPC (Feather v2) files — file or stream
    format, sniffed by magic bytes."""

    def decode(raw: bytes) -> pa.Table:
        buf = pa.BufferReader(raw)
        if raw[:6] == b"ARROW1":
            return pa.ipc.open_file(buf).read_all()
        return pa.ipc.open_stream(buf).read_all()

    return _reader_source(paths, decode, schema)


def write_ipc_file(path: str, table: pa.Table) -> None:
    with pa.OSFile(path, "wb") as sink:
        with pa.ipc.new_file(sink, table.schema) as writer:
            writer.write_table(table)
