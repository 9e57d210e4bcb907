"""Gzip-JSONL ingest: quarantine semantics + partitioned sink.

Reference parity: S2 skip-and-count bad lines
(openalex-fast-field-parse/src/main.rs:576-582), S6/S8 import_errors
side table (build_db.py:115-121,290-304), S4 organized output
(src/main.rs:1014-1107).
"""

import gzip
import json
import os

import pyarrow as pa
import pytest

from reconcile_curation_in_cris_systems_ray.sources.jsonl import (
    read_jsonl_gz, split_quarantine, write_partitioned,
)

SCHEMA = pa.schema([("id", pa.int64()), ("kind", pa.string()),
                    ("value", pa.float64())])


@pytest.fixture()
def shard_dir(tmp_path):
    rows = [{"id": i, "kind": "ab"[i % 2], "value": i / 7.0}
            for i in range(50)]
    clean = [json.dumps(r) for r in rows[:25]]
    dirty = (["{oops", "[]", json.dumps({"id": 99, "kind": "a",
                                         "value": 9.0})]
             + [json.dumps(r) for r in rows[25:]])
    for name, lines in (("clean.jsonl.gz", clean),
                        ("dirty.jsonl.gz", dirty)):
        with gzip.open(tmp_path / name, "wt") as f:
            f.write("\n".join(lines) + "\n")
    return str(tmp_path)


def test_quarantine_split(ray_session, shard_dir):
    raw = read_jsonl_gz(shard_dir, SCHEMA)
    valid, errors = split_quarantine(raw)
    errs = errors.take_all()
    assert len(errs) == 2
    assert all("dirty.jsonl.gz" in e["_error"] for e in errs)
    good = valid.take_all()
    assert len(good) == 51  # 50 rows + the valid id=99 row in dirty
    ids = sorted(r["id"] for r in good)
    assert ids == sorted(list(range(50)) + [99])
    # typed columns survive both the vectorized and the fallback path
    assert valid.schema().names == ["id", "kind", "value"]


def test_partitioned_sink_roundtrip(ray_session, shard_dir, tmp_path):
    import ray.data as rd

    valid, _ = split_quarantine(read_jsonl_gz(shard_dir, SCHEMA))
    sink = str(tmp_path / "sink")
    write_partitioned(valid, sink, ["kind"])
    # hive layout: one directory per key value (resumable unit)
    assert sorted(d for d in os.listdir(sink) if d.startswith("kind=")) \
        == ["kind=a", "kind=b"]
    back = rd.read_parquet(sink)
    assert back.count() == 51
    kinds = {r["kind"] for r in back.select_columns(["kind"]).take_all()}
    assert kinds == {"a", "b"}
