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


def test_schema_type_mismatch_quarantined(ray_session, tmp_path):
    """A syntactically-valid JSON line whose value violates the declared
    schema (string in an int64 field) must land in quarantine, not crash
    the shard task (reference S6 error-tolerant-load semantics)."""
    lines = [
        json.dumps({"id": 1, "kind": "a", "value": 1.0}),
        json.dumps({"id": "abc", "kind": "b", "value": 2.0}),  # bad type
        json.dumps({"id": 3, "kind": "c", "value": 3.0}),
        "{not json",                                           # bad syntax
    ]
    p = tmp_path / "typed.jsonl.gz"
    with gzip.open(p, "wt") as f:
        f.write("\n".join(lines) + "\n")

    valid, errors = split_quarantine(read_jsonl_gz([str(p)], SCHEMA))
    good = valid.to_pandas().sort_values("id").reset_index(drop=True)
    bad = errors.to_pandas()
    assert list(good["id"]) == [1, 3]
    assert len(bad) == 2
    assert bad["_error"].str.contains("schema mismatch|Expected|invalid",
                                      regex=True).any()
