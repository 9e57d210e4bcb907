"""ORC / Arrow-IPC container sources: fidelity and quarantine."""

from __future__ import annotations

import os

import pyarrow as pa

from reconcile_curation_in_cris_systems_ray.sources.columnar import (
    read_ipc, read_orc, write_ipc_file, write_orc_file,
)

TBL = pa.table({"a": pa.array([1, 2, 3], pa.int64()),
                "b": pa.array(["x", None, "z"], pa.string())})


def test_orc_roundtrip_with_quarantine(ray_session, tmp_path):
    good = os.path.join(tmp_path, "good.orc")
    bad = os.path.join(tmp_path, "bad.orc")
    write_orc_file(good, TBL)
    with open(bad, "wb") as f:
        f.write(b"ORC\x00not really an orc file")
    out = read_orc([good, bad], schema=TBL.schema).to_pandas()
    errs = out[out["_error"].notna()]
    ok = out[out["_error"].isna()].sort_values("a").reset_index(drop=True)
    assert len(errs) == 1 and "bad.orc" in errs["_error"].iloc[0]
    assert ok["a"].tolist() == [1, 2, 3]
    assert ok["b"].tolist()[0] == "x" and ok["b"].isna().tolist()[1]


def test_ipc_roundtrip_both_formats(ray_session, tmp_path):
    fpath = os.path.join(tmp_path, "file.arrow")
    spath = os.path.join(tmp_path, "stream.arrows")
    write_ipc_file(fpath, TBL)
    with pa.OSFile(spath, "wb") as sink:
        with pa.ipc.new_stream(sink, TBL.schema) as w:
            w.write_table(TBL)
    out = read_ipc([fpath, spath]).to_pandas()
    assert len(out) == 6
    assert sorted(out["a"].tolist()) == [1, 1, 2, 2, 3, 3]
    assert out["_error"].isna().all()


def test_orc_column_pruning(ray_session, tmp_path):
    p = os.path.join(tmp_path, "t.orc")
    write_orc_file(p, TBL)
    out = read_orc([p], columns=["a"]).to_pandas()
    assert sorted(out.columns) == ["_error", "a"]
