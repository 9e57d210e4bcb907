"""WARC source: roundtrip, HTTP-envelope stripping, record-type
filter, malformed-file quarantine, per-record gzip members."""

import gzip

import pytest


def test_warc_roundtrip_and_quarantine(ray_session, tmp_path):
    from reconcile_curation_in_cris_systems_ray.sources.warc import (
        read_warc, write_warc_file,
    )

    good = tmp_path / "a.warc"
    write_warc_file(str(good), [
        {"url": "https://x.org/1", "payload": b"hello world",
         "http_headers": b"HTTP/1.1 200 OK\r\nX: y"},
        {"url": "https://x.org/meta", "payload": b"ignored",
         "warc_type": "metadata"},
        {"url": "https://x.org/2", "payload": b"\xf0\x9f\x8c\x8d bytes"},
    ])
    bad = tmp_path / "b.warc"
    bad.write_bytes(b"NOT A WARC FILE AT ALL")

    rows = read_warc([str(good), str(bad)]).take_all()
    by_url = {r["url"]: r for r in rows if r["_error"] is None}
    # metadata record filtered out by default record_types
    assert set(by_url) == {"https://x.org/1", "https://x.org/2"}
    # HTTP envelope stripped from the payload, kept in n_bytes
    assert by_url["https://x.org/1"]["payload"] == b"hello world"
    assert by_url["https://x.org/1"]["n_bytes"] > len(b"hello world")
    assert by_url["https://x.org/2"]["payload"] == b"\xf0\x9f\x8c\x8d bytes"
    errs = [r for r in rows if r["_error"] is not None]
    assert len(errs) == 1 and "b.warc" in errs[0]["_error"]


def test_warc_per_record_gzip_members(ray_session, tmp_path):
    """Common Crawl gzips each record as its own member; the reader
    must decompress the whole multi-member stream."""
    from reconcile_curation_in_cris_systems_ray.sources.warc import (
        read_warc, write_warc_file,
    )

    one = tmp_path / "one.warc"
    two = tmp_path / "two.warc"
    write_warc_file(str(one), [{"url": "https://x.org/a",
                                "payload": b"AAA"}])
    write_warc_file(str(two), [{"url": "https://x.org/b",
                                "payload": b"BBB"}])
    multi = tmp_path / "multi.warc.gz"
    multi.write_bytes(gzip.compress(one.read_bytes())
                      + gzip.compress(two.read_bytes()))

    rows = read_warc([str(multi)]).take_all()
    assert {r["url"]: r["payload"] for r in rows} == {
        "https://x.org/a": b"AAA", "https://x.org/b": b"BBB"}


def test_sniff_mime_signatures(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from reconcile_curation_in_cris_systems_ray.stages.multimodal import (
        sniff_mime,
    )

    payloads = [
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 8,
        b"\xff\xd8\xff\xe0rest-of-jpeg",
        b"GIF89a.....",
        b"RIFF\x00\x00\x00\x00WEBPVP8 ",
        b"RIFF\x00\x00\x00\x00WAVEfmt ",
        b"%PDF-1.7\n",
        b"\x1f\x8b\x08\x00gz",
        b"PK\x03\x04zipfile",
        b"<html><body>hi</body></html>",
        b"plain words only",
        b"\x00\x01\x02\xfe\xff binary junk",
        b"",
    ]
    expect = ["image/png", "image/jpeg", "image/gif", "image/webp",
              "audio/wav", "application/pdf", "application/gzip",
              "application/zip", "text/html", "text/plain",
              "application/octet-stream", "application/octet-stream"]
    ds = rd.from_arrow(pa.table({
        "media_id": [str(i) for i in range(len(payloads))],
        "payload": payloads,
    }))
    rows = sniff_mime(ds).take_all()
    got = {r["media_id"]: r["mime_sniffed"] for r in rows}
    for i, e in enumerate(expect):
        assert got[str(i)] == e, (i, payloads[i], got[str(i)], e)
