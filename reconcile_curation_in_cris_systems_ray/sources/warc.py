"""WARC (Web ARChive, ISO 28500) source — the Common Crawl container.

The reference ingests row-oriented dumps (SURVEY §2.1); the north rule
re-targets the engine onto Common-Crawl-style web pages, whose native
wire format is WARC: concatenated records, each a ``WARC/1.0`` header
block (CRLF-separated ``Name: value`` lines, byte length given by
``Content-Length``), a blank line, the payload, then ``\r\n\r\n``.
Common Crawl ships one gzip member per record; whole-file gzip is also
accepted (both begin with the same magic and ``gzip.decompress``
handles multi-member streams).

Scale shape: one file = one Ray task (``read_binary_files`` →
``map_batches`` parse), the same bounded-shard model as the JSONL
source — a CC segment is ~1 GiB compressed, so memory stays flat and
the streaming executor pipelines decompress → parse → downstream with
backpressure.  The parser walks ``Content-Length`` offsets (no regex
scan over the buffer); malformed trailing bytes quarantine into an
``_error`` row per file rather than failing the task (S6 semantics).

HTTP ``response`` records carry the HTTP reply in the payload; the
parser splits status/headers from the body when the payload starts
with ``HTTP/`` so ``payload`` is the document bytes (what extraction
wants), and keeps the raw length in ``n_bytes``.
"""

from __future__ import annotations

import gzip

import pyarrow as pa

_CRLF2 = b"\r\n\r\n"

_FIELDS = [
    ("url", pa.string()),
    ("warc_type", pa.string()),
    ("warc_date", pa.string()),
    ("payload", pa.binary()),
    ("n_bytes", pa.int64()),
    ("_error", pa.string()),
]
_SCHEMA = pa.schema(_FIELDS)


def _empty_cols() -> dict[str, list]:
    return {name: [] for name, _ in _FIELDS}


def _parse_warc_buffer(raw: bytes, cols: dict[str, list]) -> None:
    """Append one record per WARC block in ``raw`` to ``cols``."""
    pos, n = 0, len(raw)
    while pos < n:
        # skip inter-record padding
        while pos < n and raw[pos:pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        head_end = raw.find(_CRLF2, pos)
        if head_end < 0 or not raw.startswith(b"WARC/", pos):
            raise ValueError(f"malformed WARC header at byte {pos}")
        headers: dict[str, str] = {}
        for line in raw[pos:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("ascii", "replace").lower()] = \
                v.strip().decode("utf-8", "replace")
        length = int(headers.get("content-length", "0"))
        body_start = head_end + len(_CRLF2)
        payload = raw[body_start:body_start + length]
        pos = body_start + length
        # HTTP response payloads: drop the HTTP envelope, keep the body
        if payload.startswith(b"HTTP/"):
            split = payload.find(_CRLF2)
            payload = payload[split + len(_CRLF2):] if split >= 0 else b""
        cols["url"].append(headers.get("warc-target-uri"))
        cols["warc_type"].append(headers.get("warc-type"))
        cols["warc_date"].append(headers.get("warc-date"))
        cols["payload"].append(payload)
        cols["n_bytes"].append(length)
        cols["_error"].append(None)


def _parse_file(payload: bytes, path: str) -> pa.Table:
    cols = _empty_cols()
    try:
        if payload[:2] == b"\x1f\x8b":
            payload = gzip.decompress(payload)  # multi-member safe
        _parse_warc_buffer(payload, cols)
    except Exception as exc:  # quarantine the file, don't fail the task
        cols = _empty_cols()
        cols["url"].append(None)
        cols["warc_type"].append(None)
        cols["warc_date"].append(None)
        cols["payload"].append(None)
        cols["n_bytes"].append(0)
        cols["_error"].append(f"{path}: {exc}")
    return pa.Table.from_pydict(cols, schema=_SCHEMA)


def read_warc(paths, record_types: tuple[str, ...] = ("response",)):
    """Dataset of WARC records from files/dirs (optionally gzipped).

    Returns columns ``(url, warc_type, warc_date, payload, n_bytes,
    _error)``; rows are filtered to ``record_types`` (quarantine rows
    always pass so the caller can split them off, S8-style).
    """
    import ray.data as rd

    files = rd.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        tables = [
            _parse_file(payload.as_py(), path.as_py())
            for payload, path in zip(batch.column("bytes"),
                                     batch.column("path"))
        ]
        out = pa.concat_tables(tables) if tables else \
            _SCHEMA.empty_table()
        if record_types:
            import pyarrow.compute as pc

            keep = pc.or_(
                pc.is_in(out.column("warc_type"),
                         value_set=pa.array(record_types)),
                pc.is_valid(out.column("_error")))
            out = out.filter(keep)
        return out

    return files.map_batches(parse, batch_format="pyarrow")


def write_warc_file(path: str, records: list[dict],
                    compress: bool = False) -> None:
    """Serialize ``records`` (dicts: url, date, payload bytes,
    http_headers optional) into one WARC file — the test/roundtrip
    sink; real archives come from the crawler."""
    chunks: list[bytes] = []
    for r in records:
        payload = r["payload"]
        if r.get("http_headers"):
            payload = r["http_headers"] + _CRLF2 + payload
        head = (f"WARC/1.0\r\n"
                f"WARC-Type: {r.get('warc_type', 'response')}\r\n"
                f"WARC-Target-URI: {r['url']}\r\n"
                f"WARC-Date: {r.get('date', '2024-01-01T00:00:00Z')}\r\n"
                f"Content-Length: {len(payload)}\r\n").encode()
        chunks.append(head + b"\r\n" + payload + _CRLF2)
    blob = b"".join(chunks)
    if compress:
        blob = gzip.compress(blob, compresslevel=1)
    with open(path, "wb") as f:
        f.write(blob)
