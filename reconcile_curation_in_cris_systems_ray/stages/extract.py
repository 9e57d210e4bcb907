"""HTML -> text extraction stage (the pipeline's stateful actor pool).

Mirrors the reference's "load once, extract per record" pattern (Flair
model at ``query_db/analysis/entity_extraction.py:5-69``; pattern trie
at ``openalex-fast-field-parse/src/main.rs:400-436``): the parser is
constructed once per actor in ``__init__`` and applied per Arrow batch
in ``__call__``.

Extraction contract (deterministic, pinned by tests): the text of a
page is the text content of body block elements ``h1..h6`` and ``p``
that are **not** descendants of ``nav/header/footer/aside/script/
style/noscript``, in document order, joined by ``"\\n"``, with HTML
entities unescaped.  ``<title>`` is ignored (body content only — a
trafilatura-style main-content rule).  Real extraction libraries are
not available in this container; this stdlib parser is the real,
tested implementation and the byte-identity target.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pyarrow as pa

_SKIP = {"nav", "header", "footer", "aside", "script", "style", "noscript"}
_KEEP = {"p", "h1", "h2", "h3", "h4", "h5", "h6"}


class _MainTextParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.skip_depth = 0
        self.keep_depth = 0
        self.chunks: list[str] = []
        self.current: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP:
            self.skip_depth += 1
        elif tag in _KEEP and self.skip_depth == 0:
            if self.keep_depth == 0:
                self.current = []
            self.keep_depth += 1

    def handle_endtag(self, tag):
        if tag in _SKIP:
            self.skip_depth = max(0, self.skip_depth - 1)
        elif tag in _KEEP and self.skip_depth == 0 and self.keep_depth > 0:
            self.keep_depth -= 1
            if self.keep_depth == 0:
                text = "".join(self.current)
                if text:
                    self.chunks.append(text)

    def handle_data(self, data):
        if self.keep_depth > 0 and self.skip_depth == 0:
            self.current.append(data)


def extract_html_text(html: bytes | str) -> str:
    """Deterministic main-content text of one HTML document."""
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    parser = _MainTextParser()
    parser.feed(html)
    parser.close()
    if parser.keep_depth > 0:  # unclosed keep element at EOF
        text = "".join(parser.current)
        if text:
            parser.chunks.append(text)
    return "\n".join(parser.chunks)


class HtmlTextExtractor:
    """Actor-pool batch callable: html binary column -> extracted_text.

    Use as ``ds.map_batches(HtmlTextExtractor, batch_format="pyarrow",
    batch_size=cfg.exec.extract_batch_size,
    concurrency=cfg.exec.extract_concurrency)``.

    Rows whose HTML fails to parse are quarantined in-band: the
    ``extract_error`` column is non-null and ``extracted_text`` is ''
    (reference keeps an ``import_errors`` side table,
    ``build_db.py:115-121``; callers can filter the error rows to a
    quarantine sink).
    """

    def __init__(self, html_col: str = "html", out_col: str = "extracted_text"):
        self.html_col = html_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch.column(self.html_col).to_pylist()
        texts: list[str] = []
        errors: list[str | None] = []
        for h in htmls:
            try:
                texts.append(extract_html_text(h))
                errors.append(None)
            except Exception as exc:  # quarantine, never fail the batch
                texts.append("")
                errors.append(f"{type(exc).__name__}: {exc}")
        batch = batch.drop_columns([self.html_col])
        batch = batch.append_column(self.out_col, pa.array(texts, pa.string()))
        return batch.append_column("extract_error",
                                   pa.array(errors, pa.string()))
