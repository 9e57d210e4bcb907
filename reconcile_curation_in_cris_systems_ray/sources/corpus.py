"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md F-1/F-2).

Schema per ``BASELINE.json`` input_hint:
``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)`` plus a ground-truth ``cluster_id: int64`` column (the
pipeline drops it; tests and the F1 gate keep it).

Design:
- generation is itself a Ray Data stage: ``ray.data.range(n_families)
  -> map_batches(family generator)`` so bench-scale corpora are built
  in parallel without driver loops; everything is seeded **per family
  id**, so output is independent of partitioning and parallelism.
- each family has a canonical page + 0..5 near-duplicate variants
  (token drop/replace at <=8% — keeps 3-token-shingle Jaccard vs the
  canonical well above the 0.5 match threshold), sharing a domain and
  url stem with query-param variants.
- cluster-size skew: family 0 is a "giant" family (many variants on a
  boilerplate-heavy domain) to exercise hot-key salting.
- a non-Latin minority (synthetic CJK text, ``lang='zh'``) exercises
  the Latin-gate normalization semantic.
- html wraps the ground-truth text in ``<title>`` / ``<p>`` inside
  ``<main>`` with nav/footer/script boilerplate, so extraction has real
  work to do and a knowable byte-exact answer: the ground truth is
  ``title + "\\n" + "\\n".join(paragraphs)``.
"""

from __future__ import annotations

import html as html_mod
from dataclasses import dataclass
from functools import lru_cache

import numpy as np
import pyarrow as pa

CORPUS_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
    ("cluster_id", pa.int64()),
])

_BASE_TS = np.datetime64("2024-03-01T00:00:00", "us")


@dataclass(frozen=True)
class CorpusConfig:
    n_families: int = 200
    seed: int = 42
    singleton_frac: float = 0.35      # families with zero variants
    giant_family_variants: int = 40   # family 0 size (hot-key skew)
    max_variants: int = 5
    nonlatin_frac: float = 0.08
    vocab_size: int = 4000
    n_domains: int = 12               # few domains -> per-domain skew


@lru_cache(maxsize=4)
def _vocab(seed: int, size: int) -> np.ndarray:
    rng = np.random.default_rng(seed + 101)
    syll = np.array([c + v for c in "bcdfghjklmnprstvwz" for v in "aeiou"])
    n_syll = rng.integers(2, 5, size=size)
    words = ["".join(rng.choice(syll, k)) for k in n_syll]
    return np.array(words, dtype=object)


@lru_cache(maxsize=4)
def _cjk_vocab(seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed + 202)
    cps = rng.integers(0x4E00, 0x9FFF, size=800)
    return np.array(["".join(chr(c) for c in rng.choice(cps, k))
                     for k in rng.integers(1, 4, size=500)], dtype=object)


def _make_paragraphs(rng: np.random.Generator, vocab: np.ndarray,
                     n_paras: int, joiner: str = " ") -> list[str]:
    paras = []
    for _ in range(n_paras):
        n_words = int(rng.integers(25, 70))
        paras.append(joiner.join(rng.choice(vocab, n_words)))
    return paras


def _variant_tokens(rng: np.random.Generator, tokens: list[str],
                    vocab: np.ndarray, edit_frac: float) -> list[str]:
    toks = list(tokens)
    n_edit = max(1, int(len(toks) * edit_frac))
    idx = rng.choice(len(toks), size=min(n_edit, len(toks)), replace=False)
    for i in idx:
        if rng.random() < 0.5:
            toks[i] = str(rng.choice(vocab))
        else:
            toks[i] = ""
    return [t for t in toks if t]


def _render_html(title: str, paragraphs: list[str], domain: str,
                 rng: np.random.Generator) -> bytes:
    esc = html_mod.escape
    nav_links = "".join(
        f'<li><a href="/{p}">{esc(p)}</a></li>'
        for p in ("home", "about", "products", "contact", "blog"))
    noise = " ".join(str(rng.integers(0, 9999)) for _ in range(8))
    body_paras = "".join(f"<p>{esc(p)}</p>" for p in paragraphs)
    doc = (
        "<!DOCTYPE html><html><head>"
        f"<title>{esc(title)}</title>"
        f"<script>var t={noise!r};</script>"
        "<style>body{margin:0}</style>"
        "</head><body>"
        f'<nav><ul>{nav_links}</ul><p>Welcome to {esc(domain)} — '
        "the best site on the web &amp; beyond</p></nav>"
        f"<main><h1>{esc(title)}</h1>{body_paras}</main>"
        f"<footer><p>© 2024 {esc(domain)} — all rights reserved. "
        f"Tracking {noise}</p></footer>"
        "</body></html>"
    )
    return doc.encode("utf-8")


def expected_text(title: str, paragraphs: list[str]) -> str:
    """The byte-identity ground truth the extractor must reproduce."""
    return "\n".join([title] + list(paragraphs))


def generate_family_rows(family_ids: np.ndarray, cfg: CorpusConfig) -> pa.Table:
    """All corpus rows for the given family ids (deterministic per id)."""
    vocab = _vocab(cfg.seed, cfg.vocab_size)
    cjk = _cjk_vocab(cfg.seed)
    cols: dict[str, list] = {k.name: [] for k in CORPUS_SCHEMA}
    for fid in family_ids.tolist():
        rng = np.random.default_rng((cfg.seed << 20) + fid)
        is_cjk = (fid != 0) and (rng.random() < cfg.nonlatin_frac)
        fam_vocab = cjk if is_cjk else vocab
        joiner = "" if is_cjk else " "
        lang = "zh" if is_cjk else ("en" if rng.random() < 0.9 else "de")
        domain = f"site{rng.integers(0, cfg.n_domains)}.example.com"
        slug = f"page-{fid}-" + "-".join(rng.choice(vocab, 2))
        title = " ".join(rng.choice(fam_vocab, int(rng.integers(3, 8))))
        paragraphs = _make_paragraphs(rng, fam_vocab,
                                      int(rng.integers(3, 8)), joiner)
        if fid == 0:
            n_variants = cfg.giant_family_variants
        elif rng.random() < cfg.singleton_frac:
            n_variants = 0
        else:
            n_variants = int(rng.integers(1, cfg.max_variants + 1))
        for v in range(n_variants + 1):
            if v == 0:
                v_title, v_paras = title, paragraphs
                url = f"https://{domain}/{slug}"
            else:
                # char-level edits (CJK) carry ~2x the shingle damage of
                # word-level edits; keep char-edit rates lower so variant
                # Jaccard stays decisively above the 0.5 match threshold
                edit = float(rng.uniform(0.01, 0.04)) if is_cjk \
                    else float(rng.uniform(0.02, 0.08))
                v_paras = []
                for p in paragraphs:
                    toks = p.split(" ") if joiner else list(p)
                    v_paras.append(joiner.join(
                        _variant_tokens(rng, toks, fam_vocab, edit)) or p)
                v_title = title
                url = f"https://{domain}/{slug}?v={v}&ref=rss"
            text = expected_text(v_title, v_paras)
            cols["url"].append(url)
            cols["warc_ts"].append(
                _BASE_TS + np.timedelta64(int(fid) * 3600 + v * 60, "s"))
            cols["html"].append(_render_html(v_title, v_paras, domain, rng))
            cols["text"].append(text)
            cols["lang"].append(lang)
            cols["cluster_id"].append(fid)
    return pa.Table.from_pydict(
        {n: pa.array(cols[n], type=CORPUS_SCHEMA.field(n).type)
         for n in cols})


def corpus_dataset(cfg: CorpusConfig, override_num_blocks: int | None = None):
    """Distributed deterministic corpus as a ``ray.data.Dataset``.

    Partition-independent: each family's rows depend only on
    ``(cfg.seed, family_id)``.
    """
    import ray.data as rd

    # ~512 families (~1.5k pages) per block: small enough for work
    # stealing, big enough that per-task dispatch overhead (~5ms/task
    # on the driver) stays <1% — 64-family blocks made every downstream
    # scan dispatch-bound (684 tasks ~= 3.4s of pure dispatch)
    n_blocks = override_num_blocks or max(8, cfg.n_families // 512)
    base = rd.range(cfg.n_families, override_num_blocks=n_blocks)

    def gen(batch: pa.Table) -> pa.Table:
        return generate_family_rows(
            batch.column("id").to_numpy(zero_copy_only=False), cfg)

    return base.map_batches(gen, batch_format="pyarrow")


def corpus_table(cfg: CorpusConfig) -> pa.Table:
    """Local (driver-side) corpus for small tests — same rows as the
    distributed path by construction."""
    return generate_family_rows(np.arange(cfg.n_families), cfg)


def true_pairs(table: pa.Table) -> set[tuple[str, str]]:
    """Ground-truth positive url pairs (canonical ``a < b``) from the
    ``cluster_id`` column — the F1 oracle for tests."""
    import collections
    by_cluster = collections.defaultdict(list)
    for url, cid in zip(table.column("url").to_pylist(),
                        table.column("cluster_id").to_pylist()):
        by_cluster[cid].append(url)
    pairs = set()
    for urls in by_cluster.values():
        urls = sorted(urls)
        for i in range(len(urls)):
            for j in range(i + 1, len(urls)):
                pairs.add((urls[i], urls[j]))
    return pairs
