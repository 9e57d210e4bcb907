"""Extraction byte-identity + corpus generator determinism (north-rule
invariant: byte-identical extracted text per url)."""
import numpy as np
import pyarrow as pa

from reconcile_curation_in_cris_systems_ray.sources.corpus import (
    CorpusConfig, corpus_table, generate_family_rows, true_pairs,
)
from reconcile_curation_in_cris_systems_ray.stages.extract import (
    HtmlTextExtractor, extract_html_text,
)

CFG = CorpusConfig(n_families=30)


def test_extraction_byte_identity():
    tbl = corpus_table(CFG)
    htmls = tbl.column("html").to_pylist()
    texts = tbl.column("text").to_pylist()
    assert len(htmls) > 50
    for h, t in zip(htmls, texts):
        assert extract_html_text(h) == t  # byte-identical


def test_extractor_skips_boilerplate():
    html = (b"<html><head><title>T</title></head><body>"
            b"<nav><p>menu</p></nav><main><h1>Head</h1><p>body &amp; text</p>"
            b"</main><footer><p>c</p></footer></body></html>")
    assert extract_html_text(html) == "Head\nbody & text"


def test_extractor_batch_quarantine():
    batch = pa.table({
        "url": ["a", "b"],
        "html": [b"<p>ok</p>", None],
    })
    out = HtmlTextExtractor()(batch)
    texts = out.column("extracted_text").to_pylist()
    errs = out.column("extract_error").to_pylist()
    assert texts[0] == "ok" and errs[0] is None
    assert texts[1] == "" and errs[1] is not None


def test_corpus_deterministic_and_partition_independent():
    t1 = corpus_table(CFG)
    t2 = corpus_table(CFG)
    assert t1.equals(t2)
    # generating families in two arbitrary splits yields the same rows
    a = generate_family_rows(np.array([0, 5, 7]), CFG)
    b = generate_family_rows(np.array([5]), CFG)
    sel = a.filter(pa.compute.equal(a.column("cluster_id"), 5))
    assert sel.equals(b)


def test_corpus_has_skew_and_nonlatin():
    tbl = corpus_table(CorpusConfig(n_families=80))
    cids = tbl.column("cluster_id").to_pylist()
    assert cids.count(0) >= 40  # giant family
    assert "zh" in set(tbl.column("lang").to_pylist())
    assert len(true_pairs(tbl)) > 100


def test_field_trie_nested_arrays_and_wildcards():
    """M1 hard cases: array-index subfield paths (a[0].b[1].c),
    dynamic-key wildcard objects, terminal-with-children fallthrough.
    Ref: openalex main.rs:444-499, crossref main.rs:598-606."""
    from reconcile_curation_in_cris_systems_ray.stages.fields import (
        PatternTrie, extract_fields_from_doc, parse_field_specifications,
    )

    doc = {
        "a": [
            {"b": [{"c": 1}, {"c": 2}]},
            {"b": [{"c": 3}]},
        ],
        "rel": {"cites": [{"id": "x"}], "funds": [{"id": "y"}]},
        "top": {"mid": "leaf", "deep": {"k": True}},
    }
    trie = PatternTrie.build(parse_field_specifications(
        "a.b.c, rel.*.id, top.mid, top.deep"))
    rows = sorted(extract_fields_from_doc(doc, trie))
    assert rows == sorted([
        ("a.b.c", "a[0].b[0].c", "1"),
        ("a.b.c", "a[0].b[1].c", "2"),
        ("a.b.c", "a[1].b[0].c", "3"),
        ("rel.*.id", "rel.cites[0].id", "x"),
        ("rel.*.id", "rel.funds[0].id", "y"),
        ("top.mid", "top.mid", "leaf"),
        # nested leftover JSON-serialized, bools lowercased (ref
        # main.rs:453-462 stringly-typed rows)
        ("top.deep", "top.deep", '{"k":true}'),
    ])


def test_field_trie_array_of_scalars_and_missing_keys():
    from reconcile_curation_in_cris_systems_ray.stages.fields import (
        PatternTrie, extract_fields_from_doc, parse_field_specifications,
    )

    trie = PatternTrie.build(parse_field_specifications("ids, nope.x"))
    rows = extract_fields_from_doc({"ids": [10, 20], "other": 1}, trie)
    assert sorted(rows) == [("ids", "ids[0]", "10"), ("ids", "ids[1]", "20")]
    # top-level array documents traverse transparently too
    rows2 = extract_fields_from_doc([{"ids": [7]}], trie)
    assert rows2 == [("ids", "[0].ids[0]", "7")]


def test_fast_extractor_matches_stdlib_on_corpus():
    from reconcile_curation_in_cris_systems_ray.stages.extract import (
        extract_html_text_fast,
    )

    tbl = corpus_table(CorpusConfig(n_families=40))
    for h in tbl.column("html").to_pylist():
        assert extract_html_text_fast(h) == extract_html_text(h)


def test_fast_extractor_matches_stdlib_on_malformed():
    from reconcile_curation_in_cris_systems_ray.stages.extract import (
        extract_html_text_fast,
    )

    cases = [
        "", "plain", "<P>Upper</P>", "<p>a<b>c</b>d</p>",
        "<script>var a = '<p>x</p>';</script><p>yes</p>",
        "<script src='x'/><p>ok</p>",
        "<p>a &amp; b &#65; &#x42; &unknown; &lt</p>",
        "<!-- <p>c</p> --><p>real</p>", "<!DOCTYPE html><p>x</p>",
        "<?php echo '<p>no</p>' ?><p>si</p>",
        "<p class=\"a>b\" id='c>d'>quoted</p>",
        "<p>unclosed keep", "<p>a < b</p>", "<p>a<3 b</p>",
        "<p/>text<p>real</p>", "<p >spacey</p >", "</ p>odd</p>",
        "<p>text</p", "<p>text<", "<p>a<b",
        "<SCRIPT>x</SCRIPT><p>y</p>", "<script>no close<p>q</p>",
        "<script>a</script  ><p>b</p>", "<script>a</ script><p>b</p>",
        "<p>nested <p>double</p> tail</p>",
        "<header><h1>skip</h1></header><h2>keep</h2>",
        "<p =weird>odd</p>", "<p disabled>boolattr</p>",
    ]
    for h in cases:
        assert extract_html_text_fast(h) == extract_html_text(h), h


def test_fast_extractor_fuzz_differential():
    """Hypothesis fuzz: random tag soup from the relevant alphabet must
    extract byte-identically under both implementations."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from reconcile_curation_in_cris_systems_ray.stages.extract import (
        extract_html_text_fast,
    )

    frag = st.sampled_from([
        "<p>", "</p>", "<h1>", "</h1>", "<nav>", "</nav>", "<script>",
        "</script>", "<style>", "</style>", "<p/>", "<p >", "</ p>",
        "<!--", "-->", "<!x>", "<?y>", "<", ">", "&amp;", "&#65;", "&x",
        "text ", "a<b ", "5>4 ", "x='q>r'", '"', "'", " ", "\n",
        "<p class='z'>", "<div>", "</div>", "<span>", "</span>",
    ])

    @settings(max_examples=300, deadline=None)
    @given(st.lists(frag, min_size=0, max_size=25))
    def run(parts):
        h = "".join(parts)
        assert extract_html_text_fast(h) == extract_html_text(h), repr(h)

    run()
