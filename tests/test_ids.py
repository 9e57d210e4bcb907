"""extract_doi truth table (reference query_db/utils.py:29-59 behavior)."""
import pytest

from reconcile_curation_in_cris_systems_ray.functions.ids import (
    canonicalize_url, extract_doi, url_tokens,
)

DOI_CASES = [
    ("https://doi.org/10.1234/abc.1", "10.1234/abc.1"),
    ("http://dx.doi.org/10.5555/xyz", "10.5555/xyz"),
    ("doi:10.1234/j.test.2020", "10.1234/j.test.2020"),
    ("DOI:10.1234/a", "10.1234/a"),
    ('<10.1234/wrapped>', "10.1234/wrapped"),
    ('"10.1234/quoted"', "10.1234/quoted"),
    ("10.1234/with?query=1", "10.1234/with"),
    ("10.1234/with#frag", "10.1234/with"),
    ("10.1234/trailing.,;:", "10.1234/trailing"),
    # regex needs >=4 registrant digits, but the trailing fallback
    # ("10." + "/") still accepts — reference behavior
    ("10.12/too-short-prefix", "10.12/too-short-prefix"),
    ("not a doi", None),
    ("", None),
    (None, None),
    (123, None),
]


@pytest.mark.parametrize("raw,expected", DOI_CASES)
def test_extract_doi(raw, expected):
    assert extract_doi(raw) == expected


def test_canonicalize_url():
    assert canonicalize_url("HTTP://Example.COM:80/Path?utm_source=x&q=1#frag") \
        == "http://example.com/Path?q=1"
    assert canonicalize_url("https://a.com") == "https://a.com/"
    assert canonicalize_url(None) is None


def test_url_tokens():
    assert url_tokens("https://a.example.com/x/y?q=1") == \
        ["a", "example", "com", "x", "y", "q", "1"]
