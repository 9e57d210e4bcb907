"""Pin the normalize_text semantics (SURVEY §2.2 M5/M6, FIXTURES F-7)."""
import pandas as pd
import pytest

from reconcile_curation_in_cris_systems_ray.functions.textnorm import (
    ascii_fold, blocking_key_series, has_latin_letter, is_latin_char_text,
    normalize_text, normalize_text_series, tokenize,
)

CASES = [
    ("Café, Déjà-Vu!", "cafe dejavu"),
    ("  Größe & Øl  ", "grosse  ol"),
    ("北京大学", "北京大学"),            # pure CJK: untouched (gate)
    ("北京 大学!", "北京 大学"),          # CJK + ASCII space: still untouched
    ("UPPER lower", "upper lower"),
    ("", ""),
    ("a.b;c'd", "abcd"),
    ("ŁÓDŹ", "lodz"),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_normalize_text(raw, expected):
    assert normalize_text(raw) == expected


def test_normalize_non_str_passthrough():
    assert normalize_text(None) is None
    assert normalize_text(42) == 42


def test_series_matches_scalar():
    raw = [c[0] for c in CASES]
    out = normalize_text_series(pd.Series(raw)).tolist()
    assert out == [normalize_text(r) for r in raw]


def test_series_null():
    out = normalize_text_series(pd.Series(["x", None]))
    assert out[0] == "x" and pd.isna(out[1])


def test_gates():
    # reference gate counts any char <= U+024F (incl. space)
    assert is_latin_char_text("北京 大学")
    assert not is_latin_char_text("北京大学")
    # engine gate requires a Latin letter
    assert not has_latin_letter("北京 大学 123 !")
    assert has_latin_letter("abc")
    assert has_latin_letter("Éß")


def test_ascii_fold_supplement():
    assert ascii_fold("øæßđ") == "oaessd"


def test_blocking_key():
    s = pd.Series(["  MIT Media Lab ", None, ""])
    assert blocking_key_series(s).tolist() == ["mit media lab", "", ""]


def test_tokenize():
    assert tokenize(" a  b\tc ") == ["a", "b", "c"]
    assert tokenize("") == []


def test_ascii_fast_path_equals_slow_path_fuzz():
    """Round-4: the Arrow ASCII fast path must be bit-identical to the
    original pandas/unicodedata path on every row class — ASCII,
    accented Latin, CJK, mixed, control chars, empties, nulls."""
    import numpy as np
    import pandas as pd

    from reconcile_curation_in_cris_systems_ray.functions.textnorm import (
        _normalize_series_slow, normalize_text, normalize_text_series,
    )

    rng = np.random.default_rng(7)
    pieces = ["Hello, World!", "  padded  ", "café étude", "ØrstedæÆß",
              "北京 大学", "mix 北京 ascii", "under_score-dash.dot",
              "a\tb\vc\fd\ne", "", "UPPER lower 123", "naïve-façade",
              "résumé @#$%^&*()", " łódź ıstanbul", "x\x0by z"]
    vals = [f"{rng.choice(pieces)} {rng.choice(pieces)}"
            for _ in range(300)] + pieces + [None]
    s = pd.Series(vals, dtype=object)
    fast = normalize_text_series(s)
    slow = _normalize_series_slow(s)
    for i in range(len(s)):
        fa, sl = fast.iloc[i], slow.iloc[i]
        if pd.isna(sl):
            assert pd.isna(fa), (i, s.iloc[i])
        else:
            assert fa == sl, (i, repr(s.iloc[i]), repr(fa), repr(sl))
    # scalar function parity on the same classes
    for v in pieces:
        assert normalize_text(v) == \
            normalize_text_series(pd.Series([v])).iloc[0], repr(v)
