"""American Soundex (Russell/Odell, public domain; the classic
record-linkage phonetic blocking key — reference F5's
``normalized_affiliation_key`` slot, phonetic variant).

Rules implemented (the standard archival variant):
- keep the first letter;
- H/W are dropped and do NOT separate equal codes;
- vowels (A E I O U Y) are dropped but DO separate equal codes;
- consonant codes B F P V→1, C G J K Q S X Z→2, D T→3, L→4, M N→5,
  R→6; adjacent equal codes collapse (including the first letter's own
  code);
- pad/truncate to letter + 3 digits; empty input → ''.

Both implementations share one recipe so a SQL oracle matches exactly:
strip non-alpha → drop H/W → translate (vowels to '.', consonants to
digits) → collapse digit runs → drop dots → drop the leading code
unless the first letter is a vowel/H/W → pad.  The collapse is runs-of-
one-digit (``1{2,}`` … ``6{2,}``), never a backreference — RE2-safe, so
DuckDB's regexp_replace reproduces it.
"""

from __future__ import annotations

import pandas as pd

_DROP_HW = str.maketrans("", "", "HW")
_CODES = str.maketrans("AEIOUYBFPVCGJKQSXZDTLMNR",
                       "......111122222222334556")
_FIRST_KEEP = set("AEIOUYHW")


def soundex(name: str | None) -> str:
    """Scalar Soundex (reference for tests; the batch path is
    :func:`soundex_series`)."""
    if not name:
        return ""
    base = "".join(ch for ch in name.upper() if "A" <= ch <= "Z")
    if not base:
        return ""
    code = base.translate(_DROP_HW).translate(_CODES)
    out = []
    prev = ""
    for ch in code:
        if ch != prev or ch == ".":
            out.append(ch)
        prev = ch
    digits = "".join(out).replace(".", "")
    if base[0] not in _FIRST_KEEP:
        digits = digits[1:]
    return base[0] + (digits + "000")[:3]


def soundex_series(s: pd.Series) -> pd.Series:
    """Vectorized Soundex over a string Series (pandas C string ops +
    one RE2-safe regex collapse per digit; no per-row Python)."""
    base = s.fillna("").astype(str).str.upper() \
        .str.replace("[^A-Z]", "", regex=True)
    code = base.str.translate(_DROP_HW).str.translate(_CODES)
    for d in "123456":
        code = code.str.replace(f"{d}{{2,}}", d, regex=True)
    digits = code.str.replace(".", "", regex=False)
    first = base.str[0].fillna("")
    keep_all = first.isin(list(_FIRST_KEEP))
    digits = digits.where(keep_all, digits.str[1:])
    out = first + (digits + "000").str[:3]
    return out.where(base.str.len() > 0, "")


def soundex_sql(col: str) -> str:
    """DuckDB expression computing the identical Soundex for ``col``
    (the oracle twin of :func:`soundex_series`)."""
    base = f"upper(regexp_replace(coalesce({col}, ''), '[^A-Za-z]', '', 'g'))"
    code = (f"translate(translate({base}, 'HW', ''), "
            f"'AEIOUYBFPVCGJKQSXZDTLMNR', '......111122222222334556')")
    for d in "123456":
        code = f"regexp_replace({code}, '{d}{{2,}}', '{d}', 'g')"
    digits = f"replace({code}, '.', '')"
    first = f"substr({base}, 1, 1)"
    rest = (f"CASE WHEN {first} IN ('A','E','I','O','U','Y','H','W') "
            f"THEN {digits} ELSE substr({digits}, 2) END")
    return (f"CASE WHEN length({base}) = 0 THEN '' "
            f"ELSE {first} || substr({rest} || '000', 1, 3) END")
