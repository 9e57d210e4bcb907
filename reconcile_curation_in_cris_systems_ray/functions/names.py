"""Name-style parsing and fuzzy name matching.

Reimplements (behavior, not code) the reference's name machinery:

- :func:`parse_name_by_style` — the 4 explicit styles plus a fallback
  (reference ``query_db/analysis/name_matching.py:7-61``).  The
  reference's fallback uses the ``nameparser.HumanName`` package, which
  is not available here; our fallback is a deterministic split
  ("First [Middle...] Last", honoring one comma as "Last, First
  [Middle]") + NFKD ascii-fold — a documented divergence for exotic
  names with suffixes/particles; tests pin our semantics.
- :func:`are_names_similar` — the pairwise scorer truth table
  (``name_matching.py:64-82``): JW(last) gate at threshold, initial
  match or JW(first) accept, JW(last) >= 0.95 override, empty-last
  equality fallback.  Reference uses ``jellyfish``'s Jaro-Winkler;
  we implement the standard algorithm (prefix weight 0.1, max prefix 4).
- :func:`is_likely_acronym` (``query_db/utils.py:62-70``).
"""

from __future__ import annotations

import re
import unicodedata


def jaro_similarity(s1: str, s2: str) -> float:
    """Standard Jaro similarity."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if not len1 or not len2:
        return 0.0
    window = max(len1, len2) // 2 - 1
    if window < 0:
        window = 0
    flags2 = [False] * len2
    matches1 = []
    for i, ch in enumerate(s1):
        lo, hi = max(0, i - window), min(len2, i + window + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == ch:
                flags2[j] = True
                matches1.append(ch)
                break
    m = len(matches1)
    if m == 0:
        return 0.0
    matches2 = [s2[j] for j, f in enumerate(flags2) if f]
    transpositions = sum(a != b for a, b in zip(matches1, matches2)) // 2
    return (m / len1 + m / len2 + (m - transpositions) / m) / 3.0


def jaro_winkler_similarity(s1: str, s2: str, prefix_weight: float = 0.1) -> float:
    """Jaro-Winkler with standard prefix boost (max prefix 4)."""
    jaro = jaro_similarity(s1, s2)
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a == b:
            prefix += 1
        else:
            break
    return jaro + prefix * prefix_weight * (1.0 - jaro)


# HumanName-compatible token classes for the fallback parser (the
# reference's nameparser package is unavailable here; these cover its
# common behaviors — titles dropped, suffixes dropped, surname
# particles glued to the last name, a bare token treated as a FIRST
# name — and tests/test_names.py pins a hand-derived truth table of
# HumanName outputs for 18 names)
_TITLES = {"dr", "prof", "professor", "mr", "mrs", "ms", "miss", "sir",
           "dame", "rev", "fr", "hon"}
_SUFFIXES = {"jr", "sr", "ii", "iii", "iv", "v", "phd", "md", "esq",
             "dds", "jd"}
_PARTICLES = {"van", "von", "de", "del", "della", "der", "den", "di",
              "da", "dos", "das", "du", "la", "le", "bin", "ibn", "al",
              "ter", "ten", "st"}


def _fallback_parse(name: str) -> dict:
    """Deterministic stand-in for the reference's HumanName fallback."""
    if "," in name:
        last, _, rest = name.partition(",")
        rest_parts = rest.split()
        first = rest_parts[0] if rest_parts else ""
        middle = " ".join(rest_parts[1:])
        last = last.strip()
    else:
        parts = name.split()
        while len(parts) > 1 and parts[0].lower().rstrip(".") in _TITLES:
            parts = parts[1:]
        while len(parts) > 1 and parts[-1].lower().rstrip(".") in _SUFFIXES:
            parts = parts[:-1]
        if len(parts) >= 2:
            # absorb surname particles into the last name
            # ("van der Waals" -> last, like HumanName)
            li = len(parts) - 1
            while li - 1 >= 1 and parts[li - 1].lower().rstrip(
                    ".") in _PARTICLES:
                li -= 1
            first = parts[0]
            last = " ".join(parts[li:])
            middle = " ".join(parts[1:li])
        elif parts:
            # HumanName treats a bare token as a FIRST name (mononyms);
            # are_names_similar then takes the empty-last equality path
            first, middle, last = parts[0], "", ""
        else:
            first, middle, last = "", "", ""
    clean = f"{first} {middle} {last}".strip()
    clean = unicodedata.normalize("NFKD", clean).encode("ascii", "ignore").decode()
    normalized = re.sub(r"[-.,]", " ", clean.lower()).strip()
    normalized = re.sub(r"\s+", " ", normalized)
    return {
        "first": first.lower(), "last": last.lower(),
        "middle": middle.lower(), "normalized": normalized,
        "original": name, "style": "first_last",
    }


def parse_name_by_style(name: str, style: str = "auto") -> dict:
    """Parse ``name`` into {first, last, middle, normalized, original, style}."""
    name = name.strip()

    if style == "last_initial":
        parts = name.split()
        if len(parts) >= 2:
            last = " ".join(parts[:-1])
            initials = parts[-1]
            first = initials[0].lower() if initials else ""
            return {"first": first, "last": last.lower(), "middle": "",
                    "normalized": f"{last.lower()} {first}",
                    "original": name, "style": style}
        return {"first": "", "last": name.lower(), "middle": "",
                "normalized": name.lower(), "original": name, "style": style}

    if style == "last_comma_first" and "," in name:
        last, _, rest = name.partition(",")
        last = last.strip()
        rest_parts = rest.strip().split()
        first = rest_parts[0].lower() if rest_parts else ""
        middle = " ".join(rest_parts[1:]).lower() if len(rest_parts) > 1 else ""
        normalized = re.sub(r"\s+", " ", f"{first} {middle} {last.lower()}").strip()
        return {"first": first, "last": last.lower(), "middle": middle,
                "normalized": normalized, "original": name, "style": style}

    if style == "last_first":
        parts = name.split()
        if len(parts) >= 2:
            last, first = parts[0], parts[1]
            middle = " ".join(parts[2:])
            normalized = re.sub(
                r"\s+", " ",
                f"{first.lower()} {middle.lower()} {last.lower()}").strip()
            return {"first": first.lower(), "last": last.lower(),
                    "middle": middle.lower(), "normalized": normalized,
                    "original": name, "style": style}

    if style == "first_initial_last":
        parts = name.split()
        initials: list[str] = []
        last_idx = -1
        for i, part in enumerate(parts):
            if len(part) <= 2 and (part.endswith(".") or len(part) == 1):
                initials.append(part.replace(".", "").lower())
            else:
                last_idx = i
                break
        if last_idx >= 0:
            last = " ".join(parts[last_idx:])
            first = initials[0] if initials else ""
            middle = " ".join(initials[1:]) if len(initials) > 1 else ""
            normalized = re.sub(
                r"\s+", " ", f"{first} {middle} {last.lower()}").strip()
            return {"first": first, "last": last.lower(), "middle": middle,
                    "normalized": normalized, "original": name, "style": style}

    return _fallback_parse(name)


def are_names_similar(name1_str: str, name2_str: str,
                      name1_style: str = "auto", name2_style: str = "auto",
                      threshold: float = 0.85) -> bool:
    """Style-aware fuzzy name equivalence (reference truth table)."""
    name1 = parse_name_by_style(name1_str, name1_style)
    name2 = parse_name_by_style(name2_str, name2_style)
    if not name1["last"] or not name2["last"]:
        return name1["normalized"] == name2["normalized"]
    last_sim = jaro_winkler_similarity(name1["last"], name2["last"])
    if last_sim < threshold:
        return False
    if name1["first"] and name2["first"]:
        if len(name1["first"]) == 1 or len(name2["first"]) == 1:
            if name1["first"][0] == name2["first"][0]:
                return True
        elif jaro_winkler_similarity(name1["first"], name2["first"]) >= threshold:
            return True
    return last_sim >= 0.95


def are_names_similar_guarded(name1, name2, **kwargs) -> bool:
    """Null/blank/exception guard wrapper (reference ``udf.py:11-40``)."""
    if not name1 or not name2:
        return False
    if not str(name1).strip() or not str(name2).strip():
        return False
    try:
        return are_names_similar(str(name1), str(name2), **kwargs)
    except Exception:
        return False


def is_likely_acronym(text) -> bool:
    """<=5 chars all-caps (dot/dash-insensitive) heuristic."""
    if not text:
        return False
    text = text.strip()
    if len(text) <= 5 and text.isupper():
        return True
    stripped = text.replace(".", "").replace("-", "")
    return len(stripped) <= 5 and stripped.isupper()
