"""Soundex: published truth table, three-path agreement, edge cases."""

from __future__ import annotations

import duckdb
import pandas as pd

from reconcile_curation_in_cris_systems_ray.functions.phonetic import (
    soundex, soundex_series, soundex_sql,
)

# published standard examples (incl. the H/W non-separator and
# vowel-separator cases) + edge cases
TRUTH = {
    "Robert": "R163", "Rupert": "R163", "Ashcraft": "A261",
    "Ashcroft": "A261", "Tymczak": "T522", "Pfister": "P236",
    "Honeyman": "H555", "Jackson": "J250", "Washington": "W252",
    "Lee": "L000", "Gutierrez": "G362", "VanDeusen": "V532",
    "O'Brien": "O165", "de la Cruz": "D426", "Wu": "W000",
    "": "", "123": "", None: "",
}


def test_soundex_truth_table():
    for name, want in TRUTH.items():
        assert soundex(name) == want, name


def test_soundex_series_matches_scalar():
    names = pd.Series(list(TRUTH))
    got = soundex_series(names)
    assert got.tolist() == [TRUTH[n] for n in TRUTH]


def test_soundex_sql_matches_python():
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"n": [k for k in TRUTH
                                          if k is not None]}))
    got = con.execute(f"SELECT {soundex_sql('n')} AS sx FROM t").df()
    want = [TRUTH[k] for k in TRUTH if k is not None]
    assert got["sx"].tolist() == want
