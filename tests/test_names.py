"""are_names_similar truth table at threshold 0.85 (FIXTURES F-7)."""
import pytest

from reconcile_curation_in_cris_systems_ray.functions.names import (
    are_names_similar, are_names_similar_guarded, is_likely_acronym,
    jaro_winkler_similarity, parse_name_by_style,
)


def test_jaro_winkler_known_values():
    # canonical textbook value
    assert abs(jaro_winkler_similarity("martha", "marhta") - 0.9611) < 1e-3
    assert jaro_winkler_similarity("abc", "abc") == 1.0
    assert jaro_winkler_similarity("", "abc") == 0.0


def test_styles():
    p = parse_name_by_style("Smith J", "last_initial")
    assert p["last"] == "smith" and p["first"] == "j"
    p = parse_name_by_style("Smith, John Q", "last_comma_first")
    assert (p["first"], p["middle"], p["last"]) == ("john", "q", "smith")
    p = parse_name_by_style("Smith John Q", "last_first")
    assert (p["first"], p["last"]) == ("john", "smith")
    p = parse_name_by_style("J. Q. Smith", "first_initial_last")
    assert (p["first"], p["middle"], p["last"]) == ("j", "q", "smith")
    p = parse_name_by_style("John Smith", "auto")
    assert (p["first"], p["last"]) == ("john", "smith")


SIM_CASES = [
    # initial-vs-full-first accepts via first-initial rule
    ("J Smith", "John Smith", True),
    ("John Smith", "John Smith", True),
    # different last names below gate
    ("John Smith", "John Jones", False),
    # JW(last) >= 0.95 override with disagreeing firsts
    ("Alice Johnson", "Bob Johnson", True),
    # similar-but-sub-0.95 last with different firsts -> reject
    ("Alice Johnsen", "Bob Johnson", False),  # JW(johnsen,johnson)=0.943
    ("Xavier Smith", "Maria Smithson", False),
]


@pytest.mark.parametrize("a,b,expected", SIM_CASES)
def test_are_names_similar(a, b, expected):
    assert are_names_similar(a, b) is expected


def test_empty_last_fallback_equality():
    assert are_names_similar("Cher", "Cher") is True
    assert are_names_similar("Cher", "Sting") is False


def test_guarded():
    assert are_names_similar_guarded(None, "x") is False
    assert are_names_similar_guarded("  ", "x") is False
    assert are_names_similar_guarded("J Smith", "John Smith") is True


def test_acronym():
    assert is_likely_acronym("MIT")
    assert is_likely_acronym("U.C.L.A.")
    assert is_likely_acronym("K-POP")
    assert not is_likely_acronym("Harvard")
    assert not is_likely_acronym("TOOLONGX")
    assert not is_likely_acronym("")


# Hand-derived expected outputs of the reference's HumanName-based
# fallback (name_matching.py:55-62) for 18 names: (first, middle, last,
# normalized) after the reference's lowercase + NFKD-ascii-fold +
# [-.,]->space cleanup.  Our fallback must reproduce these.
HUMANNAME_TABLE = [
    ("John Smith", ("john", "", "smith", "john smith")),
    ("John A. Smith", ("john", "a.", "smith", "john a smith")),
    ("Dr. John Smith", ("john", "", "smith", "john smith")),
    ("John Smith Jr.", ("john", "", "smith", "john smith")),
    ("Smith, John", ("john", "", "smith", "john smith")),
    ("Smith, John A.", ("john", "a.", "smith", "john a smith")),
    ("Ludwig van Beethoven", ("ludwig", "", "van beethoven",
                              "ludwig van beethoven")),
    ("Johannes Diderik van der Waals",
     ("johannes", "diderik", "van der waals",
      "johannes diderik van der waals")),
    ("José García", ("josé", "", "garcía",
                               "jose garcia")),
    ("Jean-Claude Van Damme", ("jean-claude", "", "van damme",
                               "jean claude van damme")),
    ("Madonna", ("madonna", "", "", "madonna")),
    ("Mary Jane Watson Parker", ("mary", "jane watson", "parker",
                                 "mary jane watson parker")),
    ("O'Brien, Conan", ("conan", "", "o'brien", "conan o'brien")),
    ("Prof. Ada Lovelace", ("ada", "", "lovelace", "ada lovelace")),
    ("Martin Luther King Jr.", ("martin", "luther", "king",
                                "martin luther king")),
    ("Gabriel García Márquez",
     ("gabriel", "garcía", "márquez",
      "gabriel garcia marquez")),
    ("Charles de Gaulle", ("charles", "", "de gaulle",
                           "charles de gaulle")),
    ("  Alan   Turing  ", ("alan", "", "turing", "alan turing")),
]


@pytest.mark.parametrize("name,expected", HUMANNAME_TABLE,
                         ids=[n for n, _ in HUMANNAME_TABLE])
def test_fallback_parse_matches_humanname_table(name, expected):
    p = parse_name_by_style(name, "auto")
    first, middle, last, normalized = expected
    assert (p["first"], p["middle"], p["last"], p["normalized"]) == (
        first, middle, last, normalized), p
    assert p["style"] == "first_last"
