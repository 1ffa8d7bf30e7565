"""Projection/filter operators F1-F10 + P1-P5 (SURVEY §2.2), all as native
Column expressions — no UDFs, fully pushdown/codegen friendly."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

YEAR_RANGE_PATTERN = r".*[1-2][0-9]{3}-[1-2][0-9]{3}.*$"


def first_section_col(content: Column) -> Column:
    """F1 (pilot_utils.py:142): text before the first '==' heading, trimmed.

    Python str.strip() removes ALL whitespace (incl. newlines); Spark's
    trim() only removes spaces — hence the regexp form."""
    return F.regexp_replace(
        F.substring_index(content, "==", 1), r"^\s+|\s+$", ""
    )


def ref_text_ok(content: Column, name: Column, min_chars: int = 100,
                max_chars: int = 10000) -> Column:
    """F2 (pilot_utils.py:98-104): char-length range + year-range title reject."""
    return (
        F.length(content).between(min_chars, max_chars)
        & ~name.rlike(YEAR_RANGE_PATTERN)
    )


def skip_incident_expr(langs: Column, n_texts: Column, target_languages: list[str],
                       must_have_all_languages: bool = True,
                       must_have_english: bool = True,
                       one_page_per_language: bool = True) -> Column:
    """F3 (pilot_utils.py:107-124). ``langs`` is the collected set of
    languages whose texts passed F2; ``n_texts`` the count of those texts.
    Reproduces the reference's if/elif: the one-page check only applies when
    the english check did not already fire."""
    skip = F.lit(False)
    if must_have_all_languages:
        skip = skip | (F.size(F.array_except(F.lit(target_languages), langs)) > 0)
    missing_en = ~F.array_contains(langs, "en")
    if must_have_english:
        skip = skip | missing_en
    if one_page_per_language:
        one_page_violation = n_texts != F.size(langs)
        if must_have_english:
            skip = skip | (~missing_en & one_page_violation)
        else:
            skip = skip | one_page_violation
    return skip


def qid_from_uri(uri: Column) -> Column:
    """P1 (main.py:101-103): last path segment of a Wikidata URI."""
    return F.element_at(F.split(uri, "/"), -1)


def packed_value_uri(value: Column) -> Column:
    """P3 unpack (classes.py:247): '<uri> | <label>' -> uri (tolerates bare)."""
    return F.trim(F.element_at(F.split(value, r"\|"), 1))


def gyear_literal(value: Column) -> tuple[Column, Column]:
    """P4 (classes.py:251-255): returns (obj, datatype) columns for timestamp
    role values — 4-char year + xsd:gYear when the value is a year-start
    instant, else the full value + xsd:date."""
    is_gyear = value.endswith("-01-01T00:00:00Z")
    obj = F.when(is_gyear, F.substring(value, 1, 4)).otherwise(value)
    datatype = F.when(
        is_gyear, F.lit("http://www.w3.org/2001/XMLSchema#gYear")
    ).otherwise(F.lit("http://www.w3.org/2001/XMLSchema#date"))
    return obj, datatype
