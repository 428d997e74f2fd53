"""String-cleaning functions (reference scalar surface).

Re-expressions of /root/reference/synth/utils.py:56-124 as composable Column
expressions (SURVEY.md §2.8 F1/F2/F4). Everything is JVM-side regexp; the
bs4-exact HTML-strip variant is a gated pandas UDF (bs4 absent in this
container → the regex approximation is the default and the UDF raises
cleanly).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def clean_string(col: Column) -> Column:
    """F1 — /root/reference/synth/utils.py:69-87.

    collapse [\\r\\n\\t]+ → ' '; strip HTML tags; NBSP → ' '; collapse
    runs of ≥2 whitespace chars (``\\s{2,}`` — the reference's
    multi_space_rgx, not just literal spaces); strip LEADING whitespace
    only (utils.py:76 start_space_rgx — a trailing single space survives,
    exactly as the reference emits); NULL if empty or no word character
    remains. Parity matters because clean_institution uses the cleaned
    string as an exact lookup key into master_clean.

    HTML stripping here is the regex approximation ``<[^>]+>`` → '' (the
    reference uses BeautifulSoup text extraction; divergence only on
    malformed markup — see clean_string_html_exact).
    """
    c = F.regexp_replace(col, r"[\r\n\t]+", " ")
    c = F.regexp_replace(c, r"<[^>]+>", "")
    c = F.regexp_replace(c, " ", " ")
    c = F.regexp_replace(c, r"\s{2,}", " ")
    c = F.regexp_replace(c, r"^\s+", "")
    # (?U): Java \w is ASCII-only by default, but the reference's Python \w
    # is Unicode — without the flag, non-Latin-only strings ("α β") wrongly
    # null out (pinned by the html_strip golden corpus, case 23).
    return F.when(c.rlike(r"(?U)\w"), c)


def clean_string_html_exact(col: Column) -> Column:
    """F1 with bs4-exact HTML text extraction (pandas UDF). Requires bs4;
    raises ImportError at plan-build time if unavailable."""
    import bs4  # noqa: F401  (gate: container may not ship bs4)
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def _clean(s):
        import re

        from bs4 import BeautifulSoup

        # The reference parses with lxml (utils.py:84) — malformed-markup
        # recovery differs between parsers, so only fall back to the
        # stdlib parser when lxml is absent.
        try:
            import lxml  # noqa: F401

            parser = "lxml"
        except ImportError:
            parser = "html.parser"

        def one(v):
            if v is None:
                return None
            v = re.sub(r"[\r\n\t]+", " ", v)
            if len(v) == 0:
                return None
            v = BeautifulSoup(v, parser).get_text()
            v = v.replace(" ", " ")
            v = re.sub(r"^\s+", "", re.sub(r"\s{2,}", " ", v))
            return v if re.search(r"\w", v) else None

        return s.map(one)

    return _clean(col)


def find_names(col: Column) -> Column:
    """F2 — /root/reference/synth/utils.py:56-66.

    Replace ' and ' / '&' (case-insensitive) with '; ', then extract
    name-like tokens: runs of ≥3 letters optionally joined by -, ' or space.
    Returns an array<string> of names.

    Divergence note: the reference's ``findall`` with a repeated capture
    group returns only the LAST repetition per match (``"Lee-Wong"`` →
    ``"Wong"``). Here the full match is kept (``"Lee-Wong"``) with trailing
    separators trimmed — strictly more faithful to the intent documented in
    the reference docstring ("attempts to find names").
    """
    sep = F.regexp_replace(col, r"(?i)( and |&)", "; ")
    # (?U) for Unicode letters, matching the reference's Python \W semantics
    matches = F.regexp_extract_all(sep, F.lit(r"(?U)([^\W\d_]{3,}[-' ]?)+"), 0)
    return F.transform(matches, lambda m: F.regexp_replace(m, r"[-' ]+$", ""))


def clean_institution(
    df: DataFrame, name_col: str, mapping: DataFrame, out_col: str = "clean_name"
) -> DataFrame:
    """F4 — /root/reference/synth/utils.py:105-124.

    clean_string → broadcast lookup in master_clean mapping
    (dirty → clean, 'nil' sentinel ⇒ NULL) → hit wins, miss keeps the
    cleaned original. ``mapping`` has columns (dirty, clean).
    """
    cleaned = df.withColumn("_cleaned", clean_string(F.col(name_col)))
    m = mapping.select(
        F.col("dirty").alias("_cleaned"),
        F.when(F.col("clean") != "nil", F.col("clean")).alias("_mapped"),
        F.lit(True).alias("_hit"),
    )
    return (
        cleaned.join(F.broadcast(m), "_cleaned", "left")
        .withColumn(
            out_col,
            F.when(F.col("_hit").isNotNull(), F.col("_mapped")).otherwise(
                F.col("_cleaned")
            ),
        )
        .drop("_cleaned", "_mapped", "_hit")
    )
