"""DOI extraction and normalisation (reference scalar surface F9-F13).

Re-expressions of /root/reference/synth/parsers/doi.py as Column
expressions. The reference's extractor is a staged chain
(parsers/doi.py:13-42): URL-decode → try pattern stages in order → first
hit wins; network stages (Elsevier/bibtex/pubmed — parsers/doi.py:129-223)
are out-of-plan enrichment (see SURVEY.md §4.3) and stubbed behind the
offline chain here.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

#: parsers/doi.py:45-52 — the standard Crossref-recommended regex.
DOI_PATTERN = r"10\.\d{4,9}/[-._;()/:a-zA-Z0-9]+"
#: parsers/doi.py:77-88 — strict variant without ;()/: chars.
DOI_PATTERN_STRICT = r"10\.\d{4,9}/[-._a-zA-Z0-9]+"


def normalize_doi(col: Column) -> Column:
    """F9 — parsers/doi.py:58-65: uppercase; strip trailing '.'; strip
    ``[./]{e}pdf|abstract|full|short`` suffixes."""
    c = F.upper(col)
    c = F.regexp_replace(c, r"[./](EPDF|PDF|ABSTRACT|FULL|SHORT)$", "")
    c = F.regexp_replace(c, r"\.$", "")
    return c


def extract_doi(col: Column, strict: bool = False) -> Column:
    """F10 — parsers/doi.py:45-88: first DOI-shaped substring, NULL if none."""
    pat = DOI_PATTERN_STRICT if strict else DOI_PATTERN
    hit = F.regexp_extract(col, pat, 0)
    return F.when(hit != "", hit)


def extract_doi_mapress(col: Column) -> Column:
    """F11 — parsers/doi.py:90-101: ``\\w+taxa.NNNN.N.N`` → 10.11646/ prefix."""
    hit = F.regexp_extract(col, r"(\w+taxa)\.(\d{1,4})\.(\d+)\.(\d+)", 0)
    return F.when(hit != "", F.concat(F.lit("10.11646/"), hit))


def extract_doi_nature(col: Column) -> Column:
    """F11 — parsers/doi.py:103-114: s-prefixed article ids or
    nature.com/articles/<id> → 10.1038/ prefix."""
    s_id = F.regexp_extract(col, r"(s\d{5}-\d{3}-\d{5}-.)", 1)
    article = F.regexp_extract(col, r"nature\.com/articles/([-.\w]+)", 1)
    pick = F.when(s_id != "", s_id).when(article != "", article)
    return F.when(pick.isNotNull(), F.concat(F.lit("10.1038/"), pick))


def extract_doi_cambridge(col: Column) -> Column:
    """F11 — parsers/doi.py:116-127: ``fileId=(S[A-Z0-9]+)`` → 10.1017/."""
    hit = F.regexp_extract(col, r"fileId=(S[A-Z0-9]+)", 1)
    return F.when(hit != "", F.concat(F.lit("10.1017/"), hit))


def extract_doi_chain(col: Column) -> Column:
    """F13 — parsers/doi.py:13-42: URL-decode, then first stage that hits:
    standard regex → mapress → nature → cambridge → strict. Offline stages
    only; NULL when nothing matches (network enrichment fills the gap in the
    cache-table pipeline, never inside the query plan)."""
    decoded = F.url_decode(F.regexp_replace(col, r"\s+", ""))
    # url_decode raises on malformed %-sequences under ANSI; guard with try
    safe = F.coalesce(F.try_url_decode(F.regexp_replace(col, r"\s+", "")), col) \
        if hasattr(F, "try_url_decode") else F.coalesce(decoded, col)
    return F.coalesce(
        extract_doi(safe),
        extract_doi_mapress(safe),
        extract_doi_nature(safe),
        extract_doi_cambridge(safe),
        extract_doi(safe, strict=True),
    )
