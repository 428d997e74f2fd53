"""DOI extraction and normalisation (reference scalar surface F9-F13).

Re-expressions of /root/reference/synth/parsers/doi.py as Column
expressions. The reference's extractor is a staged chain
(parsers/doi.py:13-42): URL-decode → try pattern stages in order → first
hit wins; network stages (Elsevier/bibtex/pubmed — parsers/doi.py:129-223)
are out-of-plan enrichment (see SURVEY.md §4.3) and stubbed behind the
offline chain here.

Stage order and per-stage normalisation mirror the reference exactly:
- stages run standard-regex → STRICT-regex → mapress → nature → cambridge
  (parsers/doi.py:19-30 — strict is SECOND, before the publisher rules);
- only the two regex stages normalise their hit (upper → rstrip all '.' →
  split at the FIRST ``[./](e?pdf|abstract|full|short)`` anywhere, keep the
  part before it — parsers/doi.py:58-64); publisher stages return their
  prefixed group raw;
- ``fix``-mode pre-processing is unquote_plus FIRST, then removal of literal
  spaces only (parsers/doi.py:32-34) — decoded '+'/'%20' spaces are removed,
  other whitespace survives.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

#: parsers/doi.py:53 — the standard Crossref-recommended regex.
DOI_PATTERN = r"10\.\d{4,9}/[-._;()/:a-zA-Z0-9]+"
#: parsers/doi.py:76 — strict variant without ;()/: chars. The reference
#: pattern's dot is UNESCAPED (``10.\d{4,9}``) so any character is accepted
#: after "10" — reproduced verbatim for bug-level parity.
DOI_PATTERN_STRICT = r"10.\d{4,9}/[-._a-zA-Z0-9]+"


def normalize_doi(col: Column) -> Column:
    """F9 — parsers/doi.py:58-64, in the reference's order:
    uppercase → strip ALL trailing '.' (rstrip) → split at the first
    ``[./](e?pdf|abstract|full|short)`` occurrence ANYWHERE and keep the
    leading part (``extras_regex.split(doi)[0]`` — not end-anchored)."""
    c = F.upper(col)
    c = F.regexp_replace(c, r"\.+$", "")
    c = F.regexp_replace(c, r"[./](EPDF|PDF|ABSTRACT|FULL|SHORT).*", "")
    return c


def extract_doi(col: Column, strict: bool = False) -> Column:
    """F10 — parsers/doi.py:45-88: first DOI-shaped substring, normalised
    per the reference's in-stage rules (normalize_doi), NULL if none."""
    pat = DOI_PATTERN_STRICT if strict else DOI_PATTERN
    hit = F.regexp_extract(col, pat, 0)
    return F.when(hit != "", normalize_doi(hit))


def extract_doi_mapress(col: Column) -> Column:
    """F11 — parsers/doi.py:90-100: ``\\w+taxa.NNNN.N.N`` → 10.11646/ prefix."""
    hit = F.regexp_extract(col, r"(\w+taxa\.\d{1,4}\.\d+\.\d+)", 1)
    return F.when(hit != "", F.concat(F.lit("10.11646/"), hit))


def extract_doi_nature(col: Column) -> Column:
    """F11 — parsers/doi.py:102-116: s-prefixed article ids or
    nature.com/articles/<any non-slash run> → 10.1038/ prefix."""
    s_id = F.regexp_extract(col, r"(s\d{5}-\d{3}-\d{5}-.)", 1)
    article = F.regexp_extract(col, r"nature\.com/articles/([^/]+)", 1)
    pick = F.when(s_id != "", s_id).when(article != "", article)
    return F.when(pick.isNotNull(), F.concat(F.lit("10.1038/"), pick))


def extract_doi_cambridge(col: Column) -> Column:
    """F11 — parsers/doi.py:118-127: ``fileId=(S[A-Z0-9]+)`` → 10.1017/."""
    hit = F.regexp_extract(col, r"fileId=(S[A-Z0-9]+)", 1)
    return F.when(hit != "", F.concat(F.lit("10.1017/"), hit))


def fix_citation(col: Column) -> Column:
    """The ``fix=True`` pre-pass of parsers/doi.py:33-35: unquote_plus
    FIRST, then remove literal spaces (decoded '+'/'%20' included).
    Factored out (round 11) so the staged-chain golden can feed the SAME
    fixed string to every stage the way ``dois()`` does."""
    # url_decode raises on malformed %-sequences under ANSI; Python's
    # unquote_plus leaves only the malformed token raw and still decodes
    # the rest ('a%20b%zz' → 'a b%zz'), while both paths here leave the
    # WHOLE value raw when any sequence is malformed — a documented
    # divergence on mixed valid+malformed inputs (decode per-%-token if
    # exact unquote_plus parity is ever needed). On builds without
    # try_url_decode, coalesce CANNOT trap the runtime error (it selects
    # among evaluated expressions), so gate the decode behind a
    # well-formedness check: any '%' not followed by two hex digits ⇒
    # leave the value untouched.
    if hasattr(F, "try_url_decode"):
        decoded = F.coalesce(F.try_url_decode(col), col)
    else:
        decoded = F.when(col.rlike("%(?![0-9A-Fa-f]{2})"), col).otherwise(
            F.url_decode(col)
        )
    return F.regexp_replace(decoded, " ", "")


def extract_doi_chain(col: Column) -> Column:
    """F13 — parsers/doi.py:13-42 with ``fix=True``: unquote_plus FIRST,
    then remove literal spaces (decoded '+'/'%20' included), then the first
    stage that hits wins: standard regex → STRICT regex → mapress → nature
    → cambridge. Offline stages only; NULL when nothing matches (network
    enrichment fills the gap in the cache-table pipeline, never inside the
    query plan)."""
    safe = fix_citation(col)
    return F.coalesce(
        extract_doi(safe),
        extract_doi(safe, strict=True),
        extract_doi_mapress(safe),
        extract_doi_nature(safe),
        extract_doi_cambridge(safe),
    )
