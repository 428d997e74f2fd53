"""Publisher payload → DOI parsers (reference scalar surface F12).

The reference's network DOI stages (/root/reference/synth/parsers/
doi.py:129-223) each do two separable things: BUILD a publisher-specific
fetch URL from the raw citation string, and PARSE the fetched response
body into a DOI. The transport itself lives in ``enrichment.http_stage``
(rate-limited mapInPandas); this module is everything around it as pure
Column expressions — offline-testable, JVM-side, usable both inside the
enrichment pipeline and directly over a payload table.

Response parsers (reference file:line):
- ``bibtex_doi``        — cambridge/ingenta/pensoft bibtex exports all
                          finish with ``doi_regex(r.text)`` over the raw
                          bibtex (doi.py:145-160, 163-173, 176-207):
                          first standard-DOI substring, normalised.
- ``elsevier_doi``      — full-text XML ``coredata/prism:doi`` cdata
                          (doi.py:130-142; untangle path
                          full_text_retrieval_response.coredata.prism_doi),
                          returned RAW — the reference does not normalise
                          this stage.
- ``refindit_doi``      — ReFindIt JSON: ``r.json()[0]['doi']``
                          (doi.py:209-223), returned raw.
- ``parse_payload_doi`` — table-form dispatch: when one column carries
                          payloads from many publishers, sniff the
                          transport shape (JSON array → ReFindIt; the
                          Elsevier XML envelope → prism path; a bibtex
                          entry → bibtex regex; else the plain DOI
                          regex). The reference dispatches by stage
                          instead — per-shape results are identical,
                          pinned by tests/test_payload_parsers.py.

Request builders (the offline half of each network stage):
- ``elsevier_pii`` / ``elsevier_api_url``   (doi.py:129-136)
- ``ingenta_bib_url``                       (doi.py:163-170)
- ``cambridge_export_url``                  (doi.py:144-157; takes the
                                            REDIRECT url — the id is its
                                            last path segment)
- ``pensoft_bib_url`` / chain               (doi.py:176-207, both id
                                            regexes + the journal rule
                                            with its 'www'/zookeys
                                            fallbacks)
- ``pubmed_refindit_url``                   (doi.py:209-218)

RE2-parity note: the reference's second pensoft id regex uses a
lookbehind (``(?<!_)``) that DuckDB's RE2 cannot express. Both engines
here run the consuming emulation ``(?:^|[^_])`` instead; the only
behavioural difference vs the reference is on ids embedded directly
after an underscore-free prefix of another token — none of the
publisher URL shapes the reference handles hit it.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

from ..functions.doi import extract_doi

#: doi.py:134 — Elsevier PII: S/B + 16 uppercase alphanumerics.
PII_PATTERN = r"([SB][A-Z0-9]{16})"
#: doi.py:168 — Ingenta article path: .../<year>/<vol>/<issue>/artNNN.
INGENTA_PATTERN = r"(ingentaconnect\.com/.+/\d{4}/\d+/\d+/art\d+)"
#: doi.py:184 — pensoft old-style article id. The reference's dot is
#: UNESCAPED (``articles.php``) and the greedy ``.*`` binds the LAST
#: ``id=`` in the query string — reproduced verbatim for bug-level parity
#: (same convention as functions.doi.DOI_PATTERN_STRICT).
PENSOFT_ID_1 = r"articles.php\?.*id=(\d+)"
#: doi.py:185 with the lookbehind emulated for RE2 (see module docstring).
PENSOFT_ID_2 = r"(?:^|[^_])(?:article_)?id=(\d+)|articles?/(\d+)"
#: doi.py:187 — journal name: <j>.pensoft host or journals/<j> path.
PENSOFT_JOURNAL = r"([a-z]+)\.pensoft|journals/([a-z]+)"
#: doi.py:215 — first 7-digit run is treated as the PMC id.
PMC_PATTERN = r"(\d{7})"

ELSEVIER_API = "https://api.elsevier.com/content/article/pii/"
CAMBRIDGE_EXPORT = (
    "https://www.cambridge.org/core/services/aop-easybib/export"
    "?exportType=bibtex&productIds="
)
CAMBRIDGE_EXPORT_SUFFIX = "&citationStyle=bibtex"
REFINDIT_API = "https://refinder.org/find?search=simple&db=pubmed&limit=1&text=PMC"


def _nonempty(c: Column) -> Column:
    return F.when(c != "", c)


# --------------------------------------------------------------------------
# response parsers
# --------------------------------------------------------------------------
def bibtex_doi(col: Column) -> Column:
    """First standard-DOI substring of a bibtex payload, normalised
    (upper, trailing-dot strip, url-artifact split) exactly like the
    reference's ``doi_regex`` which every bibtex stage delegates to."""
    return extract_doi(col)


def elsevier_doi(col: Column) -> Column:
    """``<prism:doi>`` cdata of the Elsevier full-text XML envelope, raw."""
    return _nonempty(
        F.regexp_extract(col, r"<prism:doi>\s*([^<]+?)\s*</prism:doi>", 1)
    )


def refindit_doi(col: Column) -> Column:
    """``[0].doi`` of a ReFindIt JSON response, raw."""
    return F.get_json_object(col, "$[0].doi")


def parse_payload_doi(col: Column) -> Column:
    """Dispatch a mixed-publisher payload column to the right parser."""
    t = F.ltrim(col)
    return (
        F.when(t.startswith("["), refindit_doi(col))
        .when(
            col.contains("<full-text-retrieval-response"), elsevier_doi(col)
        )
        .when(t.rlike(r"@[A-Za-z]+\s*\{"), bibtex_doi(col))
        .otherwise(extract_doi(col))
    )


# --------------------------------------------------------------------------
# request builders
# --------------------------------------------------------------------------
def elsevier_pii(col: Column) -> Column:
    """PII token of an Elsevier/ScienceDirect citation string."""
    return _nonempty(F.regexp_extract(col, PII_PATTERN, 1))


def elsevier_api_url(col: Column) -> Column:
    """Full-text API URL for the string's PII, NULL when no PII."""
    pii = elsevier_pii(col)
    return F.when(pii.isNotNull(), F.concat(F.lit(ELSEVIER_API), pii))


def ingenta_bib_url(col: Column) -> Column:
    """Ingenta ``?format=bib`` export URL for an article-path string."""
    hit = _nonempty(F.regexp_extract(col, INGENTA_PATTERN, 1))
    return F.when(
        hit.isNotNull(),
        F.concat(F.lit("http://www."), hit, F.lit("?format=bib")),
    )


def cambridge_export_url(redirect_col: Column) -> Column:
    """easybib bibtex export URL from the RESOLVED (redirect) article URL
    — the article id is its last path segment (doi.py:154-157)."""
    cid = F.element_at(F.split(redirect_col, "/"), -1)
    return F.when(
        redirect_col.contains("cambridge.org") & (cid != ""),
        F.concat(
            F.lit(CAMBRIDGE_EXPORT), cid, F.lit(CAMBRIDGE_EXPORT_SUFFIX)
        ),
    )


def _pensoft_journal(col: Column) -> Column:
    """Journal slug per doi.py:188-193: first non-'www' group of the
    journal regex (host form beats path form), else 'zookeys'."""
    g1 = _nonempty(F.regexp_extract(col, PENSOFT_JOURNAL, 1))
    g2 = _nonempty(F.regexp_extract(col, PENSOFT_JOURNAL, 2))
    pick = F.coalesce(
        F.when(g1 != "www", g1), F.when(g2 != "www", g2)
    )
    return F.coalesce(pick, F.lit("zookeys"))


def pensoft_bib_url(col: Column, use_regex_2: bool = False) -> Column:
    """Pensoft bibtex download URL (doi.py:176-201): gate on a
    pensoft/zookeys mention, id via the strict regex (or the looser
    second-pass regex), journal via the host/path rule."""
    gate = col.contains("pensoft") | col.contains("zookeys")
    if use_regex_2:
        pid = F.coalesce(
            _nonempty(F.regexp_extract(col, PENSOFT_ID_2, 1)),
            _nonempty(F.regexp_extract(col, PENSOFT_ID_2, 2)),
        )
    else:
        pid = _nonempty(F.regexp_extract(col, PENSOFT_ID_1, 1))
    return F.when(
        gate & pid.isNotNull(),
        F.concat(
            F.lit("https://"),
            _pensoft_journal(col),
            F.lit(".pensoft.net/article/"),
            pid,
            F.lit("/download/bibtex"),
        ),
    )


def pensoft_bib_url_chain(col: Column) -> Column:
    """The reference's two-pass pensoft retry (doi.py:202-207) without
    the network leg: strict id regex first, looser one as fallback."""
    return F.coalesce(
        pensoft_bib_url(col), pensoft_bib_url(col, use_regex_2=True)
    )


def pubmed_refindit_url(col: Column) -> Column:
    """ReFindIt lookup URL for an NCBI citation string (doi.py:209-218)."""
    pmc = _nonempty(F.regexp_extract(col, PMC_PATTERN, 1))
    return F.when(
        col.contains("ncbi.nlm.nih.gov") & pmc.isNotNull(),
        F.concat(F.lit(REFINDIT_API), pmc),
    )


#: Reference stage order, doi.py:19-30: the five offline regex stages,
#: then the five network stages. Ranks are the tuple positions.
REGEX_STAGE_NAMES = (
    "doi_regex",
    "doi_regex_strict",
    "mapress_regex",
    "nature_regex",
    "cambridge_regex",
)
NETWORK_STAGE_NAMES = (
    "elsevier_api",
    "cambridge_bibtex",
    "ingenta_bibtex",
    "pensoft_bibtex",
    "pubmed",
)


def regex_stage_hits(safe: Column) -> tuple[Column, Column]:
    """The five OFFLINE regex stages over an already-fixed string, with
    attribution: returns (doi, stage_name) Columns — first stage that
    hits wins, both NULL when none do. The pure-Column half of
    ``extract_dois_staged``; also drives the q504 oracle query."""
    from ..functions.doi import (
        extract_doi_cambridge,
        extract_doi_mapress,
        extract_doi_nature,
    )

    hits = [
        extract_doi(safe),
        extract_doi(safe, strict=True),
        extract_doi_mapress(safe),
        extract_doi_nature(safe),
        extract_doi_cambridge(safe),
    ]
    doi = F.coalesce(*hits)
    stage = F.coalesce(
        *[
            F.when(hit.isNotNull(), F.lit(name))
            for hit, name in zip(hits, REGEX_STAGE_NAMES)
        ]
    )
    return doi, stage


def extract_dois_staged(
    docs,
    fetch_fn,
    text_col: str = "citation",
    key_col: str = "key",
    n_workers: int = 4,
    rate_per_worker: float = 1000.0,
):
    """The reference's FULL ``DOIExtractor.dois`` chain (doi.py:13-42,
    ``fix=True``) over a citation table, with stage attribution:
    (key, doi, stage_name), one row per key that any stage resolved.

    Semantics mirrored exactly:
    - every stage sees the SAME fixed string (unquote_plus + space strip);
    - stages run in the reference's order and the FIRST stage yielding a
      DOI wins — including the reference's retry across network stages: a
      string recognised by several publisher builders is fetched on each
      matching URL, and the earliest stage whose payload parses wins
      (``dois()`` yields per stage; the caller breaks on the first hit);
    - each network stage parses with its OWN parser (elsevier prism XML,
      bibtex regex, ReFindIt JSON), not the table-form sniffing dispatch.

    Spark shape: the regex half is one narrow Column cascade; the network
    half explodes at most 5 (stage, url) candidates per unresolved key,
    fetches DISTINCT urls through the rate-limited ``enrich_http``
    mapInPandas transport, joins payloads back, and picks the min-rank
    parsed hit per key — no driver loop, parallel across keys exactly like
    the reference's thread pool.
    """
    from .http_stage import enrich_http
    from ..functions.doi import fix_citation

    col = F.col(text_col)
    safe = fix_citation(col)
    regex_doi, regex_stage = regex_stage_hits(safe)
    base = docs.select(
        F.col(key_col).alias("key"),
        safe.alias("_fixed"),
        regex_doi.alias("doi"),
        regex_stage.alias("stage_name"),
    )
    resolved = base.filter(F.col("doi").isNotNull()).select(
        "key", "doi", "stage_name"
    )

    fixed = F.col("_fixed")
    builders = [
        elsevier_api_url(fixed),
        cambridge_export_url(fixed),
        ingenta_bib_url(fixed),
        pensoft_bib_url_chain(fixed),
        pubmed_refindit_url(fixed),
    ]
    candidates = F.array(
        *[
            F.struct(
                F.lit(rank).cast("int").alias("rank"),
                F.lit(name).alias("stage_name"),
                url.alias("url"),
            )
            for rank, (url, name) in enumerate(
                zip(builders, NETWORK_STAGE_NAMES), start=1
            )
        ]
    )
    attempts = (
        base.filter(F.col("doi").isNull())
        .select("key", F.explode(candidates).alias("c"))
        .select("key", "c.rank", "c.stage_name", F.col("c.url").alias("url"))
        .filter(F.col("url").isNotNull())
    )
    fetched = enrich_http(
        attempts.select(F.col("url").alias("key")),
        fetch_fn,
        n_workers=n_workers,
        rate_per_worker=rate_per_worker,
    ).select(F.col("key").alias("url"), "payload", "status")
    payload = F.col("payload")
    parsed = (
        attempts.join(fetched, "url")
        .withColumn(
            "doi",
            F.when(F.col("status") != 200, F.lit(None).cast("string"))
            .when(F.col("stage_name") == "elsevier_api", elsevier_doi(payload))
            .when(F.col("stage_name") == "pubmed", refindit_doi(payload))
            .otherwise(bibtex_doi(payload)),
        )
        .filter(F.col("doi").isNotNull())
    )
    win = parsed.groupBy("key").agg(F.min("rank").alias("rank"))
    network_resolved = parsed.join(win, ["key", "rank"]).select(
        "key", "doi", "stage_name"
    )
    return resolved.unionByName(network_resolved)


def build_fetch_url(col: Column) -> Column:
    """Staged request-builder chain in the reference's stage order
    (doi.py:19-30: elsevier_api → cambridge_bibtex → ingenta_bibtex →
    pensoft_bibtex → pubmed): the first publisher rule that recognises
    the string wins. The cambridge stage is keyed on its REDIRECT url
    here (the resolve itself is transport, not parsing)."""
    return F.coalesce(
        elsevier_api_url(col),
        cambridge_export_url(col),
        ingenta_bib_url(col),
        pensoft_bib_url_chain(col),
        pubmed_refindit_url(col),
    )
