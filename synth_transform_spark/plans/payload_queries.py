"""F12 payload-parser queries (round-10 verdict #2).

The reference's network DOI stages parse publisher RESPONSES — bibtex
exports, the Elsevier full-text XML envelope, ReFindIt JSON
(/root/reference/synth/parsers/doi.py:129-223). The parsing itself is
pure string work; these queries drive it through the oracle gate by
DERIVING a deterministic payload corpus from the ``documents`` table
(one publisher shape per ``doc_id`` residue class — a fixture table
built inside the query so both engines see identical inputs) and
asserting the full parse/build result per shape.

q501 — response → DOI parsing (all three payload grammars + two miss
shapes); q502 — citation string → publisher fetch-URL construction
(all five request builders, including the pensoft journal/'www'
fallback rules and the two-pass id retry); q504 (round 11) — the five
OFFLINE regex stages of ``DOIExtractor.dois`` with per-stage
ATTRIBUTION in the reference's order, including the ``fix=True``
pre-pass and a strict-only shape exploiting the reference's unescaped
``10.`` dot (the full chain incl. the network half runs end-to-end
against a hand golden in tests/test_enrichment.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..enrichment import payloads
from ..sources.readers import load_table
from .registry import register

# DuckDB twin of functions.doi normalisation (upper → strip trailing
# dots → cut at the first url-artifact token), applied only to nonempty
# regex hits — mirrors extract_doi()'s NULL-on-miss contract.
_DUCK_BIBTEX_DOI = """
CASE WHEN regexp_extract(payload, '10\\.\\d{4,9}/[-._;()/:a-zA-Z0-9]+', 0) <> ''
     THEN regexp_replace(
            regexp_replace(
              UPPER(regexp_extract(payload, '10\\.\\d{4,9}/[-._;()/:a-zA-Z0-9]+', 0)),
              '\\.+$', ''),
            '[./](EPDF|PDF|ABSTRACT|FULL|SHORT).*', '')
END
"""


@register(
    "q501_payload_doi_parsing",
    oracle=f"""
WITH base AS (
    SELECT CAST(doc_id % 5 AS BIGINT) AS shape,
           CASE CAST(doc_id % 5 AS INTEGER)
             WHEN 0 THEN '@article{{synth' || CAST(doc_id AS VARCHAR)
                  || ', author = {{Doe, J.}}, doi = {{10.3897/zookeys.'
                  || CAST(doc_id AS VARCHAR) || '.1}}, title = {{Synth}}}}'
             WHEN 1 THEN '<full-text-retrieval-response><coredata><prism:doi>'
                  || '10.1016/j.synth.2026.' || CAST(doc_id AS VARCHAR)
                  || '</prism:doi></coredata></full-text-retrieval-response>'
             WHEN 2 THEN '[{{"doi": "10.1093/sysbio/syn'
                  || CAST(doc_id AS VARCHAR) || '", "score": 1.0}}]'
             WHEN 3 THEN '@article{{empty' || CAST(doc_id AS VARCHAR)
                  || ', title = {{No identifier here}}}}'
             ELSE '<html><body>article ' || CAST(doc_id AS VARCHAR)
                  || ' not found</body></html>'
           END AS payload
    FROM documents
),
parsed AS (
    SELECT shape,
           CASE
             WHEN LTRIM(payload) LIKE '[%'
               THEN json_extract_string(payload, '$[0].doi')
             WHEN payload LIKE '%<full-text-retrieval-response%'
               THEN NULLIF(regexp_extract(payload,
                      '<prism:doi>\\s*([^<]+?)\\s*</prism:doi>', 1), '')
             ELSE {_DUCK_BIBTEX_DOI}
           END AS doi
    FROM base
)
SELECT shape,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(doi) AS BIGINT) AS n_parsed,
       MIN(doi) AS min_doi,
       MAX(doi) AS max_doi
FROM parsed
GROUP BY shape
ORDER BY shape
""",
    tags=("F12", "S9", "enrichment"),
)
def q501_payload_doi_parsing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Publisher-response → DOI over a derived 5-shape payload corpus:
    (shape, n_docs, n_parsed, min_doi, max_doi). Shapes: bibtex-with-doi
    (normalised path), Elsevier XML (raw prism cdata), ReFindIt JSON,
    bibtex-without-doi (miss), HTML error page (miss)."""
    docs = load_table(spark, sf_dir, "documents")
    id_s = F.col("doc_id").cast("string")
    shape = (F.col("doc_id") % 5).cast("long")
    payload = (
        F.when(
            shape == 0,
            F.concat(
                F.lit("@article{synth"), id_s,
                F.lit(", author = {Doe, J.}, doi = {10.3897/zookeys."),
                id_s, F.lit(".1}, title = {Synth}}"),
            ),
        )
        .when(
            shape == 1,
            F.concat(
                F.lit("<full-text-retrieval-response><coredata><prism:doi>"),
                F.lit("10.1016/j.synth.2026."), id_s,
                F.lit("</prism:doi></coredata></full-text-retrieval-response>"),
            ),
        )
        .when(
            shape == 2,
            F.concat(
                F.lit('[{"doi": "10.1093/sysbio/syn'), id_s,
                F.lit('", "score": 1.0}]'),
            ),
        )
        .when(
            shape == 3,
            F.concat(
                F.lit("@article{empty"), id_s,
                F.lit(", title = {No identifier here}}"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("<html><body>article "), id_s,
                F.lit(" not found</body></html>"),
            )
        )
    )
    parsed = docs.select(
        shape.alias("shape"), payloads.parse_payload_doi(payload).alias("doi")
    )
    return (
        parsed.groupBy("shape")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("doi").alias("n_parsed"),
            F.min("doi").alias("min_doi"),
            F.max("doi").alias("max_doi"),
        )
        .orderBy("shape")
    )


@register(
    "q502_publisher_fetch_urls",
    oracle="""
WITH base AS (
    SELECT CAST(doc_id % 6 AS BIGINT) AS shape,
           CASE CAST(doc_id % 6 AS INTEGER)
             WHEN 0 THEN 'https://www.sciencedirect.com/science/article/pii/S'
                  || LPAD(CAST(doc_id AS VARCHAR), 16, '0')
             WHEN 1 THEN 'https://www.cambridge.org/core/journals/synthesis/article/abs/some-title/ABC'
                  || CAST(doc_id AS VARCHAR)
             WHEN 2 THEN 'http://www.ingentaconnect.com/content/mtax/mt/2026/00000042/00000003/art'
                  || LPAD(CAST(doc_id AS VARCHAR), 5, '0')
             WHEN 3 THEN 'http://www.pensoft.net/journals/zookeys/articles.php?id='
                  || CAST(doc_id AS VARCHAR)
             WHEN 4 THEN 'https://mycokeys.pensoft.net/article/'
                  || CAST(doc_id AS VARCHAR) || '/'
             ELSE 'https://www.ncbi.nlm.nih.gov/pmc/articles/PMC'
                  || LPAD(CAST(doc_id AS VARCHAR), 7, '0')
           END AS s
    FROM documents
),
built AS (
    SELECT shape,
           COALESCE(
             -- elsevier_api: PII -> full-text API
             CASE WHEN regexp_extract(s, '([SB][A-Z0-9]{16})', 1) <> ''
                  THEN 'https://api.elsevier.com/content/article/pii/'
                       || regexp_extract(s, '([SB][A-Z0-9]{16})', 1) END,
             -- cambridge_bibtex: last path segment of the redirect url
             CASE WHEN s LIKE '%cambridge.org%'
                   AND regexp_extract(s, '([^/]*)$', 1) <> ''
                  THEN 'https://www.cambridge.org/core/services/aop-easybib/export?exportType=bibtex&productIds='
                       || regexp_extract(s, '([^/]*)$', 1)
                       || '&citationStyle=bibtex' END,
             -- ingenta_bibtex
             CASE WHEN regexp_extract(s, '(ingentaconnect\\.com/.+/\\d{4}/\\d+/\\d+/art\\d+)', 1) <> ''
                  THEN 'http://www.'
                       || regexp_extract(s, '(ingentaconnect\\.com/.+/\\d{4}/\\d+/\\d+/art\\d+)', 1)
                       || '?format=bib' END,
             -- pensoft_bibtex: strict id regex, then the looser retry
             CASE WHEN (s LIKE '%pensoft%' OR s LIKE '%zookeys%')
                   AND COALESCE(
                         NULLIF(regexp_extract(s, 'articles.php\\?.*id=(\\d+)', 1), ''),
                         NULLIF(regexp_extract(s, '(?:^|[^_])(?:article_)?id=(\\d+)|articles?/(\\d+)', 1), ''),
                         NULLIF(regexp_extract(s, '(?:^|[^_])(?:article_)?id=(\\d+)|articles?/(\\d+)', 2), '')
                       ) IS NOT NULL
                  THEN 'https://'
                       || COALESCE(
                            CASE WHEN regexp_extract(s, '([a-z]+)\\.pensoft|journals/([a-z]+)', 1)
                                      NOT IN ('', 'www')
                                 THEN regexp_extract(s, '([a-z]+)\\.pensoft|journals/([a-z]+)', 1) END,
                            CASE WHEN regexp_extract(s, '([a-z]+)\\.pensoft|journals/([a-z]+)', 2)
                                      NOT IN ('', 'www')
                                 THEN regexp_extract(s, '([a-z]+)\\.pensoft|journals/([a-z]+)', 2) END,
                            'zookeys')
                       || '.pensoft.net/article/'
                       || COALESCE(
                            NULLIF(regexp_extract(s, 'articles.php\\?.*id=(\\d+)', 1), ''),
                            NULLIF(regexp_extract(s, '(?:^|[^_])(?:article_)?id=(\\d+)|articles?/(\\d+)', 1), ''),
                            NULLIF(regexp_extract(s, '(?:^|[^_])(?:article_)?id=(\\d+)|articles?/(\\d+)', 2), ''))
                       || '/download/bibtex' END,
             -- pubmed: first 7-digit run -> ReFindIt
             CASE WHEN s LIKE '%ncbi.nlm.nih.gov%'
                   AND regexp_extract(s, '(\\d{7})', 1) <> ''
                  THEN 'https://refinder.org/find?search=simple&db=pubmed&limit=1&text=PMC'
                       || regexp_extract(s, '(\\d{7})', 1) END
           ) AS url
    FROM base
)
SELECT shape,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(url) AS BIGINT) AS n_built,
       MIN(url) AS min_url,
       MAX(url) AS max_url
FROM built
GROUP BY shape
ORDER BY shape
""",
    tags=("F12", "S9", "enrichment"),
)
def q502_publisher_fetch_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Citation-string → publisher fetch-URL construction over a derived
    6-shape corpus (elsevier PII, cambridge redirect, ingenta path,
    pensoft old/new style, pubmed PMC): (shape, n_docs, n_built,
    min_url, max_url)."""
    docs = load_table(spark, sf_dir, "documents")
    id_s = F.col("doc_id").cast("string")
    shape = (F.col("doc_id") % 6).cast("long")
    s = (
        F.when(
            shape == 0,
            F.concat(
                F.lit("https://www.sciencedirect.com/science/article/pii/S"),
                F.lpad(id_s, 16, "0"),
            ),
        )
        .when(
            shape == 1,
            F.concat(
                F.lit(
                    "https://www.cambridge.org/core/journals/synthesis/article/abs/some-title/ABC"
                ),
                id_s,
            ),
        )
        .when(
            shape == 2,
            F.concat(
                F.lit(
                    "http://www.ingentaconnect.com/content/mtax/mt/2026/00000042/00000003/art"
                ),
                F.lpad(id_s, 5, "0"),
            ),
        )
        .when(
            shape == 3,
            F.concat(
                F.lit(
                    "http://www.pensoft.net/journals/zookeys/articles.php?id="
                ),
                id_s,
            ),
        )
        .when(
            shape == 4,
            F.concat(
                F.lit("https://mycokeys.pensoft.net/article/"), id_s, F.lit("/")
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://www.ncbi.nlm.nih.gov/pmc/articles/PMC"),
                F.lpad(id_s, 7, "0"),
            )
        )
    )
    built = docs.select(
        shape.alias("shape"), payloads.build_fetch_url(s).alias("url")
    )
    return (
        built.groupBy("shape")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("url").alias("n_built"),
            F.min("url").alias("min_url"),
            F.max("url").alias("max_url"),
        )
        .orderBy("shape")
    )


def _duck_norm(expr: str) -> str:
    """DuckDB twin of functions.doi.normalize_doi over a SQL expression."""
    return (
        "regexp_replace(regexp_replace(UPPER(" + expr + "), '\\.+$', ''),"
        " '[./](EPDF|PDF|ABSTRACT|FULL|SHORT).*', '')"
    )


def _q504_oracle() -> str:
    d1 = r"regexp_extract(t, '10\.\d{4,9}/[-._;()/:a-zA-Z0-9]+', 0)"
    d2 = r"regexp_extract(t, '10.\d{4,9}/[-._a-zA-Z0-9]+', 0)"  # dot UNESCAPED
    d3 = r"regexp_extract(t, '(\w+taxa\.\d{1,4}\.\d+\.\d+)', 1)"
    d4a = r"regexp_extract(t, '(s\d{5}-\d{3}-\d{5}-.)', 1)"
    d4b = r"regexp_extract(t, 'nature\.com/articles/([^/]+)', 1)"
    d5 = r"regexp_extract(t, 'fileId=(S[A-Z0-9]+)', 1)"
    return f"""
WITH base AS (
    SELECT CAST(doc_id % 7 AS BIGINT) AS shape,
           CASE CAST(doc_id % 7 AS INTEGER)
             WHEN 0 THEN 'ref:10.1234/synth.' || CAST(doc_id AS VARCHAR)
             WHEN 1 THEN 'doi%3A10.5555%2Fenc.' || CAST(doc_id AS VARCHAR)
             WHEN 2 THEN 'ref-10x1234/strict.' || CAST(doc_id AS VARCHAR)
             WHEN 3 THEN 'see-zootaxa.' || CAST(doc_id % 10000 AS VARCHAR)
                  || '.1.2-mapress'
             WHEN 4 THEN 'https://www.nature.com/articles/art'
                  || CAST(doc_id AS VARCHAR) || 'x'
             WHEN 5 THEN 'https://journals.cambridge.org/abstract?fileId=S'
                  || LPAD(CAST(doc_id AS VARCHAR), 12, '0')
             ELSE 'plain text citation number ' || CAST(doc_id AS VARCHAR)
           END AS s
    FROM documents
),
-- fix=True twin for THIS corpus: the only %-sequences constructed are
-- %3A/%2F (full unquote_plus parity is pinned by the chain golden and
-- the Java-vs-RE2 battery); then literal-space removal
fixed AS (
    SELECT shape,
           replace(replace(replace(s, '%3A', ':'), '%2F', '/'), ' ', '') AS t
    FROM base
),
staged AS (
    SELECT shape,
           CASE WHEN {d1} <> '' THEN {_duck_norm(d1)}
                WHEN {d2} <> '' THEN {_duck_norm(d2)}
                WHEN {d3} <> '' THEN '10.11646/' || {d3}
                WHEN {d4a} <> '' THEN '10.1038/' || {d4a}
                WHEN {d4b} <> '' THEN '10.1038/' || {d4b}
                WHEN {d5} <> '' THEN '10.1017/' || {d5}
           END AS doi,
           CASE WHEN {d1} <> '' THEN 'doi_regex'
                WHEN {d2} <> '' THEN 'doi_regex_strict'
                WHEN {d3} <> '' THEN 'mapress_regex'
                WHEN {d4a} <> '' OR {d4b} <> '' THEN 'nature_regex'
                WHEN {d5} <> '' THEN 'cambridge_regex'
           END AS stage_name
    FROM fixed
)
SELECT shape, stage_name,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(doi) AS BIGINT) AS n_dois,
       MIN(doi) AS min_doi,
       MAX(doi) AS max_doi
FROM staged
GROUP BY shape, stage_name
ORDER BY shape
"""


@register(
    "q504_regex_stage_attribution",
    oracle=_q504_oracle(),
    tags=("F12", "F13", "enrichment"),
)
def q504_regex_stage_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline half of the DOIExtractor.dois chain WITH stage attribution
    over a derived 7-shape citation corpus: (shape, stage_name, n_docs,
    n_dois, min_doi, max_doi). Shapes: plain DOI, %-encoded (fix=True
    pre-pass), strict-only (the unescaped-dot reference bug), mapress,
    nature article path, cambridge fileId, and a no-stage miss —
    exercising enrichment.payloads.regex_stage_hits in the reference's
    stage order (parsers/doi.py:19-30)."""
    from ..functions.doi import fix_citation

    docs = load_table(spark, sf_dir, "documents")
    id_s = F.col("doc_id").cast("string")
    shape = (F.col("doc_id") % 7).cast("long")
    s = (
        F.when(shape == 0, F.concat(F.lit("ref:10.1234/synth."), id_s))
        .when(shape == 1, F.concat(F.lit("doi%3A10.5555%2Fenc."), id_s))
        .when(shape == 2, F.concat(F.lit("ref-10x1234/strict."), id_s))
        .when(
            shape == 3,
            F.concat(
                F.lit("see-zootaxa."),
                (F.col("doc_id") % 10000).cast("string"),
                F.lit(".1.2-mapress"),
            ),
        )
        .when(
            shape == 4,
            F.concat(
                F.lit("https://www.nature.com/articles/art"), id_s, F.lit("x")
            ),
        )
        .when(
            shape == 5,
            F.concat(
                F.lit("https://journals.cambridge.org/abstract?fileId=S"),
                F.lpad(id_s, 12, "0"),
            ),
        )
        .otherwise(F.concat(F.lit("plain text citation number "), id_s))
    )
    doi, stage = payloads.regex_stage_hits(fix_citation(s))
    staged = docs.select(
        shape.alias("shape"), doi.alias("doi"), stage.alias("stage_name")
    )
    return (
        staged.groupBy("shape", "stage_name")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("doi").alias("n_dois"),
            F.min("doi").alias("min_doi"),
            F.max("doi").alias("max_doi"),
        )
        .orderBy("shape")
    )
