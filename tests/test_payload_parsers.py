"""F12 payload-parser goldens (round-10 verdict #2).

Per-publisher golden payloads through the Column parsers in
``enrichment.payloads``, checked two ways:

1. Golden expected strings hand-derived from the reference's published
   stage logic (/root/reference/synth/parsers/doi.py:129-223).
2. A pure-Python reimplementation of each stage's regex chain, built
   here from the same published patterns, run over the same battery —
   so a drifting Column expression and a drifting golden cannot drift
   together.

Plus the transport integration: a fixture URL table fed through
``enrich_http`` with an injected transport serving canned publisher
payloads, parsed back to DOIs with ``parse_payload_doi``.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
import pytest

from synth_transform_spark.enrichment import enrich_http
from synth_transform_spark.enrichment import payloads as P


def _eval(spark, col_fn, values: list[str]) -> list:
    df = spark.createDataFrame([(v,) for v in values], ["s"])
    return [r[0] for r in df.select(col_fn(F.col("s"))).collect()]


# ---------------------------------------------------------------------------
# golden payloads, one per publisher response grammar
# ---------------------------------------------------------------------------
CAMBRIDGE_BIBTEX = (
    "@article{Smith_2020, title={On synthesis}, volume={12},\n"
    "  DOI={10.1017/s0952836902001012}, number={3},\n"
    "  journal={Journal of Zoology}, author={Smith, A.}, year={2020}}"
)
INGENTA_BIBTEX = (
    "@article{doe2019,\n author = \"Doe, Jane\",\n"
    ' doi = "10.11646/zootaxa.4568.2.4.",\n'  # trailing dot: stripped
    ' url = "https://doi.org/10.11646/zootaxa.4568.2.4"\n}'
)
PENSOFT_BIBTEX = (
    "@article{10.3897/zookeys.915.39703,\n"
    "author = {Lee, Kim},\ntitle = {A new species},\n"
    "journal = {ZooKeys},\npublisher = {Pensoft Publishers}}"
)
ELSEVIER_XML = (
    '<full-text-retrieval-response xmlns:prism="http://prismstandard.org/">'
    "<coredata><prism:url>https://api.elsevier.com/content/article/pii/S0000000000000001</prism:url>"
    "<prism:doi>10.1016/j.cub.2019.03.026</prism:doi>"
    "<prism:publicationName>Current Biology</prism:publicationName>"
    "</coredata></full-text-retrieval-response>"
)
REFINDIT_JSON = (
    '[{"title": "A paper", "doi": "10.1093/sysbio/syaa012", "score": 0.99},'
    ' {"doi": "10.0000/ignored.second"}]'
)
HTML_MISS = "<html><head><title>404</title></head><body>Not found</body></html>"
BIBTEX_NO_DOI = "@article{anon1900, title = {Old paper}, year = {1900}}"


def test_bibtex_doi_goldens(spark):
    got = _eval(
        spark,
        P.bibtex_doi,
        [CAMBRIDGE_BIBTEX, INGENTA_BIBTEX, PENSOFT_BIBTEX, BIBTEX_NO_DOI],
    )
    # doi_regex normalisation: uppercase + trailing-dot strip
    assert got == [
        "10.1017/S0952836902001012",
        "10.11646/ZOOTAXA.4568.2.4",
        "10.3897/ZOOKEYS.915.39703",
        None,
    ]


def test_elsevier_doi_golden(spark):
    got = _eval(spark, P.elsevier_doi, [ELSEVIER_XML, HTML_MISS])
    assert got == ["10.1016/j.cub.2019.03.026", None]  # raw, not uppercased


def test_refindit_doi_golden(spark):
    got = _eval(spark, P.refindit_doi, [REFINDIT_JSON, "[]", "not json"])
    assert got == ["10.1093/sysbio/syaa012", None, None]


def test_parse_payload_doi_dispatch(spark):
    got = _eval(
        spark,
        P.parse_payload_doi,
        [
            CAMBRIDGE_BIBTEX,
            ELSEVIER_XML,
            REFINDIT_JSON,
            HTML_MISS,
            BIBTEX_NO_DOI,
            # no bibtex entry, no envelope: plain doi-regex fallback
            "See https://doi.org/10.5061/dryad.abc123/pdf for data.",
        ],
    )
    assert got == [
        "10.1017/S0952836902001012",
        "10.1016/j.cub.2019.03.026",
        "10.1093/sysbio/syaa012",
        None,
        None,
        "10.5061/DRYAD.ABC123",  # /pdf artifact split off
    ]


# ---------------------------------------------------------------------------
# request builders
# ---------------------------------------------------------------------------
def test_elsevier_request_golden(spark):
    urls = [
        "https://www.sciencedirect.com/science/article/pii/S0960982219303026",
        # reference regex takes EXACTLY 16 chars after S/B — a longer
        # alnum run is truncated, reference-faithfully
        "linkinghub.elsevier.com/retrieve/pii/B9780124158313000000",
        "https://example.org/no-pii-here",
    ]
    assert _eval(spark, P.elsevier_api_url, urls) == [
        "https://api.elsevier.com/content/article/pii/S0960982219303026",
        "https://api.elsevier.com/content/article/pii/B9780124158313000",
        None,
    ]


def test_cambridge_request_golden(spark):
    got = _eval(
        spark,
        P.cambridge_export_url,
        [
            "https://www.cambridge.org/core/journals/jz/article/on-synthesis/ABC123DEF",
            "https://other.org/core/article/XYZ",  # not cambridge
        ],
    )
    assert got == [
        "https://www.cambridge.org/core/services/aop-easybib/export"
        "?exportType=bibtex&productIds=ABC123DEF&citationStyle=bibtex",
        None,
    ]


def test_ingenta_request_golden(spark):
    got = _eval(
        spark,
        P.ingenta_bib_url,
        [
            "www.ingentaconnect.com/content/mtax/mt/2019/00004568/00000002/art00004",
            "https://www.ingentaconnect.com/search?q=zootaxa",  # no article path
        ],
    )
    assert got == [
        "http://www.ingentaconnect.com/content/mtax/mt/2019/00004568/00000002/art00004"
        "?format=bib",
        None,
    ]


def test_pensoft_request_rules(spark):
    battery = [
        # old style: journals/<j> path — journal from path group
        "http://www.pensoft.net/journals/zookeys/articles.php?id=3380",
        # old style with a named journal host
        "http://mycokeys.pensoft.net/articles.php?id=115",
        # new style: article/<id> needs the second-pass regex
        "https://zookeys.pensoft.net/article/39703/",
        # zookeys fallback: a pensoft mention with no journal anywhere
        "pensoft article_id=77",
        # gate: no pensoft/zookeys mention at all
        "https://example.com/articles.php?id=5",
    ]
    assert _eval(spark, P.pensoft_bib_url_chain, battery) == [
        "https://zookeys.pensoft.net/article/3380/download/bibtex",
        "https://mycokeys.pensoft.net/article/115/download/bibtex",
        "https://zookeys.pensoft.net/article/39703/download/bibtex",
        "https://zookeys.pensoft.net/article/77/download/bibtex",
        None,
    ]


def test_pubmed_request_golden(spark):
    got = _eval(
        spark,
        P.pubmed_refindit_url,
        [
            "https://www.ncbi.nlm.nih.gov/pmc/articles/PMC6675424/",
            "https://www.ncbi.nlm.nih.gov/",  # no 7-digit run
            "https://example.org/PMC6675424",  # not ncbi
        ],
    )
    assert got == [
        "https://refinder.org/find?search=simple&db=pubmed&limit=1&text=PMC6675424",
        None,
        None,
    ]


# ---------------------------------------------------------------------------
# independent pure-Python twin from the published patterns
# ---------------------------------------------------------------------------
def _py_doi_regex(s: str) -> str | None:
    m = re.search(r"10\.\d{4,9}/[-._;()/:A-Z0-9]+", s, re.I)
    if not m:
        return None
    doi = m.group().upper().rstrip(".")
    return re.split(r"[./](e?pdf|abstract|full|short)", doi, flags=re.I)[0]


def _py_parse(s: str) -> str | None:
    t = s.lstrip()
    if t.startswith("["):
        import json

        try:
            arr = json.loads(s)
            return arr[0]["doi"] if arr else None
        except Exception:
            return None
    if "<full-text-retrieval-response" in s:
        m = re.search(r"<prism:doi>\s*([^<]+?)\s*</prism:doi>", s)
        return m.group(1) if m else None
    return _py_doi_regex(s)


BATTERY = [
    CAMBRIDGE_BIBTEX,
    INGENTA_BIBTEX,
    PENSOFT_BIBTEX,
    ELSEVIER_XML,
    REFINDIT_JSON,
    HTML_MISS,
    BIBTEX_NO_DOI,
    "plain text 10.1234/abc.def. trailing-dot",
    "url artifact 10.1234/abc/pdf/page-2",
    "doi with parens 10.1002/(SICI)1097-0231(19970415)11:6",
]


def test_parsers_match_pure_python_twin(spark):
    got = _eval(spark, P.parse_payload_doi, BATTERY)
    want = [_py_parse(s) for s in BATTERY]
    assert got == want


# ---------------------------------------------------------------------------
# transport integration: fixture URLs -> enrich_http -> parse
# ---------------------------------------------------------------------------
def test_payload_table_through_http_stage(spark):
    canned = {
        "u1": (200, CAMBRIDGE_BIBTEX),
        "u2": (200, ELSEVIER_XML),
        "u3": (200, REFINDIT_JSON),
        "u4": (404, None),
        "u5": (200, HTML_MISS),
    }

    def fetch(key):
        return canned.get(key, (0, None))

    keys = spark.createDataFrame([(k,) for k in canned], ["key"])
    enriched = enrich_http(keys, fetch, n_workers=2, rate_per_worker=1e6)
    parsed = enriched.withColumn("doi", P.parse_payload_doi(F.col("payload")))
    rows = {r["key"]: (r["status"], r["doi"]) for r in parsed.collect()}
    assert rows == {
        "u1": (200, "10.1017/S0952836902001012"),
        "u2": (200, "10.1016/j.cub.2019.03.026"),
        "u3": (200, "10.1093/sysbio/syaa012"),
        "u4": (404, None),
        "u5": (200, None),
    }


def test_pensoft_id_regex_java_re2_agreement(spark):
    """The lookbehind-free pensoft id pattern must behave identically
    under Java regex (Spark) and RE2 (DuckDB) — the whole point of the
    `(?:^|[^_])` emulation (see payloads.PENSOFT_ID_2)."""
    import duckdb

    from synth_transform_spark.enrichment.payloads import PENSOFT_ID_2

    cases = [
        "id=123", "x_id=123", "article_id=456", "foo_article_id=456",
        "a id=1 b id=2", "articles/789", "article/12/download", "nothing",
        "xid=55", "_id=9", "article_id=7&id=8",
    ]
    sdf = spark.createDataFrame([(c,) for c in cases], ["s"]).select(
        "s",
        F.regexp_extract("s", PENSOFT_ID_2, 1).alias("g1"),
        F.regexp_extract("s", PENSOFT_ID_2, 2).alias("g2"),
    )
    srows = {r["s"]: (r["g1"], r["g2"]) for r in sdf.collect()}
    con = duckdb.connect()
    for c in cases:
        d1 = con.execute(
            "SELECT regexp_extract(?, ?, 1)", [c, PENSOFT_ID_2]
        ).fetchone()[0]
        d2 = con.execute(
            "SELECT regexp_extract(?, ?, 2)", [c, PENSOFT_ID_2]
        ).fetchone()[0]
        assert srows[c] == (d1, d2), (c, srows[c], (d1, d2))
