"""HTTP enrichment stage tests — mock transport, no real network.

Transports are defined INSIDE each test (cloudpickle then ships them by
value; module-level functions would need this test module importable on
executor workers).
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from synth_transform_spark.enrichment import TokenBucket, enrich_http, refresh_cache


def _fake_fetch(key: str) -> tuple[int, str | None]:
    if key.endswith("9"):
        return 404, None
    return 200, json.dumps({"doi": f"10.5555/{key}"})


def make_fake_fetch():
    """Return a by-value picklable copy of the mock transport."""
    import json as _json

    def fetch(key):
        if key.endswith("9"):
            return 404, None
        return 200, _json.dumps({"doi": f"10.5555/{key}"})

    return fetch


def test_token_bucket_enforces_rate():
    t = {"now": 0.0}
    sleeps = []

    def clock():
        return t["now"]

    def sleep(s):
        sleeps.append(s)
        t["now"] += s

    b = TokenBucket(rate=2.0, burst=1, clock=clock, sleep=sleep)
    for _ in range(5):
        b.acquire()
    # 5 requests at 2/s from a 1-token bucket: 4 waits of ~0.5s
    assert len(sleeps) >= 4
    assert abs(sum(sleeps) - 2.0) < 0.01


def test_enrich_http_statuses_and_payloads(spark):
    keys = spark.createDataFrame([(f"k{i}",) for i in range(30)], ["key"])
    out = enrich_http(
        keys, make_fake_fetch(), n_workers=4, rate_per_worker=1000.0
    ).collect()
    assert len(out) == 30
    by_key = {r.key: r for r in out}
    assert by_key["k9"].status == 404 and by_key["k9"].payload is None
    assert json.loads(by_key["k7"].payload)["doi"] == "10.5555/k7"
    assert all(r.n_attempts == 1 for r in out)


def test_enrich_http_retries_transient(spark, tmp_path):
    marker_dir = str(tmp_path)

    def flaky(key):
        # 503 on first attempt per key (file state survives worker pickling)
        import os

        marker = os.path.join(marker_dir, f"flaky_{key}")
        if not os.path.exists(marker):
            open(marker, "w").close()
            return 503, None
        return 200, '{"ok": true}'

    keys = spark.createDataFrame([("a",), ("b",)], ["key"])
    out = enrich_http(
        keys, flaky, n_workers=1, rate_per_worker=1000.0, max_retries=3
    ).collect()
    assert {r.status for r in out} == {200}
    assert {r.n_attempts for r in out} == {2}


def test_refresh_cache_fetches_only_missing(spark):
    cache = spark.createDataFrame(
        [("k0", "cached", 200, 1)], ["key", "payload", "status", "n_attempts"]
    )
    universe = spark.createDataFrame([(f"k{i}",) for i in range(4)], ["key"])
    new_cache = refresh_cache(
        cache, universe, make_fake_fetch(), n_workers=2, rate_per_worker=1000.0
    )
    rows = {r.key: r for r in new_cache.collect()}
    assert len(rows) == 4
    assert rows["k0"].payload == "cached"  # untouched, not refetched
    assert json.loads(rows["k1"].payload)["doi"] == "10.5555/k1"


def test_dedup_of_key_universe(spark):
    keys = spark.createDataFrame([("dup",), ("dup",), ("x",)], ["key"])
    out = enrich_http(keys, make_fake_fetch(), n_workers=2, rate_per_worker=1000.0)
    assert out.count() == 2  # distinct keys fetched once each


def test_consumer_join_pattern(spark):
    """Cache consumption is a plain (broadcastable) equi-join."""
    keys = spark.createDataFrame([(f"k{i}",) for i in range(10)], ["key"])
    cache = enrich_http(keys, make_fake_fetch(), n_workers=2, rate_per_worker=1000.0)
    facts = spark.createDataFrame([(i, f"k{i}") for i in range(10)], ["id", "key"])
    joined = facts.join(F.broadcast(cache), "key", "left")
    assert joined.filter(F.col("payload").isNotNull()).count() == 9


# ---------------------------------------------------------------------------
# Round-11 verdict #5: the FULL DOIExtractor.dois chain golden — the exact
# stage ORDER of /root/reference/synth/parsers/doi.py:13-42 (regex stages →
# publisher network stages → pubmed) over a mixed fixture corpus, with a
# transport injected per-URL, compared against hand-computed (doi, stage)
# pairs. Every stage family is exercised, plus the cross-stage orderings:
# a regex hit suppressing a network builder that ALSO recognises the string
# (k05), and the network retry where an earlier stage's fetch 404s and a
# later stage resolves (k11).
# ---------------------------------------------------------------------------
def test_extract_dois_staged_chain_golden(spark):
    from synth_transform_spark.enrichment.payloads import extract_dois_staged

    corpus = [
        ("k01", "cite:10.1234/abc.def"),
        ("k02", "doi%3A10.3333%2Fabc+1"),                      # fix=True path
        ("k03", "zootaxa.1234.1.2-(mapress)"),
        ("k04", "https://www.nature.com/articles/s41586-020-2649-2"),
        # fileId hits the cambridge REGEX stage; the string also contains
        # a valid PII and cambridge.org — proving regex stages pre-empt
        # the network half entirely
        ("k05", "https://journals.cambridge.org/action/displayAbstract?fileId=S0007485308005555"),
        ("k06", "sciencedirect-pii-S0123456789ABCDEF"),
        ("k07", "https://www.cambridge.org/core/journals/x/article/abc123def"),
        ("k08", "www.ingentaconnect.com/content/mtp/zt/2015/4058/1/art3"),
        ("k09", "https://zookeys.pensoft.net/articles.php?id=5555"),
        ("k10", "https://www.ncbi.nlm.nih.gov/pmc/articles/PMC1234567/"),
        # recognised by BOTH elsevier (rank 1, fetch 404s) and pubmed
        # (rank 5, resolves): the reference keeps trying stages in order
        ("k11", "ncbi.nlm.nih.gov/pmc/articles/PMC7654321-pii-B0123456789ABCDEF"),
        ("k12", "no identifiers whatsoever"),
    ]
    docs = spark.createDataFrame(corpus, ["key", "citation"])

    payloads = {
        "https://api.elsevier.com/content/article/pii/S0123456789ABCDEF": (
            200,
            "<full-text-retrieval-response><coredata>"
            "<prism:doi>10.1016/j.cub.2020.04.001</prism:doi>"
            "</coredata></full-text-retrieval-response>",
        ),
        "https://www.cambridge.org/core/services/aop-easybib/export"
        "?exportType=bibtex&productIds=abc123def&citationStyle=bibtex": (
            200,
            "@article{x, doi={10.1017/xyz.2019.55}}",
        ),
        "http://www.ingentaconnect.com/content/mtp/zt/2015/4058/1/art3"
        "?format=bib": (200, "@article{z, doi = {10.11646/zt.4058.1.3}}"),
        "https://zookeys.pensoft.net/article/5555/download/bibtex": (
            200,
            "@article{z, doi = {10.3897/zookeys.555.9962}}",
        ),
        "https://refinder.org/find?search=simple&db=pubmed&limit=1"
        "&text=PMC1234567": (200, '[{"doi": "10.5555/pm.77", "title": "t"}]'),
        "https://api.elsevier.com/content/article/pii/B0123456789ABCDEF": (
            404,
            None,
        ),
        "https://refinder.org/find?search=simple&db=pubmed&limit=1"
        "&text=PMC7654321": (200, '[{"doi": "10.9999/retry.1"}]'),
    }

    def fetch(url):
        return payloads.get(url, (404, None))

    got = {
        r.key: (r.doi, r.stage_name)
        for r in extract_dois_staged(docs, fetch).collect()
    }
    golden = {
        # the two regex stages normalise (upper); publisher prefixes and
        # network payload parses are raw except bibtex (delegates to the
        # normalising doi_regex) — exactly the reference's per-stage rules
        "k01": ("10.1234/ABC.DEF", "doi_regex"),
        "k02": ("10.3333/ABC1", "doi_regex"),
        "k03": ("10.11646/zootaxa.1234.1.2", "mapress_regex"),
        "k04": ("10.1038/s41586-020-2649-2", "nature_regex"),
        "k05": ("10.1017/S0007485308005555", "cambridge_regex"),
        "k06": ("10.1016/j.cub.2020.04.001", "elsevier_api"),
        "k07": ("10.1017/XYZ.2019.55", "cambridge_bibtex"),
        "k08": ("10.11646/ZT.4058.1.3", "ingenta_bibtex"),
        "k09": ("10.3897/ZOOKEYS.555.9962", "pensoft_bibtex"),
        "k10": ("10.5555/pm.77", "pubmed"),
        "k11": ("10.9999/retry.1", "pubmed"),
        # k12 resolves nowhere and must be absent
    }
    assert got == golden
