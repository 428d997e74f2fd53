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
