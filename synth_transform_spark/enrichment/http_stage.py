"""Rate-limited per-key HTTP enrichment as a mapInPandas stage.

Reference lineage (/root/reference, cited per SURVEY.md §2.1 S9, §2.8 F12,
§3.2): `OutputDOIs.update` fans out Crossref/ReFindIt lookups over a
20-thread pool (synth/resources.py:259-302, 304-363), `DOIMetadata.update`
fetches one Crossref work per DOI (synth/resources.py:201-217), and the DOI
parser chain falls back to publisher HTTP endpoints
(synth/parsers/doi.py:129-223). All results land in KV caches so `rebuild`
never touches the network (README.md:143-146).

Spark design:

- parallelism = ``repartition(n_workers)`` + one rate-limited worker per
  partition (replaces the thread pool; at cluster scale the executors ARE
  the pool). The limiter is token-bucket per partition — a global rate R
  with P partitions is configured as R/P per partition.
- the HTTP transport is INJECTED (``fetch_fn``). Real networking is not
  available in this container and is never exercised in tests — the mock
  transport is the test harness; a `requests`-backed transport drops in
  unchanged at deploy time.
- never inside a query plan: enrichment runs as its own job writing a cache
  table (key, payload, status, fetched_at); consumers join the cache.
- incremental refresh = anti-join the key universe against the cache
  (SURVEY.md §2.2 P5, §2.7 U3 — the `_handled`/`_added` sets), fetch only
  the misses, append.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

RESULT_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("payload", StringType(), True),
        StructField("status", IntegerType(), False),
        StructField("n_attempts", IntegerType(), False),
    ]
)


class TokenBucket:
    """Token-bucket limiter: sustained ``rate`` req/s with burst ``burst``.

    One instance per partition/worker; driver-side config, executor-side
    state (never shared across workers — no coordination at scale).
    """

    def __init__(self, rate: float, burst: int = 1, clock=time.monotonic, sleep=time.sleep):
        self.rate = float(rate)
        self.capacity = max(1, burst)
        self.tokens = float(self.capacity)
        self.clock = clock
        self.sleep = sleep
        self.last = clock()

    def acquire(self) -> None:
        while True:
            now = self.clock()
            self.tokens = min(self.capacity, self.tokens + (now - self.last) * self.rate)
            self.last = now
            if self.tokens >= 1.0:
                self.tokens -= 1.0
                return
            self.sleep((1.0 - self.tokens) / self.rate)


def enrich_http(
    keys: DataFrame,
    fetch_fn: Callable[[str], tuple[int, str | None]],
    key_col: str = "key",
    n_workers: int = 20,
    rate_per_worker: float = 5.0,
    max_retries: int = 3,
    retry_statuses: frozenset[int] = frozenset({429, 500, 502, 503}),
) -> DataFrame:
    """Fetch one payload per distinct key, rate-limited, with retries.

    ``fetch_fn(key) -> (status, payload)`` is the injected transport.
    Returns (key, payload, status, n_attempts); status 0 = transport error.
    Mirrors the reference's thread-pool fan-out (resources.py:340-342) as
    partition parallelism: n_workers partitions × rate_per_worker req/s.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bucket = TokenBucket(rate_per_worker, burst=1)
        for pdf in batches:
            out = {"key": [], "payload": [], "status": [], "n_attempts": []}
            for key in pdf[key_col]:
                status, payload, attempts = 0, None, 0
                for attempt in range(1, max_retries + 1):
                    attempts = attempt
                    bucket.acquire()
                    try:
                        status, payload = fetch_fn(key)
                    except Exception:
                        status, payload = 0, None
                    if status not in retry_statuses and status != 0:
                        break
                out["key"].append(key)
                out["payload"].append(payload)
                out["status"].append(int(status))
                out["n_attempts"].append(attempts)
            yield pd.DataFrame(out)

    distinct = keys.select(F.col(key_col).cast("string").alias(key_col)).distinct()
    return distinct.repartition(n_workers).mapInPandas(run, RESULT_SCHEMA)


def refresh_cache(
    cache: DataFrame | None,
    universe: DataFrame,
    fetch_fn: Callable[[str], tuple[int, str | None]],
    key_col: str = "key",
    **enrich_kwargs,
) -> DataFrame:
    """Incremental cache refresh: fetch only keys missing from the cache.

    anti-join (the `_handled` set, resources.py:180-182, 316-317) → fetch →
    union with the existing cache. Returns the new full cache relation;
    caller persists it (overwrite-swap or append of the delta).
    """
    want = universe.select(F.col(key_col).cast("string").alias(key_col)).distinct()
    if cache is not None:
        missing = want.join(cache.select(key_col), key_col, "left_anti")
    else:
        missing = want
    fetched = enrich_http(missing, fetch_fn, key_col=key_col, **enrich_kwargs)
    if cache is None:
        return fetched
    return cache.unionByName(fetched)
