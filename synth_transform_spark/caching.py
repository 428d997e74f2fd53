"""Session-scoped cache tracking.

Operators that persist intermediates mid-pipeline (two-consumer relations:
``assign_ids_scalable``'s partitioned input, the LSH band relation, the
shingle arrays) cannot unpersist before their caller has consumed the
result — but a long-lived session running many queries would otherwise
accumulate cached blocks indefinitely. ``persist_tracked`` registers every
such persist; hosts (bench.py's query loop, test fixtures, the CLI after
each command) call ``release_cached`` between units of work.

Cluster fault-tolerance note: ``persist`` pins computed partitions but is
NOT a durability guarantee — on executor loss the lineage recomputes, and
a nondeterministically-partitioned lineage (``repartitionByRange`` samples
boundaries per execution) can recompute DIFFERENT partitions. Pipelines
whose correctness depends on frozen partitioning across multiple jobs
(ids.py's offset map) should use ``localCheckpoint``/``checkpoint`` on a
real cluster; ``persist_tracked(df, checkpoint=True)`` opts in.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def persist_tracked(
    df: DataFrame,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
    checkpoint: bool = False,
) -> DataFrame:
    """Persist (or eagerly localCheckpoint) a DataFrame and register it for
    later release. Returns the DataFrame to persist/checkpoint semantics:
    with ``checkpoint=True`` the returned DF's lineage is truncated, making
    multi-job reuse safe under executor loss."""
    if checkpoint:
        out = df.localCheckpoint(eager=True)
        _TRACKED.append(out)
        return out
    # re-persisting an already-persisted relation is a Spark no-op, but it
    # emits a CacheManager "already cached" warning and walks the whole
    # lineage to find the cached plan — skip it (and don't double-track)
    try:
        already = df.storageLevel.useMemory or df.storageLevel.useDisk
    except Exception:
        already = False
    if not already:
        df.persist(level)
        _TRACKED.append(df)
    return df


def release_cached(blocking: bool = False) -> int:
    """Unpersist every tracked DataFrame; returns how many were released.

    Contract: call only AFTER the consuming action of every plan built on a
    tracked persist has completed — i.e. between units of work, not mid-query.
    Plans that baked driver-side state derived from a persisted relation
    (``assign_ids_scalable``'s collected pid→offset map over a
    ``repartitionByRange`` input) must NOT be re-executed after release: the
    range partitioner resamples boundaries on recompute, so the baked offsets
    would silently mis-assign ids. Re-executing such a plan requires either
    rebuilding it or having persisted with ``checkpoint=True`` (lineage
    truncated, recompute impossible)."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:
            pass
    return n
