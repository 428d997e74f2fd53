"""SparkSession bootstrap.

Defaults are tuned for the driver's local[32] test rig but written for a real
cluster: AQE on (runtime join re-selection + skew-join splitting), UTC session
timezone (oracle parity), Arrow for any pandas exchange, and a shuffle
partition count that AQE coalesces downward at small scale and that a cluster
deployment overrides upward (rule of thumb: 2-3× total cores, partitions
~128-512 MB post-filter at 100 TB).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # AQE: runtime plan re-optimisation — coalesces small shuffles, converts
    # sort-merge→broadcast when the built side turns out small, splits skewed
    # partitions. Essential at 100 TB where static stats lie.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Deterministic timestamps across engines (DuckDB oracle runs tz-naive).
    "spark.sql.session.timeZone": "UTC",
    # Arrow for the (rare) pandas-UDF paths — batch columnar transfer.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Local test default; cluster deployments override via spark-submit.
    "spark.sql.shuffle.partitions": "32",
    # Keep ANSI off: reference semantics are null-on-failure casts
    # (SURVEY.md §1.2 "dates stored as strings").
    "spark.sql.ansi.enabled": "false",
    # Broadcast threshold: dims (region/nation/supplier/part at test SF) are
    # broadcast; at 100 TB only genuinely bounded dims stay under this.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    # Long-lived local sessions accumulate listener/UI state per execution
    # (plan graphs, stage metrics) — cap retention so a many-query session
    # doesn't degrade later queries via heap pressure. On a cluster these
    # live in the history server instead.
    "spark.ui.enabled": "false",
    "spark.sql.ui.retainedExecutions": "10",
    "spark.ui.retainedJobs": "100",
    "spark.ui.retainedStages": "100",
    "spark.appStateStore.asyncTracking.enable": "false",
}


def get_spark(app_name: str = "synth_transform_spark", **overrides: str) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Master resolves from ``SPARK_GRAFT_CPUS`` (driver contract) → ``local[N]``,
    else ``local[*]``; an explicit ``spark.master`` in the environment or
    overrides wins (cluster mode).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    master = os.environ.get("SPARK_MASTER", f"local[{cpus}]" if cpus else "local[*]")
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    conf.update(overrides)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def silence_bounded_window_warnings(spark: SparkSession) -> None:
    """Raise the WindowExec log4j category to ERROR for this JVM.

    The audited bounded single-partition windows (SCALE.md
    "Bounded-window exceptions"; lint allowlist in tests/test_plans.py)
    each emit WindowExec's "No Partition Defined" WARN even though their
    input is calendar/vocabulary/top-k bounded. Benches call this so the
    log tail stays clean; correctness of the invariant is enforced by the
    plan lint, not by reading warnings.
    """
    category = "org.apache.spark.sql.execution.window.WindowExec"
    try:
        # Spark Connect sessions have no .sparkContext / _jvm — treat a
        # JVM-less session the same as a missing log4j API and skip
        jvm = spark.sparkContext._jvm
    except Exception:
        print("silence_bounded_window_warnings: no JVM-backed session; skipped")
        return
    try:
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            category, jvm.org.apache.logging.log4j.Level.ERROR
        )
    except Exception:
        try:  # log4j 1.x deployments (older Spark builds)
            jvm.org.apache.log4j.LogManager.getLogger(category).setLevel(
                jvm.org.apache.log4j.Level.ERROR
            )
        except Exception:
            # warnings are cosmetic; note the skip so a noisy bench tail
            # is attributable instead of silently persisting
            print("silence_bounded_window_warnings: no log4j API found; skipped")
