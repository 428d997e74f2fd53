#!/usr/bin/env python
"""Targeted driver-replica: verify named queries against their DuckDB
oracles at a given SF dir (default sf0.01 — the driver's hash-compare
scale). Exit 1 on any mismatch.

Usage: python tools/oracle_replica.py [--sf-dir DIR] q186_bpe_merges ...
       python tools/oracle_replica.py --all        # full registry sweep
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()

    from synth_transform_spark.plans import REGISTRY
    from synth_transform_spark.session import get_spark, silence_bounded_window_warnings
    from synth_transform_spark.testing import compare, duckdb_connection
    from synth_transform_spark.caching import release_cached

    names = sorted(REGISTRY) if args.all else args.queries
    spark = get_spark("synth-transform-replica")
    silence_bounded_window_warnings(spark)
    con = duckdb_connection(args.sf_dir)
    fails = []
    for name in names:
        q = REGISTRY[name]
        try:
            sdf = q.spark(spark, args.sf_dir).toPandas()
            if q.oracle is None:
                print(f"# {name}: rows-only ({len(sdf)} rows)", file=sys.stderr)
                continue
            odf = con.execute(q.oracle).df()
            res = compare(sdf, odf)
            status = "OK" if res.ok else f"FAIL: {res.detail}"
            print(f"# {name}: {status} ({len(sdf)} rows)", file=sys.stderr)
            if not res.ok:
                fails.append(name)
        except Exception as ex:
            print(f"# {name}: ERROR {ex}", file=sys.stderr)
            fails.append(name)
        release_cached()
        spark.catalog.clearCache()
    print(f"# {len(names) - len(fails)}/{len(names)} OK", file=sys.stderr)
    if fails:
        print("FAILED: " + ", ".join(fails))
        return 1
    print("ALL OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
