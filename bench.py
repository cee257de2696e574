#!/usr/bin/env python
"""Benchmark harness — times every registered query at the bench scale
factor and emits ONE parseable JSON line on stdout.

Protocol (driver contract):
    $SPARK_GRAFT_SF_DIR  input dir  (default /root/testdata/sf0.1)
    $SPARK_GRAFT_CPUS    local[N]   (default 32)
    stdout last line: {"metric": ..., "value": total_sec, "unit": "sec",
                       "queries": {name: sec, ...}, "sf": N}

Each query is materialized with ``collect()`` — results are small
aggregates (bounded by grid/group cardinality, never event rows), so
collect cost is negligible and the timing captures the full scan ->
transform -> shuffle -> aggregate pipeline.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from mpes_spark.session import get_spark

    spark = get_spark(
        app_name="mpes_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if cpus.isdigit() else 32,
    )

    from __spark_entry__ import queries

    # Warm up the JVM / codegen / file-index caches outside the timed
    # region (standard benchmarking practice: the first action pays
    # one-time session costs that say nothing about query throughput).
    spark.read.parquet(f"{sf_dir}/events.parquet").limit(1000).groupBy().count().collect()

    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name, fn in queries().items():
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).collect()
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as exc:  # noqa: BLE001 - report, don't abort the run
            failures[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# FAIL {name}: {failures[name]}", file=sys.stderr)

    out = {
        "metric": "query_suite_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if failures:
        out["failures"] = failures
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
