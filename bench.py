#!/usr/bin/env python
"""Benchmark harness — times every registered query at the bench scale
factor, BASELINE.md §2 protocol (3 repetitions, fresh SparkSession per
rep, per-query MEDIAN wall-clock), and emits ONE parseable JSON line
on stdout.

Protocol (driver contract):
    $SPARK_GRAFT_SF_DIR  input dir  (default /root/testdata/sf0.1)
    $SPARK_GRAFT_CPUS    local[N]   (default 32)
    $SPARK_GRAFT_REPS    repetitions (default 3; medians over reps)
    stdout last line: {"metric": ..., "value": total_sec, "unit": "sec",
                       "queries": {name: sec, ...}, "sf": N}

The driver records only the LAST ~2000 chars of stdout and parses the
last line; a 98-query map with spreads and deltas is ~3.5 KB, which is
how round 3 lost its per-query timings (`parsed: null`, truncated
tail — VERDICT r3 #2/#3). So the COMPLETE document (queries at 4
decimals, per-query [min, max] spread, prev-round deltas,
regressions, failures) is written to a sidecar `bench_results.json`
next to this script, and the final stdout line is kept under a 1900-
char budget: full header + failures + regressions always, then the
slowest queries (2-decimal medians) until the budget is spent, with
`queries_omitted` counting the fast tail that only the sidecar holds.

Each rep tears the SparkSession down and builds a new one (cold
catalog/file-index/plan caches; the JVM itself is reused in-process —
the one warmth the protocol cannot shed without a subprocess per rep).
Each query is materialized with ``collect()`` — results are small
aggregates (bounded by grid/group cardinality, never event rows), so
collect cost is negligible and the timing captures the full scan ->
transform -> shuffle -> aggregate pipeline.
"""

from __future__ import annotations

import glob
import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _prev_round_queries(sf: float) -> tuple[str | None, dict[str, float]]:
    """Latest driver-recorded BENCH_r*.json at the same scale factor
    -> (file, per-query secs); deltas across scale factors would be
    meaningless."""
    here = os.path.dirname(os.path.abspath(__file__))
    best: tuple[int, str] | None = None
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m:
            r = int(m.group(1))
            if best is None or r > best[0]:
                best = (r, p)
    if best is None:
        return None, {}
    try:
        with open(best[1]) as fh:
            doc = json.load(fh)
        parsed = doc.get("parsed", doc) or {}
        if float(parsed.get("sf", -1)) == sf and not parsed.get(
            "queries_omitted"
        ):
            q = parsed.get("queries", {})
            return os.path.basename(best[1]), {
                k: float(v) for k, v in q.items()
            }
        # compact-line rounds keep the full map only in the committed
        # sidecar; use it when it matches the recorded total
        side = os.path.join(here, "bench_results.json")
        with open(side) as fh:
            detail = json.load(fh)
        if float(detail.get("sf", -1)) == sf:
            return "bench_results.json", {
                k: float(v) for k, v in detail.get("queries", {}).items()
            }
        return os.path.basename(best[1]), {}
    except Exception:  # noqa: BLE001 - deltas are best-effort decoration
        return os.path.basename(best[1]), {}


def _run_suite(sf_dir: str, cpus: str) -> tuple[dict[str, float], dict[str, str]]:
    """One cold rep: fresh session, warm-up scan, run every query."""
    from mpes_spark.session import get_spark

    spark = get_spark(
        app_name="mpes_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if cpus.isdigit() else 32,
    )
    # Pay one-time session costs (JVM threads, parquet footer reads)
    # outside the timed region.
    spark.read.parquet(f"{sf_dir}/events.parquet").limit(1000).groupBy().count().collect()

    from __spark_entry__ import queries

    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name, fn in queries().items():
        # Settle GC debt from the previous query OUTSIDE the timed
        # region: the allocation burst of a shuffle-heavy neighbor
        # (e.g. the shingle-explode dedup queries) otherwise lands a
        # multi-second major-GC stall on whichever query runs next —
        # measured: +8-13 s on the follower, gone after System.gc().
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).collect()
            timings[name] = time.perf_counter() - t0
        except Exception as exc:  # noqa: BLE001 - report, don't abort the run
            failures[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# FAIL {name}: {failures[name]}", file=sys.stderr)
    spark.stop()
    return timings, failures


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_REPS", "3")))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    per_rep: list[dict[str, float]] = []
    failures: dict[str, str] = {}
    for r in range(reps):
        t, f = _run_suite(sf_dir, cpus)
        per_rep.append(t)
        failures.update(f)
        print(f"# rep {r + 1}/{reps}: {sum(t.values()):.1f}s", file=sys.stderr)

    names = [n for n in per_rep[0] if all(n in t for t in per_rep)]
    medians = {
        n: round(statistics.median(t[n] for t in per_rep), 4) for n in names
    }
    spread = {
        n: [round(min(t[n] for t in per_rep), 4), round(max(t[n] for t in per_rep), 4)]
        for n in names
    }

    out: dict = {
        "metric": "query_suite_total",
        "value": round(sum(medians.values()), 4),
        "unit": "sec",
        "queries": medians,
        "sf": sf,
        "reps": reps,
        "spread": spread,
    }

    prev_file, prev = _prev_round_queries(sf)
    if prev:
        common = [n for n in medians if n in prev]
        out["prev_round"] = prev_file
        out["prev_total"] = round(sum(prev[n] for n in common), 4)
        out["delta_total"] = round(
            sum(medians[n] for n in common) - out["prev_total"], 4
        )
        # queries >= 1.5x slower than last round's recorded number
        out["regressions"] = {
            n: [round(prev[n], 4), medians[n]]
            for n in common
            if prev[n] > 0.05 and medians[n] / prev[n] >= 1.5
        }
    if failures:
        out["failures"] = failures

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "bench_results.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=False)
    print("# full results: bench_results.json", file=sys.stderr)

    # Compact final stdout line, sized for the driver's 2000-char tail.
    line: dict = {k: out[k] for k in ("metric", "value", "unit", "sf", "reps")}
    line["n_queries"] = len(medians)
    line["detail"] = "bench_results.json"
    for k in ("failures", "regressions", "prev_total", "delta_total"):
        if k in out and out[k]:
            line[k] = out[k]
    budget = 1900
    slowest = sorted(medians, key=medians.get, reverse=True)
    compact: dict[str, float] = {}
    line["queries"] = compact
    line["queries_omitted"] = len(medians)
    for n in slowest:
        compact[n] = round(medians[n], 2)
        line["queries_omitted"] = len(medians) - len(compact)
        if len(json.dumps(line, separators=(",", ":"))) > budget:
            del compact[n]
            line["queries_omitted"] = len(medians) - len(compact)
            break
    if not line["queries_omitted"]:
        del line["queries_omitted"]
    print(json.dumps(line, separators=(",", ":")))


if __name__ == "__main__":
    main()
