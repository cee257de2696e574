#!/usr/bin/env python
"""Benchmark harness — times every registered query at the bench scale
factor (BASELINE.md §2 protocol) and emits ONE parseable JSON line on
stdout.

Protocol (driver contract):
    $SPARK_GRAFT_SF_DIR  input dir  (default /root/testdata/sf0.1)
    $SPARK_GRAFT_CPUS    local[N]   (default 32)
    $SPARK_GRAFT_REPS    repetitions (default 3; medians over reps)
    stdout last line: {"metric": ..., "value": total_sec, "unit": "sec",
                       "queries": {name: sec, ...}, "sf": N}

Self-adjudication (VERDICT r4 #1) — the protocol carries its own error
bars so ambient shared-VM drift (measured ±18-20% whole-suite,
SCALING.md) can't masquerade as a code regression:

- **Rep interleaving**: each rep runs the suite in a different
  (deterministic, rep-seeded) order, so a query's samples come from
  different suite positions and neighbor-GC/JIT ambience decorrelates
  across reps instead of biasing every sample the same way.
- **Bands**: per-query [min, median, max] over reps is recorded in the
  sidecar (`bands`); the median remains the headline number.
- **Calibration probes**: four fixed queries with code that never
  changes (parquet scan+agg, shuffle agg, pure-JVM expression chain,
  and an Arrow pandas_udf round-trip) run every rep. Their timings are
  a pure machine-speed signal, split into two drift classes (r11):
  JVM-bound queries rescale by the scan/shuffle/cpu trio's ratio,
  Python-worker-bound queries (plans containing ArrowEvalPython /
  MapInPandas / ... — auto-detected per query, recorded in the
  sidecar's `classes`) rescale by the Arrow probe's ratio. Both
  ratios clamp to [0.5, 2.0].
- **Regression rule**: a query is flagged only when its new median
  exceeds 1.2x the previous run's MAX band (or 1.5x the previous
  median when the previous round recorded no bands), after probe-drift
  rescaling. Flagged entries carry [prev_high, new_median, ratio] so a
  reviewer can adjudicate without re-deriving the rule.

The driver records only the LAST ~2000 chars of stdout and parses the
last line (round 3 lost its timings to tail truncation), so the
COMPLETE document (4-decimal medians, bands, probes, deltas,
regressions, failures) goes to a JSON sidecar and the final stdout
line stays under a 1700-char budget: header + drift + CAPPED
failure/regression digests (r12 — round 10's line became unparseable
because an uncapped `regressions` dict pushed the line past the
driver's 2000-char tail), then the slowest queries until the budget
is spent, with `queries_omitted` counting the tail.

Sidecar protocol (r12, VERDICT r11 #1/#2): the committed
`bench_results.json` is the round's ADJUDICATED baseline and is never
clobbered by a casual run — when that file is git-clean, results go
to `bench_results.latest.json` instead (promote explicitly with `cp`
+ commit after adjudicating any drift flags). `$SPARK_GRAFT_BENCH_OUT`
overrides the output path outright. Regression comparisons always
read the committed `bench_results.json`.

Probe warm pass (r11, declared per VERDICT r11 #8): each calibration
probe runs once untimed before its timed rep. The Arrow probe's warm
pass therefore spawns the Python worker pool BEFORE the query loop,
so the first Arrow query of a rep no longer pays worker spawn
(~2-3 s/rep vs the r10 protocol); recorded in the sidecar as
`worker_pool_prewarmed: true`.

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
import random
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PROBE_DRIFT_CLAMP = (0.5, 2.0)
BAND_REGRESSION_FACTOR = 1.2  # vs previous max band
MEDIAN_REGRESSION_FACTOR = 1.5  # fallback vs previous median (no bands)


def _probes(sf_dir: str):
    """Three fixed calibration queries — frozen code, so their timing
    moves only when the MACHINE does. Kept trivial (<~0.5 s each) and
    spanning the three cost regimes the suite exercises: parquet
    scan+aggregate (IO), hash-shuffle aggregate (exchange), and a pure
    JVM expression chain (CPU/codegen)."""
    from pyspark.sql import functions as F

    def probe_scan(spark):
        return (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .agg(F.count(F.lit(1)), F.sum("value"))
        )

    def probe_shuffle(spark):
        return (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .groupBy(F.pmod(F.xxhash64("user_id"), F.lit(64)).alias("b"))
            .agg(F.count(F.lit(1)).alias("c"))
        )

    def probe_cpu(spark):
        return (
            spark.range(2_000_000)
            .select(
                F.sum(
                    F.sqrt(F.col("id").cast("double") + 1.0)
                    + F.sin(F.col("id").cast("double") * 1e-4)
                ).alias("s")
            )
        )

    def probe_arrow(spark):
        # Fixed Arrow pandas_udf round-trip (r11, VERDICT r10 #4): the
        # scan/shuffle/cpu trio tracks only the JVM, but the component
        # that actually drifted in r10 was the Python worker pool
        # (probes read 0.71x while Arrow-tagged queries ran ~3x). This
        # probe times worker spawn + Arrow batch transfer both ways +
        # a pandas kernel, so Arrow-tagged queries get rescaled by the
        # machine signal of THEIR cost regime.
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("double")
        def _fma(a, b):
            return a * b + a

        return spark.range(1_000_000).select(
            F.sum(
                _fma(
                    F.col("id").cast("double"),
                    (F.col("id") % F.lit(7)).cast("double"),
                )
            ).alias("s")
        )

    return {
        "probe_scan": probe_scan,
        "probe_shuffle": probe_shuffle,
        "probe_cpu": probe_cpu,
        "probe_arrow": probe_arrow,
    }


# Physical-plan node names that mark a query as Python-worker-bound
# ("arrow" drift class); everything else is "jvm".
_ARROW_PLAN_RE = re.compile(
    r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|MapGroupsInPandas"
    r"|AggregateInPandas|WindowInPandas|FlatMapCoGroupsInPandas|PythonMapInArrow"
)
_JVM_PROBES = ("probe_scan", "probe_shuffle", "probe_cpu")


def _prev_round_results(sf: float) -> tuple[str | None, dict[str, float], dict[str, list], dict[str, float]]:
    """Latest recorded results at the same scale factor ->
    (source_file, per-query medians, per-query bands, probe dict).
    Prefers the committed sidecar (full map + bands + probes); falls
    back to the newest BENCH_r*.json parsed line when it carries the
    full query map. Bands accept both the r4 2-element spread and the
    r5+ 3-element [min, median, max]."""
    here = os.path.dirname(os.path.abspath(__file__))
    side = os.path.join(here, "bench_results.json")
    try:
        with open(side) as fh:
            detail = json.load(fh)
        if float(detail.get("sf", -1)) == sf:
            bands = detail.get("bands") or detail.get("spread") or {}
            probe = detail.get("probe")
            probe = dict(probe) if isinstance(probe, dict) else {}
            return (
                "bench_results.json",
                {k: float(v) for k, v in detail.get("queries", {}).items()},
                bands,
                probe,
            )
    except Exception:  # noqa: BLE001 - deltas are best-effort decoration
        pass
    best: tuple[int, str] | None = None
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m:
            r = int(m.group(1))
            if best is None or r > best[0]:
                best = (r, p)
    if best is None:
        return None, {}, {}, None
    try:
        with open(best[1]) as fh:
            doc = json.load(fh)
        parsed = doc.get("parsed", doc) or {}
        if float(parsed.get("sf", -1)) == sf and not parsed.get("queries_omitted"):
            return (
                os.path.basename(best[1]),
                {k: float(v) for k, v in parsed.get("queries", {}).items()},
                {},
                {},
            )
    except Exception:  # noqa: BLE001
        pass
    return os.path.basename(best[1]), {}, {}, {}


def _run_suite(
    sf_dir: str, cpus: str, rep: int
) -> tuple[dict[str, float], dict[str, float], dict[str, str]]:
    """One cold rep: fresh session, warm-up scan, probes, then every
    query in a rep-seeded order (interleaving: each rep samples each
    query at a different suite position)."""
    from mpes_spark.session import get_spark

    spark = get_spark(
        app_name="mpes_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if cpus.isdigit() else 32,
    )
    # Pay one-time session costs (JVM threads, parquet footer reads)
    # outside the timed region.
    spark.read.parquet(f"{sf_dir}/events.parquet").limit(1000).groupBy().count().collect()

    probe_times: dict[str, float] = {}
    for name, fn in _probes(sf_dir).items():
        # Warm pass first (r11): the FIRST execution of a code path in
        # a fresh JVM costs 3-4x its warm cost (JIT + Python worker
        # pool spawn for the Arrow probe — measured in-session
        # 2.89 -> 0.93 -> 0.73 s JVM trio, 3.39 -> 0.97 -> 0.52 s
        # Arrow; SCALING.md r11). A single-shot cold probe measures
        # warmup, not machine speed, and saturates the drift clamp.
        fn(spark).collect()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        fn(spark).collect()
        probe_times[name] = time.perf_counter() - t0

    from __spark_entry__ import queries

    q = queries()
    order = list(q)
    random.Random(rep).shuffle(order)

    timings: dict[str, float] = {}
    classes: dict[str, str] = {}
    failures: dict[str, str] = {}
    for name in order:
        # Settle the PREVIOUS query's residue OUTSIDE the timed
        # region, in two steps (r9):
        # 1. Release leaked storage: queries that persist() or
        #    localCheckpoint() intermediates cannot unpersist them
        #    (they return lazy DataFrames), so across a 240-query rep
        #    the block manager fills with dead blocks and mid-suite
        #    queries pay eviction churn their exclusive runs never
        #    see — measured: ngram_novelty 1.67 s in-suite vs 0.93 s
        #    exclusive, reproduced across the r8 driver run and both
        #    r9 builder runs, gone once storage is cleared. Each
        #    query is timed against clean storage, so in-suite
        #    medians now agree with the exclusive adjudication
        #    playbook instead of flagging suite-position noise.
        # 2. Settle GC debt: the allocation burst of a shuffle-heavy
        #    neighbor otherwise lands a multi-second major-GC stall
        #    on whichever query runs next (measured +8-13 s, r6).
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        try:
            df = q[name](spark, sf_dir)
            df.collect()
            timings[name] = time.perf_counter() - t0
        except Exception as exc:  # noqa: BLE001 - report, don't abort the run
            failures[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# FAIL {name}: {failures[name]}", file=sys.stderr)
        else:
            # Drift class, read OUTSIDE the timed region from the
            # already-planned query: Python-worker-bound plans rescale
            # by the Arrow probe, everything else by the JVM trio.
            try:
                plan = df._jdf.queryExecution().executedPlan().toString()
                classes[name] = "arrow" if _ARROW_PLAN_RE.search(plan) else "jvm"
            except Exception:  # noqa: BLE001 - class is decoration
                classes[name] = "jvm"
    spark.stop()
    return timings, probe_times, failures, classes


def _sidecar_path(here: str) -> str:
    """Where this run's full results go (r12, VERDICT r11 #2): the
    committed `bench_results.json` is the round's adjudicated baseline;
    a run must not silently replace it. If that file is git-clean
    (committed and unmodified), results go to
    `bench_results.latest.json`; promotion to baseline is an explicit
    `cp` + commit. `$SPARK_GRAFT_BENCH_OUT` overrides (path relative to
    the repo root, or absolute)."""
    env = os.environ.get("SPARK_GRAFT_BENCH_OUT")
    if env:
        return env
    side = os.path.join(here, "bench_results.json")
    if not os.path.exists(side):
        return "bench_results.json"
    try:
        import subprocess

        dirty = subprocess.run(
            ["git", "status", "--porcelain", "--", "bench_results.json"],
            cwd=here,
            capture_output=True,
            text=True,
            timeout=10,
        ).stdout.strip()
        if dirty:
            return "bench_results.json"  # already a scratch copy
        return "bench_results.latest.json"
    except Exception:  # noqa: BLE001 - no git? keep legacy behavior
        return "bench_results.json"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_REPS", "3")))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    per_rep: list[dict[str, float]] = []
    probe_reps: list[dict[str, float]] = []
    failures: dict[str, str] = {}
    classes: dict[str, str] = {}
    for r in range(reps):
        t, p, f, c = _run_suite(sf_dir, cpus, r)
        per_rep.append(t)
        probe_reps.append(p)
        failures.update(f)
        # "arrow" wins across reps: a plan that ever touched the
        # Python workers belongs to the arrow drift class.
        for n, cls in c.items():
            if classes.get(n) != "arrow":
                classes[n] = cls
        print(f"# rep {r + 1}/{reps}: {sum(t.values()):.1f}s", file=sys.stderr)

    names = [n for n in per_rep[0] if all(n in t for t in per_rep)]
    medians = {
        n: round(statistics.median(t[n] for t in per_rep), 4) for n in names
    }
    bands = {
        n: [
            round(min(t[n] for t in per_rep), 4),
            medians[n],
            round(max(t[n] for t in per_rep), 4),
        ]
        for n in names
    }
    # min over reps, not median (r11): probes estimate machine
    # CAPABILITY for drift rescaling, and shared-VM contention noise
    # is one-sided (samples only ever sit ABOVE the capability floor —
    # quiet-box minima reproduce historical bands while medians swing
    # 1.5-2.5x; SCALING.md r11). The min is the stable capability
    # statistic; query timings keep medians because the workload's
    # realistic cost includes the noise.
    probe = {
        n: round(min(p[n] for p in probe_reps), 4)
        for n in probe_reps[0]
    }

    out: dict = {
        "metric": "query_suite_total",
        "value": round(sum(medians.values()), 4),
        "unit": "sec",
        "queries": medians,
        "sf": sf,
        "reps": reps,
        "cpus": cpus,
        "bands": bands,
        "probe": probe,
        "classes": classes,
        "worker_pool_prewarmed": True,
    }

    prev_file, prev, prev_bands, prev_probe = _prev_round_results(sf)
    if prev:
        common = [n for n in medians if n in prev]
        out["prev_round"] = prev_file
        out["prev_total"] = round(sum(prev[n] for n in common), 4)
        out["delta_total"] = round(
            sum(medians[n] for n in common) - out["prev_total"], 4
        )
        # Per-class drift (r11): JVM queries rescale by the frozen
        # scan/shuffle/cpu trio, Arrow queries by the pandas_udf
        # round-trip probe — the r10 incident was exactly these two
        # classes drifting in opposite directions (JVM probes 0.71x
        # while Python-worker queries ran ~3x).
        drift_jvm = drift_arrow = 1.0
        jvm_common = [k for k in _JVM_PROBES if k in prev_probe and k in probe]
        if jvm_common:
            raw = sum(probe[k] for k in jvm_common) / sum(
                prev_probe[k] for k in jvm_common
            )
            drift_jvm = min(max(raw, PROBE_DRIFT_CLAMP[0]), PROBE_DRIFT_CLAMP[1])
            out["probe_drift"] = round(drift_jvm, 3)
        if prev_probe.get("probe_arrow") and probe.get("probe_arrow"):
            raw = probe["probe_arrow"] / prev_probe["probe_arrow"]
            drift_arrow = min(max(raw, PROBE_DRIFT_CLAMP[0]), PROBE_DRIFT_CLAMP[1])
            out["probe_drift_arrow"] = round(drift_arrow, 3)
        else:
            drift_arrow = drift_jvm  # no arrow baseline yet
        regressions: dict[str, list] = {}
        for n in common:
            if prev[n] <= 0.05:
                continue
            drift = drift_arrow if classes.get(n) == "arrow" else drift_jvm
            pb = prev_bands.get(n)
            if pb and len(pb) >= 2:
                prev_high = float(pb[-1])  # max of the recorded band
                limit = BAND_REGRESSION_FACTOR * drift * prev_high
            else:
                prev_high = prev[n]
                limit = MEDIAN_REGRESSION_FACTOR * drift * prev_high
            if medians[n] > limit:
                regressions[n] = [
                    round(prev_high, 4),
                    medians[n],
                    round(medians[n] / prev_high, 2),
                ]
        out["regressions"] = regressions
    if failures:
        out["failures"] = failures

    here = os.path.dirname(os.path.abspath(__file__))
    side_name = _sidecar_path(here)
    with open(os.path.join(here, side_name), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=False)
    print(f"# full results: {side_name}", file=sys.stderr)

    # Compact final stdout line, sized for the driver's 2000-char tail.
    # Every potentially-unbounded dict is CAPPED (r12): round 10's line
    # exceeded the tail because `regressions` was included whole, and
    # the r11 8-core run lost all query entries the same way. The line
    # carries counts + the worst few entries; the sidecar has the rest.
    line: dict = {k: out[k] for k in ("metric", "value", "unit", "sf", "reps")}
    line["n_queries"] = len(medians)
    line["detail"] = side_name
    for k in ("probe_drift", "prev_total", "delta_total"):
        if k in out and out[k] is not None:
            line[k] = out[k]
    if failures:
        line["n_failures"] = len(failures)
        line["failures"] = {
            n: failures[n][:80] for n in sorted(failures)[:3]
        }
    regressions = out.get("regressions") or {}
    if regressions:
        line["n_regressions"] = len(regressions)
        worst = sorted(regressions, key=lambda n: -regressions[n][2])[:5]
        line["regressions"] = {n: regressions[n] for n in worst}
    budget = 1700
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
