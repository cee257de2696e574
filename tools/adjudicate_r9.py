"""Exclusive 7-rep interleaved adjudication of the r8 driver bench
flags plus the two judge-watched movers (VERDICT r8 #2):
`ngram_novelty` (driver 1.68x), `peaks_per_group` (driver 1.46x),
`dedup_canonical_quality` (1.42-1.45x in both close-to-close and
driver runs), `cross_source_duplication` (1.52x close-to-close).

Playbook (committed, SCALING.md r6/r7/r8): one fresh exclusive
session, local[32], sf0.1, System.gc() before every timed sample,
rep-seeded interleaving; clear bar = 1.2 x prev max band x probe
drift, where prev = the builder's r8 CLOSE sidecar (b24364a — the
pre-flag baseline), extracted to /tmp/side_r8close.json by the
caller. Single cold probe samples clamp drift to [0.5, 2.0]; verdicts
are also re-derived at strict drift=1.0 for the record.
"""
import json
import os
import random
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

names = [
    "ngram_novelty",
    "peaks_per_group",
    "dedup_canonical_quality",
    "cross_source_duplication",
]
side = json.load(open("/tmp/side_r8close.json"))
bands = side["bands"]
prev_probe = sum(side["probe"].values())
print(f"adjudicating {len(names)} flags; loadavg {os.getloadavg()}")

from mpes_spark.session import get_spark  # noqa: E402

sf_dir = "/root/testdata/sf0.1"
spark = get_spark(app_name="adjudicate_r9", master="local[32]", shuffle_partitions=32)
spark.read.parquet(f"{sf_dir}/events.parquet").limit(1000).groupBy().count().collect()

import bench as B  # noqa: E402

probe_now = {}
for pname, fn in B._probes(sf_dir).items():
    spark.sparkContext._jvm.System.gc()
    t0 = time.perf_counter()
    fn(spark).collect()
    probe_now[pname] = time.perf_counter() - t0
drift = max(0.5, min(2.0, sum(probe_now.values()) / prev_probe))
print(f"probes now {probe_now} drift {drift:.3f}")

from __spark_entry__ import queries  # noqa: E402

q = queries()
samples = {n: [] for n in names}
REPS = 7
for rep in range(1, REPS + 1):
    order = list(names)
    random.Random(rep).shuffle(order)
    for n in order:
        # r9 close protocol: clear leaked storage so every sample is
        # COLD (leaked persists otherwise make interleaved reps reuse
        # their own cache and understate the suite-cold cost)
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        q[n](spark, sf_dir).collect()
        samples[n].append(round(time.perf_counter() - t0, 3))
    print(f"rep {rep}/{REPS} done", flush=True)

out = {
    "drift": drift,
    "probe_now": probe_now,
    "loadavg_end": os.getloadavg(),
    "queries": {},
}
n_clear = 0
for n in names:
    med = statistics.median(samples[n])
    prev_max = max(bands[n])
    bar = 1.2 * prev_max * drift
    bar_strict = 1.2 * prev_max  # drift=1.0 rederivation
    verdict = "CLEAR" if med <= bar else "FLAG"
    verdict_strict = "CLEAR" if med <= bar_strict else "FLAG"
    if verdict == "CLEAR":
        n_clear += 1
    out["queries"][n] = {
        "samples": samples[n],
        "median": med,
        "prev_max_band": prev_max,
        "clear_bar": round(bar, 3),
        "clear_bar_strict": round(bar_strict, 3),
        "verdict": verdict,
        "verdict_strict": verdict_strict,
    }
    print(
        f"{n:28s} med {med:7.3f}  bar {bar:7.3f}  strict {bar_strict:7.3f}"
        f"  {verdict}/{verdict_strict}"
    )
print(f"{n_clear}/{len(names)} cleared")
json.dump(out, open("/root/repo/tools/adjudicate_r9_artifact.json", "w"), indent=1)
spark.stop()
