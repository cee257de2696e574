"""Exclusive 7-rep interleaved adjudication of the 32 marginal band
flags in the builder's r9 CLOSE sidecar (VERDICT r9 #2; flags are
1.00-1.33x, median 1.05x, all same-code), plus a first COLD band for
minhash_lsh_pairs (driver 6.36 s in r9, never had a 7-rep band).

Playbook (committed, SCALING.md r6-r9): one fresh exclusive session,
local[32], sf0.1, System.gc() before every timed sample, rep-seeded
interleaving. prev = the PRE-FLAG baseline bands — the sidecar the
r9 close run compared against (fe922a3, extracted by the caller to
/tmp/side_r9preclose.json). Clear bar = 1.2 x prev max band x probe
drift; verdicts also re-derived at strict drift=1.0 because the
calibration probes on this box currently move ~2x while query costs
move ~5% (probe drift floor-clamps; see r10 notes in SCALING.md)."""
import json
import os
import random
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

flags = json.load(open("/tmp/side_r9close.json"))["regressions"]
side = json.load(open("/tmp/side_r9preclose.json"))
bands = side["bands"]
prev_probe = sum(side["probe"].values())
names = sorted(flags) + ["minhash_lsh_pairs"]
print(f"adjudicating {len(names)} queries; loadavg {os.getloadavg()}")

from mpes_spark.session import get_spark  # noqa: E402

sf_dir = "/root/testdata/sf0.1"
spark = get_spark(
    app_name="adjudicate_r10", master="local[32]", shuffle_partitions=32
)
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
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        q[n](spark, sf_dir).collect()
        samples[n].append(round(time.perf_counter() - t0, 3))
    # storage-cleared samples (r9 protocol): no leaked persists may
    # subsidize the next query
    spark.catalog.clearCache()
    print(f"rep {rep}/{REPS} done", flush=True)

out = {
    "drift": drift,
    "probe_now": probe_now,
    "loadavg_end": os.getloadavg(),
    "queries": {},
}
n_clear = n_clear_strict = 0
for n in names:
    med = statistics.median(samples[n])
    band = bands.get(n)
    prev_max = max(band) if band else None
    rec = {
        "samples": samples[n],
        "median": med,
        "band_now": [min(samples[n]), med, max(samples[n])],
        "prev_band": band,
    }
    if prev_max:
        rec["bar"] = round(1.2 * prev_max * drift, 3)
        rec["bar_strict"] = round(1.2 * prev_max, 3)
        rec["clear"] = med <= rec["bar"]
        rec["clear_strict"] = med <= rec["bar_strict"]
        n_clear += rec["clear"]
        n_clear_strict += rec["clear_strict"]
    out["queries"][n] = rec
out["n_clear"] = n_clear
out["n_clear_strict"] = n_clear_strict
with open("tools/adjudicate_r10_artifact.json", "w") as fh:
    json.dump(out, fh, indent=1)
print(json.dumps({k: v for k, v in out.items() if k != "queries"}))
for n in names:
    r = out["queries"][n]
    print(
        f"{n:28s} med {r['median']:7.3f} prev {r.get('prev_band')} "
        f"clear={r.get('clear')} strict={r.get('clear_strict')}"
    )
spark.stop()
