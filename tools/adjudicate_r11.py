"""Exclusive quiet-box adjudication of the r10 Arrow-UDF bench
inflation (VERDICT r10 #1): 9 queries ran 2-3.5x slower
driver-to-driver on untouched code while the JVM probes read the box
as FASTER — "host ambience" was claimed across three sessions without
a cold band for any of them. This run settles it.

Playbook (committed, SCALING.md r6-r10): ONE fresh exclusive session,
local[32], sf0.1, System.gc() + storage clear before every rep,
rep-seeded interleaving, 7 reps. Baselines:
  prev  = r9 close sidecar (git 947e616:bench_results.json ->
          /tmp/side_r9.json)  — the pre-inflation bands
  r10   = r10 driver sidecar (git 2eafc79:bench_results.json ->
          /tmp/side_r10.json) — the inflated medians
Per query we report which baseline the quiet box reproduces:
  clear        = median <= 1.2 x r9 max band x JVM-probe drift
  clear_strict = same at drift pinned to 1.0
  reproduced_inflation = median >= 0.8 x the r10 inflated median
The r11 bench now carries a 4th probe (Arrow pandas_udf round-trip);
its raw timing is recorded here to seed the per-class drift baseline.

NOTE sentence_span_dedup changed in r11 (segmenter chain collapsed
54 -> 3 passes), so its row is measured against BOTH baselines but
judged as a feature-cost re-band, not an ambience verdict.

Run:  git show 947e616:bench_results.json > /tmp/side_r9.json
      git show 2eafc79:bench_results.json > /tmp/side_r10.json
      python tools/adjudicate_r11.py     # exclusive box, ~15 min
"""
import json
import os
import random
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

NAMES = [
    "contrastive_mining_ann",
    "embed_neardup_banded",
    "semantic_dedup",
    "pack_sequences",
    "ann_lsh_cosine",
    "hist_rebin",
    "ivfpq_ann_cosine",
    "ivf_ann_fullprobe",
    "sentence_span_dedup",
]

side9 = json.load(open("/tmp/side_r9.json"))
side10 = json.load(open("/tmp/side_r10.json"))
bands9 = side9["bands"]
med10 = side10["queries"]
prev_probe = sum(side9["probe"].values())  # r9: JVM trio only
print(f"adjudicating {len(NAMES)} queries; loadavg {os.getloadavg()}")

from mpes_spark.session import get_spark  # noqa: E402

sf_dir = "/root/testdata/sf0.1"
spark = get_spark(
    app_name="adjudicate_r11", master="local[32]", shuffle_partitions=32
)
spark.read.parquet(f"{sf_dir}/events.parquet").limit(1000).groupBy().count().collect()

import bench as B  # noqa: E402

probe_now = {}
for pname, fn in B._probes(sf_dir).items():
    spark.sparkContext._jvm.System.gc()
    t0 = time.perf_counter()
    fn(spark).collect()
    probe_now[pname] = time.perf_counter() - t0
jvm_now = sum(v for k, v in probe_now.items() if k in B._JVM_PROBES)
drift = max(0.5, min(2.0, jvm_now / prev_probe))
print(f"probes now {probe_now} jvm-drift {drift:.3f}")

from __spark_entry__ import queries  # noqa: E402

q = queries()
samples = {n: [] for n in NAMES}
REPS = 7
for rep in range(1, REPS + 1):
    order = list(NAMES)
    random.Random(rep).shuffle(order)
    for n in order:
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        q[n](spark, sf_dir).collect()
        samples[n].append(round(time.perf_counter() - t0, 3))
    print(f"rep {rep}/{REPS} done", flush=True)

out = {
    "drift_jvm": drift,
    "probe_now": probe_now,
    "loadavg_end": os.getloadavg(),
    "queries": {},
}
n_clear = n_clear_strict = n_repro = 0
for n in NAMES:
    med = statistics.median(samples[n])
    band = bands9.get(n)
    prev_max = max(band) if band else None
    r10v = med10.get(n)
    rec = {
        "samples": samples[n],
        "median": med,
        "band_now": [min(samples[n]), med, max(samples[n])],
        "r9_band": band,
        "r10_median": r10v,
    }
    if prev_max:
        rec["bar"] = round(1.2 * prev_max * drift, 3)
        rec["bar_strict"] = round(1.2 * prev_max, 3)
        rec["clear"] = med <= rec["bar"]
        rec["clear_strict"] = med <= rec["bar_strict"]
        n_clear += rec["clear"]
        n_clear_strict += rec["clear_strict"]
    if r10v:
        rec["reproduced_inflation"] = med >= 0.8 * r10v
        n_repro += rec["reproduced_inflation"]
    out["queries"][n] = rec
out["n_clear"] = n_clear
out["n_clear_strict"] = n_clear_strict
out["n_reproduced_inflation"] = n_repro
with open("tools/adjudicate_r11_artifact.json", "w") as fh:
    json.dump(out, fh, indent=1)
print(json.dumps({k: v for k, v in out.items() if k != "queries"}))
for n in NAMES:
    r = out["queries"][n]
    print(
        f"{n:26s} med {r['median']:7.3f} r9 {r.get('r9_band')} "
        f"r10 {r.get('r10_median')} clear={r.get('clear')} "
        f"strict={r.get('clear_strict')} repro={r.get('reproduced_inflation')}"
    )
spark.stop()
