"""Exclusive 7-rep interleaved adjudication of the 27 r7 driver bench
flags (BENCH_r07.json .regressions), per the committed playbook
(SCALING.md): one fresh session, local[32], sf0.1, System.gc() before
every timed sample, rep-seeded interleaving; clear bar = 1.2 x prev
max band x probe drift."""
import json, os, random, statistics, sys, time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

flags = json.load(open("/root/repo/BENCH_r07.json"))["parsed"]["regressions"]
side = json.load(open("/root/repo/bench_results.json"))
bands = side["bands"]; prev_probe = sum(side["probe"].values())
names = sorted(flags)
print(f"adjudicating {len(names)} flags; loadavg {os.getloadavg()}")

from mpes_spark.session import get_spark
sf_dir = "/root/testdata/sf0.1"
spark = get_spark(app_name="adjudicate_r8", master="local[32]", shuffle_partitions=32)
spark.read.parquet(f"{sf_dir}/events.parquet").limit(1000).groupBy().count().collect()

# probes (copied semantics from bench.py via import)
import bench as B
probe_now = {}
for pname, fn in B._probes(sf_dir).items():
    spark.sparkContext._jvm.System.gc()
    t0 = time.perf_counter(); fn(spark).collect()
    probe_now[pname] = time.perf_counter() - t0
drift = max(0.5, min(2.0, sum(probe_now.values()) / prev_probe))
print(f"probes now {probe_now} drift {drift:.3f}")

from __spark_entry__ import queries
q = queries()
samples = {n: [] for n in names}
REPS = 7
for rep in range(1, REPS + 1):
    order = list(names); random.Random(rep).shuffle(order)
    for n in order:
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        q[n](spark, sf_dir).collect()
        samples[n].append(round(time.perf_counter() - t0, 3))
    print(f"rep {rep}/{REPS} done", flush=True)

out = {"drift": drift, "probe_now": probe_now, "loadavg_end": os.getloadavg(), "queries": {}}
n_clear = 0
for n in names:
    med = statistics.median(samples[n])
    prev_max = max(bands[n]) if n in bands else None
    bar = (1.2 * prev_max * drift) if prev_max else None
    verdict = "CLEAR" if (bar is not None and med <= bar) else "FLAG"
    if verdict == "CLEAR": n_clear += 1
    out["queries"][n] = {"samples": samples[n], "median": med,
                         "prev_max_band": prev_max, "clear_bar": round(bar, 3) if bar else None,
                         "driver_flagged": flags[n], "verdict": verdict}
    print(f"{n:32s} med {med:7.3f}  bar {bar:7.3f}  driver {flags[n][1]:7.3f}  {verdict}")
print(f"{n_clear}/{len(names)} cleared")
json.dump(out, open("/tmp/adjudicate_r8.json", "w"), indent=1)
spark.stop()
