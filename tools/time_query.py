"""Isolated single-query timing (guide §1.4): cold session per rep,
storage cleared, gc settled, collect() on the (small-aggregate) result.

    python tools/time_query.py <reps> <name> [name ...]

Prints per-rep seconds and the median per query. Honors
$SPARK_GRAFT_SF_DIR and $SPARK_GRAFT_CPUS like bench.py.
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mpes_spark.session import get_spark


def main() -> None:
    reps = int(sys.argv[1])
    names = sys.argv[2:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    samples: dict[str, list[float]] = {n: [] for n in names}
    for r in range(reps):
        spark = get_spark(
            app_name="time_query",
            master=f"local[{cpus}]",
            shuffle_partitions=int(cpus) if cpus.isdigit() else 32,
        )
        spark.read.parquet(f"{sf}/events.parquet").limit(1000).groupBy().count().collect()
        import __spark_entry__ as ent

        q = ent.queries()
        for name in names:
            spark.catalog.clearCache()
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist(False)
            spark.sparkContext._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"time:{name}:rep{r}")
            t0 = time.perf_counter()
            q[name](spark, sf).collect()
            dt = time.perf_counter() - t0
            samples[name].append(dt)
            print(f"rep{r} {name:36s} {dt:8.3f}s", flush=True)
        spark.stop()
    print("--- medians ---")
    for n in names:
        s = sorted(samples[n])
        print(
            f"{n:36s} median={statistics.median(s):8.3f}  "
            f"min={s[0]:.3f} max={s[-1]:.3f}"
        )


if __name__ == "__main__":
    main()
