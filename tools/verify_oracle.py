"""Full-registry oracle verification (r11).

Runs every declared query (or a named subset) at a small SF against its
DuckDB oracle with the driver's comparison semantics (shape + column
set + order-insensitive exact values). Usage:

    python tools/verify_oracle.py                 # all oracled queries
    python tools/verify_oracle.py neardup_ dedup_ # name-prefix filter
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 python tools/verify_oracle.py
"""

import math
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
import duckdb
import pandas as pd

from mpes_spark.session import get_spark

sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
spark = get_spark(app_name="verify_oracle", master="local[32]", shuffle_partitions=32)
import __spark_entry__ as ent

Q, O = ent.queries(), ent.oracle_sql()
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
duck = duckdb.connect()
for t in TABLES:
    duck.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
    )


def canon(df):
    out = df.copy()[sorted(df.columns)]
    for c in out.columns:
        if pd.api.types.is_float_dtype(out[c]):
            out[c] = out[c].astype("float64")
        elif pd.api.types.is_integer_dtype(out[c]):
            out[c] = out[c].astype("int64")
    return out.sort_values(by=list(out.columns), ignore_index=True)


prefixes = sys.argv[1:]
names = [
    n
    for n in Q
    if not prefixes or any(p in n for p in prefixes)
]
n_ok = n_ro = n_bad = 0
bad_names = []
t_start = time.time()
for name in names:
    t0 = time.time()
    try:
        got = Q[name](spark, sf).toPandas()
        sql = O.get(name)
        if sql is None:
            n_ro += 1
            print(f"{name:36s} rows-only rows={len(got)} ({time.time()-t0:.1f}s)")
            continue
        want = duck.execute(sql).df()
        g, w = canon(got), canon(want)
        bad = []
        if len(g) == len(w) and list(g.columns) == list(w.columns):
            for col in g.columns:
                for a, b in zip(g[col], w[col]):
                    e = (
                        isinstance(a, float)
                        and isinstance(b, float)
                        and (a == b or (math.isnan(a) and math.isnan(b)))
                    ) or a == b
                    if not e:
                        bad.append((col, a, b))
                        break
        else:
            bad.append(("shape", (len(g), list(g.columns)), (len(w), list(w.columns))))
        if bad:
            n_bad += 1
            bad_names.append(name)
            print(f"{name:36s} HASH-BAD {bad[:2]} ({time.time()-t0:.1f}s)")
        else:
            n_ok += 1
            print(f"{name:36s} ok ({time.time()-t0:.1f}s)")
    except Exception as exc:  # noqa: BLE001 - report every query
        n_bad += 1
        bad_names.append(name)
        print(f"{name:36s} ERROR {type(exc).__name__}: {str(exc)[:160]}")
print(
    f"\n{len(names)} checked in {time.time()-t_start:.0f}s: "
    f"{n_ok} hash-OK, {n_ro} rows-only, {n_bad} BAD"
)
if bad_names:
    print("BAD:", ", ".join(bad_names))
spark.stop()
sys.exit(1 if bad_names else 0)
