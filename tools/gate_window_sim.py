import math, sys
sys.path.insert(0, "/root/repo")
import pandas as pd, duckdb
from mpes_spark.session import get_spark

spark = get_spark(app_name="winsim", master="local[32]", shuffle_partitions=32)
import __spark_entry__ as ent
Q, O = ent.queries(), ent.oracle_sql()
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
sf = "/root/testdata/sf0.01"
duck = duckdb.connect()
for t in TABLES:
    duck.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

def canon(df):
    out = df.copy()[sorted(df.columns)]
    for c in out.columns:
        if pd.api.types.is_float_dtype(out[c]): out[c]=out[c].astype("float64")
        elif pd.api.types.is_integer_dtype(out[c]): out[c]=out[c].astype("int64")
    return out.sort_values(by=list(out.columns), ignore_index=True)

win = list(Q)[:50]
n_ok = n_ro = n_bad = 0
for name in win:
    try:
        got = Q[name](spark, sf).toPandas()
        sql = O.get(name)
        if sql is None:
            ok = len(got.columns) > 0
            n_ro += 1
            print(f"{name:32s} rows-only rows={len(got)}")
            continue
        want = duck.execute(sql).df()
        g, w = canon(got), canon(want)
        bad = []
        if len(g)==len(w) and list(g.columns)==list(w.columns):
            for col in g.columns:
                for a,b in zip(g[col], w[col]):
                    e = (isinstance(a,float) and isinstance(b,float) and (a==b or (math.isnan(a) and math.isnan(b)))) or a==b
                    if not e: bad.append((col,a,b)); break
        else:
            bad.append(("shape", len(g), len(w)))
        if bad:
            n_bad += 1
            print(f"{name:32s} HASH-BAD {bad[:2]}")
        else:
            n_ok += 1
    except Exception as exc:
        n_bad += 1
        print(f"{name:32s} ERROR {type(exc).__name__}: {str(exc)[:120]}")
print(f"\nwindow: {n_ok} hash-OK, {n_ro} rows-only, {n_bad} BAD of {len(win)}")
spark.stop()
