"""Dump .explain("formatted") for named registry queries to files.

    python tools/dump_plans.py <outdir> <suffix> <name> [name ...]

writes <outdir>/<name><suffix>.txt for each query. Used to produce the
plans/r11/<query>_{before,after}.txt deliverables (run from a worktree
at the round-10 close for the _before set).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mpes_spark.session import get_spark


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(
        app_name="dump_plans", master="local[8]", shuffle_partitions=8
    )
    import __spark_entry__ as ent

    q = ent.queries()
    for name in names:
        if name not in q:
            print(f"{name}: NOT IN REGISTRY", file=sys.stderr)
            continue
        try:
            df = q[name](spark, sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 - keep dumping the rest
            plan = f"ERROR {type(exc).__name__}: {exc}"
        path = os.path.join(outdir, f"{name}{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"{name}: {len(plan)} chars -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
