"""Dump .explain("formatted") for named registry queries.

    python tools/dump_query_plan.py <outdir> <suffix> <name> [name ...]

Run from the repo checkout whose code should be dumped (cwd decides);
honors $SPARK_GRAFT_SF_DIR (default sf0.01). Writes
<outdir>/<name><suffix>.txt per query.
"""

import os
import sys

ROOT = os.getcwd()
sys.path.insert(0, ROOT)

from mpes_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(
        app_name="dump_query_plan", master="local[8]", shuffle_partitions=8
    )
    import __spark_entry__ as ent

    q = ent.queries()
    for name in names:
        path = os.path.join(outdir, f"{name}{suffix}.txt")
        df = q[name](spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(path, "w") as fh:
            fh.write(f"# {name}{suffix}\n# code: {ROOT}\n{plan}")
        print(f"{name}{suffix}: {len(plan)} chars")
    spark.stop()


if __name__ == "__main__":
    main()
