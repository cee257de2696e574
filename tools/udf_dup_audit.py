"""Find optimizer-duplicated Python UDF evaluations (guide §4.4).

Builds every registered query and flags plans where the same UDF call
signature appears in more than one ArrowEvalPython / BatchEvalPython
node — the filter-pushdown double-evaluation pattern. Prints only
queries with at least one duplicated signature.

    python tools/udf_dup_audit.py [name-substring ...]
"""

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mpes_spark.session import get_spark

NODE_RE = re.compile(
    r"^\(\d+\) (ArrowEvalPython|BatchEvalPython)\s*$\n^Input.*$\n"
    r"^Arguments: \[(.*?)\], \[pythonUDF",
    re.M,
)


def main() -> None:
    subs = sys.argv[1:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(
        app_name="udf_dup_audit", master="local[8]", shuffle_partitions=8
    )
    import __spark_entry__ as ent

    q = ent.queries()
    flagged = 0
    for name in q:
        if subs and not any(s in name for s in subs):
            continue
        try:
            df = q[name](spark, sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERR {type(exc).__name__}: {exc}"[:120])
            continue
        # canonicalize expression ids (#123) so the same call over the
        # same input matches across nodes
        sigs = Counter(
            re.sub(r"#\d+", "#", m.group(2)) for m in NODE_RE.finditer(plan)
        )
        dups = {s: c for s, c in sigs.items() if c > 1}
        if dups:
            flagged += 1
            print(f"== {name}")
            for s, c in dups.items():
                print(f"   x{c}: {s[:140]}")
    spark.stop()
    print(f"# {flagged} queries with duplicated UDF evaluations")


if __name__ == "__main__":
    main()
