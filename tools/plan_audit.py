"""Registry-wide physical-plan tabulation (guide §1/§7.2).

Builds every registered query at a small SF (no execution beyond any
eager checkpoints the operator itself performs), counts the plan nodes
that matter for the optimization audit, and prints a TSV sorted by
parquet-scan count — the smell that found the rouge/bleu and
contamination repeated-subtree wins.

    python tools/plan_audit.py [name-substring ...]   # default: all

`--executed` additionally RUNS each query once (collect, like the
bench) and tabulates the AQE-FINAL plan instead of the initial one.
The r11 lesson this encodes: initial-plan scan counts overstate
runtime work exactly when repeated subtrees are canonically identical
— AQE stage reuse dedups them at runtime (ReusedExchange), so a
fusion rewrite can only add overhead there. A repeated subtree is a
real fusion candidate only when the executed plan still shows the
duplicated scans and NO ReusedExchange covering them (the subtrees
diverge under pushdown/pruning, where no reuse mechanism exists).
Columns added in this mode: `reuse` (ReusedExchange nodes),
`aqeread` (AQEShuffleRead nodes).
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mpes_spark.session import get_spark

COUNTERS = {
    "scan": r"Scan parquet",
    "exch": r"\bExchange\b",
    "smj": r"SortMergeJoin",
    "bhj": r"BroadcastHashJoin",
    "win": r"\bWindow\b",
    "arrow": r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|AggregateInPandas|WindowInPandas|PythonMapInArrow",
    "rowudf": r"BatchEvalPython",
    "rdd": r"Scan ExistingRDD",
    "cache": r"InMemoryTableScan",
}

EXECUTED_COUNTERS = {
    "reuse": r"ReusedExchange",
    "aqeread": r"AQEShuffleRead",
}


def main() -> None:
    args = sys.argv[1:]
    executed = "--executed" in args
    subs = [a for a in args if a != "--executed"]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(
        app_name="plan_audit", master="local[8]", shuffle_partitions=8
    )
    import __spark_entry__ as ent

    q = ent.queries()
    counters = dict(COUNTERS)
    if executed:
        counters.update(EXECUTED_COUNTERS)
    rows = []
    for name in q:
        if subs and not any(s in name for s in subs):
            continue
        try:
            df = q[name](spark, sf)
            if executed:
                df.collect()  # AQE finalizes; same action as the bench
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 - audit the rest
            rows.append((name, {"err": f"{type(exc).__name__}: {exc}"[:80]}))
            continue
        counts = {
            k: len(re.findall(pat, plan)) for k, pat in counters.items()
        }
        counts["chars"] = len(plan)
        rows.append((name, counts))
    spark.stop()

    hdr = ["query"] + list(counters) + ["chars"]
    print("\t".join(hdr))
    for name, c in sorted(
        rows, key=lambda r: -(r[1].get("scan", 0) or 0)
    ):
        if "err" in c:
            print(f"{name}\tERR {c['err']}")
        else:
            print("\t".join([name] + [str(c[k]) for k in hdr[1:]]))


if __name__ == "__main__":
    main()
