"""plans/r11 before/after explain artifacts.

Dumps .explain("formatted") for the queries whose PLANS changed in
round 11. The prefix-dedup registry queries eagerly materialize
(localCheckpoint) so their *returned* plan is a bare ExistingRDD scan;
for those this script builds the SAME operator call the registry makes
but with ``checkpoint=False`` so the real stage structure is visible
(a header line in each file records that wrapping).

Run from the repo whose code should be dumped:

    cd /root/repo      && python tools/dump_plans_r11.py plans/r11 _after
    cd /tmp/r10close   && python tools/dump_plans_r11.py /root/repo/plans/r11 _before

Operator calls that don't exist in the before tree (e.g. waves=) are
skipped with a note.
"""

import os
import sys

ROOT = os.getcwd()
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from mpes_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    os.makedirs(outdir, exist_ok=True)
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(
        app_name="dump_plans_r11", master="local[8]", shuffle_partitions=8
    )
    import __spark_entry__ as ent
    from mpes_spark.extras import dedup as DD

    q = ent.queries()
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    def builders():
        # registry queries whose returned plan is fully visible
        yield "sentence_span_dedup", "registry query (plan fully visible)", (
            lambda: q["sentence_span_dedup"](spark, sf)
        )
        # prefix family: registry wraps these exact calls in an eager
        # localCheckpoint; checkpoint=False exposes the live plan
        note = "operator with checkpoint=False (registry wraps this plan in an eager localCheckpoint)"
        yield "neardup_prefix_filter", note, (
            lambda: DD.prefix_filtered_pairs(
                docs, threshold=0.7, n=3, checkpoint=False
            )
        )
        yield "neardup_prefix_waved", note + "; waves=3", (
            lambda: DD.prefix_filtered_pairs(
                docs, threshold=0.7, n=3, waves=3, checkpoint=False
            )
        )
        yield "neardup_dual_measure", note, (
            lambda: DD.prefix_dual_pairs(
                docs,
                jaccard_threshold=0.7,
                containment_threshold=0.9,
                n=3,
                checkpoint=False,
            )
        )

    for name, note, build in builders():
        path = os.path.join(outdir, f"{name}{suffix}.txt")
        try:
            df = build()
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            body = f"# {name}{suffix}: {note}\n# code: {ROOT}\n{plan}"
        except TypeError as exc:
            body = (
                f"# {name}{suffix}: NOT AVAILABLE in this tree "
                f"(operator predates the round-11 change: {exc})\n"
            )
        except KeyError:
            body = f"# {name}{suffix}: query not registered in this tree\n"
        with open(path, "w") as fh:
            fh.write(body)
        print(f"{name}{suffix}: {len(body)} chars")
    spark.stop()


if __name__ == "__main__":
    main()
