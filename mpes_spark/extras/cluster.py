"""Fixed-iteration k-means over embedding relations (Lloyd 1982) —
the clustering primitive under SemDeDup-style semantic dedup, domain
discovery, and IVF coarse quantization.

Deterministic, oracle-replayable rendering (the pagerank playbook,
``analysis/graph.py``): initial centroids are the vectors of the k
smallest ids, a FIXED number of Lloyd iterations unrolls into
per-iteration (assign -> update) steps, and the DuckDB twin
(:func:`kmeans_fixed_sql`) textually unrolls the same steps as chained
CTEs. Cross-engine float sync:

- assignment distances are rounded to 6 before the argmin (ties to the
  lower centroid id), so the ~1e-14 summation-order drift between
  Spark's left-fold and the oracle's per-dimension SUM can't flip an
  assignment;
- updated centroids are rounded to 9 ON THE ENGINE (F.round / round())
  before reuse, re-synchronizing both engines' centroids exactly each
  iteration (per-cell drift ~1e-16 against a 5e-10 boundary).

Scale shape (10^9 vectors): centroids are k x dim — always
driver-sized — so each iteration is ONE narrow projection for the
assignment (centroid literals inlined; no join, no shuffle) plus ONE
(cid, pos)-keyed aggregation for the update (map-side combined,
k x dim output cells). The driver round-trip per iteration carries
k x dim doubles, never data. Empty clusters drop out of the centroid
relation on both engines identically (no respawn heuristic — the
fixed-iteration contract keeps the plan replayable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dist2_expr(v, centroid: list[float]):
    """round(sum_i (v_i - c_i)^2, 6) as a left-fold Column."""
    lits = F.array(*[F.lit(float(c)) for c in centroid])
    return F.round(
        F.aggregate(
            F.zip_with(v, lits, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, d: acc + d,
        ),
        6,
    )


def kmeans_fixed(
    df: DataFrame,
    k: int = 4,
    iters: int = 2,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Fixed-iteration Lloyd k-means; returns the long-form result
    ``(cid, pos, centroid, n_points)`` — one row per (cluster,
    dimension), n_points from the final assignment."""
    from mpes_spark.extras.similarity import as_double_array

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if iters < 1:
        # iters=0 would leave `assigned` undefined (no final
        # assignment to count) — reject rather than crash later.
        raise ValueError(f"iters must be >= 1, got {iters}")

    e = df.select(F.col(id_col), as_double_array(vec).alias("v"))
    init_rows = e.orderBy(id_col).limit(k).collect()
    centroids: list[tuple[int, list[float]]] = [
        (i, list(r["v"])) for i, r in enumerate(init_rows)
    ]

    assigned = None
    for _ in range(iters):
        choice = F.array(
            *[
                F.struct(
                    _dist2_expr(F.col("v"), cv).alias("d"),
                    F.lit(cid).alias("cid"),
                )
                for cid, cv in centroids
            ]
        )
        assigned = e.withColumn(
            "cid", F.array_min(choice)["cid"].cast("int")
        )
        upd = (
            assigned.select("cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.round(F.avg("x"), 9).alias("val"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in upd:
            by_cid.setdefault(r["cid"], {})[r["pos"]] = r["val"]
        centroids = [
            (cid, [dims[p] for p in sorted(dims)])
            for cid, dims in sorted(by_cid.items())
        ]

    counts = assigned.groupBy("cid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points")
    )
    cent_rows = [
        (cid, pos, val)
        for cid, cv in centroids
        for pos, val in enumerate(cv)
    ]
    spark = df.sparkSession
    cent = spark.createDataFrame(
        cent_rows, "cid int, pos int, centroid double"
    )
    return cent.join(F.broadcast(counts), "cid").select(
        "cid", "pos", "centroid", "n_points"
    )


def kmeans_fixed_sql(
    table: str,
    k: int = 4,
    iters: int = 2,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB twin of :func:`kmeans_fixed`: the same k/iters unrolled
    as chained CTEs over the dimension-exploded relation."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if iters < 1:
        # mirror kmeans_fixed: iters=0 would reference a{0}, which is
        # never generated
        raise ValueError(f"iters must be >= 1, got {iters}")
    parts = [
        f"WITH e AS (SELECT {id_col}, {vec}::DOUBLE[] AS v FROM {table})",
        f"ex AS (SELECT {id_col}, unnest(v) AS x,"
        f" CAST(generate_subscripts(v, 1) - 1 AS INTEGER) AS pos FROM e)",
        # init: vectors of the k smallest ids, cid = 0-based rank
        f"c0 AS (SELECT CAST(row_number() OVER (ORDER BY {id_col}) - 1 AS INTEGER)"
        f" AS cid, v FROM e ORDER BY {id_col} LIMIT {k})",
        "c0x AS (SELECT cid, unnest(v) AS val,"
        " CAST(generate_subscripts(v, 1) - 1 AS INTEGER) AS pos FROM c0)",
    ]
    prev = "c0x"
    for i in range(1, iters + 1):
        parts.append(
            f"d{i} AS (SELECT ex.{id_col}, c.cid,"
            f" round(sum((ex.x - c.val) * (ex.x - c.val)), 6) AS d"
            f" FROM ex JOIN {prev} c ON c.pos = ex.pos"
            f" GROUP BY ex.{id_col}, c.cid)"
        )
        parts.append(
            f"a{i} AS (SELECT {id_col}, cid FROM ("
            f"SELECT {id_col}, cid, row_number() OVER ("
            f"PARTITION BY {id_col} ORDER BY d, cid) AS rn FROM d{i}) r"
            f" WHERE rn = 1)"
        )
        parts.append(
            f"c{i}x AS (SELECT a.cid, ex.pos, round(avg(ex.x), 9) AS val"
            f" FROM ex JOIN a{i} a USING ({id_col}) GROUP BY a.cid, ex.pos)"
        )
        prev = f"c{i}x"
    parts.append(
        f"n AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_points"
        f" FROM a{iters} GROUP BY cid)"
    )
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT c.cid, c.pos, c.val AS centroid, n.n_points"
        f" FROM {prev} c JOIN n USING (cid)"
    )
