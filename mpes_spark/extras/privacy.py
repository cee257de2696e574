"""Privacy governance operators (r8): k-anonymity auditing and a
deterministic differential-privacy noise mechanism — the release-side
counterpart of the PII scan/redact family in :mod:`extras.text`.

Both operators are engine-portable by construction (pure Column
algebra; closed-form inverse-CDF noise from the shared md5 hash
family), so each carries a full DuckDB hash-gate twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mpes_spark.extras.dedup import _md5_hash_sql

__all__ = [
    "k_anonymity_report",
    "k_anonymity_report_sql",
    "dp_noisy_counts_sql",
]


def k_anonymity_report(
    df: DataFrame, quasi: list[str], k: int = 5
) -> DataFrame:
    """k-anonymity audit over quasi-identifier columns: one row per
    equivalence-class-size bucket — (class_size, n_classes, n_rows,
    violates) where ``violates`` marks classes smaller than ``k``
    (rows re-identifiable within fewer than k candidates; Sweeney
    2002). Release gate: the table is k-anonymous iff no violating
    bucket exists. Two map-side-combined aggregations (quasi-group
    sizes, then a size histogram) — output bounded by distinct class
    sizes, no joins, all-integer exact gate."""
    classes = df.groupBy(*quasi).agg(F.count(F.lit(1)).alias("class_size"))
    return (
        classes.groupBy("class_size")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_classes"),
            (F.count(F.lit(1)) * F.col("class_size")).cast("bigint").alias("n_rows"),
        )
        .select(
            F.col("class_size").cast("bigint").alias("class_size"),
            "n_classes",
            "n_rows",
            (F.col("class_size") < k).alias("violates"),
        )
    )


def k_anonymity_report_sql(table: str, quasi: list[str], k: int = 5) -> str:
    q = ", ".join(quasi)
    return f"""
SELECT CAST(class_size AS BIGINT) AS class_size,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(count(*) * class_size AS BIGINT) AS n_rows,
       class_size < {k} AS violates
FROM (SELECT {q}, count(*) AS class_size FROM {table} GROUP BY {q})
GROUP BY class_size
""".strip()


def dp_noisy_counts_sql(
    table: str,
    keys: list[str],
    dialect: str,
    epsilon: float = 1.0,
    seed: int = 7,
) -> str:
    """Laplace-mechanism noisy group counts (Dwork et al. 2006),
    dual-dialect: count + Lap(1/epsilon) per group with the noise
    drawn DETERMINISTICALLY from the shared md5 hash of the group key
    — u = (hash mod 2^30 + 0.5) / 2^30 in (0,1) with exactly
    representable steps, noise = -(1/eps) * sign(u - 0.5) *
    ln(1 - 2|u - 0.5|) (inverse CDF). A seeded-hash draw makes the
    release reproducible and hash-gateable (the identical expression
    tree runs on both engines; the one ln() rounds away at 6 digits);
    swapping in true randomness is the seed argument. One
    map-side-combined aggregation; the noise expression is per GROUP,
    so its cost is grid-bounded, never row-bounded."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    q = ", ".join(keys)
    key_sql = " || '|' || ".join(f"CAST({c} AS {s})" for c in keys)
    h = _md5_hash_sql(seed, f"({key_sql})", dialect)
    b = 1.0 / float(epsilon)
    u = f"((({h}) % {1 << 30}) + 0.5) / {float(1 << 30)!r}"
    return f"""
SELECT {q},
       CAST(true_count AS BIGINT) AS true_count,
       round(true_count + (-{b!r}) * sign(u - 0.5) * ln(1 - 2 * abs(u - 0.5)), 6)
         AS noisy_count
FROM (
  SELECT {q}, count(*) AS true_count, {u} AS u
  FROM {table} GROUP BY {q}
)
""".strip()


def l_diversity_report(
    df: DataFrame, quasi: list[str], sensitive: str, ell: int = 2
) -> DataFrame:
    """Distinct l-diversity audit (Machanavajjhala et al. 2007): per
    quasi-identifier equivalence class, the count of DISTINCT
    sensitive values; a class with fewer than ``ell`` distinct values
    leaks the sensitive attribute even when k-anonymous. Output is the
    (n_sensitive -> class count/row count) histogram with a violates
    flag — the same bucketed-report shape as
    :func:`k_anonymity_report`, so the two gates compose into one
    release checklist. Two-level exact distinct (group by quasi +
    sensitive first) — never a count-distinct shuffle of raw rows."""
    per_class = (
        df.select(*quasi, sensitive)
        .distinct()
        .groupBy(*quasi)
        .agg(F.count(F.lit(1)).alias("n_sensitive"))
    )
    sizes = df.groupBy(*quasi).agg(F.count(F.lit(1)).alias("class_rows"))
    joined = per_class.join(sizes, quasi)
    return (
        joined.groupBy("n_sensitive")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_classes"),
            F.sum("class_rows").cast("bigint").alias("n_rows"),
        )
        .select(
            F.col("n_sensitive").cast("bigint").alias("n_sensitive"),
            "n_classes",
            "n_rows",
            (F.col("n_sensitive") < ell).alias("violates"),
        )
    )


def l_diversity_report_sql(
    table: str, quasi: list[str], sensitive: str, ell: int = 2
) -> str:
    q = ", ".join(quasi)
    return f"""
WITH per_class AS (
  SELECT {q}, count(*) AS n_sensitive
  FROM (SELECT DISTINCT {q}, {sensitive} FROM {table}) d GROUP BY {q}
),
sizes AS (SELECT {q}, count(*) AS class_rows FROM {table} GROUP BY {q})
SELECT CAST(n_sensitive AS BIGINT) AS n_sensitive,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(class_rows) AS BIGINT) AS n_rows,
       n_sensitive < {ell} AS violates
FROM per_class JOIN sizes USING ({q})
GROUP BY n_sensitive
""".strip()


def t_closeness_report(
    df: DataFrame, quasi: list[str], sensitive: str, t: float = 0.3
) -> DataFrame:
    """t-closeness audit (Li et al. 2007), total-variation rendering
    for categorical sensitive attributes (TV distance IS the
    variational EMD for the uniform ground metric): per quasi class,
    tv = 0.5 * sum_v |P_class(v) - P_global(v)|; classes with tv > t
    leak distributional information even when l-diverse. Output one
    row per class with the rounded distance and a violates flag.

    Shape: one (quasi, sensitive) count agg, one global sensitive agg
    (broadcast — sensitive cardinality-sized), one class-size agg; the
    |p - q| sum folds back with a map-side-combined groupBy. No joins
    larger than class x sensitive-value."""
    cls_val = df.groupBy(*quasi, sensitive).agg(F.count(F.lit(1)).alias("cv"))
    cls_sz = df.groupBy(*quasi).agg(F.count(F.lit(1)).alias("cn"))
    glob = df.groupBy(sensitive).agg(F.count(F.lit(1)).alias("gv"))
    n_total = df.count()
    # per (class, sensitive-value) contribution; values absent from a
    # class contribute P_global(v) on their own (handled by the
    # right-join against the global relation)
    joined = (
        cls_sz.crossJoin(F.broadcast(glob))
        .join(cls_val, [*quasi, sensitive], "left")
        .select(
            *quasi,
            "cn",
            F.abs(
                F.coalesce(F.col("cv"), F.lit(0)) / F.col("cn")
                - F.col("gv") / F.lit(float(n_total))
            ).alias("d"),
        )
    )
    return (
        joined.groupBy(*quasi)
        .agg(F.round(F.lit(0.5) * F.sum("d"), 6).alias("tv_distance"),
             F.max("cn").alias("class_rows"))
        .select(
            *quasi,
            F.col("class_rows").cast("bigint").alias("class_rows"),
            "tv_distance",
            (F.col("tv_distance") > t).alias("violates"),
        )
    )


def t_closeness_report_sql(
    table: str, quasi: list[str], sensitive: str, t: float = 0.3
) -> str:
    q = ", ".join(quasi)
    return f"""
WITH cls_val AS (
  SELECT {q}, {sensitive}, count(*) AS cv FROM {table} GROUP BY {q}, {sensitive}
),
cls_sz AS (SELECT {q}, count(*) AS cn FROM {table} GROUP BY {q}),
gdist AS (SELECT {sensitive}, count(*) AS gv FROM {table} GROUP BY {sensitive}),
tot AS (SELECT count(*) AS n FROM {table}),
pairs AS (
  SELECT s.{q.replace(', ', ', s.')}, s.cn,
         abs(COALESCE(v.cv, 0) / CAST(s.cn AS DOUBLE)
             - g.gv / CAST(t.n AS DOUBLE)) AS d
  FROM cls_sz s CROSS JOIN gdist g CROSS JOIN tot t
  LEFT JOIN cls_val v
    ON {' AND '.join(f'v.{c} = s.{c}' for c in quasi)}
   AND v.{sensitive} = g.{sensitive}
)
SELECT {q}, CAST(max(cn) AS BIGINT) AS class_rows,
       round(0.5 * sum(d), 6) AS tv_distance,
       round(0.5 * sum(d), 6) > {t!r} AS violates
FROM pairs GROUP BY {q}
""".strip()
