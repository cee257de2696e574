"""Declarative data-quality constraint checking (the Deequ/dbt-test
shape [Schelter et al. 2018, "Automating large-scale data quality
verification"]): describe constraints, get back one tidy
``(check_name, metric, passed)`` relation computed in as few passes as the
constraint set allows.

Scale shape: all single-column constraints (uniqueness, completeness,
range, accepted-values, row count) collapse into ONE aggregation pass
over the table — a handful of agg expressions riding a single scan,
partial/final combined map-side. Referential-integrity checks each
add one anti-join-shaped aggregation (broadcast when the key side is
dim-sized). Nothing is ever collected except the per-check metric row.

Metrics are fractions in [0, 1] (or row counts), rounded to 6 so the
DuckDB oracle twin hash-matches; ``passed`` compares the ROUNDED
metric against the threshold, so both engines decide identically.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Unique:
    """distinct(col)/count(*) == 1 (primary-key property). The
    denominator is ALL rows, so NULLs count against uniqueness — a PK
    column with NULL rows fails both this and its NotNull companion
    rather than slipping through (distinct/count both skip NULLs, so a
    non-NULL-only ratio would pass a column that is half NULL)."""

    col: str

    @property
    def name(self) -> str:
        return f"unique_{self.col}"


@dataclass(frozen=True)
class NotNull:
    """Fraction of non-NULL values must be >= ``min_fraction``."""

    col: str
    min_fraction: float = 1.0

    @property
    def name(self) -> str:
        return f"notnull_{self.col}"


@dataclass(frozen=True)
class InRange:
    """Fraction of non-NULL values inside [lo, hi] >= min_fraction."""

    col: str
    lo: float
    hi: float
    min_fraction: float = 1.0

    @property
    def name(self) -> str:
        return f"range_{self.col}"


@dataclass(frozen=True)
class InSet:
    """Fraction of non-NULL values in the accepted set >= min_fraction."""

    col: str
    values: tuple
    min_fraction: float = 1.0

    @property
    def name(self) -> str:
        return f"inset_{self.col}"


@dataclass(frozen=True)
class MinRows:
    """Table must have at least ``n`` rows."""

    n: int

    @property
    def name(self) -> str:
        return "min_rows"


Check = Unique | NotNull | InRange | InSet | MinRows


def _metric_and_threshold(c: Check):
    """(metric Column, pass threshold) — metric rounded to 6. Ratios
    use try_divide so an empty table / all-NULL column yields a NULL
    metric (coalesced to passed=0 downstream) instead of an ANSI
    divide-by-zero error; the SQL twin's nullif() denominators are the
    same semantics."""
    if isinstance(c, Unique):
        m = F.try_divide(
            F.countDistinct(F.col(c.col)).cast("double"), F.count(F.lit(1))
        )
        return F.round(m, 6), 1.0
    if isinstance(c, NotNull):
        m = F.try_divide(F.count(F.col(c.col)).cast("double"), F.count(F.lit(1)))
        return F.round(m, 6), c.min_fraction
    if isinstance(c, InRange):
        ok = F.sum(
            F.when(F.col(c.col).between(c.lo, c.hi), 1).otherwise(0)
        ).cast("double")
        return F.round(F.try_divide(ok, F.count(F.col(c.col))), 6), c.min_fraction
    if isinstance(c, InSet):
        ok = F.sum(
            F.when(F.col(c.col).isin(*c.values), 1).otherwise(0)
        ).cast("double")
        return F.round(F.try_divide(ok, F.count(F.col(c.col))), 6), c.min_fraction
    if isinstance(c, MinRows):
        return F.count(F.lit(1)).cast("double"), float(c.n)
    raise TypeError(f"unknown check {c!r}")


def check_constraints(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Evaluate all single-table constraints in ONE aggregation pass;
    returns ``(check_name, metric, passed)`` ordered by check name."""
    exprs = []
    thresholds: dict[str, float] = {}
    for c in checks:
        m, thr = _metric_and_threshold(c)
        exprs.append(m.alias(c.name))
        thresholds[c.name] = thr
    wide = df.agg(*exprs)
    stack_args = ", ".join(f"'{c.name}', `{c.name}`" for c in checks)
    tidy = wide.select(
        F.expr(f"stack({len(checks)}, {stack_args}) AS (check_name, metric)")
    )
    passed = None
    for name, thr in thresholds.items():
        cond = F.when(
            F.col("check_name") == name, (F.col("metric") >= F.lit(thr)).cast("int")
        )
        passed = cond if passed is None else passed.when(
            F.col("check_name") == name, (F.col("metric") >= F.lit(thr)).cast("int")
        )
    # NULL metric (empty table, all-NULL column) must read as FAILURE,
    # not pass-by-vacuity: fail_fast gates and the streaming monitor
    # test `passed == 0`, so a NULL `passed` would slip through.
    return tidy.select(
        "check_name", "metric", F.coalesce(passed, F.lit(0)).alias("passed")
    ).orderBy("check_name")


def referential_integrity(
    df: DataFrame, col: str, ref: DataFrame, ref_col: str
) -> DataFrame:
    """Fraction of non-NULL ``col`` values present in ``ref.ref_col``
    as a one-row ``(check_name, metric, passed)`` relation — union it with
    :func:`check_constraints` output. The membership probe is a
    left-semi-shaped join against the DISTINCT key side (broadcast
    when dim-sized); at 100 TB this is the same runtime-filter shape
    as `bloom_semijoin_prune`, exact instead of approximate."""
    keys = ref.select(F.col(ref_col).alias("_k")).distinct()
    probe = df.filter(F.col(col).isNotNull()).select(F.col(col).alias("_v"))
    hit = probe.join(keys, probe._v == keys._k, "left").agg(
        F.round(
            F.try_divide(
                F.sum(
                    F.when(F.col("_k").isNotNull(), 1).otherwise(0)
                ).cast("double"),
                F.count(F.lit(1)),
            ),
            6,
        ).alias("metric")
    )
    return hit.select(
        F.lit(f"fk_{col}").alias("check_name"),
        "metric",
        F.coalesce((F.col("metric") >= 1.0).cast("int"), F.lit(0)).alias("passed"),
    )


def _sql_str(v) -> str:
    """Render a Python string as a SQL string literal, doubling embedded
    single quotes so values like ``O'Brien`` can't produce malformed (or
    injectable) oracle SQL."""
    return "'" + str(v).replace("'", "''") + "'"


def dq_report_sql(table: str, checks: Sequence[Check], order: bool = True) -> str:
    """DuckDB oracle twin of :func:`check_constraints` (same names,
    same rounded metrics, same thresholds). ``order=False`` returns
    the bare UNION ALL for composition with :func:`fk_sql`."""
    rows = []
    for c in checks:
        if isinstance(c, Unique):
            m = (
                f"round(CAST(count(DISTINCT {c.col}) AS DOUBLE)"
                f" / nullif(count(*), 0), 6)"
            )
            thr = 1.0
        elif isinstance(c, NotNull):
            m = f"round(CAST(count({c.col}) AS DOUBLE) / nullif(count(*), 0), 6)"
            thr = c.min_fraction
        elif isinstance(c, InRange):
            m = (
                f"round(CAST(sum(CASE WHEN {c.col} BETWEEN {c.lo} AND {c.hi}"
                f" THEN 1 ELSE 0 END) AS DOUBLE) / nullif(count({c.col}), 0), 6)"
            )
            thr = c.min_fraction
        elif isinstance(c, InSet):
            vals = ", ".join(
                _sql_str(v) if isinstance(v, str) else str(v) for v in c.values
            )
            m = (
                f"round(CAST(sum(CASE WHEN {c.col} IN ({vals})"
                f" THEN 1 ELSE 0 END) AS DOUBLE) / nullif(count({c.col}), 0), 6)"
            )
            thr = c.min_fraction
        elif isinstance(c, MinRows):
            m = "CAST(count(*) AS DOUBLE)"
            thr = float(c.n)
        else:
            raise TypeError(f"unknown check {c!r}")
        rows.append(
            f"SELECT {_sql_str(c.name)} AS check_name, {m} AS metric, "
            f"CAST(coalesce({m} >= {thr!r}, FALSE) AS INTEGER) AS passed"
            f" FROM {table}"
        )
    body = " UNION ALL ".join(rows)
    return body + " ORDER BY check_name" if order else body


def fk_sql(table: str, col: str, ref_table: str, ref_col: str) -> str:
    """DuckDB twin of :func:`referential_integrity`."""
    m = (
        f"round(CAST(sum(CASE WHEN r._k IS NOT NULL THEN 1 ELSE 0 END)"
        f" AS DOUBLE) / nullif(count(*), 0), 6)"
    )
    return (
        f"SELECT 'fk_{col}' AS check_name, {m} AS metric, "
        f"CAST(coalesce({m} >= 1.0, FALSE) AS INTEGER) AS passed "
        f"FROM (SELECT {col} AS _v FROM {table} WHERE {col} IS NOT NULL) p "
        f"LEFT JOIN (SELECT DISTINCT {ref_col} AS _k FROM {ref_table}) r "
        f"ON p._v = r._k"
    )


# ---------------------------------------------------------------------------
# one-pass column profiling (the Deequ profiler / df.describe shape)
# ---------------------------------------------------------------------------

_NUMERIC_PREFIXES = ("int", "bigint", "smallint", "tinyint", "float", "double", "decimal")


def profile_columns(
    df: DataFrame, cols: Sequence[str] | None = None, dp: int = 6
) -> DataFrame:
    """Column profiler: for every requested column emit tidy
    ``(column, metric, value)`` rows — ``n_rows`` / ``n_null`` /
    ``n_distinct`` for all types, plus ``min`` / ``max`` / ``mean``
    (rounded to ``dp``) for numeric columns; all values rendered as
    DOUBLE so the relation stays one well-typed shape.

    This is the discovery half of the DQ surface (the constraints in
    :func:`check_constraints` are the enforcement half): ALL metrics
    for ALL columns ride ONE aggregation pass over one scan —
    ``k`` columns cost ``O(k)`` agg expressions, not ``k`` jobs — with
    partial/final combine map-side, and the output is bounded by
    columns x metrics, never rows."""
    cols = list(cols) if cols is not None else [c for c, _ in df.dtypes]
    dtypes = dict(df.dtypes)
    exprs: list = []
    names: list[tuple[str, str]] = []  # (column, metric) per expr slot

    def add(col: str, metric: str, e) -> None:
        exprs.append(e.cast("double").alias(f"{col}__{metric}"))
        names.append((col, metric))

    for c in cols:
        if c not in dtypes:
            raise ValueError(f"column {c!r} not in {list(dtypes)}")
        add(c, "n_rows", F.count(F.lit(1)))
        add(c, "n_null", F.count(F.lit(1)) - F.count(F.col(c)))
        add(c, "n_distinct", F.countDistinct(F.col(c)))
        if dtypes[c].startswith(_NUMERIC_PREFIXES):
            add(c, "min", F.round(F.min(F.col(c)).cast("double"), dp))
            add(c, "max", F.round(F.max(F.col(c)).cast("double"), dp))
            add(c, "mean", F.round(F.avg(F.col(c)), dp))
    wide = df.agg(*exprs)
    stack_args = ", ".join(
        f"'{c}', '{m}', `{c}__{m}`" for c, m in names
    )
    return wide.select(
        F.expr(
            f"stack({len(names)}, {stack_args}) AS (column, metric, value)"
        )
    ).orderBy("column", "metric")


def profile_sql(
    table: str,
    cols: Sequence[tuple[str, bool]],
    dp: int = 6,
) -> str:
    """DuckDB twin of :func:`profile_columns`. ``cols`` is
    ``(name, is_numeric)`` pairs (the oracle string is static, so the
    caller declares numericness instead of sniffing a live schema)."""
    rows = []
    for c, numeric in cols:
        rows += [
            f"SELECT '{c}' AS \"column\", 'n_rows' AS metric, CAST(count(*) AS DOUBLE) AS value FROM {table}",
            f"SELECT '{c}', 'n_null', CAST(count(*) - count({c}) AS DOUBLE) FROM {table}",
            f"SELECT '{c}', 'n_distinct', CAST(count(DISTINCT {c}) AS DOUBLE) FROM {table}",
        ]
        if numeric:
            rows += [
                f"SELECT '{c}', 'min', round(CAST(min({c}) AS DOUBLE), {dp}) FROM {table}",
                f"SELECT '{c}', 'max', round(CAST(max({c}) AS DOUBLE), {dp}) FROM {table}",
                f"SELECT '{c}', 'mean', round(avg({c}), {dp}) FROM {table}",
            ]
    body = " UNION ALL ".join(rows)
    return f'SELECT * FROM ({body}) p ORDER BY "column", metric'


# ---------------------------------------------------------------------------
# order-insensitive table checksum (migration / replication validation)
# ---------------------------------------------------------------------------

_CKSUM_SEED = 271


def _cksum_cols(cols, money_cols, dialect: str) -> str:
    """Row canonicalization both engines render identically: ints and
    strings concat as-is; 2-decimal money doubles become exact cent
    BIGINTs (float-to-string rendering is NOT engine-portable, cents
    are)."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    parts = []
    for c in cols:
        if c in money_cols:
            parts.append(f"CAST(CAST(round({c} * 100) AS BIGINT) AS {s})")
        else:
            parts.append(f"CAST({c} AS {s})")
    return ", '|', ".join(parts)


def table_checksum_sql(
    table: str,
    cols,
    money_cols=(),
    dialect: str = "duckdb",
) -> str:
    """One-line order-insensitive digest of a relation: bit_xor over
    the seeded 60-bit md5-family hash of each canonicalized row, plus
    the row count (XOR alone can't see a row repeated twice — the
    count disambiguates). The cross-engine/cross-cluster answer to
    "is the replica identical?": O(1) state per partition, map-side
    combined, no sort, no collect — where a sort-and-compare
    validation would be a full-table global sort at 100 TB.

    Shared template: the SAME expression string renders for Spark and
    DuckDB (the md5-prefix hash is the one family both engines
    compute bit-for-bit), so the driver's gate pins the digest
    itself."""
    from mpes_spark.extras.dedup import _md5_hash_sql

    row = f"concat({_cksum_cols(cols, money_cols, dialect)})"
    h = _md5_hash_sql(_CKSUM_SEED, row, dialect)
    return (
        f"SELECT '{table}' AS table_name, "
        f"CAST(count(*) AS BIGINT) AS n_rows, "
        f"CAST(bit_xor({h}) AS BIGINT) AS checksum FROM {table}"
    )


def table_checksum(df: DataFrame, name: str, cols, money_cols=()) -> DataFrame:
    """Spark side of :func:`table_checksum_sql` (same expression
    text, evaluated as a Column)."""
    from mpes_spark.extras.dedup import _md5_hash_sql

    row = f"concat({_cksum_cols(cols, money_cols, 'spark')})"
    h = _md5_hash_sql(_CKSUM_SEED, row, "spark")
    return df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.expr(f"bit_xor({h})").cast("bigint").alias("checksum"),
    ).select(
        F.lit(name).alias("table_name"), "n_rows", "checksum"
    )


# ---------------------------------------------------------------------------
# Merkle-style partition digest diff (replica divergence localization)
# ---------------------------------------------------------------------------

def _bucket_expr_sql(key: str, nbuckets: int, dialect: str) -> str:
    from mpes_spark.extras.dedup import _md5_hash_sql

    s = "STRING" if dialect == "spark" else "VARCHAR"
    # the 60-bit md5-prefix hash is non-negative in both engines, so
    # plain % is already a pmod
    return f"({_md5_hash_sql(_CKSUM_SEED + 1, f'CAST({key} AS {s})', dialect)} % {nbuckets})"


def partition_digests(
    df: DataFrame,
    key: str,
    cols,
    money_cols=(),
    nbuckets: int = 64,
) -> DataFrame:
    """Per-bucket digests of a relation: rows are hash-bucketed on
    ``key`` (seeded md5-family, so both engines and any two clusters
    agree on the bucketing), each bucket summarized by (n_rows,
    bit_xor row checksum) — the one-level Merkle decomposition of
    :func:`table_checksum`. Comparing two tables' digests
    (:func:`digest_diff`) localizes WHICH key ranges diverged at the
    cost of two aggregation scans and a bucket-sized join — no
    row-level compare, no sort, no shuffle of actual data. The
    recursive narrowing (re-digest a differing bucket at finer grain)
    is the anti-entropy repair loop replicated systems use; with
    nbuckets = O(n / target_rows) each level is O(1) state per bucket
    and a differing cell isolates ~target_rows rows for the row-level
    CDC diff (transforms/cdc.table_diff_feed) to finish."""
    from mpes_spark.extras.dedup import _md5_hash_sql

    row = f"concat({_cksum_cols(cols, money_cols, 'spark')})"
    h = _md5_hash_sql(_CKSUM_SEED, row, "spark")
    return (
        df.groupBy(
            F.expr(_bucket_expr_sql(key, nbuckets, "spark")).alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.expr(f"bit_xor({h})").cast("bigint").alias("checksum"),
        )
    )


def partition_digests_sql(
    table: str,
    key: str,
    cols,
    money_cols=(),
    nbuckets: int = 64,
    dialect: str = "duckdb",
) -> str:
    """Shared-template twin of :func:`partition_digests`."""
    from mpes_spark.extras.dedup import _md5_hash_sql

    row = f"concat({_cksum_cols(cols, money_cols, dialect)})"
    h = _md5_hash_sql(_CKSUM_SEED, row, dialect)
    b = _bucket_expr_sql(key, nbuckets, dialect)
    return (
        f"SELECT {b} AS bucket, CAST(count(*) AS BIGINT) AS n_rows, "
        f"CAST(bit_xor({h}) AS BIGINT) AS checksum FROM {table} GROUP BY 1"
    )


def digest_diff(a: DataFrame, b: DataFrame) -> DataFrame:
    """Buckets where two digest relations disagree: full-outer join on
    bucket, keep rows whose (n_rows, checksum) differ (a bucket
    present on one side only also differs). Output is
    divergence-sized: (bucket, n_a, checksum_a, n_b, checksum_b)."""
    aa = a.select(
        "bucket",
        F.col("n_rows").alias("n_a"),
        F.col("checksum").alias("checksum_a"),
    )
    bb = b.select(
        "bucket",
        F.col("n_rows").alias("n_b"),
        F.col("checksum").alias("checksum_b"),
    )
    j = aa.join(bb, "bucket", "full_outer")
    differs = (
        ~(
            F.col("n_a").eqNullSafe(F.col("n_b"))
            & F.col("checksum_a").eqNullSafe(F.col("checksum_b"))
        )
    )
    return j.filter(differs).select(
        "bucket", "n_a", "checksum_a", "n_b", "checksum_b"
    )
