"""Decision-support shape battery — the join/subquery patterns the
round-4 set (Q1/Q3/Q5/Q8/Q10/Q14 shapes in ``registry.py``) did not
yet exercise: EXISTS semi-joins, NOT-EXISTS anti-joins with scalar
subquery thresholds, correlated per-group averages, disjunctive join
predicates, nation-pair self-joins on the dimension, HAVING against a
global aggregate, and per-group argmax selection.

Adapted to the driver's reduced star schema (no ``partsupp``, no
commit/receipt dates, no shipmode — see TESTDATA.md): each query keeps
the classic TPC-H plan *shape* while substituting available columns,
and the docstring says which physical pattern it pins.

Determinism rules (shared with ``registry.py``): every double
aggregate is ``round(sum, 2)``; derived averages divide the *rounded*
sum; thresholds computed from data are either exact (integral doubles)
or rounded identically on both engines before comparison; timestamps
never reach the output (years are cast to INT on both sides).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class Query:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    sql: str | None


_REGISTRY: list[Query] = []


def _q(name: str, sql: str | None):
    def deco(fn):
        _REGISTRY.append(Query(name, fn, sql))
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from mpes_spark.registry import t

    return t(spark, sf_dir, name)


def _ts(df: DataFrame, col: str, lit: str):
    return F.lit(lit).cast(dict(df.dtypes)[col])


# ---------------------------------------------------------------------------
# Q6 shape: single-table scan-aggregate with fully pushable predicates
# ---------------------------------------------------------------------------

_FORECAST_SQL = (
    "SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue, "
    "CAST(count(*) AS BIGINT) AS n_lines "
    "FROM lineitem "
    "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
    "AND l_shipdate < TIMESTAMP '1997-01-01' "
    "AND l_discount >= 0.05 AND l_discount <= 0.07 "
    "AND l_quantity < 24"
)


@_q("forecast_revenue", _FORECAST_SQL)
def forecast_revenue(spark, sf_dir):
    """TPC-H Q6-shaped revenue-change forecast: ONE fact-table scan
    where every predicate (date range, discount band, quantity cap)
    is pushable to the parquet reader, a map-side partial sum, and a
    1-row final agg — zero shuffled rows beyond 32 partials. The
    purest test that filters reach `PushedFilters` and nothing else
    rides the scan. At 100 TB this is the shape partition pruning +
    row-group statistics exist for."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts(li, "l_shipdate", "1996-01-01"))
            & (F.col("l_shipdate") < _ts(li, "l_shipdate", "1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
            .alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q4 shape: EXISTS -> LEFT SEMI join
# ---------------------------------------------------------------------------

_PRIORITY_SQL = (
    "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count "
    "FROM orders o "
    "WHERE o.o_orderdate >= TIMESTAMP '1996-01-01' "
    "AND o.o_orderdate < TIMESTAMP '1996-07-01' "
    "AND EXISTS (SELECT 1 FROM lineitem l "
    "  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R') "
    "GROUP BY o_orderpriority"
)


@_q("priority_order_count", _PRIORITY_SQL)
def priority_order_count(spark, sf_dir):
    """TPC-H Q4-shaped order-priority checking: the EXISTS subquery
    becomes a LEFT SEMI join (one orderkey-keyed shuffle; the semi
    side is pre-filtered and deduplicates inside the join — no
    distinct pass), then a priority-bounded count. Semi joins are the
    scale-correct EXISTS: the probe row is emitted at the first
    match, never multiplied by match count."""
    o = _t(spark, sf_dir, "orders")
    o = o.filter(
        (F.col("o_orderdate") >= _ts(o, "o_orderdate", "1996-01-01"))
        & (F.col("o_orderdate") < _ts(o, "o_orderdate", "1996-07-01"))
    ).select("o_orderkey", "o_orderpriority")
    r_lines = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(r_lines, o.o_orderkey == r_lines.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q22 shape: scalar-subquery threshold + NOT EXISTS -> LEFT ANTI join
# ---------------------------------------------------------------------------

_IDLE_RICH_SQL = (
    "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust, "
    "round(sum(c_acctbal), 2) AS totacctbal "
    "FROM customer c "
    "WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer "
    "  WHERE c_acctbal > 0.0) "
    "AND NOT EXISTS (SELECT 1 FROM orders o "
    "  WHERE o.o_custkey = c.c_custkey) "
    "GROUP BY c_mktsegment"
)


@_q("idle_rich_customers", _IDLE_RICH_SQL)
def idle_rich_customers(spark, sf_dir):
    """TPC-H Q22-shaped global-sales-opportunity: customers with
    above-average balance and no orders. The scalar AVG subquery is a
    1-row aggregate broadcast (crossJoin against one row, never a
    shuffle); NOT EXISTS becomes a LEFT ANTI join on custkey — the
    anti side projects the join key only, so at 100 TB the build side
    is a key column, not the orders table. Threshold determinism: the
    unrounded avg is bit-identical on both engines only up to
    summation order (~1e-10 of a ~5e3 mean) while balances are
    2-decimal — a boundary flip would need a customer within 1e-10 of
    the avg, which the 2-decimal grid makes impossible in practice.
    Output bounded by |mktsegment|."""
    c = _t(spark, sf_dir, "customer")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    rich = (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .select("c_custkey", "c_mktsegment", "c_acctbal")
    )
    return (
        rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Q13 shape: outer join survives the aggregate (zero-order customers count)
# ---------------------------------------------------------------------------

_CUST_DIST_SQL = (
    "SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM ("
    "  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count "
    "  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey "
    "    AND o.o_orderpriority <> '1-URGENT' "
    "  GROUP BY c.c_custkey) t "
    "GROUP BY c_count"
)


@_q("customer_order_counts", _CUST_DIST_SQL)
def customer_order_counts(spark, sf_dir):
    """TPC-H Q13-shaped customer distribution: LEFT OUTER join so
    customers with zero qualifying orders appear as c_count = 0 (the
    bug an inner join silently introduces), with the non-equi
    priority predicate in the JOIN condition, not the WHERE (where it
    would turn the outer join back into an inner). Two aggregations:
    custkey-keyed (the real shuffle) then distribution-keyed (tiny).
    count(o_orderkey) counts non-NULL only — the outer-join-aware
    count."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("bigint").alias("custdist")
    )


# ---------------------------------------------------------------------------
# Q17 shape: correlated per-group average -> aggregate + re-join
# ---------------------------------------------------------------------------

_SMALL_QTY_SQL = (
    "SELECT round(round(sum(l.l_extendedprice), 2) / 7.0, 6) AS avg_yearly "
    "FROM lineitem l "
    "JOIN part p ON p.p_partkey = l.l_partkey "
    "JOIN (SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_thr "
    "  FROM lineitem GROUP BY l_partkey) t ON t.l_partkey = l.l_partkey "
    "WHERE p.p_brand = 'Brand#23' AND l.l_quantity < t.qty_thr"
)


@_q("small_qty_avg_yearly", _SMALL_QTY_SQL)
def small_qty_avg_yearly(spark, sf_dir):
    """TPC-H Q17-shaped small-quantity-order revenue: the correlated
    `l_quantity < 0.2 * avg(l_quantity) per part` subquery is
    decorrelated into a partkey aggregate joined back to the fact —
    at 100 TB that is one partkey shuffle producing a |part|-sized
    relation, not a per-row subquery execution. The threshold is
    EXACT on both engines: quantities are integral doubles, so the
    per-part sum (and hence avg and 0.2*avg) is the same IEEE double
    regardless of summation order — no rounding needed before the
    comparison. Brand filter broadcasts from the part dim."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    thr = li.groupBy("l_partkey").agg(
        (0.2 * F.avg("l_quantity")).alias("qty_thr")
    ).withColumnRenamed("l_partkey", "t_partkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(thr, li.l_partkey == thr.t_partkey)
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg(
            F.round(F.round(F.sum("l_extendedprice"), 2) / 7.0, 6).alias(
                "avg_yearly"
            )
        )
    )


# ---------------------------------------------------------------------------
# Q18 shape: HAVING-qualified key set -> semi join back to the facts
# ---------------------------------------------------------------------------

_LARGE_VOL_SQL = (
    "SELECT c.c_name, c.c_custkey, o.o_orderkey, "
    "round(o.o_totalprice, 2) AS o_totalprice, "
    "round(sum(l.l_quantity), 2) AS sum_qty "
    "FROM customer c "
    "JOIN orders o ON o.o_custkey = c.c_custkey "
    "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
    "WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem "
    "  GROUP BY l_orderkey HAVING sum(l_quantity) > 250.0) "
    "GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_totalprice"
)


@_q("large_volume_customers", _LARGE_VOL_SQL)
def large_volume_customers(spark, sf_dir):
    """TPC-H Q18-shaped large-volume customers: the IN (GROUP BY ...
    HAVING) subquery is an orderkey aggregate semi-joined back to
    orders — the qualifying-key set is tiny (p99 of per-order
    quantity is ~262, threshold 250), so AQE broadcasts it and the
    re-join with lineitem stays on the already-shuffled orderkey.
    Threshold determinism: per-order quantity sums are integral
    doubles — exact on both engines. The final group-by keys include
    the order, so output is bounded by qualifying orders."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 250.0)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o_big = o.join(big, o.o_orderkey == big.big_orderkey, "left_semi")
    return (
        li.join(o_big, li.l_orderkey == o_big.o_orderkey)
        .join(F.broadcast(c), o_big.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "sum_qty",
        )
    )


# ---------------------------------------------------------------------------
# Q19 shape: disjunction of conjunctive join predicates
# ---------------------------------------------------------------------------

_DISJ_SQL = (
    "SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) "
    "  AS revenue, CAST(count(*) AS BIGINT) AS n_lines "
    "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
    "WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5 "
    "    AND l.l_quantity BETWEEN 1 AND 11) "
    "OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10 "
    "    AND l.l_quantity BETWEEN 10 AND 20) "
    "OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15 "
    "    AND l.l_quantity BETWEEN 20 AND 30)"
)


@_q("disjunctive_brand_revenue", _DISJ_SQL)
def disjunctive_brand_revenue(spark, sf_dir):
    """TPC-H Q19-shaped disjunctive-predicate revenue: an OR of three
    (brand, size, quantity) conjuncts straddling both join sides.
    Catalyst factors the part-only disjuncts (brand/size) into a
    pushed scan filter on the dim and keeps the mixed residual on the
    join — the dim shrinks to 3 brand groups and broadcasts, so the
    disjunction never forces a nested-loop join. The classic test
    that OR predicates don't defeat pushdown."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#12") & s.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#34") & s.between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q7 shape: nation-pair volume (the dimension self-join on both fact legs)
# ---------------------------------------------------------------------------

_VOLUME_PAIRS_SQL = (
    "SELECT supp_nation, cust_nation, l_year, "
    "round(sum(volume), 2) AS revenue FROM ("
    "  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
    "  CAST(year(l.l_shipdate) AS INTEGER) AS l_year, "
    "  l.l_extendedprice * (1 - l.l_discount) AS volume "
    "  FROM lineitem l "
    "  JOIN supplier s ON s.s_suppkey = l.l_suppkey "
    "  JOIN nation n1 ON n1.n_nationkey = s.s_nationkey "
    "  JOIN orders o ON o.o_orderkey = l.l_orderkey "
    "  JOIN customer c ON c.c_custkey = o.o_custkey "
    "  JOIN nation n2 ON n2.n_nationkey = c.c_nationkey "
    "  WHERE l.l_shipdate >= TIMESTAMP '1996-01-01' "
    "  AND l.l_shipdate < TIMESTAMP '1998-01-01' "
    "  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') "
    "    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))) v "
    "GROUP BY supp_nation, cust_nation, l_year"
)


@_q("volume_shipping_pairs", _VOLUME_PAIRS_SQL)
def volume_shipping_pairs(spark, sf_dir):
    """TPC-H Q7-shaped volume shipping between two nations: the
    nation dim joins BOTH fact legs (supplier side and customer
    side), and the pair predicate is a disjunction across the two
    aliases. Plan: supplier⋈nation1 and customer⋈nation2 are both
    broadcast (dim-sized), lineitem⋈orders is the one real shuffle
    (orderkey), and the pair filter rides the joined row — never a
    nation×nation expansion. Output bounded by 2 pairs × years."""
    li = _t(spark, sf_dir, "lineitem")
    li = li.filter(
        (F.col("l_shipdate") >= _ts(li, "l_shipdate", "1996-01-01"))
        & (F.col("l_shipdate") < _ts(li, "l_shipdate", "1998-01-01"))
    ).select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
        F.year("l_shipdate").cast("int").alias("l_year"),
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pair = (
        (F.col("supp_nation") == "NATION_1")
        & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2")
        & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q9 shape: product-line profit by nation and year
# ---------------------------------------------------------------------------

_PROFIT_SQL = (
    "SELECT nation, o_year, round(sum(amount), 2) AS sum_profit FROM ("
    "  SELECT n.n_name AS nation, "
    "  CAST(year(l.l_shipdate) AS INTEGER) AS o_year, "
    "  l.l_extendedprice * (1 - l.l_discount) "
    "    - 0.6 * p.p_retailprice * l.l_quantity AS amount "
    "  FROM lineitem l "
    "  JOIN part p ON p.p_partkey = l.l_partkey "
    "  JOIN supplier s ON s.s_suppkey = l.l_suppkey "
    "  JOIN nation n ON n.n_nationkey = s.s_nationkey "
    "  WHERE p.p_name LIKE '%red%') v "
    "GROUP BY nation, o_year"
)


@_q("product_profit_by_nation", _PROFIT_SQL)
def product_profit_by_nation(spark, sf_dir):
    """TPC-H Q9-shaped product-type profit (supply cost proxied as
    0.6 × retail price — the schema carries no partsupp): part is
    LIKE-filtered then broadcast into the fact, supplier⋈nation
    collapses to a second broadcast, and the only shuffle is the
    final (nation, year)-bounded aggregate. The LIKE filter cannot
    push to parquet as a range, but column pruning still reduces the
    dim scan to (partkey, name, retailprice)."""
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
        "l_discount",
        F.year("l_shipdate").cast("int").alias("o_year"),
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum(amount), 2).alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q15 shape: argmax against an aggregate (window over the aggregated grid)
# ---------------------------------------------------------------------------

_TOP_SUPPLIER_SQL = (
    "WITH rev AS (SELECT l_suppkey, "
    "  round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev "
    "  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
    "  AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY l_suppkey) "
    "SELECT s.s_suppkey, s.s_name, r.total_rev "
    "FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey "
    "WHERE r.total_rev = (SELECT max(total_rev) FROM rev)"
)


@_q("top_supplier_by_revenue", _TOP_SUPPLIER_SQL)
def top_supplier_by_revenue(spark, sf_dir):
    """TPC-H Q15-shaped top supplier: quarterly revenue per supplier,
    then the supplier(s) equal to the max. The scalar-max subquery is
    a window max over the ALREADY-AGGREGATED |supplier|-sized grid —
    not a self-join back to the fact table, which would re-derive the
    whole lineage twice (the r4 pagerank lesson, memory rule). Max
    compares 2-decimal-rounded revenues, so the equality is exact on
    both engines and ties return every argmax row deterministically."""
    from pyspark.sql.window import Window as W

    li = _t(spark, sf_dir, "lineitem")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= _ts(li, "l_shipdate", "1996-01-01"))
            & (F.col("l_shipdate") < _ts(li, "l_shipdate", "1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_rev")
        )
    )
    top = rev.withColumn(
        "max_rev", F.max("total_rev").over(W.partitionBy())
    ).filter(F.col("total_rev") == F.col("max_rev"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return top.join(
        F.broadcast(s), top.l_suppkey == s.s_suppkey
    ).select("s_suppkey", "s_name", "total_rev")


# ---------------------------------------------------------------------------
# Q11 shape: HAVING against a global aggregate (fraction-of-total gate)
# ---------------------------------------------------------------------------

_IMPORTANT_PARTS_SQL = (
    "WITH val AS (SELECT l.l_partkey, "
    "  round(sum(l.l_extendedprice * l.l_quantity), 2) AS part_value "
    "  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey "
    "  JOIN nation n ON n.n_nationkey = s.s_nationkey "
    "  JOIN region r ON r.r_regionkey = n.n_regionkey "
    "  WHERE r.r_name = 'ASIA' GROUP BY l.l_partkey) "
    "SELECT l_partkey, part_value FROM ("
    "  SELECT l_partkey, part_value, "
    "  round(sum(part_value) OVER (), 2) AS total_value, "
    "  count(*) OVER () AS n_parts FROM val) t "
    "WHERE part_value > 2.0 * total_value / n_parts"
)


@_q("important_parts_share", _IMPORTANT_PARTS_SQL)
def important_parts_share(spark, sf_dir):
    """TPC-H Q11-shaped important stock: per-part value restricted to
    one region's suppliers, keeping parts above 2x the MEAN part
    value (the scale-free rendering of Q11's fraction-of-total
    gate: a fixed fraction empties as |part| grows). The grand total is an empty-frame window sum over
    the aggregated |part|-bounded grid (single-partition over ~2k
    rows — fine; a fact-table self-join to recompute the total would
    not be). Both the per-part values and the total are rounded to 2
    before the fraction compare, so the gate is identical doubles on
    both engines."""
    from pyspark.sql.window import Window as W

    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                n.join(
                    F.broadcast(r), n.n_regionkey == r.r_regionkey
                ).select("n_nationkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    val = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_quantity")), 2
            ).alias("part_value")
        )
    )
    w = W.partitionBy()
    return (
        val.withColumn("total_value", F.round(F.sum("part_value").over(w), 2))
        .withColumn("n_parts", F.count(F.lit(1)).over(w))
        .filter(
            F.col("part_value")
            > 2.0 * F.col("total_value") / F.col("n_parts")
        )
        .select("l_partkey", "part_value")
    )


# ---------------------------------------------------------------------------
# Q2 shape: per-group argmax over a derived relation
# ---------------------------------------------------------------------------

_BEST_SUPPLIER_SQL = (
    "WITH ps AS (SELECT DISTINCT l.l_partkey, l.l_suppkey "
    "  FROM lineitem l), "
    "eu AS (SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name "
    "  FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey "
    "  JOIN region r ON r.r_regionkey = n.n_regionkey "
    "  WHERE r.r_name = 'EUROPE'), "
    "j AS (SELECT p.p_partkey, eu.s_suppkey, eu.s_name, "
    "    round(eu.s_acctbal, 2) AS s_acctbal, eu.n_name, "
    "    max(round(eu.s_acctbal, 2)) OVER (PARTITION BY p.p_partkey) "
    "      AS max_bal "
    "  FROM part p "
    "  JOIN ps ON ps.l_partkey = p.p_partkey "
    "  JOIN eu ON eu.s_suppkey = ps.l_suppkey "
    "  WHERE p.p_size = 15 AND p.p_type = 'STANDARD') "
    "SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name "
    "FROM j WHERE s_acctbal = max_bal"
)


@_q("best_supplier_per_part", _BEST_SUPPLIER_SQL)
def best_supplier_per_part(spark, sf_dir):
    """TPC-H Q2-shaped minimum-cost supplier (argmax on account
    balance — the schema carries no partsupp cost): for each
    size/type-filtered part, the EUROPE supplier(s) with the highest
    balance among those that actually ship it. The part-supplier
    relation is derived by DISTINCT over the fact's (partkey,
    suppkey) — one 16-byte-key shuffle — and the correlated max
    becomes a per-part window over the joined (part × its few
    suppliers) relation, never a re-scan. Balances are rounded to 2
    before the max/equality so ties resolve identically on both
    engines."""
    from pyspark.sql.window import Window as W

    ps = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
                    "n_nationkey", "n_name"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "s_suppkey", "s_name",
            F.round("s_acctbal", 2).alias("s_acctbal"), "n_name",
        )
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey")
    )
    j = (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .join(F.broadcast(eu), ps.l_suppkey == eu.s_suppkey)
    )
    w = W.partitionBy("p_partkey")
    return (
        j.withColumn("max_bal", F.max("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("max_bal"))
        .select("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
    )


# ---------------------------------------------------------------------------
# Q21 shape: sole-blame supplier (multi-leg order forensics)
# ---------------------------------------------------------------------------

_BLAME_SQL = (
    "WITH per_pair AS (SELECT l_orderkey, l_suppkey, "
    "  max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r "
    "  FROM lineitem GROUP BY l_orderkey, l_suppkey), "
    "per_order AS (SELECT l_orderkey, "
    "  CAST(count(*) AS BIGINT) AS n_supp, "
    "  CAST(sum(has_r) AS BIGINT) AS n_r_supp "
    "  FROM per_pair GROUP BY l_orderkey) "
    "SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait "
    "FROM per_pair p "
    "JOIN per_order po ON po.l_orderkey = p.l_orderkey "
    "JOIN supplier s ON s.s_suppkey = p.l_suppkey "
    "WHERE p.has_r = 1 AND po.n_supp >= 2 AND po.n_r_supp = 1 "
    "GROUP BY s.s_name"
)


@_q("blame_single_return_supplier", _BLAME_SQL)
def blame_single_return_supplier(spark, sf_dir):
    """TPC-H Q21-shaped suppliers-who-kept-orders-waiting (returnflag
    proxies the late-delivery predicate — the schema carries no
    receipt/commit dates): in orders served by ≥2 suppliers, count
    per supplier the orders where it is the ONLY supplier with a
    returned line. The EXISTS/NOT-EXISTS pair of the classic query is
    expressed as a (orderkey, suppkey) rollup (the dedup) feeding an
    orderkey rollup that reuses its exchange — never an Expand-based
    double countDistinct, never a correlated-subquery probe join, and
    the pair relation is already unique so no post-join distinct.
    Output bounded by |supplier|."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    # two-level aggregation instead of the EXPAND-based double
    # countDistinct: the (orderkey, suppkey) rollup is the dedup — at
    # sf0.1 this cut the query from 20.3s to ~4s warm (no Expand,
    # no post-join distinct). The order-level counts then come from a
    # WINDOW over the pair relation (r11, guide §2.4): the previous
    # per-order rollup + semi-join consumed per_pair TWICE, so the
    # lineitem scan + pair aggregation re-executed per consumer (2
    # parquet scans of lineitem in the before plan, 1 after); the
    # window needs one orderkey exchange and its partitions are
    # bounded by suppliers-per-order. Isolated A/B at sf0.1: median
    # 2.14 -> 1.85 s, floor 1.93 -> 1.80 s.
    from pyspark.sql.window import Window as W

    per_pair = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("has_r")
    )
    wo = W.partitionBy("l_orderkey")
    blamed = (
        per_pair.withColumn("n_supp", F.count(F.lit(1)).over(wo))
        .withColumn("n_r_supp", F.sum("has_r").over(wo))
        .filter(
            (F.col("has_r") == 1)
            & (F.col("n_supp") >= 2)
            & (F.col("n_r_supp") == 1)
        )
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        blamed.join(F.broadcast(s), blamed.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
    )


# ---------------------------------------------------------------------------
# relational-surface shapes: UNPIVOT (melt) and INTERSECT/EXCEPT audits
# ---------------------------------------------------------------------------

_UNPIVOT_SQL = (
    "SELECT measure, CAST(count(*) AS BIGINT) AS n, "
    "round(sum(val), 2) AS total, "
    "round(round(sum(val), 2) / count(*), 6) AS mean_val "
    "FROM ("
    "  SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem "
    "  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem "
    "  UNION ALL SELECT 'l_discount', l_discount FROM lineitem "
    "  UNION ALL SELECT 'l_tax', l_tax FROM lineitem) u "
    "GROUP BY measure"
)


@_q("unpivot_measures", _UNPIVOT_SQL)
def unpivot_measures(spark, sf_dir):
    """UNPIVOT (melt): wide measure columns to long (measure, value)
    rows, then a per-measure profile — the inverse of `pivot_report`
    and the shape every metrics-collection pipeline runs. Spark's
    native unpivot is an Expand node: ONE scan emits all four
    measure rows (the SQL twin's UNION ALL re-states it as four
    logical scans; DuckDB reads the parquet once per branch, Spark
    literally once). Output bounded by |measures|."""
    li = _t(spark, sf_dir, "lineitem")
    long = li.unpivot(
        [],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "val",
    )
    return long.groupBy("measure").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.sum("val"), 2).alias("total"),
        F.round(F.round(F.sum("val"), 2) / F.count(F.lit(1)), 6).alias(
            "mean_val"
        ),
    )


_SETOPS_SQL = (
    "WITH y96 AS (SELECT DISTINCT o_custkey FROM orders "
    "  WHERE o_orderdate >= TIMESTAMP '1996-01-01' "
    "  AND o_orderdate < TIMESTAMP '1997-01-01'), "
    "y97 AS (SELECT DISTINCT o_custkey FROM orders "
    "  WHERE o_orderdate >= TIMESTAMP '1997-01-01' "
    "  AND o_orderdate < TIMESTAMP '1998-01-01') "
    "SELECT 'retained' AS cohort, CAST(count(*) AS BIGINT) AS n_customers "
    "FROM (SELECT o_custkey FROM y96 INTERSECT SELECT o_custkey FROM y97) a "
    "UNION ALL "
    "SELECT 'churned', CAST(count(*) AS BIGINT) "
    "FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y97) b"
)


@_q("customer_setops_audit", _SETOPS_SQL)
def customer_setops_audit(spark, sf_dir):
    """INTERSECT / EXCEPT as retention audit: customers active in
    both years vs only the first. Spark compiles both set ops to
    LeftSemi/LeftAnti joins over distinct key sets — key-column-only
    shuffles; at 100 TB the two year extents come from partition
    pruning on the date. The 2-row output is the sanity panel a
    pipeline asserts on after a backfill."""
    o = _t(spark, sf_dir, "orders")

    def year_keys(lo, hi):
        return (
            o.filter(
                (F.col("o_orderdate") >= _ts(o, "o_orderdate", lo))
                & (F.col("o_orderdate") < _ts(o, "o_orderdate", hi))
            )
            .select("o_custkey")
            .distinct()
        )

    y96 = year_keys("1996-01-01", "1997-01-01")
    y97 = year_keys("1997-01-01", "1998-01-01")
    retained = y96.intersect(y97).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers")
    ).select(F.lit("retained").alias("cohort"), "n_customers")
    churned = y96.subtract(y97).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers")
    ).select(F.lit("churned").alias("cohort"), "n_customers")
    return retained.unionByName(churned)


# ---------------------------------------------------------------------------
# Q12 shape: fact-fact join + conditional (CASE) aggregation matrix
# ---------------------------------------------------------------------------

_PRIORITY_MATRIX_SQL = (
    "SELECT l_returnflag, "
    "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
    "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
    "CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') "
    "THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count "
    "FROM orders JOIN lineitem ON l_orderkey = o_orderkey "
    "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
    "AND l_shipdate < TIMESTAMP '1997-01-01' "
    "GROUP BY l_returnflag"
)


@_q("priority_lines_matrix", _PRIORITY_MATRIX_SQL)
def priority_lines_matrix(spark, sf_dir):
    """TPC-H Q12-shaped shipping-priority matrix (shipmode -> the
    schema's l_returnflag): one fact-fact equi-join with the date
    filter PUSHED to the lineitem scan (the join's probe side
    shrinks before shuffling), then conditional CASE aggregation —
    two mutually exclusive counts in ONE pass, not two filtered
    scans. Both counts are integers: exact hash gate."""
    li = _t(spark, sf_dir, "lineitem")
    li = li.filter(
        (F.col("l_shipdate") >= _ts(li, "l_shipdate", "1996-01-01"))
        & (F.col("l_shipdate") < _ts(li, "l_shipdate", "1997-01-01"))
    ).select("l_orderkey", "l_returnflag")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(hi, 0).otherwise(1)).cast("bigint").alias(
                "low_line_count"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Q16 shape: NOT-IN exclusion subquery + count(DISTINCT) per class
# ---------------------------------------------------------------------------

_SUPPLIER_CNT_SQL = (
    "SELECT p_brand, p_size, "
    "CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt "
    "FROM part JOIN lineitem ON l_partkey = p_partkey "
    "WHERE p_brand <> 'Brand#1' AND p_size IN (1, 7, 14, 23, 36, 45) "
    "AND l_suppkey NOT IN "
    "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0) "
    "GROUP BY p_brand, p_size"
)


@_q("supplier_count_by_class", _SUPPLIER_CNT_SQL)
def supplier_count_by_class(spark, sf_dir):
    """TPC-H Q16-shaped supplier-relationship count (partsupp -> the
    (l_partkey, l_suppkey) pairs lineitem materializes): how many
    distinct suppliers serve each surviving part class, EXCLUDING
    blacklisted suppliers. The NOT IN becomes a LEFT ANTI join on
    suppkey (the exclusion side projects only the key — safe here
    because s_suppkey is non-NULL; a nullable NOT IN column is the
    classic three-valued-logic trap the docstring exists to flag);
    part filters push to the dimension scan, which then broadcasts.
    count(DISTINCT) dedups inside the aggregate — integers, exact
    gate."""
    p = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & F.col("p_size").isin(1, 7, 14, 23, 36, 45)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(bad, "l_suppkey", "left_anti")
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(
            F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt")
        )
    )


# ---------------------------------------------------------------------------
# Q20 shape: nested IN subqueries with a correlated share threshold
# ---------------------------------------------------------------------------

_EXCESS_SHARE_SQL = (
    "SELECT s.s_suppkey, s.s_name, round(s.s_acctbal, 2) AS s_acctbal "
    "FROM supplier s WHERE s.s_suppkey IN ("
    "SELECT sp.l_suppkey FROM "
    "(SELECT l_suppkey, l_partkey, sum(l_quantity) AS sq FROM lineitem "
    " WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
    " AND l_shipdate < TIMESTAMP '1997-01-01' "
    " GROUP BY l_suppkey, l_partkey) sp "
    "JOIN "
    "(SELECT l_partkey, sum(l_quantity) AS tq FROM lineitem "
    " WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
    " AND l_shipdate < TIMESTAMP '1997-01-01' "
    " GROUP BY l_partkey) pt "
    "ON sp.l_partkey = pt.l_partkey "
    "WHERE sp.sq > 0.9 * pt.tq)"
)


@_q("dominant_share_suppliers", _EXCESS_SHARE_SQL)
def dominant_share_suppliers(spark, sf_dir):
    """TPC-H Q20-shaped nested-subquery supplier selection (availqty
    -> shipped-quantity share): suppliers who shipped > 90% of some
    part's total 1996 volume. The correlated half-sum threshold
    renders as two aggregations over the SAME filtered scan joined on
    partkey — the per-(supp, part) agg rolls up to the per-part agg,
    so Spark reuses the shuffle (same key prefix); the outer IN is a
    LEFT SEMI join on suppkey. Quantities are integral doubles, so
    sums are exact and `sq > 0.9*tq` is the same single IEEE multiply
    on both engines — no rounding ambiguity at the boundary."""
    li = _t(spark, sf_dir, "lineitem")
    li = li.filter(
        (F.col("l_shipdate") >= _ts(li, "l_shipdate", "1996-01-01"))
        & (F.col("l_shipdate") < _ts(li, "l_shipdate", "1997-01-01"))
    ).select("l_suppkey", "l_partkey", "l_quantity")
    sp = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum("l_quantity").alias("sq")
    )
    pt = li.groupBy("l_partkey").agg(F.sum("l_quantity").alias("tq"))
    dominant = (
        sp.join(pt, "l_partkey")
        .filter(F.col("sq") > 0.9 * F.col("tq"))
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    s = _t(spark, sf_dir, "supplier")
    return s.join(dominant, "s_suppkey", "left_semi").select(
        "s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal")
    )


def decision_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.spark for q in _REGISTRY}


def decision_oracles() -> dict[str, str]:
    return {q.name: q.sql for q in _REGISTRY if q.sql is not None}
