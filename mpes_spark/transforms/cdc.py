"""Row-level change-data-feed derivation and application.

``snapshot_diff`` (registry) audits two snapshots at the aggregate
level; these operators produce and consume the RECORD-level feed — the
(op, key, before, after) relation a downstream consumer (cache
invalidation, search-index sync, replication) actually applies.

Scale shape: the diff is one full-outer equi-join on the key (the
only shuffle; at 100 TB both sides arrive bucketed on the key and the
join is co-located); unchanged rows are filtered before the feed ever
materializes, so the output is delta-sized, not table-sized. Applying
a feed is one left-anti (deletes + updates' old rows) + one union —
again key-only shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff_feed(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare: list[str],
) -> DataFrame:
    """Derive the change feed turning ``old`` into ``new``: one row
    per changed key with ``op`` in (insert, delete, update), the
    ``compare`` columns' before/after values (NULL on the absent
    side), and nothing for unchanged keys. NULL-safe equality (``<=>``)
    on every compared column, so NULL -> value and value -> NULL both
    register as updates."""
    o = old.select(
        F.col(key).alias("__ok"),
        *[F.col(c).alias(f"old_{c}") for c in compare],
    )
    n = new.select(
        F.col(key).alias("__nk"),
        *[F.col(c).alias(f"new_{c}") for c in compare],
    )
    j = o.join(n, o["__ok"] == n["__nk"], "full_outer")
    unchanged = F.lit(True)
    for c in compare:
        unchanged = unchanged & F.col(f"old_{c}").eqNullSafe(
            F.col(f"new_{c}")
        )
    op = (
        F.when(F.col("__ok").isNull(), "insert")
        .when(F.col("__nk").isNull(), "delete")
        .otherwise("update")
    )
    both = F.col("__ok").isNotNull() & F.col("__nk").isNotNull()
    return (
        j.filter(~(both & unchanged))
        .select(
            F.coalesce("__ok", "__nk").alias(key),
            op.alias("op"),
            *[F.col(f"old_{c}") for c in compare],
            *[F.col(f"new_{c}") for c in compare],
        )
    )


def apply_diff_feed(
    old: DataFrame,
    feed: DataFrame,
    key: str,
    compare: list[str],
) -> DataFrame:
    """Apply a :func:`table_diff_feed` to the old snapshot and return
    the new one — the round-trip that proves the feed is lossless.
    Deletes and updates remove their old row (one LEFT ANTI join on
    the key); inserts and updates contribute their new row (a
    delta-sized union). Columns come back in ``[key, *compare]``
    order."""
    touched = feed.select(F.col(key)).distinct()
    kept = old.select(key, *compare).join(touched, key, "left_anti")
    added = (
        feed.filter(F.col("op") != "delete")
        .select(key, *[F.col(f"new_{c}").alias(c) for c in compare])
    )
    return kept.unionByName(added)


def join_delta(
    l_old: DataFrame,
    l_delta: DataFrame,
    r_old: DataFrame,
    r_delta: DataFrame,
    on: str | list[str],
) -> DataFrame:
    """Incremental maintenance of an inner equi-join under inserts:
    the delta of ``(L_old ∪ ΔL) ⋈ (R_old ∪ ΔR)`` over ``L_old ⋈
    R_old`` is exactly ``ΔL ⋈ R_old  ∪  L_old ⋈ ΔR  ∪  ΔL ⋈ ΔR``
    (the textbook delta rule for joins — Blakeley et al. SIGMOD
    1986; the join half of the IVM story whose aggregation half is
    ``rollup_incremental``). The materialized join view advances by
    appending these rows; the full join is never recomputed.

    Scale shape: every term is an equi-join on the view key. The two
    mixed terms shuffle the *delta* side only when the base side is
    already bucketed on the key (at 100 TB the base relations are
    stored bucketed precisely so maintenance stays delta-sized), and
    small deltas broadcast outright; ΔL ⋈ ΔR is delta × delta.
    Work scales with the increment, not the table.
    """
    keys = [on] if isinstance(on, str) else list(on)
    return (
        l_delta.join(r_old, keys)
        .unionByName(l_old.join(r_delta, keys))
        .unionByName(l_delta.join(r_delta, keys))
    )


def feed_to_signed_delta(
    feed: DataFrame,
    key: str,
    compare: list[str],
    m: str = "m",
) -> DataFrame:
    """Turn a :func:`table_diff_feed` (insert/delete/update rows) into
    a SIGNED-multiplicity delta relation — the standard IVM
    generalization from insert-only deltas to arbitrary churn: a
    delete contributes its OLD row with multiplicity −1, an insert its
    NEW row with +1, and an update both (retract old, assert new).
    Summing multiplicities per row reconstructs the new snapshot from
    the old; feeding the relation to :func:`join_delta_signed`
    maintains a join view under the same churn."""
    minus = feed.filter(F.col("op").isin("delete", "update")).select(
        key,
        *[F.col(f"old_{c}").alias(c) for c in compare],
        F.lit(-1).cast("bigint").alias(m),
    )
    plus = feed.filter(F.col("op").isin("insert", "update")).select(
        key,
        *[F.col(f"new_{c}").alias(c) for c in compare],
        F.lit(1).cast("bigint").alias(m),
    )
    return minus.unionByName(plus)


def join_delta_signed(
    l_old: DataFrame,
    l_delta: DataFrame,
    r_old: DataFrame,
    r_delta: DataFrame,
    on: str | list[str],
    m: str = "m",
) -> DataFrame:
    """Incremental maintenance of an inner equi-join under MIXED churn
    (inserts, deletes, updates): deltas carry a signed multiplicity
    column ``m`` (:func:`feed_to_signed_delta`), base relations carry
    an implicit +1, and the delta of the join view is the same three
    terms as :func:`join_delta` with multiplicities MULTIPLIED per
    joined row — ``ΔL ⋈ R_old`` keeps ΔL's sign, ``L_old ⋈ ΔR`` keeps
    ΔR's, and ``ΔL ⋈ ΔR`` multiplies both (a retracted-left joined
    with a retracted-right is net +1: the row was counted out twice
    by the mixed terms). Summing ``m`` per joined row advances the
    view; net-zero rows cancel. Same scale shape as
    :func:`join_delta`: every term is delta-sized against a bucketed
    base — work scales with the churn, never the table."""
    keys = [on] if isinstance(on, str) else list(on)
    ml, mr = f"__{m}_l", f"__{m}_r"
    ld = l_delta.withColumnRenamed(m, ml)
    rd = r_delta.withColumnRenamed(m, mr)
    t1 = ld.join(r_old, keys).withColumn(m, F.col(ml)).drop(ml)
    t2 = l_old.join(rd, keys).withColumn(m, F.col(mr)).drop(mr)
    t3 = (
        ld.join(rd, keys)
        .withColumn(m, F.col(ml) * F.col(mr))
        .drop(ml, mr)
    )
    return t1.unionByName(t2).unionByName(t3)
