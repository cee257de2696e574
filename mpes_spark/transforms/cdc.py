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
