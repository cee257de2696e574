"""Structured Streaming live binning (SURVEY §2.8 — new surface; the
reference is batch-only but its data IS an event stream with
reconstructed event time).

Operators:
- ``live_binning``: event-time tumbling-window N-D histogram — the
  streaming twin of :func:`mpes_spark.binning.engine.bin_sparse`;
  watermarking bounds state and admits late events up to the horizon.
- ``live_count_rate``: windowed event counts (``getCountRate`` live).
- ``densify_sink``: a ``foreachBatch`` callback scattering each
  micro-batch's sparse histogram into a dense
  :class:`~mpes_spark.grid.binned.BinnedArray` on the driver.

Scale notes: state per trigger is bounded by (windows in watermark
horizon) x (occupied grid cells), never by event rate; the shuffle key
is (window, bin...) so partial aggregation happens map-side within
each micro-batch exactly as in the batch engine.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mpes_spark.binning.spec import BinAxis
from mpes_spark.grid.binned import BinnedArray


def with_event_time(
    df: DataFrame, ts: str = "ts", out: str = "event_time"
) -> DataFrame:
    """Normalize the event-time column to TIMESTAMP: the engine's
    parquet readers surface TIMESTAMP(NANOS) as epoch-nanos longs
    (see session.py), which F.window cannot consume directly."""
    dt = dict(df.dtypes).get(ts)
    if dt in ("bigint", "int"):
        # integer div, not double: epoch-nanos exceed 2^53
        return df.withColumn(out, F.timestamp_micros(F.expr(f"{ts} div 1000")))
    if dt == "timestamp_ntz":
        # tz-independent: an ntz -> ltz CAST would shift the epoch
        # under any non-UTC session timezone
        micros = F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `{ts}`)"
        )
        return df.withColumn(out, F.timestamp_micros(micros))
    return df.withColumn(out, F.col(ts).cast("timestamp"))


def live_binning(
    stream: DataFrame,
    axes: Sequence[BinAxis],
    ts: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
    count_name: str = "cnt",
) -> DataFrame:
    """Windowed N-D histogram over an event stream: one sparse
    (win_start, bin..., cnt) row per occupied cell per window."""
    ev = with_event_time(stream, ts).withWatermark("event_time", watermark)
    cols = [ax.index_expr().alias(ax.out) for ax in axes]
    keyed = ev.select(F.col("event_time"), *cols)
    for ax in axes:
        keyed = keyed.filter(ax.in_range_expr(F.col(ax.out)))
    return (
        keyed.groupBy(
            F.window("event_time", window).alias("w"), *[F.col(ax.out) for ax in axes]
        )
        .agg(F.count(F.lit(1)).alias(count_name))
        .select(F.col("w.start").alias("win_start"), *[ax.out for ax in axes], count_name)
    )


def live_count_rate(
    stream: DataFrame,
    ts: str = "ts",
    window: str = "1 second",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Events/window trace — streaming ``getCountRate``
    (/root/reference/mpes/fprocessing.py:1086-1108)."""
    ev = with_event_time(stream, ts).withWatermark("event_time", watermark)
    return (
        ev.groupBy(F.window("event_time", window).alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("win_start"), "cnt")
    )


def scan_sessions(
    stream: DataFrame,
    ts: str = "ts",
    gap: str = "5 minutes",
    watermark: str = "10 minutes",
    group_col: str | None = None,
) -> DataFrame:
    """Scan segmentation via session windows (SURVEY §2.8): events
    separated by more than ``gap`` of event-time silence belong to
    different scans. Emits (session_start, session_end, n_events
    [, group]) per closed session — the acquisition-run detector the
    reference reconstructs manually from timestamps. Works on batch
    DataFrames too (session_window is a grouping expression).

    Streaming constraint (Spark): session windows need a non-empty
    grouping key — pass ``group_col`` (e.g. a detector/run id) for
    streaming input; batch input may omit it."""
    ev = with_event_time(stream, ts)
    if stream.isStreaming:
        ev = ev.withWatermark("event_time", watermark)
    keys = [F.session_window("event_time", gap).alias("w")]
    if group_col:
        keys.append(F.col(group_col))
    out = ev.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_events"))
    sel = [
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n_events",
    ]
    if group_col:
        sel.insert(2, F.col(group_col))
    return out.select(*sel)


def dedup_stream(
    stream: DataFrame,
    key: str | None = None,
    text: str = "text",
    ts: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Streaming exact dedup (dedup-on-ingest): keep the first arrival
    of each content fingerprint, drop every later copy — the streaming
    twin of ``extras/dedup.exact_dedup`` for a live crawl feed.

    State semantics: with no watermark the dedup is global and state
    grows with distinct-key cardinality (16-byte digests — ~16 GB per
    10⁹ distinct docs across the cluster, checkpointed; acceptable for
    bounded backfills). For an unbounded feed pass ``ts`` +
    ``watermark`` to use ``dropDuplicatesWithinWatermark`` — state is
    then bounded by the watermark horizon, trading global dedup for
    dedup-within-horizon (the standard ingest compromise; a periodic
    batch ``exact_dedup`` compaction restores the global invariant).

    ``key`` overrides the dedup key column; by default the md5
    fingerprint of normalized ``text`` is computed in-stream."""
    from mpes_spark.extras.text import fingerprint_expr

    if key is None:
        stream = stream.withColumn("fingerprint", fingerprint_expr(text))
        key = "fingerprint"
    if watermark is not None:
        if ts is None:
            raise ValueError("watermark requires a ts column")
        ev = with_event_time(stream, ts).withWatermark("event_time", watermark)
        return ev.dropDuplicatesWithinWatermark([key])
    return stream.dropDuplicates([key])


def ingest_dedup_stream(
    stream: DataFrame,
    corpus: DataFrame,
    text: str = "text",
) -> DataFrame:
    """Incremental-crawl ingest dedup: drop streamed docs whose
    content fingerprint already exists in the STATIC corpus (the data
    lake being appended to), then dedup within the stream itself —
    the two-level check every incremental crawl append needs
    (:func:`dedup_stream` alone only sees the stream's own keys).

    The corpus side is an anti-join against a fingerprint projection
    (16 bytes/row); Spark re-plans the stream-static join each
    micro-batch, so a corpus snapshot refreshed between batches (the
    just-appended files) is picked up without restarting the query.
    At 10⁹ corpus docs the fingerprint relation is the thing to keep
    compacted/bucketed; the stream side is micro-batch-sized."""
    from mpes_spark.extras.text import fingerprint_expr

    seen = corpus.select(fingerprint_expr(text).alias("fingerprint")).distinct()
    return (
        stream.withColumn("fingerprint", fingerprint_expr(text))
        .join(seen, "fingerprint", "left_anti")
        .dropDuplicates(["fingerprint"])
    )


def interval_attribution_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
    suffix: str = "_r",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: pair each left event with every right
    event of the same key whose event time falls within
    ``[left_time, left_time + horizon]`` — the click-to-purchase
    attribution shape, and the streaming twin of
    :func:`mpes_spark.transforms.joins.range_join_binned` with
    event-derived intervals.

    Both sides are watermarked and the join condition carries the
    explicit time range, which is what lets Structured Streaming bound
    the join state: buffered rows older than (watermark + horizon) are
    evicted instead of accumulating forever — a stream-stream join
    without the time bound is an unbounded-state plan Spark rejects in
    append mode. State per key is O(events within the horizon), not
    O(stream length).

    With ``how="leftOuter"`` unmatched left events are ALSO emitted
    (NULL right columns) — but only once the watermark passes their
    match window's expiry, i.e. a click's "no purchase followed" row
    appears (horizon + watermark) after the click, when no matching
    right event can still arrive. That deferral is the semantic price
    of bounded state; the batch twin emits unmatched rows
    immediately because it sees the complete input.

    Works identically on batch DataFrames (the same plan minus state
    management), which is how the parity test pins its semantics.
    """
    lt, rt = "event_time", "event_time" + suffix
    # same guard as transforms.joins._ensure_disjoint: a left column
    # already named like a suffixed right column (or either derived
    # event-time name) would silently duplicate in the join output
    r_out = [on + suffix, rt] + [
        c + suffix for c in right.columns if c not in (on, right_ts)
    ]
    clash = (set(left.columns) | {lt}) & set(r_out)
    if len(set(r_out)) != len(r_out):
        dup = sorted({c for c in r_out if r_out.count(c) > 1})
        raise ValueError(
            f"suffixed right columns collide among themselves: {dup}; "
            "rename before joining"
        )
    if clash:
        raise ValueError(
            f"right-side columns {sorted(clash)} collide with left "
            f"columns (or derived event-time names); rename before joining"
        )
    if lt in left.columns and lt != left_ts:
        raise ValueError(
            f"left column {lt!r} would be overwritten by the derived "
            "event-time column; rename it before joining"
        )
    l_ = with_event_time(left, left_ts, out=lt).withWatermark(lt, watermark)
    r_ = with_event_time(right, right_ts, out=rt).withWatermark(rt, watermark)
    r_ = r_.select(
        F.col(on).alias(on + suffix),
        F.col(rt),
        *[
            F.col(c).alias(c + suffix)
            for c in right.columns
            if c not in (on, right_ts)
        ],
    )
    cond = (
        (F.col(on) == F.col(on + suffix))
        & (F.col(rt) >= F.col(lt))
        & (F.col(rt) <= F.col(lt) + F.expr(f"INTERVAL {horizon}"))
    )
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"unsupported join type {how!r}")
    return l_.join(r_, cond, how)


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static join: enrich a live event stream with a slowly
    changing dimension table (calibration constants, channel maps,
    user/domain metadata). The static side is broadcast — Spark
    re-plans the join each micro-batch, so a refreshed dim table (a
    re-read Delta/parquet snapshot) is picked up without restarting
    the query. No state, no watermark interaction: each micro-batch
    joins independently."""
    return stream.join(F.broadcast(dim), on, how)


def densify_sink(
    axes: Sequence[BinAxis],
    on_update: Callable[[object, BinnedArray], None],
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` callback that densifies micro-batch
    updates and hands (win_start, BinnedArray) pairs to ``on_update``
    — the live-display hook. Use with update output mode.

    Update mode emits only the *changed* (window, bin) rows per
    micro-batch, so the callback keeps a per-window dense accumulator
    (driver-side, bounded by windows x grid) and merges each batch
    into it — the array handed to ``on_update`` is always the full
    current grid for that window, never a partial one."""
    import numpy as np

    shape = tuple(ax.nbins for ax in axes)
    grids: dict = {}

    def handle(batch: DataFrame, _batch_id: int) -> None:
        pdf = batch.toPandas()
        if pdf.empty:
            return
        for win, grp in pdf.groupby("win_start"):
            data = grids.setdefault(win, np.zeros(shape))
            idx = tuple(grp[ax.out].to_numpy(dtype="int64") for ax in axes)
            data[idx] = grp["cnt"].to_numpy()
            on_update(
                win,
                BinnedArray(
                    data=data.copy(),
                    dims=[ax.out for ax in axes],
                    coords={ax.out: ax.centers() for ax in axes},
                    attrs={"units": "counts", "window": str(win)},
                ),
            )

    return handle


def read_event_stream(
    spark,
    path: str,
    schema: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source event stream (the live-acquisition analog: the DAQ
    drops one parquet per scan chunk; each trigger folds new files into
    the windowed aggregation)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def neardup_ingest_sink(
    corpus: DataFrame,
    *,
    text: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.7,
    compact_every: int | None = None,
    compact_path: str | None = None,
):
    """NEAR-duplicate ingest dedup — the LSH upgrade of
    :func:`ingest_dedup_stream` (which catches only exact content).
    A streamed doc is dropped iff it is a verified near-dup of
    anything previously SEEN: the static corpus, any doc from an
    earlier micro-batch, or a lower-id doc in the SAME batch. Each
    micro-batch is MinHash-bucketed, joined against the persisted
    seen-bucket table AND self-joined within the batch; bucket
    collisions are verified with exact Jaccard (cross-relation form,
    so id spaces never conflate), and every batch doc's shingles /
    buckets — kept or dropped — are folded into the seen relations
    afterwards. "Seen, not kept" is deliberate: it collapses a
    transitive near-dup chain to its earliest element (the
    connected-component canonical convention of
    :func:`mpes_spark.extras.dedup.dedup_canonical`), and it makes
    the kept set independent of micro-batch partitioning whenever
    arrival order is monotone in doc id — what the parity test pins.

    Returns ``(handle, novel, flagged)`` for
    ``writeStream.foreachBatch``: ``novel()`` is the accumulated
    DataFrame of kept docs, ``flagged()`` the (stream_id, matched_id,
    jaccard) audit relation — ``matched_id`` is a corpus doc id or an
    earlier stream doc id, whichever the collision verified against.

    Why foreachBatch rather than a streaming plan: the signature
    aggregation + bucket join + verify aggregation is two streaming
    aggregations deep — beyond what append-mode streaming plans allow
    — while per micro-batch it is ordinary bounded work. Scale shape:
    the corpus shingle/bucket relations are computed ONCE up front
    (at 10^9 docs these are the things to keep bucketed on disk);
    each batch's increment is materialized once behind an eager
    localCheckpoint and APPENDED to a parts list — the seen relation a
    join consumes is a lazy union of already-materialized parts, so
    per-batch work is the batch digests plus one scan of the seen
    parts, never a rewrite of the whole history (the rewrite-per-batch
    fold was O(N) blocks written per batch, O(N^2) cumulative).
    ``compact_every=K`` bounds the parts list: every K batches the
    seen relations are rewritten to ``compact_path`` as parquet
    (buckets repartitioned on the (band, bucket) join key,
    generation-numbered so the previous generation stays readable
    during the rewrite) and the parts collapse to the one on-disk
    relation — checkpoint blocks are executor-local and
    non-replicated, a compacted table is replayable from storage.
    With ``compact_path=None`` compaction collapses to a single fresh
    localCheckpoint, which still releases the dead per-batch blocks
    and keeps the union shallow. ``novel``/``flagged`` accumulate the
    same way and are compacted on the same cadence."""
    from functools import reduce

    from mpes_spark.extras.dedup import (
        lsh_buckets,
        minhash_signatures,
        shingle_table,
        verify_jaccard_cross,
    )

    corpus_sh = shingle_table(corpus, text, n, id_col).persist()
    corpus_bk = (
        lsh_buckets(minhash_signatures(corpus_sh, k, id_col), k, bands, id_col)
        .withColumnRenamed(id_col, "matched_id")
        .persist()
    )
    state: dict = {
        "novel": [],
        "flagged": [],
        "sh_parts": [corpus_sh],
        "bk_parts": [corpus_bk],
        "batches": 0,
        "generation": 0,
        "compactions": 0,
    }

    def _union(parts: list[DataFrame]) -> DataFrame:
        return reduce(lambda a, b: a.unionByName(b), parts)

    def _compact(spark) -> None:
        state["generation"] += 1
        state["compactions"] += 1
        gen = state["generation"]
        if compact_path is not None:
            rels = {
                "seen_sh": _union(state["sh_parts"]),
                "seen_bk": _union(state["bk_parts"]).repartition(
                    "band", "bucket"
                ),
                "novel": _union(state["novel"]) if state["novel"] else None,
                "flagged": (
                    _union(state["flagged"]) if state["flagged"] else None
                ),
            }
            compacted = {}
            for name, rel in rels.items():
                if rel is None:
                    continue
                path = f"{compact_path}/gen={gen}/{name}"
                rel.write.mode("overwrite").parquet(path)
                compacted[name] = spark.read.parquet(path)
            state["sh_parts"] = [compacted["seen_sh"]]
            state["bk_parts"] = [compacted["seen_bk"]]
            if "novel" in compacted:
                state["novel"] = [compacted["novel"]]
            if "flagged" in compacted:
                state["flagged"] = [compacted["flagged"]]
        else:
            state["sh_parts"] = [
                _union(state["sh_parts"]).localCheckpoint(eager=True)
            ]
            state["bk_parts"] = [
                _union(state["bk_parts"]).localCheckpoint(eager=True)
            ]
            if state["novel"]:
                state["novel"] = [
                    _union(state["novel"]).localCheckpoint(eager=True)
                ]
            if state["flagged"]:
                state["flagged"] = [
                    _union(state["flagged"]).localCheckpoint(eager=True)
                ]

    def handle(batch: DataFrame, _batch_id: int) -> None:
        seen_sh = _union(state["sh_parts"])
        seen_buckets = _union(state["bk_parts"])
        sh = shingle_table(batch, text, n, id_col).localCheckpoint(eager=True)
        bks = lsh_buckets(
            minhash_signatures(sh, k, id_col), k, bands, id_col
        ).localCheckpoint(eager=True)
        # candidates vs everything seen before this batch
        cand_seen = (
            bks.join(seen_buckets, ["band", "bucket"])
            .select(F.col(id_col).alias("id_a"), F.col("matched_id").alias("id_b"))
            .distinct()
        )
        # candidates within the batch: doc vs lower-id batch doc
        a, b = bks.alias("a"), bks.alias("b")
        cand_within = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col(f"a.{id_col}") > F.col(f"b.{id_col}")),
            )
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
            )
            .distinct()
        )
        verified = verify_jaccard_cross(
            cand_seen, sh, seen_sh, threshold, id_col
        ).unionByName(verify_jaccard_cross(cand_within, sh, sh, threshold, id_col))
        dup_ids = verified.select(F.col("id_a").alias(id_col)).distinct()
        novel = batch.join(dup_ids, id_col, "left_anti")
        flagged = verified.select(
            F.col("id_a").alias("stream_id"),
            F.col("id_b").alias("matched_id"),
            "jaccard",
        )
        # accumulate increments only — batch-sized materialization;
        # the seen union is assembled lazily from materialized parts
        state["novel"].append(novel.localCheckpoint(eager=True))
        state["flagged"].append(flagged.localCheckpoint(eager=True))
        # fold ALL batch docs (kept or dropped) into the seen relations
        state["sh_parts"].append(sh)
        state["bk_parts"].append(bks.withColumnRenamed(id_col, "matched_id"))
        state["batches"] += 1
        if compact_every and state["batches"] % compact_every == 0:
            _compact(batch.sparkSession)

    def novel() -> DataFrame | None:
        return _union(state["novel"]) if state["novel"] else None

    def flagged() -> DataFrame | None:
        return _union(state["flagged"]) if state["flagged"] else None

    handle.state = state  # introspection: batches/compactions/generation
    return handle, novel, flagged
