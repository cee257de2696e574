"""Unit tests for the export-side curation operators: boilerplate
segment detection, deterministic shuffle-shard, and length-bucketed
batch packing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mpes_spark.extras.curation import (
    boilerplate_stats,
    length_bucket_batches,
    shuffle_shard,
    token_window_segments_expr,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


def test_token_window_segments_covers_all_tokens(spark):
    df = spark.createDataFrame([(1, "a b c d e f g h i j")], ["id", "text"])
    segs = df.select(
        F.explode(token_window_segments_expr(4)).alias("seg")
    ).collect()
    assert [r.seg for r in segs] == ["a b c d", "e f g h", "i j"]


def test_boilerplate_detects_shared_segment(spark):
    # the same 8-token prefix in 3 docs of src A -> boilerplate there;
    # the same text in a doc of src B is NOT (only 1 doc in B)
    boiler = "the quick brown fox jumps over the dog"
    rows = [
        (1, "A", boiler + " unique one two three four five six seven"),
        (2, "A", boiler + " other eight nine ten eleven twelve thirteen x"),
        (3, "A", boiler + " more fourteen fifteen sixteen seventeen y z w"),
        (4, "B", boiler + " borrowed eighteen nineteen twenty one two four"),
    ]
    out = boilerplate_stats(_docs(spark, rows)).collect()
    by_id = {r.doc_id: r for r in out}
    for d in (1, 2, 3):
        assert by_id[d].n_boiler == 1, by_id[d]
        assert by_id[d].n_segments == 2
        assert by_id[d].boiler_frac == 0.5
    assert by_id[4].n_boiler == 0


def test_boilerplate_min_docs_threshold(spark):
    boiler = "one two three four five six seven eight"
    rows = [
        (1, "A", boiler + " a b c d e f g h"),
        (2, "A", boiler + " i j k l m n o p"),
    ]
    out = boilerplate_stats(_docs(spark, rows), min_docs=2).collect()
    assert all(r.n_boiler == 1 for r in out)
    out3 = boilerplate_stats(_docs(spark, rows), min_docs=3).collect()
    assert all(r.n_boiler == 0 for r in out3)


def test_shuffle_shard_deterministic_and_dense(spark):
    df = spark.range(200).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: (r.shard, r.pos) for r in shuffle_shard(df, 8).collect()}
    b = {r.doc_id: (r.shard, r.pos) for r in shuffle_shard(df, 8).collect()}
    assert a == b  # pure function of (seed, id)
    # every shard's positions are dense 0..n-1
    by_shard = {}
    for shard, pos in a.values():
        by_shard.setdefault(shard, []).append(pos)
    assert set(by_shard) <= set(range(8))
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps))), shard
    # no shard is empty or wildly imbalanced at n=200, k=8
    sizes = sorted(len(v) for v in by_shard.values())
    assert len(by_shard) == 8 and sizes[0] >= 5


def test_shuffle_shard_seed_changes_order(spark):
    df = spark.range(100).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: (r.shard, r.pos) for r in shuffle_shard(df, 4, seed=1).collect()}
    b = {r.doc_id: (r.shard, r.pos) for r in shuffle_shard(df, 4, seed=2).collect()}
    assert a != b


def test_length_bucket_batches_waste_bounds(spark):
    rows = [(i, "S", " ".join(["w"] * (5 + (i * 7) % 120))) for i in range(80)]
    out = length_bucket_batches(_docs(spark, rows), batch_size=8).collect()
    assert sum(r.n_docs for r in out) == 80
    for r in out:
        assert 0.0 <= r.pad_waste < 1.0
        assert r.max_tok * r.n_docs >= r.sum_tok
        assert r.n_docs <= 8
    # docs never exceed their bucket boundary (except the overflow top)
    for r in out:
        if r.bucket < 512:
            assert r.max_tok <= r.bucket


def test_length_bucket_batch_ids_dense(spark):
    rows = [(i, "S", " ".join(["w"] * 10)) for i in range(40)]
    out = length_bucket_batches(_docs(spark, rows), batch_size=16).collect()
    ids = sorted(r.batch_id for r in out)
    assert ids == [0, 1, 2]  # 40 docs / 16 = 3 batches in one bucket
    assert [r.n_docs for r in sorted(out, key=lambda r: r.batch_id)] == [16, 16, 8]
