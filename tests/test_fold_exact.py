"""The oracle contract of the vectorized similarity kernels: numpy
batch results must be BIT-identical to the sequential Column/SQL fold
(`aggregate(zip_with(a, b, *), 0.0, +)`), not merely close — a 1-ulp
summation difference can flip a hyperplane sign or a threshold
comparison and desync the DuckDB gate."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mpes_spark.extras.similarity import (
    _seq_dots_np,
    bucket_expr,
    hyperplanes,
    signature_udf,
    as_double_array,
)
from tests.conftest import SF_SMALL


def _python_fold_dot(a, b) -> float:
    """The reference semantics: strict left fold, acc starts at 0.0."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + (x * y)
    return acc


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=128,
    ),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_seq_dots_bitwise_equals_python_fold(vals, seed):
    rng = np.random.default_rng(seed)
    v = np.asarray(vals, dtype=np.float64)
    planes = rng.standard_normal((3, len(v)))
    got = _seq_dots_np(v[None, :], planes)[0]
    want = np.asarray([_python_fold_dot(v, p) for p in planes])
    # bitwise equality, not approx: repr-level identity both engines see
    assert all(
        x == y or (np.isnan(x) and np.isnan(y)) for x, y in zip(got, want)
    ), (got - want)


def test_signature_udf_equals_column_fold(spark):
    """The Arrow signature UDF and the literal Column fold
    (`bucket_expr`) must produce identical buckets for every corpus
    vector — the end-to-end form of the fold-exactness contract."""
    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    planes = hyperplanes(dim=64, nplanes=8, seed=7)
    sig = signature_udf(planes, 1)
    both = e.select(
        "vec_id",
        sig(F.col("embedding")).getItem(0).alias("udf_bucket"),
        bucket_expr(as_double_array("embedding"), planes).alias("col_bucket"),
    )
    bad = both.filter(F.col("udf_bucket") != F.col("col_bucket")).count()
    assert bad == 0
