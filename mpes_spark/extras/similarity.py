"""Embedding similarity search: brute-force cosine top-k and
hyperplane-LSH bucketed ANN over an ``embeddings(vec_id, embedding
array<float>, label)`` relation.

Dot products are pure ``aggregate(zip_with(...))`` column math —
JVM-side, no UDF; elements are cast to double before the fold so the
DuckDB oracle (``list_dot_product`` over ``::DOUBLE[]``) performs the
same IEEE-754 accumulation, and cosines are rounded to 6 dp on both
engines to absorb any summation-order ulp drift.

Scale notes (100 TB / 1e9+ vectors):
- brute-force top-k broadcasts the *query* set (small) against the
  corpus — one scan, no shuffle of the corpus, per-partition partial
  top-k via the window only over (query x corpus-partition) rows.
- the LSH path buckets the corpus once (deterministic hyperplane
  signs), so each query probes only its bucket: the join is equi-keyed
  on bucket id. Recall is tuned by nplanes (fewer planes -> bigger
  buckets) or multi-probe; an IVF variant would replace the bucket id
  with a learned centroid id, same join shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_double_array(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot_expr(a: Column, b: Column) -> Column:
    """Left-to-right fold of elementwise products (matches DuckDB's
    sequential list_dot_product)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column, digits: int = 6) -> Column:
    return F.round(dot_expr(a, b) / (norm_expr(a) * norm_expr(b)), digits)


def _lit_array(vals: np.ndarray) -> Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def _sql_array(vals: np.ndarray) -> str:
    return "[" + ", ".join(repr(float(v)) for v in vals) + "]"


# ---------------------------------------------------------------------------
# brute-force top-k
# ---------------------------------------------------------------------------

def topk_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-match excluded):
    (query_id, neighbor_id, cosine, rank). The query side is
    broadcast; ties broken by neighbor id for determinism."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(vec).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(vec).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_expr(F.col("qv"), F.col("cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("bigint").alias("rank"))
    )


def topk_cosine_sql(
    table: str,
    query_pred: str,
    k: int = 3,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB oracle twin of :func:`topk_cosine` with the query set
    defined by ``query_pred`` (e.g. ``vec_id < 8``)."""
    return f"""
WITH c AS (SELECT {id_col}, {vec}::DOUBLE[] AS v FROM {table}),
q AS (SELECT {id_col} AS query_id, v AS qv FROM c WHERE {query_pred.replace(id_col, id_col)}),
scored AS (
  SELECT q.query_id, c.{id_col} AS neighbor_id,
         round(list_dot_product(q.qv, c.v) /
               (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine
  FROM c JOIN q ON c.{id_col} <> q.query_id
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {k}
""".strip()


# ---------------------------------------------------------------------------
# hyperplane LSH (signed random projections)
# ---------------------------------------------------------------------------

def hyperplanes(dim: int, nplanes: int, seed: int = 7) -> np.ndarray:
    """Deterministic Gaussian hyperplanes (Charikar's SRP-LSH for
    cosine). Seeded so Spark and the oracle share the same planes."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((nplanes, dim))


def bucket_expr(vec: Column, planes: np.ndarray) -> Column:
    """Bucket id = bit vector of dot-product signs."""
    b = F.lit(0).cast("bigint")
    for j, plane in enumerate(planes):
        b = b + F.when(
            dot_expr(vec, _lit_array(plane)) > 0, F.lit(1 << j).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
    return b


def bucket_sql(vec_sql: str, planes: np.ndarray) -> str:
    terms = [
        f"(CASE WHEN list_dot_product({vec_sql}, {_sql_array(p)}) > 0 "
        f"THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j, p in enumerate(planes)
    ]
    return "(" + " + ".join(terms) + ")"


def ann_lsh_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    planes: np.ndarray,
    k: int = 3,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: only corpus vectors in the query's hyperplane
    bucket are scored. Join is equi-keyed on bucket id (shuffle-light);
    at 1e9 vectors the bucketed corpus would be written
    partitioned-by-bucket so probes prune to one partition."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(vec).alias("cv")
    ).withColumn("bucket", bucket_expr(F.col("cv"), planes))
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(vec).alias("qv")
    ).withColumn("bucket", bucket_expr(F.col("qv"), planes))
    scored = (
        c.join(F.broadcast(q), ["bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_expr(F.col("qv"), F.col("cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("bigint").alias("rank"))
    )


def ann_lsh_cosine_sql(
    table: str,
    query_pred: str,
    planes: np.ndarray,
    k: int = 3,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    bsql = bucket_sql("v", planes)
    return f"""
WITH c AS (
  SELECT {id_col}, {vec}::DOUBLE[] AS v FROM {table}
),
cb AS (SELECT {id_col} AS neighbor_id, v, {bsql} AS bucket FROM c),
qb AS (SELECT {id_col} AS query_id, v AS qv, {bsql} AS bucket FROM c WHERE {query_pred}),
scored AS (
  SELECT qb.query_id, cb.neighbor_id,
         round(list_dot_product(qb.qv, cb.v) /
               (sqrt(list_dot_product(qb.qv, qb.qv)) * sqrt(list_dot_product(cb.v, cb.v))), 6) AS cosine
  FROM cb JOIN qb USING (bucket)
  WHERE cb.neighbor_id <> qb.query_id
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {k}
""".strip()


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the learned-bucket scale path
# ---------------------------------------------------------------------------

def train_ivf_centroids(
    corpus: DataFrame,
    k: int = 16,
    sample_rows: int = 10_000,
    iters: int = 10,
    seed: int = 7,
    vec: str = "embedding",
) -> np.ndarray:
    """Driver-side Lloyd k-means on a bounded sample -> (k, dim)
    centroids. The sample collect is capped (`sample_rows`), never the
    corpus; at 1e9 vectors the same code trains on a 1e5-row sample —
    standard IVF practice (coarse quantizer quality needs samples,
    not the full set)."""
    pdf = corpus.select(vec).limit(sample_rows).toPandas()
    X = np.stack(pdf[vec].to_numpy()).astype("float64")
    rng = np.random.default_rng(seed)
    cent = X[rng.choice(len(X), size=k, replace=False)]
    for _ in range(iters):
        d2 = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                cent[j] = X[m].mean(axis=0)
    return cent


def ivf_assign(
    df: DataFrame, centroids: np.ndarray, vec: str = "embedding", out: str = "list_id"
) -> DataFrame:
    """Nearest-centroid assignment via an Arrow-batched pandas UDF
    (vectorized argmin against the broadcast centroid matrix — the
    k x dim distance matrix per batch stays in numpy)."""


    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(np.asarray(centroids, dtype="float64"))

    @F.pandas_udf("int")
    def _assign(vs: pd.Series) -> pd.Series:
        cent = bc.value
        X = np.stack(vs.to_numpy()).astype("float64")
        d2 = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d2.argmin(axis=1).astype("int32"))

    return df.withColumn(out, _assign(F.col(vec)))


def ivf_topk_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 3,
    nprobe: int = 1,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN: corpus sharded into inverted lists by nearest
    centroid; each query scores only its ``nprobe`` nearest lists.
    Join is equi-keyed on list id. At 1e9 vectors the assigned corpus
    is written ``partitionBy(list_id)`` once, so probes prune to
    nprobe partitions; recall is tuned by nprobe (and k of the
    quantizer)."""


    c = ivf_assign(
        corpus.select(F.col(id_col).alias("neighbor_id"), as_double_array(vec).alias("cv"),
                      F.col(vec).alias("_raw")),
        centroids, vec="_raw",
    ).drop("_raw")

    sc = corpus.sparkSession.sparkContext
    bc = sc.broadcast(np.asarray(centroids, dtype="float64"))

    @F.pandas_udf("array<int>")
    def _probe(vs: pd.Series) -> pd.Series:
        cent = bc.value
        X = np.stack(vs.to_numpy()).astype("float64")
        d2 = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        order = np.argsort(d2, axis=1)[:, :nprobe].astype("int32")
        return pd.Series(list(order))

    q = (
        queries.select(
            F.col(id_col).alias("query_id"), as_double_array(vec).alias("qv"),
            F.col(vec).alias("_raw"),
        )
        .withColumn("probe", _probe(F.col("_raw")))
        .drop("_raw")
        .withColumn("list_id", F.explode("probe"))
        .drop("probe")
    )
    scored = (
        c.join(F.broadcast(q), ["list_id"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine_expr(F.col("qv"), F.col("cv")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("bigint").alias("rank"))
    )


def embedding_neardup_pairs(
    corpus: DataFrame,
    planes: np.ndarray,
    threshold: float = 0.95,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs *within LSH buckets*:
    (id_a, id_b, cosine >= threshold). Same bucket-join discipline —
    exact near-dup pairs whose members land in different buckets are
    (documented) recall loss, the standard LSH trade."""
    c = corpus.select(
        F.col(id_col), as_double_array(vec).alias("v")
    ).withColumn("bucket", bucket_expr(F.col("v"), planes))
    a, b = c.alias("a"), c.alias("b")
    raw = dot_expr(F.col("a.v"), F.col("b.v")) / (
        norm_expr(F.col("a.v")) * norm_expr(F.col("b.v"))
    )
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        # filter on the raw cosine (like the oracle), round only for output
        .filter(raw >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(raw, 6).alias("cosine"),
        )
    )


def embedding_neardup_sql(
    table: str,
    planes: np.ndarray,
    threshold: float = 0.95,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    bsql = bucket_sql("v", planes)
    return f"""
WITH c AS (SELECT {id_col}, {vec}::DOUBLE[] AS v FROM {table}),
cb AS (SELECT {id_col}, v, {bsql} AS bucket FROM c)
SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
       round(list_dot_product(a.v, b.v) /
             (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
FROM cb a JOIN cb b ON a.bucket = b.bucket AND a.{id_col} < b.{id_col}
WHERE list_dot_product(a.v, b.v) /
      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= {threshold!r}
""".strip()
