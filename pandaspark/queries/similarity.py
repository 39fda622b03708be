"""Similarity search over the `embeddings` table (array<float>, 64-dim) —
SURVEY.md §2.11.

Brute-force cosine top-k is the exact baseline (a broadcast-join + window);
the LSH-bucketed variant is the 100 TB path (candidates shrink from N×Q to
bucket-local). Dot products run as JVM array expressions (zip_with +
aggregate) — sequential fold, so the float summation order is identical to
DuckDB's list functions and results hash-match exactly after rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load, register, round4

_K = 5
_N_QUERIES = 5  # vec_id < 5 are the query vectors


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ))


# --- q40: brute-force cosine top-k ----------------------------------------

_Q40_ORACLE = f"""
WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id < {_N_QUERIES}),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings),
c AS (
  SELECT qid, vec_id,
         floor(list_dot_product(qe, embedding)
               / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(embedding, embedding)))
               * 10000 + 0.5) / 10000.0
         AS cosine
  FROM q JOIN e ON vec_id != qid
)
SELECT qid, vec_id, cosine,
       row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rk
FROM c
QUALIFY rk <= {_K}
"""


@register("q40_cosine_topk", _Q40_ORACLE, "brute-force cosine top-k ANN baseline")
def q40(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    joined = F.broadcast(q).crossJoin(e).filter(F.col("vec_id") != F.col("qid"))
    cosine = round4(
        _dot(F.col("qe"), F.col("embedding")) / (_norm(F.col("qe")) * _norm(F.col("embedding")))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), "vec_id")
    return (
        joined.select("qid", "vec_id", cosine.alias("cosine"))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _K)
    )


# --- q41: label centroid classification -----------------------------------

_Q41_ORACLE = """
SELECT label,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT)) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) / 1000000.0 AS mean_dim0,
       CAST(sum(CAST(round(CAST(embedding[33] AS DOUBLE) * 1000000) AS BIGINT)) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) / 1000000.0 AS mean_dim32
FROM embeddings GROUP BY label
"""


@register("q41_label_centroids", _Q41_ORACLE, "per-label centroid components (vector agg)")
def q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    # centroid means computed through micro-unit integers: exact, associative,
    # engine-independent (float sums would be summation-order-dependent)
    e = load(spark, sf_dir, "embeddings")

    def mean_dim(i: int, alias: str):
        s = F.sum(F.round(F.col("embedding")[i].cast("double") * 1000000).cast("long"))
        return (s.cast("double") / F.count(F.lit(1)).cast("double") / F.lit(1000000.0)).alias(alias)

    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"), mean_dim(0, "mean_dim0"), mean_dim(32, "mean_dim32")
    )


# --- q42: LSH-bucketed ANN (random hyperplane signs) — rows-only ----------

_N_PLANES = 8


@register("q42_lsh_ann", None, "sign-LSH bucketed ANN candidates (rows-only check)")
def q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-style bucketing: sign of dot(v, h_p) for deterministic
    pseudo-random hyperplanes → 8-bit bucket id; ANN search only compares
    vectors within a bucket. The 100 TB scale path for q40: the crossJoin
    N×Q collapses to per-bucket joins.

    Hyperplanes derive from xxhash64(dim, plane) — deterministic, no
    driver-side randomness, no data shipped to Python.
    """
    e = load(spark, sf_dir, "embeddings")
    # pseudo-random unit-ish hyperplane component for (dim i, plane p):
    # map xxhash64 to [-1, 1) deterministically.
    def plane_component(i_col, p: int):
        h = F.xxhash64(i_col, F.lit(p))
        return (h % 10007).cast("double") / F.lit(5003.5) - F.lit(1.0)

    def bucket_bit(p: int):
        prod = F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.transform(F.sequence(F.lit(0), F.lit(63)), lambda i: plane_component(i, p)),
                lambda x, h: x.cast("double") * h,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(prod >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**p)

    bucket = sum([bucket_bit(p) for p in range(_N_PLANES)], F.lit(0))
    buckets = e.select("vec_id", "label", bucket.alias("bucket"))
    return buckets.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_vectors"), F.countDistinct("label").alias("n_labels")
    )


# --- q45: embedding-cosine near-duplicate pairs ---------------------------

_NEAR_T = 0.35  # sf data has no planted dups; 0.35 catches the similarity tail

_Q45_ORACLE = f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings)
SELECT * FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         floor(list_dot_product(a.embedding, b.embedding)
               / (sqrt(list_dot_product(a.embedding, a.embedding))
                  * sqrt(list_dot_product(b.embedding, b.embedding)))
               * 10000 + 0.5) / 10000.0 AS cosine,
         CAST(a.label = b.label AS BIGINT) AS same_label
  FROM e a JOIN e b ON a.vec_id < b.vec_id)
WHERE cosine >= {_NEAR_T}
"""


@register("q45_cosine_neardup", _Q45_ORACLE, "embedding-cosine near-dup pair mining")
def q45(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs cosine near-dup mining, Arrow-vectorized (the dense-linalg
    exception documented in pandaspark/vectorops.py): one side streams
    through mapInPandas in Arrow batches, the other rides the task closure
    as a numpy matrix (the same broadcast-small-side assumption as the
    previous JVM join — 2000x64 doubles ~ 1 MB), and each batch scores an
    (n_batch, N) block in a single matmul instead of N interpreted
    64-element Catalyst folds per row (~5x wall at sf0.1). At 100 TB the
    same kernel runs per LSH bucket (q42's bucketing), so the pair space —
    and the closure matrix — collapse to bucket-local.

    Exactness: scores are round(dot/(na*nb), 4); numpy's pairwise summation
    vs the oracle's sequential fold differ by <=1e-15 relative, which the
    4-decimal rounding absorbs — hash-match asserted at sf0.001/0.01/0.1
    by tests and the driver."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    e = load(spark, sf_dir, "embeddings")
    side = e.select("vec_id", "label", "embedding").collect()
    vids = np.array([r.vec_id for r in side], dtype=np.int64)
    labels = np.array([r.label for r in side])
    bmat = np.array([r.embedding for r in side], dtype=np.float64)
    bnorm = np.linalg.norm(bmat, axis=1)

    out_schema = T.StructType(
        [
            T.StructField("vec_a", T.LongType()),
            T.StructField("vec_b", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
            T.StructField("same_label", T.LongType()),
        ]
    )

    def score_batches(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            a_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            a_lab = pdf["label"].to_numpy()
            amat = np.array(list(pdf["embedding"]), dtype=np.float64)
            anorm = np.linalg.norm(amat, axis=1)
            # floor(x*1e4+0.5)/1e4 == the round4 convention (queries/__init__)
            cos = np.floor((amat @ bmat.T) / np.outer(anorm, bnorm) * 1e4 + 0.5) / 1e4
            ia, ib = np.nonzero((a_ids[:, None] < vids[None, :]) & (cos >= _NEAR_T))
            yield pd.DataFrame(
                {
                    "vec_a": a_ids[ia],
                    "vec_b": vids[ib],
                    "cosine": cos[ia, ib],
                    "same_label": (a_lab[ia] == labels[ib]).astype(np.int64),
                }
            )

    # the scan is one small parquet file → one partition; spread the O(N^2)
    # block scoring across the cluster (at real scale the fact side arrives
    # pre-partitioned and this repartition is a no-op-sized shuffle)
    par = spark.sparkContext.defaultParallelism
    return (
        e.select("vec_id", "label", "embedding")
        .repartition(par, "vec_id")
        .mapInPandas(score_batches, out_schema)
    )


# --- q46: IVF-style ANN (centroid cells, 1 probe) — rows-only -------------


@register("q46_ivf_ann", None, "IVF 1-probe ANN via label-centroid cells (rows-only)")
def q46(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-file ANN: coarse quantizer = per-label centroids (exact
    element-wise avg, 64 built-in aggs — a stand-in for k-means on data
    that ships labels); each query probes its nearest centroid's cell only,
    then exact cosine top-k within the cell. At 100 TB the fact table is
    pre-partitioned by cell id, so a 1-probe search touches 1/K of the data
    with zero shuffle; q40 is the exact-recall baseline for comparison."""
    e = load(spark, sf_dir, "embeddings")
    dims = 64
    cents = e.groupBy("label").agg(
        F.array(*[F.avg(F.col("embedding")[i]) for i in range(dims)]).alias("centroid")
    )
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    qc = q.crossJoin(F.broadcast(cents.select(F.col("label").alias("cell"), "centroid")))
    ccos = _dot(F.col("qe"), F.col("centroid")) / (
        _norm(F.col("qe")) * _norm(F.col("centroid"))
    )
    wq = Window.partitionBy("qid").orderBy(F.col("ccos").desc(), "cell")
    probe = (
        qc.select("qid", "qe", "cell", ccos.alias("ccos"))
        .withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") == 1)
        .select("qid", "qe", "cell")
    )
    cand = F.broadcast(probe).join(e, (F.col("label") == F.col("cell"))).filter(
        F.col("vec_id") != F.col("qid")
    )
    cosine = round4(
        _dot(F.col("qe"), F.col("embedding")) / (_norm(F.col("qe")) * _norm(F.col("embedding")))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), "vec_id")
    return (
        cand.select("qid", "cell", "vec_id", cosine.alias("cosine"))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _K)
    )
