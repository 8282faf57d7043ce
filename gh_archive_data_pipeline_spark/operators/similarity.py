"""Similarity search over embedding columns (north-star: ANN / J9).

- brute_force_topk: exact cosine top-k — the correctness baseline. Query set
  broadcasts; the corpus never shuffles. Cost O(|Q|·|corpus|) per batch —
  fine when |Q| is bounded, regardless of corpus size.
- lsh_topk: random-hyperplane (signed random projection) LSH bucketing — the
  scale path. Corpus is bucketed once (linear scan), queries probe only
  matching buckets; recall traded via number of hyperplanes/tables.

All vector math is built-in higher-order functions (zip_with/aggregate) over
array<double> — JVM-side, no Python in the loop. Floats are cast to double
BEFORE any arithmetic so Spark and the DuckDB oracle see identical inputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load_table
from ..plans.registry import register


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a, b):
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: broadcast queries × corpus, window top-k.

    Output: query_id, neighbor_id, cosine_sim, rank (self-matches excluded).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.round("sim", 6).alias("cosine_sim"), "rank")
    )


def lsh_bucket_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    planes_per_table: int = 4, num_tables: int = 16,
                    dim: int = 64, seed: int = 42) -> DataFrame:
    """Approximate top-k via multi-table signed-random-projection LSH.

    L independent tables of ``planes_per_table`` hyperplanes each (generated
    deterministically from ``seed``; L·k·dim literals — tiny). The corpus is
    hashed once into (table, bucket) keys — L rows per vector — and each
    query probes its L buckets; candidates are the union, scored exactly.

    Recall for a pair with per-plane agreement p = 1−θ/π is 1−(1−p^k)^L:
    with the defaults ≈0.87 at cosine 0.6, →1 as similarity grows. Raise
    ``planes_per_table`` for high-similarity corpora (sparser buckets),
    ``num_tables`` for recall. This is the shape that scales to 10^9 vectors:
    hashing is one linear pass, and the candidate join shuffles only
    (id, table, bucket) keys — never the vectors.
    """
    import random

    from pyspark.sql.types import ArrayType, LongType

    rng = random.Random(seed)
    # (L·k) × dim plane matrix; one Arrow-batched matmul hashes a whole
    # vector batch into all tables at once (BLAS, not per-element HOF eval).
    plane_matrix = np.array(
        [[rng.gauss(0, 1) for _ in range(dim)]
         for _ in range(num_tables * planes_per_table)])
    weights = (1 << np.arange(planes_per_table))

    @F.pandas_udf(ArrayType(LongType()))
    def buckets_of(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())            # (batch, dim)
        signs = (mat @ plane_matrix.T) >= 0        # (batch, L·k)
        bits = signs.reshape(len(mat), num_tables, planes_per_table)
        codes = (bits * weights).sum(axis=2)       # (batch, L)
        return pd.Series(list(codes))

    def hashed(df, out_id, out_vec):
        return df.select(
            out_id, out_vec,
            F.posexplode(buckets_of(F.col(out_vec))).alias("t", "b"))

    c = hashed(corpus.select(F.col(id_col).alias("neighbor_id"),
                             _as_double(F.col(vec_col)).alias("cv")),
               "neighbor_id", "cv")
    q = hashed(queries.select(F.col(id_col).alias("query_id"),
                              _as_double(F.col(vec_col)).alias("qv")),
               "query_id", "qv")
    candidates = (
        c.join(F.broadcast(q), ["t", "b"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qv", "neighbor_id", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = candidates.select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("sim"))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.round("sim", 6).alias("cosine_sim"), "rank")
    )


# ---------------------------------------------------------------------------
# Registry queries
# ---------------------------------------------------------------------------


@register(
    "q44_embedding_topk",
    sql="""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 10),
         c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
               FROM embeddings),
         scored AS (
           SELECT query_id, neighbor_id,
                  list_dot_product(qv, cv)
                    / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                    AS sim
           FROM q JOIN c ON query_id <> neighbor_id),
         ranked AS (
           SELECT query_id, neighbor_id, sim,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, neighbor_id) AS rank
           FROM scored)
    SELECT query_id, neighbor_id, round(sim, 6) AS cosine_sim, CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def q44_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9/ANN baseline: exact cosine top-5 for query vectors vec_id<10 over
    the full corpus. Brute force IS the oracle-checkable baseline; the LSH
    variant (q45) is the scale path."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return brute_force_topk(emb, queries, k=5)


@register("q45_embedding_lsh_topk", sql=None)
def q45_embedding_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path: random-hyperplane LSH bucketing + in-bucket exact
    cosine. Rows-only driver check; recall vs brute force is asserted in unit
    tests (same-bucket probability degrades gracefully, never errors)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return lsh_bucket_topk(emb, queries, k=5)


@register(
    "q46_label_centroid_sim",
    sql="""
    WITH pos AS (
      SELECT label,
             unnest(range(1, len(embedding) + 1)) AS i,
             unnest(embedding::DOUBLE[]) AS x
      FROM embeddings
    ),
    cent AS (
      SELECT label, list(cx ORDER BY i) AS centroid
      FROM (SELECT label, i, avg(x) AS cx FROM pos GROUP BY label, i)
      GROUP BY label
    )
    SELECT e.vec_id, e.label,
           round(list_dot_product(e.embedding::DOUBLE[], c.centroid)
                 / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(c.centroid, c.centroid))), 6)
             AS centroid_sim
    FROM embeddings e JOIN cent c ON e.label = c.label
    """,
)
def q46_label_centroid_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped vector aggregation: per-label centroid (element-wise avg via
    posexplode→groupBy) then each vector's cosine to its class centroid —
    the building block for embedding-cluster dedup/quality filtering."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double(F.col("embedding")).alias("v"))
    pos = emb.select("label", F.posexplode("v").alias("i", "x"))
    cent = (
        pos.groupBy("label", "i").agg(F.avg("x").alias("cx"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "cx"))).alias("pairs"))
        .select("label", F.transform("pairs", lambda s: s["cx"]).alias("centroid"))
    )
    return (
        emb.join(F.broadcast(cent), "label")
        .select("vec_id", "label",
                F.round(cosine(F.col("v"), F.col("centroid")), 6)
                .alias("centroid_sim"))
    )
