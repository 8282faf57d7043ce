"""Distributed linear algebra on the embeddings table: PCA top component by
power iteration.

The iterative-algorithm pattern (like operators/graph.py's label
propagation): a driver loop whose per-iteration state is O(dim) floats, with
ALL row-scale work inside one aggregation pass per iteration. The corpus is
never collected and never shuffles — each pass is a map-side partial
aggregate of 65 sums, so at 100 TB an iteration costs one scan (or one
cached-memory pass) regardless of row count. Iteration count is fixed and
small (power iteration converges geometrically in the λ1/λ2 gap).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.readers import load_table
from .similarity import _as_double, dot

DIM = 64
ITERATIONS = 15


def _mean_vector(emb: DataFrame) -> list[float]:
    row = emb.agg(*[
        F.avg(F.col("embedding").getItem(j)).alias(f"m{j}") for j in range(DIM)
    ]).first()
    return [float(row[f"m{j}"]) for j in range(DIM)]


def pca_top_component(emb: DataFrame) -> tuple[list[float], float, float]:
    """Leading eigenvector of the (uncentered-storage, centered-math)
    covariance via power iteration. Returns (unit eigenvector, eigenvalue,
    explained-variance share). Covariance action A·v is computed WITHOUT
    materializing centered vectors: with d_i = e_i·v - μ·v,
    (A·v)_j = Σ_i e_ij·d_i − μ_j·Σ_i d_i."""
    mu = _mean_vector(emb)
    n = emb.count()
    # Deterministic start: normalized all-ones (never orthogonal to the top
    # component in practice; a zero Rayleigh quotient would flag it loudly).
    v = [1.0 / math.sqrt(DIM)] * DIM

    vec = _as_double(F.col("embedding"))
    for _ in range(ITERATIONS):
        mu_dot_v = sum(m * x for m, x in zip(mu, v))
        d = dot(vec, F.array(*[F.lit(float(x)) for x in v])) - F.lit(mu_dot_v)
        sums = emb.select(
            d.alias("d"), *[F.col("embedding").getItem(j).alias(f"e{j}")
                            for j in range(DIM)]
        ).agg(
            F.sum("d").alias("sd"),
            *[F.sum(F.col(f"e{j}") * F.col("d")).alias(f"s{j}")
              for j in range(DIM)],
        ).first()
        w = [float(sums[f"s{j}"]) - mu[j] * float(sums["sd"])
             for j in range(DIM)]
        nrm = math.sqrt(sum(x * x for x in w))
        v = [x / nrm for x in w]
        eigenvalue = nrm / n  # Rayleigh quotient after normalization step

    # Total variance = Σ_j Var(col_j), one pass.
    var_row = emb.agg(*[
        F.var_pop(F.col("embedding").getItem(j)).alias(f"v{j}")
        for j in range(DIM)
    ]).first()
    total_var = sum(float(var_row[f"v{j}"]) for j in range(DIM))
    return v, eigenvalue, eigenvalue / total_var


@register("q146_pca_power_iteration", sql=None)
def q146_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA leading component of the embedding corpus by power iteration —
    rows-only (iterative, not SQL-expressible; unit tests pin it against
    NumPy — exact eigenvector match on gapped data, Rayleigh-quotient-at-λ1
    bound on the near-isotropic fixture, where no fixed-iteration method can
    single out the exact top direction). Output: one row per dimension with
    the loading, plus the eigenvalue/explained-variance share repeated for
    context. Sign is fixed by making the largest-|loading| entry positive."""
    emb = load_table(spark, sf_dir, "embeddings")
    v, eigenvalue, share = pca_top_component(emb)
    flip = -1.0 if v[max(range(DIM), key=lambda j: abs(v[j]))] < 0 else 1.0
    rows = [
        (j, round(flip * v[j], 6), round(eigenvalue, 6), round(share, 6))
        for j in range(DIM)
    ]
    return spark.createDataFrame(
        rows, "dim_idx int, loading double, eigenvalue double, var_share double"
    )
