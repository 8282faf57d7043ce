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

    # Materialize the projected input once: without this every iteration
    # re-runs the parquet scan through its whole lineage (15 scans); at
    # cluster scale this is .cache() / a checkpoint to storage.
    emb = emb.select("embedding").localCheckpoint()
    vec = _as_double(F.col("embedding"))
    for _ in range(ITERATIONS):
        mu_dot_v = sum(m * x for m, x in zip(mu, v))
        d = dot(vec, F.array(*[F.lit(float(x)) for x in v])) - F.lit(mu_dot_v)
        # Per-dimension sums via posexplode + groupBy(dim) rather than 64
        # separate sum() expressions: the wide-agg form re-compiles a fresh
        # 65-expression codegen unit EVERY iteration (v changes → new plan
        # text) at ~1s/compile; this 3-expression shape compiles in ms.
        # Communication is identical — partial aggregation reduces each
        # partition to 65 (dim, sum) pairs before the shuffle. A sentinel
        # dimension with e=1.0 rides along so Σd comes from the same pass.
        rows = (emb.select(
                    d.alias("d"),
                    F.posexplode(F.concat(vec, F.array(F.lit(1.0))))
                    .alias("j", "e"))
                .groupBy("j")
                .agg(F.sum(F.col("e") * F.col("d")).alias("s"))
                .collect())
        by_j = {int(r["j"]): float(r["s"]) for r in rows}
        sd = by_j[DIM]  # the sentinel slot
        w = [by_j[j] - mu[j] * sd for j in range(DIM)]
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


def _pca_oracle(iterations: int = ITERATIONS, dim: int = DIM) -> str:
    """Unrolled replay of :func:`pca_top_component` — the q390/q391
    fixed-round float-sequence technique applied to power iteration: one
    MATERIALIZED stage triple (d/s/i) per round computing the SAME IEEE
    double sequence (covariance action without centering, sentinel-free Σd,
    normalize), so every intermediate eigenvector estimate must agree to
    within summation-order noise, nine orders of magnitude below the
    6-decimal output rounding. Deterministic by construction: all-ones
    init, fixed 15 rounds."""
    rng = f"range(1, {dim + 1})"
    stages = []
    for k in range(1, iterations + 1):
        stages.append(f"""
    d{k} AS (
        SELECT e,
               list_sum(list_transform({rng}, i -> e[i] * v[i]))
               - list_sum(list_transform({rng}, i -> mu[i] * v[i])) AS d
        FROM emb, i{k - 1}, mus
    ),
    s{k} AS MATERIALIZED (
        SELECT (SELECT list(sj ORDER BY j)
                FROM (SELECT t.j AS j, sum(e[t.j] * d) AS sj
                      FROM d{k}, LATERAL (SELECT unnest({rng}) AS j) t
                      GROUP BY t.j)) AS s,
               (SELECT sum(d) FROM d{k}) AS sd
    ),
    i{k} AS MATERIALIZED (
        SELECT list_transform(w, x -> x / nrm) AS v, nrm / nn.n AS eig
        FROM (SELECT list_transform({rng}, i -> s[i] - mu[i] * sd) AS w
              FROM s{k}, mus) tw,
             LATERAL (SELECT sqrt(list_sum(list_transform(w, x -> x * x)))
                      AS nrm) tn,
             nn
    ),""")
    return f"""
    WITH emb AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    nn AS (SELECT count(*)::DOUBLE AS n FROM emb),
    mus AS MATERIALIZED (
        SELECT (SELECT list(m ORDER BY j)
                FROM (SELECT t.j AS j, avg(e[t.j]) AS m
                      FROM emb, LATERAL (SELECT unnest({rng}) AS j) t
                      GROUP BY t.j)) AS mu
    ),
    i0 AS (SELECT list_transform({rng}, i -> 1.0 / sqrt({dim}.0)) AS v,
           0.0 AS eig),
    {''.join(stages)}
    jmax AS (
        SELECT t.j AS j
        FROM i{iterations}, LATERAL (SELECT unnest({rng}) AS j) t
        ORDER BY abs(v[t.j]) DESC, t.j ASC LIMIT 1
    ),
    tv AS (
        SELECT sum(vp) AS total_var
        FROM (SELECT var_pop(e[t.j]) AS vp
              FROM emb, LATERAL (SELECT unnest({rng}) AS j) t
              GROUP BY t.j)
    )
    SELECT CAST(t.j - 1 AS INTEGER) AS dim_idx,
           round(CASE WHEN v[jm.j] < 0 THEN -v[t.j] ELSE v[t.j] END, 6)
               AS loading,
           round(eig, 6) AS eigenvalue,
           round(eig / total_var, 6) AS var_share
    FROM i{iterations}, jmax jm, tv,
         LATERAL (SELECT unnest({rng}) AS j) t
    ORDER BY dim_idx
    """


@register("q146_pca_power_iteration", sql=_pca_oracle())
def q146_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA leading component of the embedding corpus by power iteration —
    oracle-paired since round 8: the fixed-round float-sequence replay
    (q390/q391's technique) unrolls all 15 iterations as MATERIALIZED CTE
    stages computing the identical IEEE double sequence, with unit tests
    additionally pinning the result against NumPy (exact eigenvector match
    on gapped data, Rayleigh-quotient-at-λ1 bound on the near-isotropic
    fixture). Output: one row per dimension with the loading, plus the
    eigenvalue/explained-variance share repeated for context. Sign is fixed
    by making the largest-|loading| entry positive."""
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


def _argmin_cluster(centroids: list[list[float]]):
    """JVM argmin over k centroids: array_min over (distance², j) structs —
    the struct comparison is lexicographic, so the index rides along free.
    The k distance HOFs are built as SQL text, not Python lambdas: multiple
    pyspark-lambda HOFs in one projection collapse into one shared expression
    (all k distances would silently become centroid 0's)."""
    cells = []
    for j, c in enumerate(centroids):
        carr = "array(" + ",".join(f"{float(x)!r}D" for x in c) + ")"
        d2 = (f"aggregate(zip_with(cast(embedding as array<double>), {carr},"
              f" (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)")
        cells.append(f"struct({d2} AS d2, {j} AS j)")
    best = f"array_min(array({', '.join(cells)}))"
    return (F.expr(best).getField("j").alias("cluster"),
            F.expr(best).getField("d2").alias("d2"))


def kmeans(emb: DataFrame, k: int = 8, iterations: int = 5) -> tuple[list[list[float]], DataFrame]:
    """Lloyd's k-means over the embedding column. Same scale contract as
    pca_top_component: per-iteration driver state is the k×dim codebook
    (collected — bounded and small, like the IVF codebook in
    operators/similarity.py), and each iteration is ONE partial-aggregated
    shuffle on the k-valued cluster key. Seeds are the first k vectors by
    vec_id (deterministic, replayable)."""
    seed_rows = (emb.orderBy("vec_id").limit(k)
                 .select(_as_double(F.col("embedding")).alias("e")).collect())
    centroids = [list(r.e) for r in seed_rows]
    emb = emb.select("vec_id", "embedding").localCheckpoint()
    for _ in range(iterations):
        cluster, _d2 = _argmin_cluster(centroids)
        sums = (
            emb.select(cluster, _as_double(F.col("embedding")).alias("e"))
            .groupBy("cluster")
            .agg(F.count("*").alias("n"),
                 *[F.sum(F.col("e").getItem(d)).alias(f"s{d}")
                   for d in range(DIM)])
            .collect()
        )
        by_j = {r.cluster: r for r in sums}
        centroids = [
            [float(by_j[j][f"s{d}"]) / by_j[j].n for d in range(DIM)]
            if j in by_j else centroids[j]          # empty cluster: keep seed
            for j in range(len(centroids))
        ]
    cluster, d2 = _argmin_cluster(centroids)
    assigned = emb.select("vec_id", cluster, d2)
    return centroids, assigned


def _kmeans_oracle(k: int = 8, iterations: int = 5, dim: int = DIM) -> str:
    """Unrolled replay of :func:`kmeans`: per Lloyd round, an assignment
    CTE (argmin over the k centroids with the same (d2, j) lexicographic
    tie-break as the Spark struct-min) and a centroid CTE (per-cluster
    per-dim mean, COALESCE keeping the previous centroid for an empty
    cluster, exactly like the Spark loop). Deterministic by construction:
    seeds are the first k vectors by vec_id, 5 fixed rounds; the only
    engine divergence is distributed-vs-sequential summation order, ~1e-13
    relative against the 6-decimal output rounding."""
    rng = f"range(1, {dim + 1})"
    stages = []
    for r in range(1, iterations + 2):   # last round = final assignment
        stages.append(f"""
    a{r} AS MATERIALIZED (
        SELECT vec_id, e, cluster, d2 FROM (
            SELECT vec_id, e, cluster, d2,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY d2, cluster) AS rn
            FROM (SELECT emb.vec_id, emb.e, c.j AS cluster,
                         list_sum(list_transform({rng},
                             i -> (emb.e[i] - c.c[i])
                                  * (emb.e[i] - c.c[i]))) AS d2
                  FROM emb, c{r - 1} c)
        ) WHERE rn = 1
    ),""")
        if r <= iterations:
            stages.append(f"""
    c{r} AS MATERIALIZED (
        SELECT p.j, COALESCE(m.c, p.c) AS c
        FROM c{r - 1} p LEFT JOIN (
            SELECT cluster AS j, list(sd / cnt ORDER BY i) AS c
            FROM (SELECT cluster, t.i AS i, sum(e[t.i]) AS sd,
                         count(*) AS cnt
                  FROM a{r}, LATERAL (SELECT unnest({rng}) AS i) t
                  GROUP BY cluster, t.i)
            GROUP BY cluster
        ) m ON p.j = m.j
    ),""")
    return f"""
    WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                 FROM embeddings),
    c0 AS MATERIALIZED (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, e AS c
        FROM (SELECT vec_id, e FROM emb ORDER BY vec_id LIMIT {k})
    ),
    {''.join(stages)}
    dummy AS (SELECT 1)
    SELECT CAST(cluster AS INTEGER) AS cluster,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(d2), 6) AS mean_sq_dist
    FROM a{iterations + 1}
    GROUP BY cluster
    ORDER BY cluster
    """


@register("q149_kmeans_clusters", sql=_kmeans_oracle())
def q149_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means (k=8, 5 Lloyd iterations) over the embedding corpus —
    oracle-paired since round 8 via the unrolled Lloyd replay (assignment
    argmin with the exact (d2, cluster) tie-break, per-cluster means,
    empty-cluster carry-over), with the NumPy unit test still pinning
    assignments and inertia against an independent implementation.
    Output: per-cluster size and mean squared distance (inertia
    contribution)."""
    emb = load_table(spark, sf_dir, "embeddings")
    _centroids, assigned = kmeans(emb)
    return (
        assigned.groupBy("cluster")
        .agg(F.count("*").cast("bigint").alias("n"),
             F.round(F.avg("d2"), 6).alias("mean_sq_dist"))
        .orderBy("cluster")
    )
