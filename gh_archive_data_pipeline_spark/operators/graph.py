"""Graph operators for dedup-cluster resolution.

Near-duplicate detection (operators/dedup.py, operators/similarity.py)
yields PAIRS; a training-data pipeline needs CLUSTERS — "these 5 documents
are all one document; keep the canonical one". That is connected components
over the pair graph, which Spark lacks natively.

Implementation: iterative min-label propagation as pure DataFrame ops.
Each round every node adopts the minimum label among itself and its
neighbors; convergence in O(graph diameter) rounds. Near-dup graphs have
tiny diameters (clusters are quasi-cliques — a duplicate of A and a
duplicate of B are usually duplicates of each other), so 3-5 rounds settle
real corpora; ``max_iters`` bounds pathological chains. Per round: one
join + one groupBy (both shuffle on node id — co-partitioned by AQE), and a
``localCheckpoint`` to truncate the growing lineage (at cluster scale:
checkpoint to reliable storage instead). The alternative for adversarial
diameters is the large-star/small-star algorithm (O(log n) rounds); the
round structure below is the same, only the propagation rule changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register


def connected_components(nodes: DataFrame, edges: DataFrame,
                         node_col: str = "node",
                         src: str = "src", dst: str = "dst",
                         max_iters: int = 25) -> DataFrame:
    """Label every node with the smallest node id reachable from it.

    ``nodes``: one column (``node_col``) — must include isolated nodes.
    ``edges``: (``src``, ``dst``) pairs, treated as undirected.
    Returns (node, component) where component = min id in the node's
    connected component.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (sym.union(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
           .distinct()
           .localCheckpoint())
    labels = nodes.select(F.col(node_col).alias("node"),
                          F.col(node_col).alias("label"))
    for _ in range(max_iters):
        nbr = (sym.join(labels.withColumnRenamed("node", "a"), "a")
               .groupBy(F.col("b").alias("node"))
               .agg(F.min("label").alias("nbr_label")))
        stepped = (labels.join(nbr, "node", "left")
                   .select("node", "label",
                           F.least("label", F.coalesce("nbr_label", "label"))
                           .alias("new_label"))
                   .localCheckpoint())
        changed = stepped.filter(F.col("new_label") < F.col("label"))
        labels = stepped.select("node", F.col("new_label").alias("label"))
        if changed.isEmpty():
            break
    return labels.select("node", F.col("label").alias("component"))


@register(
    "q84_dedup_clusters",
    sql="""
    WITH RECURSIVE
    toks AS (
        SELECT doc_id, string_split(text, ' ') AS w
        FROM documents WHERE doc_id < 40
    ),
    sh AS (
        SELECT doc_id,
               CASE WHEN len(w) >= 3
                    THEN list_distinct(list_transform(range(1, len(w) - 1),
                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                    ELSE [array_to_string(w, ' ')] END AS s
        FROM toks
    ),
    pairs AS (
        SELECT a.doc_id AS da, b.doc_id AS db
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE round(len(list_filter(a.s, x -> list_contains(b.s, x)))::DOUBLE
                    / (len(a.s) + len(b.s)
                       - len(list_filter(a.s, x -> list_contains(b.s, x)))), 6)
              >= 0.25
    ),
    edges AS (
        SELECT da AS src, db AS dst FROM pairs
        UNION
        SELECT db, da FROM pairs
    ),
    reach(node, root) AS (
        SELECT doc_id, doc_id FROM toks
        UNION
        SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node
    ),
    comp AS (
        SELECT node AS doc_id, min(root) AS cluster_id
        FROM reach GROUP BY node
    )
    SELECT doc_id, cluster_id,
           count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
           (doc_id = cluster_id) AS is_keeper
    FROM comp
    """,
)
def q84_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-cluster resolution end-to-end: near-dup pairs (exact trigram
    Jaccard >= 0.25 on the bounded q41 window) → connected components →
    per-doc cluster id, cluster size, and keeper flag (min id is canonical).
    The DuckDB oracle computes the same components with a recursive CTE —
    an independent algorithm (transitive closure) pinning the clustering."""
    from ..sources.readers import load_table
    from .dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    pairs = (ngram_jaccard_pairs(docs)
             .filter(F.col("jaccard") >= 0.25)
             .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")))
    comp = connected_components(docs.select(F.col("doc_id").alias("node")),
                                pairs)
    from pyspark.sql import Window
    w = Window.partitionBy("cluster_id")
    return (comp.select(F.col("node").alias("doc_id"),
                        F.col("component").alias("cluster_id"))
            .withColumn("cluster_size", F.count(F.lit(1)).over(w))
            .withColumn("is_keeper", F.col("doc_id") == F.col("cluster_id")))
