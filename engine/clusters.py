"""Duplicate-cluster resolution: near-dup PAIRS -> connected components ->
one canonical doc per cluster.

The last step of the LLM-training-data dedup pipeline this engine's
minhash/simhash/ann pair generators feed: pairs say "these two documents
are near-duplicates"; what the pipeline actually needs is a CLUSTER id per
document (duplicates are transitive in practice) and a deterministic
canonical representative, so the keep/drop decision is one filter.

Algorithm: distributed min-label propagation WITH pointer jumping —
each iteration (a) propagates the smallest known label one hop along the
pair edges and (b) replaces every label by its label's label (path
halving). The jump step is what makes this scale: a pathological
diameter-D component (a chain of templated pages each similar only to its
neighbors) converges in O(log D) iterations instead of O(D), the
hooking + pointer-jumping idea classical CC algorithms (and the
MapReduce variants, e.g. Kiveris et al. 2014, "Connected Components in
MapReduce and Beyond") are built on.

100 TB shape:
- per iteration: one equi-join along edges + one self-join on labels +
  one min-aggregate — all key-partitioned shuffles, no all-pairs step.
- lineage is cut per iteration (localCheckpoint; on a real cluster set a
  reliable spark.sparkContext.setCheckpointDir and swap to checkpoint()),
  so iteration N's plan does not replay iterations 1..N-1.
- convergence is detected by a changed-label count (an action per
  iteration, cost bounded by the label table) and bounded by `max_iter`;
  non-convergence raises instead of silently emitting partial clusters.
- cluster ids are the component's MINIMUM doc_id: deterministic at any
  parallelism (the north rule's two-cluster-size identity), no
  monotonically_increasing_id anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(id, cluster_id) for every id appearing in `pairs`, cluster_id =
    min doc id of the connected component. Raises RuntimeError if not
    converged within max_iter (2^max_iter effective diameter — max_iter=20
    covers any component a real corpus can produce)."""
    edges_fwd = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    )
    edges = (
        edges_fwd.union(
            edges_fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .persist()
    )
    if edges.isEmpty():
        edges.unpersist()
        schema = "id long, cluster_id long"
        return pairs.sparkSession.createDataFrame([], schema)

    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # (a) one-hop propagation: each node offers its label to neighbors
        msgs = edges.join(
            labels.withColumnRenamed("id", "src"), "src"
        ).select(F.col("dst").alias("id"), "label")
        hop = (
            msgs.union(labels)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
        )
        # (b) pointer jump: label := label(label) — halves chain depth
        jumped = (
            hop.alias("a")
            .join(
                hop.select(
                    F.col("id").alias("label"), F.col("label").alias("parent")
                ).alias("b"),
                "label",
                "left",
            )
            .select("id", F.least("label", F.coalesce("parent", "label")).alias("label"))
        )
        new_labels = jumped.localCheckpoint()
        changed = (
            new_labels.join(
                labels.withColumnRenamed("label", "old"), "id"
            )
            .where(F.col("label") != F.col("old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            edges.unpersist()
            return labels.select("id", F.col("label").alias("cluster_id"))
    edges.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations"
    )


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Every document's cluster assignment: (doc_id, cluster_id,
    is_canonical). Docs in no pair are singleton clusters of themselves;
    is_canonical marks the kept representative (the cluster's min doc_id),
    so `WHERE is_canonical` is the deduplicated corpus."""
    comp = connected_components(pairs, id_a, id_b, max_iter)
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(comp.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
        .withColumn("is_canonical", F.col("doc_id") == F.col("cluster_id"))
    )


def dedup_clusters_oracle_sql(
    pairs_sql: str,
    table: str = "documents",
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> str:
    """DuckDB twin: transitive closure by recursive CTE (exact at oracle
    scale; the engine's pointer-jumping is the distributed equivalent),
    min reachable id as the cluster id."""
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
edges AS (
  SELECT {id_a} AS src, {id_b} AS dst FROM pairs
  UNION
  SELECT {id_b} AS src, {id_a} AS dst FROM pairs
),
reach(id, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src
),
lab AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
SELECT d.{id_col} AS doc_id,
       coalesce(l.cluster_id, d.{id_col}) AS cluster_id,
       d.{id_col} = coalesce(l.cluster_id, d.{id_col}) AS is_canonical
FROM {table} d LEFT JOIN lab l ON d.{id_col} = l.id
"""
