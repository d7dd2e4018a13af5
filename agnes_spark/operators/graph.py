"""Iterative graph operators on edge DataFrames.

`connected_components` turns near-duplicate PAIRS into duplicate
CLUSTERS — the step between candidate generation (minhash/simhash/
jaccard joins in operators/dedup.py) and "keep one canonical document
per cluster" in a curation pipeline.

Algorithm: min-label propagation (a DataFrame-native union-find).
Every node starts labeled with its own id; each round every node takes
the min of its label and its neighbors' labels. Rounds needed =
component diameter — for dedup graphs (tiny, dense clusters) that is
2-4; the loop stops as soon as a round changes nothing.

Scale notes: each round is one shuffle (groupBy node) against
edges pre-partitioned once by src; lineage is truncated every round
with localCheckpoint so plans stay O(1) deep. For graphs with huge
diameters (paths), switch to the alternating large/small-star
algorithm — same primitive ops, O(log n) rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a_id",
    dst: str = "b_id",
    max_iter: int = 25,
) -> DataFrame:
    """Return (id, cluster_id) with cluster_id = min node id reachable.

    Isolated nodes don't appear (callers union them back with their own
    id as cluster if needed).
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .repartition("u")
        .persist()
    )
    labels = sym.select(F.col("u").alias("id")).distinct().withColumn("lbl", F.col("id"))
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.v == labels.id)
            .groupBy("u")
            .agg(F.min("lbl").alias("nlbl"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.u, "left")
            .select(
                "id",
                F.least(F.col("lbl"), F.coalesce("nlbl", F.col("lbl"))).alias("lbl"),
            )
            .localCheckpoint()  # truncate lineage; also materializes
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.lbl") < F.col("o.lbl"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels.select(F.col("id"), F.col("lbl").alias("cluster_id"))


def canonical_per_cluster(
    docs: DataFrame, components: DataFrame, id_col: str
) -> DataFrame:
    """Keep one canonical row per duplicate cluster: the cluster
    representative (min id) plus every row that is in no cluster."""
    reps = components.filter(F.col("id") == F.col("cluster_id")).select(
        F.col("id").alias(id_col)
    )
    clustered = components.select(F.col("id").alias(id_col))
    unclustered = docs.join(clustered, id_col, "left_anti").select(id_col)
    return docs.join(reps.unionByName(unclustered), id_col, "left_semi")
