"""Connected components over an edge list — dedup-cluster resolution.

Near-duplicate detection yields PAIRS; deduplication needs CLUSTERS
(every doc transitively connected to a canonical survivor). This is
the iterative piece the reference never needed (its dedup is an exact
primary key) but any LSH-based pipeline does.

Algorithm: label propagation to the minimum id — each iteration every
vertex adopts the smallest label in its neighborhood; converges in
O(diameter) iterations. Spark-first mechanics:

- edges are symmetrized once and CACHED (reused every iteration);
- each iteration is one join + one min-aggregate (two shuffles);
- convergence check = count of changed labels (an aggregate, cheap);
- labels are localCheckpoint'ed EVERY iteration to truncate lineage —
  the classic iterative-algorithm trap on Spark (without it each
  action replays all prior iterations);
- pointer jumping (label-of-label) gives O(log diameter) convergence.

Near-dup graphs have tiny diameters (dup clusters are cliques-ish), so
this typically converges in 2–3 iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(vertex, component) — component = min vertex id in the component.

    ``edges``: undirected pair list; vertices appearing only as isolated
    ids are not invented here (pass them through afterwards with a
    left join + coalesce to their own id).
    """
    # symmetrize in ONE pass over the edge list (explode of both
    # orientations) — a union of two selects would evaluate the whole
    # upstream pair-generation plan (LSH + verification) twice
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                    F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
        .cache()
    )
    labels = sym.select(F.col("u").alias("vertex")).distinct().withColumn(
        "component", F.col("vertex")
    )
    for i in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym["v"] == labels["vertex"])
            .groupBy(F.col("u").alias("vertex2"))
            .agg(F.min("component").alias("neighbor_component"))
        )
        updated = (
            labels.join(neighbor_min, labels["vertex"] == F.col("vertex2"), "left")
            .select(
                "vertex",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("neighbor_component"), F.col("component")),
                ).alias("new_component"),
                "component",
            )
        )
        # pointer jumping (label-of-label): component' = label[component] —
        # halves the remaining path length every iteration, turning
        # O(diameter) convergence into O(log diameter)
        jump = updated.select(
            F.col("vertex").alias("jvertex"), F.col("new_component").alias("jcomponent")
        )
        jumped = (
            updated.join(jump, updated["new_component"] == jump["jvertex"], "left")
            .select(
                "vertex",
                F.least(
                    F.col("new_component"),
                    F.coalesce(F.col("jcomponent"), F.col("new_component")),
                ).alias("final_component"),
                "component",
            )
        )
        # Materialize EVERY iteration: without it, each convergence-check
        # action recomputes the whole lineage of all prior iterations
        # (quadratic in iterations), and the plan grows unboundedly.
        jumped = jumped.localCheckpoint(eager=True)
        changed = jumped.filter(F.col("final_component") != F.col("component")).count()
        labels = jumped.select("vertex", F.col("final_component").alias("component"))
        if changed == 0:
            break
    sym.unpersist()
    return labels


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Assign every row of ``df`` its duplicate-cluster canonical id.

    Rows not touching any pair become their own singleton cluster.
    Output: df columns + ``cluster_id`` + ``is_canonical``.
    """
    comp = connected_components(pairs, src, dst)
    out = (
        df.join(comp, df[id_col] == comp["vertex"], "left")
        .withColumn("cluster_id", F.coalesce(F.col("component"), F.col(id_col)))
        .drop("vertex", "component")
    )
    return out.withColumn("is_canonical", F.col(id_col) == F.col("cluster_id"))
