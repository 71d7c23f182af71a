"""Connected components over an edge list — dedup-cluster resolution.

Near-duplicate detection yields PAIRS; deduplication needs CLUSTERS
(every doc transitively connected to a canonical survivor). This is
the iterative piece the reference never needed (its dedup is an exact
primary key) but any LSH-based pipeline does.

Algorithm: label propagation to the minimum id — each iteration every
vertex adopts the smallest label in its neighborhood; converges in
O(diameter) iterations. Spark-first mechanics:

- edges are symmetrized once and eagerly localCheckpoint'ed —
  pre-partitioned on the join key (reused every iteration, never
  re-shuffled) and with upstream lineage TRUNCATED, so per-iteration
  actions don't re-analyze the pair-generation expression tree;
- iteration 1 is fused into initialization (min of self + direct
  neighbors, one aggregate, no join);
- each further iteration is ONE persist+count job: the tagged
  union-aggregate yields new and old labels together, so the same
  action materializes the generation (truncating lineage — the classic
  iterative-algorithm trap on Spark) and evaluates convergence;
- pointer jumping (label-of-label) gives O(log diameter) convergence.

Near-dup graphs have tiny diameters (dup clusters are cliques-ish), so
this typically converges in 1–2 counted iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Adaptive small-graph cutoff: a verified near-dup edge list is
# typically orders of magnitude smaller than the corpus (most docs are
# not duplicates; LSH+verify prunes hard). Below this many edges the
# right physical plan is not an iterative distributed algorithm at all
# — it is: pull the edges to the driver (bounded by the cap), run
# union-find there in O(E α(E)), and broadcast the tiny label table
# back. Same adaptive philosophy as AQE's broadcast-join threshold:
# the LOGICAL operator is identical, the physical strategy switches on
# measured size. 200k edges ≈ a few MB of driver memory.
DRIVER_EDGE_CAP = 200_000


def _driver_union_find(rows, src: str, dst: str) -> list[tuple]:
    """Min-root union-find with path compression over collected edges."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for row in rows:
        a, b = row[src], row[dst]
        for v in (a, b):
            if v not in parent:
                parent[v] = v
        ra, rb = find(a), find(b)
        if ra != rb:
            # attach the larger root under the smaller: the root is
            # then always the component minimum, matching the
            # distributed min-label result exactly
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return [(v, find(v)) for v in parent]


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
    driver_edge_cap: int = DRIVER_EDGE_CAP,
) -> DataFrame:
    """(vertex, component) — component = min vertex id in the component.

    ``edges``: undirected pair list; vertices appearing only as isolated
    ids are not invented here (pass them through afterwards with a
    left join + coalesce to their own id).

    Physical strategy is adaptive: a bounded ``limit(cap+1)`` probe
    collects at most cap+1 edges (CollectLimit evaluates partitions
    incrementally, so a huge edge list short-circuits the probe). If
    the whole edge list fits, driver union-find replaces the iterative
    path — saving its per-iteration job overhead — and the result is
    bit-identical (min-root invariant). Pass ``driver_edge_cap=0`` to
    force the distributed path (e.g. when the caller knows the graph
    is big and wants to skip the probe's partial evaluation).
    """
    if driver_edge_cap:
        probe = edges.select(src, dst).limit(driver_edge_cap + 1).collect()
        if len(probe) <= driver_edge_cap:
            vtype = edges.schema[src].dataType.simpleString()
            labels = _driver_union_find(probe, src, dst)
            # bounded by the cap (≤ a few MB): hint broadcast so the
            # caller's cluster join never SMJ-shuffles the corpus side
            # against this tiny parallelized list (local-list dfs have
            # no stats, so without the hint Catalyst plans SMJ and
            # only AQE might rescue it at runtime)
            return F.broadcast(
                edges.sparkSession.createDataFrame(
                    labels, f"vertex {vtype}, component {vtype}"
                )
            )
    # symmetrize in ONE pass over the edge list (explode of both
    # orientations) — a union of two selects would evaluate the whole
    # upstream pair-generation plan (LSH + verification) twice. The
    # materialization is an EAGER localCheckpoint, not a cache: it both
    # pins the blocks (pre-partitioned on the join key v, so the
    # per-iteration join never re-shuffles the edge side) and TRUNCATES
    # the logical plan. Truncation is the load-bearing part — the edge
    # list usually arrives with the entire LSH + verify expression tree
    # as its lineage, and every subsequent action here would otherwise
    # pay Catalyst re-analysis of that tree (measured ~1 s per action
    # on the dedup-pipeline shape, dwarfing the actual tiny-graph work).
    # no distinct(): min-label aggregation is idempotent under
    # duplicate edges (min over extra copies of the same message), and
    # the usual producers emit unique id_a < id_b pairs already — a
    # distinct here would cost a second full shuffle of the edge list
    # purely to shrink the tiny per-iteration message join
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
        .repartition("v")
        .localCheckpoint(eager=True)
    )
    # iteration 1 fused into initialization: with a symmetric edge
    # list, min-label's first round is exactly component = min(self,
    # direct neighbors) — one aggregate, no join, no separate
    # init-labels distinct
    labels = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select(F.col("u").alias("vertex"), F.least("u", "mn").alias("component"))
    )
    pinned = []  # persisted label generations, released at exit
    for _ in range(max_iterations - 1):
        # one tagged union-aggregate replaces join-then-left-join:
        # neighbor labels (is_old=0) and own labels (is_old=1) fold in
        # a single groupBy that yields both the new component and the
        # old one for the convergence check
        msgs = sym.join(
            labels.withColumnRenamed("vertex", "v"), "v"
        ).select(F.col("u").alias("vertex"), "component", F.lit(0).alias("is_old"))
        own = labels.select("vertex", "component", F.lit(1).alias("is_old"))
        combined = (
            msgs.unionByName(own)
            .groupBy("vertex")
            .agg(
                F.min("component").alias("new_component"),
                F.max(F.when(F.col("is_old") == 1, F.col("component"))).alias(
                    "old_component"
                ),
            )
        )
        # pointer jumping (label-of-label): component' = label[component] —
        # halves the remaining path length every iteration, turning
        # O(diameter) convergence into O(log diameter)
        jump = combined.select(
            F.col("vertex").alias("jvertex"), F.col("new_component").alias("jcomponent")
        )
        jumped = (
            combined.join(jump, combined["new_component"] == jump["jvertex"], "left")
            .select(
                "vertex",
                F.least(
                    F.col("new_component"),
                    F.coalesce(F.col("jcomponent"), F.col("new_component")),
                ).alias("component"),
                "old_component",
            )
        )
        # persist + count = ONE job that both materializes this
        # generation (truncating recompute for the next iteration) and
        # evaluates convergence; near-dup graphs converge in 1-2
        # rounds, so the cached-plan nesting stays shallow
        jumped = jumped.persist()
        pinned.append(jumped)
        changed = jumped.filter(F.col("component") != F.col("old_component")).count()
        labels = jumped.select("vertex", "component")
        if changed == 0:
            break
    # the returned labels read the LAST persisted generation directly —
    # a final eager localCheckpoint would cost one more full job purely
    # to re-copy blocks that are already materialized. Earlier
    # generations and the edge cache unpersist now; if the last
    # generation is ever evicted, recompute walks the original lineage
    # (correct, just slower).
    for df in pinned[:-1]:
        df.unpersist()
    # sym's localCheckpoint blocks are released by the ContextCleaner
    # when the RDD is garbage-collected; there is no unpersist handle.
    return labels


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
    rank_col: str | None = None,
) -> DataFrame:
    """Assign every row of ``df`` its duplicate-cluster canonical id.

    Rows not touching any pair become their own singleton cluster.
    Output: df columns + ``cluster_id`` + ``is_canonical``.

    ``rank_col``: by default the survivor is the minimum-id row (the
    deterministic choice the SQL oracles replay). Curation pipelines
    usually want the BEST copy instead — pass a rank column (e.g. a
    quality score) and the cluster's max-rank row survives (ties
    break to the min id). Costs one row_number window on cluster_id;
    ``cluster_id`` itself stays the min-label either way, so cluster
    identity is unchanged."""
    from pyspark.sql import Window

    comp = connected_components(pairs, src, dst)
    out = (
        df.join(comp, df[id_col] == comp["vertex"], "left")
        .withColumn("cluster_id", F.coalesce(F.col("component"), F.col(id_col)))
        .drop("vertex", "component")
    )
    if rank_col is None:
        return out.withColumn(
            "is_canonical", F.col(id_col) == F.col("cluster_id")
        )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col(rank_col).desc_nulls_last(), F.col(id_col).asc()
    )
    return out.withColumn("is_canonical", F.row_number().over(w) == 1)
