"""Distributed connected components over near-duplicate pair lists.

The dedup family (`operators/dedup.py`) emits PAIRS — (id_a, id_b)
candidates from LSH banding, inverted-index Jaccard, or SimHash radius
joins. Turning pairs into dedup GROUPS (keep one canonical doc per
cluster, drop the rest) is a connected-components problem: near-dup is
not transitive, but dedup policy treats it as if it were (the standard
choice in C4/RefinedWeb/SlimPajama-style pipelines).

Reference behavior analogue: the reference dedups by exact content hash
only (`/root/reference/app/utils/file_utils.py:23-26`, one doc == one
group); this generalizes that to similarity clusters at corpus scale.

Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii, "Connected Components in MapReduce and
Beyond", SoCC 2014). Both steps are pure DataFrame ops:

- large-star: every node connects its STRICTLY LARGER neighbors to the
  minimum of its neighborhood (including itself),
- small-star: every node connects its smaller-or-equal neighbors (and
  itself) to that minimum.

Each step is one groupBy-min shuffle plus one equi-join — never a
``collect_list`` of neighborhoods, so a hot node (a template document
colliding with millions) costs a map-side-combined min aggregation, not
a giant array in one task. The paper proves O(log^2 n) rounds worst
case (O(log n) in practice); near-dup clusters are shallow, so 2-4
rounds converge. Per round the edge set only shrinks or re-points; the
fixed point is a star forest: every non-root points at its component's
minimum id. Lineage is cut with ``localCheckpoint`` each round so the
plan does not grow with iterations (the classic iterative-algorithm trap
on Spark).

At 10^10 edges: every round is shuffle-bounded by the live edge count,
which decays geometrically; nothing transits the driver but the one-row
convergence probe per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """(u,v) edges -> for each node, larger neighbors point at the min.

    Emits (v, m) for every undirected neighbor v > u, where
    m = min(N(u) + {u}). All output edges point larger -> smaller.
    """
    und = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = und.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )
    return (
        und.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Directed (u,v), u > v -> u and its smaller neighbors point at min."""
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    j = e.join(mins, "u")
    moved = j.select(
        F.col("v").alias("u"), F.col("m").alias("v")
    ).where(F.col("u") != F.col("v"))
    self_edge = mins.select(F.col("u"), F.col("m").alias("v"))
    return moved.union(self_edge).where(F.col("u") != F.col("v")).distinct()


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 24,
) -> DataFrame:
    """(node, component_id) for every node appearing in ``pairs``.

    ``component_id`` is the MINIMUM id in the node's connected component
    (total order of the id column's type: lexicographic for strings),
    the deterministic canonical-representative convention. Nodes include
    their own component roots. Raises if the star-forest fixed point is
    not reached within ``max_rounds`` (2-4 rounds in practice).
    """
    e = (
        pairs.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        e2 = _small_star(_large_star(e)).localCheckpoint()
        converged = (
            e2.exceptAll(e).isEmpty() and e.exceptAll(e2).isEmpty()
        )
        e = e2
        if converged:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    # star forest: non-roots point at the root; roots label themselves
    non_roots = e.select(F.col("u").alias("node"), F.col("v").alias("component_id"))
    roots = e.select(F.col("v").alias("node")).distinct().withColumn(
        "component_id", F.col("node")
    )
    return non_roots.union(roots).distinct()


def dedup_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Label every row of ``df`` with its near-dup cluster.

    Returns (id_col, component_id, is_canonical, n_members): singletons
    (no pair) are their own component of size 1; ``is_canonical`` marks
    the min-id representative a keep-one dedup pass would retain. The
    join back to ``df`` is on the id column — component labels are tiny
    relative to the corpus, so AQE broadcast-joins them in practice.
    """
    comp = connected_components(pairs, src=src, dst=dst)
    labeled = (
        df.select(F.col(id_col))
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .withColumn(
            "component_id", F.coalesce("component_id", F.col(id_col))
        )
    )
    sizes = labeled.groupBy("component_id").agg(
        F.count("*").alias("n_members")
    )
    return (
        labeled.join(sizes, "component_id")
        .select(
            id_col,
            "component_id",
            (F.col(id_col) == F.col("component_id")).alias("is_canonical"),
            "n_members",
        )
    )
