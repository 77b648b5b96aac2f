"""Connected components for duplicate-cluster resolution.

Near-dup pair generators (``neardup``/``similarity``) emit edges; turning
edges into KEEP/DROP decisions needs the transitive closure: if A~B and
B~C, all three are one cluster even when A~C was never scored. The
reference resolves dup groups per key before deleting
(snowflake_bq_deduplication_sync.py:214 keeps one row per duplicate key);
this operator is the corpus-scale generalization for fuzzy keys.

Scale posture: min-label propagation with pointer jumping — per round,
every node takes the min label over its neighborhood (one shuffle on the
edge key), then labels are compressed through one extra self-join
(label := label(label)), doubling the collapsed distance per round. Near-
dup clusters have tiny diameters, so ``ITERS`` rounds (distance ≥ 2^ITERS)
converge with huge margin; the converged labeling is the exact component
minimum — engine-independent and therefore oracle-checkable. Lineage is
cut per round with ``localCheckpoint`` (exponential plan growth
otherwise); on a real cluster use a reliable checkpoint dir instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ITERS = 6

#: Extra verified rounds attempted when the blind ``ITERS`` rounds have not
#: reached a fixed point (pathological diameters); each costs one count job.
MAX_EXTRA_ROUNDS = 12


def _propagate(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """One min-label round: neighborhood min, then pointer jump."""
    nbr_min = (
        edges.join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(F.col("dst").alias("node"))
        .agg(F.min("label").alias("__nbr"))
    )
    labels = labels.join(nbr_min, "node", "left").select(
        "node",
        F.least(
            F.col("label"), F.coalesce(F.col("__nbr"), F.col("label"))
        ).alias("label"),
    )
    jump = labels.select(
        F.col("node").alias("__jnode"), F.col("label").alias("__jlabel")
    )
    return (
        labels.join(jump, labels.label == F.col("__jnode"), "left")
        .select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("__jlabel"), F.col("label"))
            ).alias("label"),
        )
        .localCheckpoint(eager=False)
    )


def connected_components(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    iters: int = ITERS,
) -> DataFrame:
    """(node, label) with label = min node id of the component.

    ``pairs`` is an undirected edge list (one row per pair, either
    orientation); both directions are materialized internally.

    Convergence is VERIFIED, not assumed: after the ``iters`` blind rounds
    (pointer jumping covers diameter 2^iters), one extra propagation must
    be a fixed point — if any label still moves, additional verified
    rounds run (up to ``MAX_EXTRA_ROUNDS``) and a component that still
    hasn't settled raises instead of silently returning split clusters.
    The check counts over the (tiny) label set, not the raw corpus.
    """
    fwd = pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    edges = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    for _ in range(iters):
        labels = _propagate(edges, labels)
    for _ in range(MAX_EXTRA_ROUNDS):
        nxt = _propagate(edges, labels)
        moved = (
            nxt.withColumnRenamed("label", "__new")
            .join(labels, "node")
            .filter(F.col("__new") != F.col("label"))
            .count()
        )
        if moved == 0:
            return labels
        labels = nxt
    raise RuntimeError(
        "connected_components did not converge after "
        f"{iters} + {MAX_EXTRA_ROUNDS} rounds — component diameter exceeds "
        "the pointer-jumping reach; raise `iters` for this graph"
    )


def dup_clusters(pairs: DataFrame) -> DataFrame:
    """Cluster assignment for every doc that appears in a dup pair.

    Output: (doc_id, canonical_id, cluster_size, is_canonical) — the
    KEEP/DROP worklist: keep each cluster's canonical (min id) doc, drop
    the rest.
    """
    labels = connected_components(pairs)
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
    return labels.join(sizes, "label").select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("canonical_id"),
        "cluster_size",
        (F.col("node") == F.col("label")).alias("is_canonical"),
    )
