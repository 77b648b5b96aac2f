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
minimum — engine-independent and therefore oracle-checkable. Lineage must
be cut per round (exponential plan growth otherwise); :func:`_cut_lineage`
picks RELIABLE checkpointing automatically whenever the session has a
checkpoint dir configured (``spark.sparkContext.setCheckpointDir``) —
``localCheckpoint`` blocks are executor-local and one lost executor on a
1000-node run kills the whole job's lineage — and falls back to
``localCheckpoint`` only when no dir is set (local/dev sessions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cut_lineage(df: DataFrame) -> DataFrame:
    """Truncate ``df``'s lineage: reliable checkpoint when the session has
    a checkpoint dir (fault-tolerant — required on real clusters), else
    ``localCheckpoint`` (fast, executor-local; dev/local only).

    Reliable checkpoints are eager (they materialize to the checkpoint
    dir); the local fallback stays lazy so small iterative runs don't pay
    extra jobs.
    """
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=False)

#: Blind warm-start rounds. Correctness does NOT depend on this constant —
#: the verified loop below propagates until a checked fixed point — so it
#: only tunes job count: pointer jumping covers diameter 2^ITERS before
#: the first (propagate + count) verification round runs. Near-dup
#: clusters are almost always star-shaped around a template (diameter
#: <= 2), which ONE blind round plus the verified fixed-point round
#: already covers; deeper graphs just pay extra verified rounds.
#: Measured at sf0.1: 3 -> 2 saved ~0.7s, 2 -> 1 another ~0.7-2s, each
#: with an identical verified result.
ITERS = 1

#: Extra verified rounds attempted when the blind ``ITERS`` rounds have not
#: reached a fixed point (pathological diameters); each costs one count job.
MAX_EXTRA_ROUNDS = 15

#: Small-graph fast path (r15): near-dup pair worklists are tiny relative
#: to the corpus (the pair GENERATORS bound them), but the distributed
#: resolve still costs 4-6 Spark jobs (propagate joins + verified-round
#: counts + lineage cuts) — ~1-3s of pure dispatch on a worklist of a few
#: hundred edges. Up to this many edges, ONE bounded collect + a driver
#: union-find computes the identical exact min-label components
#: (O(edges α(n)) time, O(nodes) driver memory — ~100k longs at the cap,
#: within the repo's documented bounded-driver-state contracts). Larger
#: graphs take the distributed path unchanged; the probe is one
#: limit-pushed collect, so at scale it reads the first cap+1 edges and
#: stops.
SMALL_CC_MAX_EDGES = 100_000


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
    return _cut_lineage(
        labels.join(jump, labels.label == F.col("__jnode"), "left").select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("__jlabel"), F.col("label"))
            ).alias("label"),
        )
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
    # Small-graph fast path: exact same labeling, one job instead of 4-6.
    head = fwd.limit(SMALL_CC_MAX_EDGES + 1).collect()
    if len(head) <= SMALL_CC_MAX_EDGES:
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for row in head:
            a, b = row["src"], row["dst"]
            for n in (a, b):
                if n not in parent:
                    parent[n] = n
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        roots: dict = {}
        for n in parent:
            r = find(n)
            m = roots.get(r)
            if m is None or n < m:
                roots[r] = n
        rows = [(n, roots[find(n)]) for n in parent]
        from pyspark.sql import types as T

        dt = pairs.schema[src_col].dataType
        return pairs.sparkSession.createDataFrame(
            rows,
            T.StructType(
                [
                    T.StructField("node", dt, False),
                    T.StructField("label", dt, False),
                ]
            ),
        )
    edges = _cut_lineage(
        fwd.union(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    for _ in range(iters):
        labels = _propagate(edges, labels)
    for _ in range(MAX_EXTRA_ROUNDS):
        # Verified round: neighborhood-min only. A fixed point of THIS
        # round alone proves convergence — no label moving across any edge
        # means labels are constant per component, hence the component min
        # (the pointer jump is pure acceleration, not needed for the
        # proof). One join + one count job over the tiny label set.
        nbr_min = (
            edges.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("__nbr"))
        )
        nxt = _cut_lineage(
            labels.withColumnRenamed("label", "__old")
            .join(nbr_min, "node", "left")
            .select(
                "node",
                "__old",
                F.least(
                    F.col("__old"), F.coalesce(F.col("__nbr"), F.col("__old"))
                ).alias("label"),
            )
        )
        moved = nxt.filter(F.col("label") != F.col("__old")).count()
        if moved == 0:
            return labels
        labels = _propagate(edges, nxt.select("node", "label"))
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
