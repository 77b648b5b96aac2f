"""Connected-components correctness: transitive closure over dup pairs,
including chains far longer than one propagation hop."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_to_bq_pipeline_spark.operators import graph


def _labels(df):
    return {r.node: r.label for r in df.collect()}


def test_chain_collapses_to_one_component(spark):
    # 0-1-2-...-19: diameter 19 exceeds plain per-round propagation with
    # 6 rounds; pointer jumping must cover it.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(19)], "doc_a long, doc_b long"
    )
    labels = _labels(graph.connected_components(pairs))
    assert set(labels) == set(range(20))
    assert set(labels.values()) == {0}


def test_disjoint_components_stay_disjoint(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)],
        "doc_a long, doc_b long",
    )
    labels = _labels(graph.connected_components(pairs))
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_dup_clusters_marks_canonicals(spark):
    pairs = spark.createDataFrame(
        [(5, 3), (3, 9), (100, 101)], "doc_a long, doc_b long"
    )
    rows = {r.doc_id: r for r in graph.dup_clusters(pairs).collect()}
    assert rows[3].canonical_id == 3 and rows[3].is_canonical
    assert rows[5].canonical_id == 3 and not rows[5].is_canonical
    assert rows[9].cluster_size == 3
    assert rows[100].canonical_id == 100 and rows[101].cluster_size == 2


def test_edge_direction_irrelevant(spark):
    a = spark.createDataFrame([(7, 2), (2, 4)], "doc_a long, doc_b long")
    b = a.select(
        F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
    )
    assert _labels(graph.connected_components(a)) == _labels(
        graph.connected_components(b)
    )


def test_reliable_checkpoint_used_when_dir_set(spark, tmp_path, monkeypatch):
    """With a checkpoint dir configured, lineage cuts must go through the
    fault-tolerant reliable checkpoint, not executor-local blocks.
    (Forces the DISTRIBUTED path — the r15 small-graph driver fast path
    never cuts lineage because it runs no iterative jobs at all.)"""
    monkeypatch.setattr(graph, "SMALL_CC_MAX_EDGES", 0)
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    ckpt = str(tmp_path / "ckpt")
    sc.setCheckpointDir(ckpt)
    try:
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
        )
        labels = _labels(graph.connected_components(pairs))
        assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
        import glob as _glob
        assert _glob.glob(ckpt + "/*/*"), "no reliable checkpoint written"
    finally:
        # Other tests in the shared session expect the local fallback.
        setter = getattr(sc._jsc.sc(), "checkpointDir_$eq")
        setter(sc._jvm.scala.Option.empty())
        assert sc.getCheckpointDir() is None


def test_small_graph_fast_path_equals_distributed(spark, monkeypatch):
    """The r15 driver union-find fast path must produce the identical
    exact min-label components as the distributed pointer-jumping
    resolve — same (node, label) set, same schema."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(19)]
        + [(100, 101), (101, 102), (102, 100), (7, 3), (500, 500)],
        "doc_a long, doc_b long",
    )
    fast = graph.connected_components(pairs)
    assert _labels(fast) and fast.schema["node"].dataType.typeName() == "long"
    monkeypatch.setattr(graph, "SMALL_CC_MAX_EDGES", 0)
    dist = graph.connected_components(pairs)
    assert _labels(fast) == _labels(dist)
