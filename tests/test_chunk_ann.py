"""Chunk-grain retrieval on the standing IVF index (r13 verdict ask #3):
doc_chunk_windows passages embedded through the injectable encoder seam
(operators/text.chunk_vectors — the multimodal embed_media pattern) and
searched via the shared train_centroids/_assign/ivf_topk family. Gates
mirror tests/test_multimodal_sinks.py's media gates: recall vs the exact
brute-force cosine baseline, and maintained-index ≡ inline-assignment
equality through streaming/ann.maintain_ivf_index."""

from pyspark.sql import functions as F

from snowflake_to_bq_pipeline_spark.catalog import load_table
from snowflake_to_bq_pipeline_spark.operators import similarity
from snowflake_to_bq_pipeline_spark.operators import text as text_ops


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_chunk_vectors_contract(spark, sf_dir):
    """vec_id packs (doc_id, chunk_idx) invertibly and uniquely; the
    stub encoder emits unit-norm vectors; chunk rows match the chunking
    report's row count (same explode, plus text)."""
    docs = _docs(spark, sf_dir).limit(50)
    v = text_ops.chunk_vectors(docs)
    base = text_ops.CHUNK_VEC_BASE
    rows = v.collect()
    assert rows
    n_report = text_ops.chunk_windows(docs).count()
    assert len(rows) == n_report
    assert len({r.vec_id for r in rows}) == len(rows)
    doc_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    for r in rows[:200]:
        assert r.vec_id // base in doc_ids
        assert 0 <= r.vec_id % base < base
        norm = sum(x * x for x in r.embedding) ** 0.5
        assert abs(norm - 1.0) < 1e-9


def test_chunk_vectors_encoder_seam_injectable(spark, sf_dir):
    """A swapped encoder flows through unchanged — the production seam
    (every downstream ANN plan is encoder-agnostic)."""
    docs = _docs(spark, sf_dir).limit(10)

    def two_dim(content: bytes, dims: int) -> list[float]:
        return [float(len(content)), 1.0] + [0.0] * (dims - 2)

    got = text_ops.chunk_vectors(docs, dims=4, encoder=two_dim).collect()
    assert got and all(len(r.embedding) == 4 for r in got)
    assert all(r.embedding[1] == 1.0 and r.embedding[2] == 0.0 for r in got)


def test_chunk_ann_recall_vs_brute_force(spark, sf_dir):
    """Chunk IVF search must clear the same recall floor as the document
    and media IVF paths, against the exact brute-force cosine top-k on
    the same chunk vector table."""
    docs = _docs(spark, sf_dir)
    v = text_ops.chunk_vectors(docs)
    base = text_ops.CHUNK_VEC_BASE
    q_pred = (F.col("vec_id") % base == 0) & (F.col("vec_id") < 10 * base)
    k = 5
    brute = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(v, q_pred, k=k).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_topk(
            v, q_pred, k=k, n_centroids=16, n_probe=6
        ).collect()
    }
    assert brute, "queries must have neighbors"
    recall = len(ivf & brute) / len(brute)
    assert recall >= 0.8, f"chunk IVF recall too low: {recall}"
    per_q = {}
    for q, _ in ivf:
        per_q[q] = per_q.get(q, 0) + 1
    assert all(c == k for c in per_q.values())


def test_chunk_ann_rides_standing_index_and_streaming_twin(spark, sf_dir, tmp_path):
    """ONE maintenance path for chunks too: the chunk vector table flows
    through streaming/ann.maintain_ivf_index unchanged, the drained sink
    equals the batch assignment twin, and ivf_topk over the
    stream-maintained standing index equals the inline assignment."""
    from snowflake_to_bq_pipeline_spark.streaming import ann as sann

    docs = _docs(spark, sf_dir).limit(120)
    v = text_ops.chunk_vectors(docs)
    ve = v.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    rows = [
        (int(r["cent_id"]), list(r["ce"]))
        for r in similarity.train_centroids(ve, 8, 3).collect()
    ]
    cents = spark.createDataFrame(rows, "cent_id long, ce array<double>")

    batch_rows = {
        (r["vec_id"], r["cent_id"])
        for r in sann.assign_vectors_batch(v, cents).collect()
    }
    src = str(tmp_path / "chunk_vec_src")
    v.repartition(6).write.mode("overwrite").parquet(src)
    sink = str(tmp_path / "chunk_ivf_sink")
    q = sann.maintain_ivf_index(
        sann.read_vectors_stream(spark, src),
        cents,
        sink,
        str(tmp_path / "chunk_ivf_ckpt"),
    )
    q.awaitTermination(180)
    assert q.exception() is None
    got = {
        (r["vec_id"], r["cent_id"])
        for r in spark.read.parquet(sink).collect()
    }
    assert got == batch_rows, "chunk stream must drain-equal the batch twin"

    maintained = (
        spark.read.parquet(sink)
        .join(ve, "vec_id")
        .select("vec_id", "cent_id", "e")
    )
    base = text_ops.CHUNK_VEC_BASE
    q_pred = (F.col("vec_id") % base == 0) & (F.col("vec_id") < 8 * base)
    via_index = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in similarity.ivf_topk(
            v, q_pred, k=3, n_probe=3, centroids=cents, assigned=maintained
        ).collect()
    }
    direct = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in similarity.ivf_topk(
            v, q_pred, k=3, n_probe=3, centroids=cents
        ).collect()
    }
    assert via_index == direct, (
        "search over the stream-maintained standing index must equal the "
        "inline assignment pass"
    )


def test_chunk_ann_registry_query_shape(spark, sf_dir):
    """The registered query returns (doc, passage)-grain results: ids
    unpack consistently, ranks are 1..k per query, self-chunk excluded."""
    from snowflake_to_bq_pipeline_spark.registry import chunk_ann_topk_q

    base = text_ops.CHUNK_VEC_BASE
    rows = chunk_ann_topk_q(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.query_doc == r.query_id // base
        assert r.neighbor_doc == r.neighbor_id // base
        assert r.neighbor_chunk == r.neighbor_id % base
        assert r.neighbor_id != r.query_id
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.rank)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_empty_content_embeds_to_unit_vector_never_nan(spark):
    """Self-review fix: empty chunk/blob content must embed to a unit
    vector, and the Arrow candidate scorer must never emit NaN — a NaN
    cosine would rank ABOVE every real neighbor under the descending
    sort."""
    import math

    from snowflake_to_bq_pipeline_spark.multimodal.media import _fake_embed
    from snowflake_to_bq_pipeline_spark.operators import similarity
    from snowflake_to_bq_pipeline_spark.operators.text import (
        _default_chunk_encoder,
    )

    for enc in (_default_chunk_encoder, _fake_embed):
        v = enc(b"", 8)
        assert v[0] == 1.0 and sum(x * x for x in v) == 1.0
    # zero-norm vectors (a hand-built embedding table can still carry
    # them) score 0.0, not NaN, through the Arrow scorer
    cand = spark.createDataFrame(
        [(1, [0.0, 0.0], 2, [1.0, 0.0]), (1, [1.0, 0.0], 3, [0.0, 0.0])],
        "query_id long, qe array<double>, vec_id long, e array<double>",
    )
    rows = similarity._ivf_score_candidates(cand).collect()
    assert {r["neighbor_id"]: r["cosine"] for r in rows} == {2: 0.0, 3: 0.0}
    assert not any(math.isnan(r["cosine"]) for r in rows)


def test_default_encoder_batch_equals_scalar(spark, sf_dir):
    """The r15 numpy fast path for the DEFAULT chunk encoder must be
    bitwise-identical to the per-row Python encoder (counts are exact
    integers, the norm a sum of exact integer squares, the divide/sqrt
    the same IEEE ops) — including the empty-content unit-vector rule."""
    docs = load_table(spark, sf_dir, "documents").limit(40)
    docs = docs.unionByName(
        spark.createDataFrame(
            [(10_000_001, "", "s", None, None)],
            docs.schema,
        )
    )
    fast = {
        r["vec_id"]: list(r["embedding"])
        for r in text_ops.chunk_vectors(docs).collect()
    }
    slow = {
        r["vec_id"]: list(r["embedding"])
        for r in text_ops.chunk_vectors(
            docs, encoder=text_ops._default_chunk_encoder
        ).collect()
    }
    assert fast == slow and fast
