"""Multimodal plumbing and sink behaviors."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from snowflake_to_bq_pipeline_spark.catalog import load_table
from snowflake_to_bq_pipeline_spark.multimodal import media
from snowflake_to_bq_pipeline_spark.multimodal.media import (
    resize_images,
    sample_frames,
    synthetic_media,
)
from snowflake_to_bq_pipeline_spark.sinks import writers


def test_media_feature_extraction(spark):
    m = media.synthetic_media(spark, n=50)
    feats = media.extract_features(m)
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert r.n_bytes == 64  # sha2-256 hex string as fake payload
        assert len(r.checksum) == 32
        assert 0 <= r.feat_mean <= 255
        assert 0 <= r.feat_max <= 255
    # Determinism: same input → same features.
    again = {(r.media_id, r.checksum, r.feat_mean) for r in feats.collect()}
    assert {(r.media_id, r.checksum, r.feat_mean) for r in rows} == again


def test_repartition_for_media_bounds_partitions(spark):
    m = media.synthetic_media(spark, n=100)
    out = media.repartition_for_media(m, target_bytes_per_partition=1024)
    assert out.rdd.getNumPartitions() >= 3
    assert out.count() == 100


def _upper_decode(content: bytes) -> list[int]:
    """Injected stand-in codec for the seam test (module-level: the
    callback ships to executors inside the mapInPandas closure)."""
    return [b ^ 0xFF for b in content[:16]]


def test_codec_seam_injects_custom_decoder(spark):
    """extract_features' decode seam: a user codec must drive the feature
    values while all Spark-side plumbing (schema, batching) is unchanged."""
    m = media.synthetic_media(spark, n=20)
    rows = {r.media_id: r for r in media.extract_features(m, decode=_upper_decode).collect()}
    base = {r.media_id: r for r in media.extract_features(m).collect()}
    assert len(rows) == 20
    for mid, r in rows.items():
        # same plumbing outputs (bytes/checksum), different codec outputs
        assert r.n_bytes == base[mid].n_bytes
        assert r.checksum == base[mid].checksum
        assert 0 <= r.feat_max <= 255
    # the injected codec inverts bytes, so features must differ from the
    # default codec's on at least one media row
    assert any(rows[k].feat_mean != base[k].feat_mean for k in rows)


def test_media_byte_budget_partitioner_bounds_skewed_tasks(spark):
    """One blob 1000x the median must NOT drag a target's worth of other
    rows into its decode task: per-task bytes stay < 2*target + max_blob
    and the giant shares its task with < target bytes of small rows."""
    target = 64 * 1024
    small_sz, giant_sz = 64, 64 * 1000  # 64 KB giant vs 64 B rows
    small = spark.range(500).select(
        F.col("id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.lit("application/octet-stream").alias("mime_type"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("content"),
        F.lit(8).cast("int").alias("width"),
        F.lit(8).cast("int").alias("height"),
        F.lit(0).cast("int").alias("duration_ms"),
    )
    giant = spark.createDataFrame(
        [(250_000, "video", "application/octet-stream",
          bytearray(b"x" * giant_sz), 8, 8, 0)],
        small.schema,
    )
    m = small.unionByName(giant)
    out = media.repartition_for_media(m, target_bytes_per_partition=target)

    def part_stats(it):
        tot, gi, n = 0, 0, 0
        for row in it:
            b = len(row.content) if row.content is not None else 0
            tot += b
            n += 1
            if b >= giant_sz:
                gi += 1
        yield (tot, gi, n)

    stats = out.rdd.mapPartitions(part_stats).collect()
    assert sum(n for _t, _g, n in stats) == 501
    max_bytes = max(t for t, _g, _n in stats)
    assert max_bytes < 2 * target + giant_sz, stats
    (giant_tot,) = [t for t, g, _n in stats if g]
    # the giant's task carries less than one target of co-located rows
    assert giant_tot - giant_sz < target, giant_tot


def test_merge_into_path_roundtrip(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    target = str(tmp_path / "orders_sync")
    base = orders.filter(F.col("o_orderkey") % 2 == 0)
    writers.write_snapshot(base, target)

    updates = orders.filter(F.col("o_orderkey") % 4 != 0).withColumn(
        "o_orderpriority", F.lit("UPDATED")
    )
    writers.merge_into_path(spark, updates, target, ["o_orderkey"])

    merged = spark.read.parquet(target)
    n_base = base.count()
    n_upd = updates.count()
    n_overlap = base.join(updates, "o_orderkey", "left_semi").count()
    assert merged.count() == n_base + n_upd - n_overlap
    # Updated keys carry the update's payload.
    assert (
        merged.filter(F.col("o_orderkey") % 4 == 2)
        .filter(F.col("o_orderpriority") != "UPDATED")
        .count()
        == 0
    )
    # Keys unique after merge.
    assert merged.select("o_orderkey").distinct().count() == merged.count()


def test_merge_into_path_delete_absent_keys(spark, sf_dir, tmp_path):
    """Full reconciliation: orphans deleted, missing inserted, matched
    updated (ref: snowflake_bq_deduplication_sync.py:270 posture)."""
    orders = load_table(spark, sf_dir, "orders")
    target = str(tmp_path / "orders_recon")
    base = orders.filter(F.col("o_orderkey") % 2 == 0)  # evens
    writers.write_snapshot(base, target)

    source = orders.filter(F.col("o_orderkey") % 3 == 0).withColumn(
        "o_orderpriority", F.lit("RECONCILED")
    )  # multiples of 3
    writers.merge_into_path(
        spark, source, target, ["o_orderkey"], delete_absent_keys=True
    )

    merged = spark.read.parquet(target)
    # Target keyspace == source keyspace: orphans (evens not div by 3) gone.
    assert merged.count() == source.count()
    assert merged.filter(F.col("o_orderkey") % 3 != 0).count() == 0
    # Missing keys (odd multiples of 3) inserted, and every row carries the
    # source payload.
    assert merged.filter(F.col("o_orderpriority") != "RECONCILED").count() == 0
    assert merged.select("o_orderkey").distinct().count() == merged.count()


def test_merge_into_path_recovers_dangling_swap(spark, sf_dir, tmp_path):
    """A crash between the two swap renames must not lose merged history."""
    orders = load_table(spark, sf_dir, "orders")
    target = str(tmp_path / "orders_crash")
    base = orders.filter(F.col("o_orderkey") <= 1000)
    writers.write_snapshot(base, target)

    # Simulate the crash window: target renamed aside, new data never landed.
    os.rename(target, target + ".old.deadbeef")
    updates = orders.filter(F.col("o_orderkey") <= 10).withColumn(
        "o_orderpriority", F.lit("REPLAYED")
    )
    writers.merge_into_path(spark, updates, target, ["o_orderkey"])

    merged = spark.read.parquet(target)
    # Without recovery this would be just the replayed batch (10 rows).
    assert merged.count() == base.count()
    assert not os.path.exists(target + ".old.deadbeef")


def test_write_partitioned_dynamic_overwrite(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    target = str(tmp_path / "events_part")
    with_day = events.withColumn("day", F.to_date("ts"))
    writers.write_partitioned(with_day, target, ["day"])
    n_all = events.count()
    assert spark.read.parquet(target).count() == n_all

    # Overwriting ONE day's partition leaves the others untouched.
    one_day = with_day.filter(F.col("day") == F.lit("2024-01-05").cast("date"))
    n_day = one_day.count()
    writers.write_partitioned(one_day.limit(max(n_day - 1, 1)), target, ["day"])
    total_after = spark.read.parquet(target).count()
    assert total_after == n_all - n_day + max(n_day - 1, 1)


def test_delta_merge_env_gate(spark, sf_dir, tmp_path):
    """Without delta-spark the Delta sink must refuse loudly (and point at
    the parquet fallback), never silently degrade."""
    import pytest

    from snowflake_to_bq_pipeline_spark.catalog import load_table
    from snowflake_to_bq_pipeline_spark.sinks import writers

    orders = load_table(spark, sf_dir, "orders").limit(10)
    if writers.delta_available():
        pytest.skip("delta-spark present; gate not exercised")
    with pytest.raises(RuntimeError, match="merge_into_path"):
        writers.merge_into_delta(
            spark, orders, str(tmp_path / "t"), ["o_orderkey"]
        )


def _simulate_delta_merge(base, updates, key_cols, order_col):
    """DataFrame simulation of Delta's MERGE with whenMatchedUpdateAll /
    whenNotMatchedInsertAll, driven by the EXACT condition strings
    merge_into_delta passes to delta-spark (writers.delta_merge_condition
    / delta_matched_condition) — so the contract is tested even though
    the sandbox ships without the package."""
    from snowflake_to_bq_pipeline_spark.sinks.writers import (
        delta_matched_condition,
        delta_merge_condition,
    )

    t, u = base.alias("t"), updates.alias("u")
    joined = t.join(u, F.expr(delta_merge_condition(key_cols)), "full_outer")
    matched = delta_matched_condition(order_col)
    take_update = F.col(f"u.{key_cols[0]}").isNotNull() & (
        F.col(f"t.{key_cols[0]}").isNull()
        | (F.expr(matched) if matched is not None else F.lit(True))
    )
    return joined.select(
        *[
            F.when(take_update, F.col(f"u.{c}"))
            .otherwise(F.col(f"t.{c}"))
            .alias(c)
            for c in base.columns
        ]
    )


def test_delta_merge_contract_matches_path_merge(spark, tmp_path):
    """merge_into_delta's MERGE condition/actions and merge_into_path must
    produce identical tables from the same inputs (newer-wins ordering,
    distinct order values — the documented cross-backend contract)."""
    schema = "k long, ts long, payload string"
    base = spark.createDataFrame(
        [(k, 10 * k, f"base{k}") for k in range(1, 9)], schema
    )
    # keys 5-6: STALE updates (must lose); 7-8: newer (must win);
    # 9-12: unmatched (must insert)
    updates = spark.createDataFrame(
        [(5, 1, "stale5"), (6, 2, "stale6"),
         (7, 1000, "new7"), (8, 1001, "new8"),
         (9, 90, "ins9"), (10, 100, "ins10"),
         (11, 110, "ins11"), (12, 120, "ins12")],
        schema,
    )

    target = str(tmp_path / "t")
    writers.write_snapshot(base, target)
    writers.merge_into_path(spark, updates, target, ["k"], order_col="ts")
    via_path = sorted(
        (r.k, r.ts, r.payload) for r in spark.read.parquet(target).collect()
    )

    via_delta_contract = sorted(
        (r.k, r.ts, r.payload)
        for r in _simulate_delta_merge(base, updates, ["k"], "ts").collect()
    )
    assert via_path == via_delta_contract
    # spot-check the interesting rows once, so a symmetric bug in both
    # backends can't hide behind the equality
    d = {k: (ts, p) for k, ts, p in via_path}
    assert d[5] == (50, "base5") and d[6] == (60, "base6")
    assert d[7] == (1000, "new7") and d[8] == (1001, "new8")
    assert d[12] == (120, "ins12") and len(d) == 12

    if writers.delta_available():  # pragma: no cover - sandbox lacks delta
        dt = str(tmp_path / "dt")
        writers.merge_into_delta(spark, base, dt, ["k"], order_col="ts")
        writers.merge_into_delta(spark, updates, dt, ["k"], order_col="ts")
        real = sorted(
            (r.k, r.ts, r.payload)
            for r in spark.read.format("delta").load(dt).collect()
        )
        assert real == via_path


def test_resize_images_fixed_shape_and_passthrough(spark):
    media = synthetic_media(spark, 30)
    out = resize_images(media, width=8, height=8).collect()
    assert len(out) == 30
    for r in out:
        if r["media_type"] == "image":
            assert r["width"] == 8 and r["height"] == 8
            assert len(bytes(r["content"])) == 64
        else:
            # non-image rows untouched
            assert r["width"] == 64


def test_sample_frames_period_and_determinism(spark):
    media = synthetic_media(spark, 30)
    frames = sample_frames(media, every_ms=250).collect()
    vids = [r for r in synthetic_media(spark, 30).collect() if r["media_type"] == "video"]
    # duration 1000ms, every 250ms -> 4 frames per video row
    assert len(frames) == 4 * len(vids)
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    for rows in by_id.values():
        idxs = sorted(r["frame_idx"] for r in rows)
        assert idxs == [0, 1, 2, 3]
        assert sorted(r["frame_ts_ms"] for r in rows) == [0, 250, 500, 750]
    # deterministic re-run
    again = sample_frames(synthetic_media(spark, 30), every_ms=250).collect()
    assert sorted(map(tuple, frames)) == sorted(map(tuple, again))


def test_write_clustered_prunes_file_ranges(spark, sf_dir, tmp_path):
    import pyarrow.parquet as pq

    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_clustered")
    writers.write_clustered(orders, path, ["o_orderdate"], num_files=6)
    # Per-file o_orderdate ranges must be pairwise disjoint (footer
    # min/max stats prune whole files for date-filtered scans).
    ranges = []
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "o_orderdate"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) >= 2
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, (hi1, lo2)
    # Round-trip intact.
    assert spark.read.parquet(path).count() == orders.count()


def test_compact_path_reduces_files_preserves_data(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_small_files")
    orders.repartition(40).write.parquet(path)
    before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert before >= 40
    rows_before = sorted(map(tuple, spark.read.parquet(path).collect()))
    n_after = writers.compact_path(spark, path)
    assert n_after < before
    rows_after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert rows_before == rows_after


def test_expire_snapshots_keeps_newest(spark, sf_dir, tmp_path):
    import pytest as _pytest

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "snap_day", F.date_format("o_orderdate", "yyyy-MM-dd")
    )
    # Restrict to a few distinct days for a small partition layout.
    days = [r["snap_day"] for r in
            orders.select("snap_day").distinct().orderBy("snap_day").limit(5).collect()]
    sub = orders.filter(F.col("snap_day").isin(days))
    path = str(tmp_path / "snaps")
    writers.write_partitioned(sub, path, ["snap_day"])
    deleted = writers.expire_snapshots(spark, path, "snap_day", keep_n=2)
    assert deleted == days[:-2]
    left = sorted(
        d.split("=", 1)[1] for d in os.listdir(path) if d.startswith("snap_day=")
    )
    assert left == days[-2:]
    # Surviving data readable and complete.
    expect = sub.filter(F.col("snap_day").isin(days[-2:])).count()
    assert spark.read.parquet(path).count() == expect
    with _pytest.raises(ValueError):
        writers.expire_snapshots(spark, path, "snap_day", keep_n=0)


def test_embed_media_near_dup_pairs(spark):
    # Build media where pairs (i, i+1000) share near-identical content
    # (one trailing byte differs) and everything else is unrelated.
    base = media.synthetic_media(spark, 30).select(
        "media_id", "media_type", "mime_type", "content",
        "width", "height", "duration_ms",
    )
    near = base.select(
        (F.col("media_id") + 1000).alias("media_id"),
        "media_type",
        "mime_type",
        F.concat(F.col("content"), F.lit(b"\x01")).alias("content"),
        "width", "height", "duration_ms",
    )
    both = base.unionByName(near)
    pairs = media.media_neardup_pairs(both, threshold=0.98).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    # Every (i, i+1000) near-dup must surface; LSH with 8 tables at
    # cosine ~1 misses with probability ~0.
    expected = {(i, i + 1000) for i in range(30)}
    assert expected <= found, expected - found
    # And no unrelated pair sneaks past exact verification.
    assert all((a, b) in expected for a, b in found), found - expected
    for r in pairs:
        assert r.cosine >= 0.98


def test_embed_media_vectors_are_unit_norm(spark):
    m = media.synthetic_media(spark, 12)
    emb = media.embed_media(m).collect()
    assert len(emb) == 12
    for r in emb:
        assert len(r.embedding) == media.EMBED_DIMS
        assert abs(sum(x * x for x in r.embedding) - 1.0) < 1e-9


def test_write_training_shards_one_file_per_shard(spark, sf_dir, tmp_path):
    import glob as _glob

    from snowflake_to_bq_pipeline_spark.operators import curation
    from snowflake_to_bq_pipeline_spark.catalog import load_table
    from snowflake_to_bq_pipeline_spark.sinks import writers
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.array_size(F.split(F.col("text"), " "))
    assigned = curation.shard_assignment(docs, n_tokens, n_shards=4)
    out = str(tmp_path / "shards")
    writers.write_training_shards(assigned, out, order_col="doc_id")

    shard_dirs = sorted(_glob.glob(out + "/shard_id=*"))
    assert len(shard_dirs) == 4
    for d in shard_dirs:
        files = [f for f in _glob.glob(d + "/*.parquet")]
        assert len(files) == 1, f"{d} has {len(files)} files"
    back = spark.read.parquet(out)
    assert back.count() == assigned.count()
    got = {
        (r["doc_id"], int(r["shard_id"])) for r in back.collect()
    }
    want = {
        (r["doc_id"], int(r["shard_id"])) for r in assigned.collect()
    }
    assert got == want


def test_repartition_for_media_empty_partitions_and_cache_loss(spark):
    """Offsets cover EVERY range partition id (empty ones contribute 0)
    and the offset join is a left join: a boundary desync after cache
    loss degrades bin packing instead of silently dropping rows. Rows
    << defaultParallelism forces empty pids; clearCache() between plan
    build and materialization simulates executor cache eviction (the
    persisted `ranged` recomputes and repartitionByRange re-samples)."""
    m = media.synthetic_media(spark, n=7)  # 32-way range partitioning
    out = media.repartition_for_media(m, target_bytes_per_partition=128)
    spark.catalog.clearCache()
    assert out.count() == 7
    ids = sorted(r.media_id for r in out.select("media_id").collect())
    assert ids == list(range(7))


def test_media_ann_topk_recall_vs_brute_force(spark):
    """r12 verdict ask #5: media vectors ride the standing IVF family —
    recall vs the exact brute-force cosine baseline must clear the same
    floor the text-embedding IVF path is held to."""
    from snowflake_to_bq_pipeline_spark.operators import similarity

    m = media.synthetic_media(spark, 120)
    v = media.media_vectors(m)
    q_pred = F.col("vec_id") < 10
    k = 5
    brute = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(v, q_pred, k=k).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in media.media_ann_topk(
            m, q_pred, k=k, n_centroids=8, n_probe=4
        ).collect()
    }
    assert brute, "queries must have neighbors"
    recall = len(ivf & brute) / len(brute)
    assert recall >= 0.8, f"media IVF recall too low: {recall}"
    # per-query result-set size contract: k rows per query
    per_q = {}
    for q, _ in ivf:
        per_q[q] = per_q.get(q, 0) + 1
    assert all(c == k for c in per_q.values())


def test_media_ann_rides_standing_index_and_streaming_twin(spark, tmp_path):
    """ONE maintenance path for both modalities: the media vector table
    flows through streaming/ann.maintain_ivf_index unchanged, the drained
    sink equals the batch assignment twin, and media_ann_topk consumes
    the standing (centroids, assigned) state built that way."""
    from snowflake_to_bq_pipeline_spark.operators import similarity
    from snowflake_to_bq_pipeline_spark.streaming import ann as sann

    m = media.synthetic_media(spark, 90)
    v = media.media_vectors(m)
    cents_df = similarity.train_centroids(
        v.select("vec_id", F.col("embedding").cast("array<double>").alias("e")),
        8,
        3,
    )
    # capture the model driver-side (standing-model posture)
    rows = [(int(r["cent_id"]), list(r["ce"])) for r in cents_df.collect()]
    cents = spark.createDataFrame(rows, "cent_id long, ce array<double>")

    batch_rows = {
        (r["vec_id"], r["cent_id"])
        for r in sann.assign_vectors_batch(v, cents).collect()
    }
    src = str(tmp_path / "media_vec_src")
    v.repartition(6).write.mode("overwrite").parquet(src)
    sink = str(tmp_path / "media_ivf_sink")
    q = sann.maintain_ivf_index(
        sann.read_vectors_stream(spark, src),
        cents,
        sink,
        str(tmp_path / "media_ivf_ckpt"),
    )
    q.awaitTermination(180)
    assert q.exception() is None
    got = {
        (r["vec_id"], r["cent_id"])
        for r in spark.read.parquet(sink).collect()
    }
    assert got == batch_rows, "media stream must drain-equal the batch twin"

    # the maintained index IS media_ann_topk's standing `assigned` state
    maintained = (
        spark.read.parquet(sink)
        .join(
            v.select(
                "vec_id", F.col("embedding").cast("array<double>").alias("e")
            ),
            "vec_id",
        )
        .select("vec_id", "cent_id", "e")
    )
    via_index = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in media.media_ann_topk(
            m, F.col("vec_id") < 8, k=3, n_probe=3,
            centroids=cents, assigned=maintained,
        ).collect()
    }
    direct = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in media.media_ann_topk(
            m, F.col("vec_id") < 8, k=3, n_probe=3,
            centroids=cents,
        ).collect()
    }
    assert via_index == direct, (
        "search over the stream-maintained standing index must equal the "
        "inline assignment pass"
    )


def test_media_dedup_provenance_conservation_and_precedence(spark):
    """Media twin of the document provenance audit: every media item
    gets exactly one verdict; byte-identical blobs take exact_dup even
    when they are also semantic dups (precedence); near-identical blobs
    (one byte appended -> cosine ~1 under the histogram encoder) take
    semantic_dup; unrelated blobs are kept."""
    import hashlib

    def blob(i):
        return hashlib.sha256(str(i).encode()).digest() * 2

    rows = [(i, "image", blob(i)) for i in range(8)]
    rows.append((10, "image", blob(0)))            # exact dup of 0
    rows.append((11, "image", blob(1) + b"\x01"))  # near dup of 1
    media_df = spark.createDataFrame(
        rows, "media_id long, media_type string, content binary"
    )
    out = {
        r.media_id: (r.reason, r.keep)
        for r in media.media_dedup_provenance(media_df).collect()
    }
    assert set(out) == {0, 1, 2, 3, 4, 5, 6, 7, 10, 11}  # conservation
    assert out[10] == ("exact_dup", False)  # beats its semantic verdict
    assert out[11] == ("semantic_dup", False)
    assert out[0] == ("kept", True) and out[1] == ("kept", True)
    kept = [m for m, (r, k) in out.items() if k]
    assert all(out[m][0] == "kept" for m in kept)
    # canonical-first: every dup's group keeps its min id
    assert 0 in kept and 1 in kept
