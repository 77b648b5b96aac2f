"""Streaming paths: the availableNow drain must reproduce the batch twin,
and the stateful operator must accumulate across micro-batches."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from snowflake_to_bq_pipeline_spark.catalog import load_table
from snowflake_to_bq_pipeline_spark.streaming import incremental, stateful


def test_streaming_matches_batch_twin(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    shutil.copy(os.path.join(sf_dir, "events.parquet"), src)

    target = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    incremental.run_incremental_sync(spark, src, target, ckpt)

    import datetime as dt

    events = load_table(spark, sf_dir, "events")
    streamed = spark.read.parquet(target)
    batch = incremental.windowed_counts_batch(events)
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    # Append mode only emits windows CLOSED by the final watermark
    # (max ts - 10 min); everything emitted must match the batch twin and
    # everything withheld must lie within the watermark horizon.
    assert s <= b
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    horizon = max_ts - dt.timedelta(minutes=10)
    for row in b - s:
        assert row[1] > horizon, f"closed window missing from stream: {row}"

    # Exactly-once: a second drain with the same checkpoint adds nothing.
    incremental.run_incremental_sync(spark, src, target, ckpt)
    assert spark.read.parquet(target).count() == len(s)


def test_stateful_running_totals_accumulate(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    half1 = str(tmp_path / "in")
    os.makedirs(half1)
    # Two files → with maxFilesPerTrigger=1 the stream sees 2 micro-batches.
    events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        os.path.join(half1, "a.parquet")
    )
    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        os.path.join(half1, "b.parquet")
    )

    src = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(half1 + "/*/")
    )
    out = stateful.running_user_totals(src)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("totals")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # Final state per user (last update wins) must equal the batch aggregate.
    result = spark.sql(
        """
        SELECT user_id, event_count, value_sum FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY event_count DESC
          ) rn FROM totals
        ) WHERE rn = 1
        """
    )
    expected = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("event_count"), F.sum("value").alias("value_sum")
    )
    got = {(r.user_id, r.event_count, round(r.value_sum, 6)) for r in result.collect()}
    want = {
        (r.user_id, r.event_count, round(r.value_sum, 6)) for r in expected.collect()
    }
    assert got == want


def test_streaming_merge_sink_converges_to_latest(spark, sf_dir, tmp_path):
    from snowflake_to_bq_pipeline_spark.operators.dedup import latest_record
    from snowflake_to_bq_pipeline_spark.streaming import merge_sink

    events = load_table(spark, sf_dir, "events")
    src_dir = str(tmp_path / "msrc")
    os.makedirs(src_dir)
    # Two files → two micro-batches with maxFilesPerTrigger=1.
    events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        os.path.join(src_dir, "a.parquet")
    )
    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        os.path.join(src_dir, "b.parquet")
    )
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir + "/*/")
    )
    target = str(tmp_path / "mtarget")
    merge_sink.run_merge_stream(
        spark, stream, target, str(tmp_path / "mckpt"),
        ["user_id"], "ts", tiebreak_cols=["event_id"],
    )
    got = {
        (r.user_id, r.event_id)
        for r in spark.read.parquet(target).collect()
    }
    want = {
        (r.user_id, r.event_id)
        for r in latest_record(events, ["user_id"], "ts", ["event_id"]).collect()
    }
    assert got == want


def test_streaming_dedup_drops_in_horizon_duplicates(spark, sf_dir, tmp_path):
    from snowflake_to_bq_pipeline_spark.streaming import dedup

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "dedup_in")
    os.makedirs(src)
    # The same rows twice in two files: every duplicate's reappearance is
    # within the watermark horizon of its first occurrence when both files
    # land in one availableNow drain.
    sample = events.filter(F.col("event_id") < 500)
    sample.coalesce(1).write.parquet(os.path.join(src, "a.parquet"))
    sample.coalesce(1).write.parquet(os.path.join(src, "b.parquet"))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(src + "/*/")
    )
    out = dedup.dedup_stream(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.sql("SELECT event_id FROM dedup_out").collect()
    ids = [r.event_id for r in got]
    assert len(ids) == len(set(ids)), "duplicates survived the stream"
    assert set(ids) == {r.event_id for r in sample.select("event_id").collect()}


def test_streaming_session_windows_match_batch_twin(spark, sf_dir, tmp_path):
    from snowflake_to_bq_pipeline_spark.streaming import sessions

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "sess_in")
    os.makedirs(src)
    events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        os.path.join(src, "a.parquet")
    )
    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        os.path.join(src, "b.parquet")
    )
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*/")
    )
    out = sessions.session_stats_stream(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        tuple(r)
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    batch = {
        tuple(r)
        for r in sessions.session_stats_batch(events).collect()
    }
    # Append mode emits only sessions CLOSED by the final watermark; all
    # emitted sessions must match the batch twin exactly, and the stream
    # must have emitted a substantial share of them.
    assert got <= batch
    assert len(got) > 0.5 * len(batch), (len(got), len(batch))


def test_stream_stream_attribution_matches_batch_twin(spark, sf_dir, tmp_path):
    from snowflake_to_bq_pipeline_spark.streaming import joins

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "attr_in")
    os.makedirs(src)
    events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        os.path.join(src, "a.parquet")
    )
    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        os.path.join(src, "b.parquet")
    )
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*/")
    )
    out = joins.attribution_stream(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("attr_out")
        .option("checkpointLocation", str(tmp_path / "attr_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {tuple(r) for r in spark.sql("SELECT * FROM attr_out").collect()}
    batch = {tuple(r) for r in joins.attribution_batch(events).collect()}
    # Inner stream-stream join: every emitted pair must be a true batch
    # pair; pairs whose older side fell behind the watermark between the
    # two input files may be missing, but most must arrive.
    assert got <= batch
    assert len(got) > 0.5 * len(batch), (len(got), len(batch))


def test_streaming_curation_matches_batch_twin(spark, sf_dir, tmp_path):
    from snowflake_to_bq_pipeline_spark.streaming import curation as scur

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id")).alias(
            "ts"
        ),
    )
    # Plant exact-content duplicates and a too-short doc.
    planted = docs.limit(5).select(
        (F.col("doc_id") + 100_000).alias("doc_id"), "text",
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.col("doc_id") + F.lit(60)
        ).alias("ts"),
    )
    junk = spark.createDataFrame(
        [(999_999, "tiny", None)], "doc_id long, text string, ts string"
    ).select("doc_id", "text", F.to_timestamp(F.lit("2023-11-14")).alias("ts"))
    full = docs.unionByName(planted).unionByName(junk)
    src = str(tmp_path / "docs_src")
    full.write.mode("overwrite").parquet(src)

    batch = scur.curate_docs(
        spark.read.parquet(src), watermark=None
    )
    # One survivor per fingerprint, junk filtered.
    n_batch = batch.count()
    assert n_batch == batch.select("fingerprint").distinct().count()
    assert batch.filter(F.col("doc_id") == 999_999).count() == 0

    stream = scur.curate_docs(
        spark.readStream.schema(full.schema).parquet(src)
    )
    out = str(tmp_path / "out")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    # The availableNow drain dedups the same fingerprints (all planted
    # dups are within the watermark horizon of their originals).
    assert got.count() == n_batch
    assert (
        got.select("fingerprint").distinct().count()
        == batch.select("fingerprint").distinct().count()
    )


def test_streaming_resumes_from_checkpoint_across_restart(
    spark, sf_dir, tmp_path
):
    """Fault-tolerance contract: a second run of the SAME query over the
    SAME checkpoint after new files arrive must resume exactly-once —
    every window emitted once, closed windows equal to the batch twin over
    ALL data, nothing re-emitted from before the restart.

    The event stream is split at the median timestamp so arrival order
    respects event time (files arriving out of event-time order beyond
    the watermark are the documented drop case, not the resume case
    under test)."""
    import datetime as dt

    events = load_table(spark, sf_dir, "events")
    median_ts = events.select(
        F.expr("percentile(unix_micros(ts), 0.5)")
    ).collect()[0][0]
    median_ts = F.timestamp_micros(F.lit(int(median_ts)))

    src = str(tmp_path / "src")
    target = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    events.filter(F.col("ts") <= median_ts).write.parquet(
        src, mode="append"
    )
    incremental.run_incremental_sync(spark, src, target, ckpt)
    first = [tuple(r) for r in spark.read.parquet(target).collect()]
    assert len(first) > 0  # drain 1 closed some windows

    # "Restart": new files land, same checkpoint, fresh query object.
    events.filter(F.col("ts") > median_ts).write.parquet(
        src, mode="append"
    )
    incremental.run_incremental_sync(spark, src, target, ckpt)
    final = [tuple(r) for r in spark.read.parquet(target).collect()]

    # No window emitted twice across the restart boundary.
    assert len(final) == len(set(final))
    # Everything from drain 1 survives verbatim (resume, not recompute).
    assert set(first) <= set(final)

    batch = {tuple(r) for r in incremental.windowed_counts_batch(events).collect()}
    s = set(final)
    assert s <= batch
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    horizon = max_ts - dt.timedelta(minutes=10)
    for row in batch - s:
        assert row[1] > horizon, f"closed window missing after resume: {row}"


def test_streaming_volume_anomaly_matches_batch_twin(spark, sf_dir, tmp_path):
    from snowflake_to_bq_pipeline_spark.streaming import anomaly, incremental

    events = load_table(spark, sf_dir, "events")
    baseline = anomaly.window_count_baseline(events)

    src = str(tmp_path / "anom_in")
    os.makedirs(src)
    shutil.copy(os.path.join(sf_dir, "events.parquet"), src)
    stream = incremental.read_events_stream(spark, src)
    out = anomaly.volume_anomaly_stream(stream, baseline)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("anom_out")
        .option("checkpointLocation", str(tmp_path / "anom_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {tuple(r) for r in spark.sql("SELECT * FROM anom_out").collect()}
    want = {
        tuple(r)
        for r in anomaly.volume_anomaly_batch(events, baseline).collect()
    }
    # Append mode emits only watermark-closed windows; emitted rows match
    # the batch twin exactly and carry the same anomaly verdicts.
    assert got <= want
    assert len(got) > 0.5 * len(want), (len(got), len(want))
    # The monitor actually fires on something in this corpus OR stays
    # all-quiet consistently with the batch twin.
    fired_stream = {r for r in got if r[-1]}
    fired_batch = {r for r in want if r[-1]}
    assert fired_stream <= fired_batch


def test_merge_sink_resumes_from_checkpoint_across_restart(
    spark, sf_dir, tmp_path
):
    """Keyed MERGE sink across a restart: first drain lands half the
    stream, a second run over the SAME checkpoint lands the rest; the
    target must converge to latest-per-key over ALL data — no lost
    updates, no resurrection of older rows after the restart."""
    from snowflake_to_bq_pipeline_spark.operators.dedup import latest_record
    from snowflake_to_bq_pipeline_spark.streaming import merge_sink

    events = load_table(spark, sf_dir, "events")
    src_dir = str(tmp_path / "m2src")
    os.makedirs(src_dir)
    target = str(tmp_path / "m2target")
    ckpt = str(tmp_path / "m2ckpt")

    def run():
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir + "/*/")
        )
        merge_sink.run_merge_stream(
            spark, stream, target, ckpt,
            ["user_id"], "ts", tiebreak_cols=["event_id"],
        )

    events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        os.path.join(src_dir, "a.parquet")
    )
    run()
    first = {
        (r.user_id, r.event_id) for r in spark.read.parquet(target).collect()
    }
    assert first == {
        (r.user_id, r.event_id)
        for r in latest_record(
            events.filter(F.col("event_id") % 2 == 0),
            ["user_id"], "ts", ["event_id"],
        ).collect()
    }

    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        os.path.join(src_dir, "b.parquet")
    )
    run()  # fresh query object, same checkpoint: must process ONLY file b
    got = {
        (r.user_id, r.event_id) for r in spark.read.parquet(target).collect()
    }
    want = {
        (r.user_id, r.event_id)
        for r in latest_record(events, ["user_id"], "ts", ["event_id"]).collect()
    }
    assert got == want


def test_anomaly_scoring_flags_unknown_types_and_flat_baselines(spark):
    """A stream with NO baseline history must flag (left join, null z),
    and a zero-std baseline must flag any deviation from its constant
    history instead of coalescing to quiet."""
    from snowflake_to_bq_pipeline_spark.streaming import anomaly

    counts = spark.createDataFrame(
        [("known", 10), ("brand_new", 500), ("flat", 7), ("flat", 9)],
        "event_type string, event_count long",
    )
    baseline = spark.createDataFrame(
        [("known", 10.0, 2.0), ("flat", 9.0, 0.0)],
        "event_type string, baseline_mean double, baseline_std double",
    )
    rows = {
        (r.event_type, r.event_count): (r.z_score, r.is_anomaly)
        for r in anomaly.score_windowed_counts(counts, baseline).collect()
    }
    assert len(rows) == 4  # nothing dropped
    assert rows[("brand_new", 500)] == (None, True)
    assert rows[("flat", 7)] == (None, True)
    assert rows[("flat", 9)] == (None, False)
    z, fired = rows[("known", 10)]
    assert z == 0.0 and not fired


def test_streaming_multivariate_matches_batch_twin(spark, sf_dir, tmp_path):
    from snowflake_to_bq_pipeline_spark.streaming import anomaly, incremental

    events = load_table(spark, sf_dir, "events")
    model = anomaly.multivariate_model(events)

    src = str(tmp_path / "mv_in")
    os.makedirs(src)
    shutil.copy(os.path.join(sf_dir, "events.parquet"), src)
    stream = incremental.read_events_stream(spark, src)
    out = anomaly.multivariate_anomaly_stream(stream, model)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("mv_out")
        .option("checkpointLocation", str(tmp_path / "mv_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {tuple(r) for r in spark.sql("SELECT * FROM mv_out").collect()}
    want = {
        tuple(r)
        for r in anomaly.multivariate_anomaly_batch(events, model).collect()
    }
    # Append mode emits only watermark-closed day windows; emitted rows
    # carry identical features, distances, and verdicts as the batch twin.
    assert got <= want
    assert len(got) > 0.5 * len(want), (len(got), len(want))
    # the trained cutoff reproduces the batch operator's decision boundary
    # on the training corpus: every batch-flagged day that closed is
    # flagged by the stream (it IS the same function — sanity check > 0)
    assert sum(1 for r in want if r[-1]) > 0


def test_multivariate_scoring_flags_unknown_stream(spark, sf_dir):
    from snowflake_to_bq_pipeline_spark.operators.anomaly import (
        mv_daily_features,
    )
    from snowflake_to_bq_pipeline_spark.streaming import anomaly

    events = load_table(spark, sf_dir, "events")
    model = anomaly.multivariate_model(events)
    novel = events.withColumn("event_type", F.lit("brand_new_stream"))
    rows = anomaly.score_daily_features(
        mv_daily_features(novel), model
    ).collect()
    assert rows
    assert all(r.mahalanobis is None for r in rows)
    assert all(r.is_anomaly for r in rows)


def test_streaming_near_dedup_drain_equals_batch_twin(spark, sf_dir, tmp_path):
    """Simhash-band near-dedup stage: the availableNow drain over a
    (ts, doc_id)-ordered single-partition source must keep EXACTLY the
    docs the batch twin (watermark=None greedy first-seen) keeps, and —
    the pigeonhole recall property at the default 4×16-bit banding —
    must drop the later doc of every in-horizon pair with hamming ≤ 3,
    while NOT over-dropping the corpus at large."""
    from snowflake_to_bq_pipeline_spark.operators import neardup
    from snowflake_to_bq_pipeline_spark.streaming import curation as scur

    base = 1_700_000_000
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.timestamp_seconds(F.lit(base) + F.col("doc_id")).alias("ts"),
    )
    # Plant NEAR-duplicates: copies with one word swapped, arriving
    # shortly after their originals (well inside the horizon).
    planted = docs.limit(8).select(
        (F.col("doc_id") + 100_000).alias("doc_id"),
        F.regexp_replace("text", r"^(\S+ \S+ \S+) \S+", r"$1 zqzqzq").alias(
            "text"
        ),
        F.timestamp_seconds(
            F.lit(base) + F.col("doc_id") + F.lit(120)
        ).alias("ts"),
    )
    shorty = spark.range(1).select(
        F.lit(999_999).cast("long").alias("doc_id"),
        F.lit("one two").alias("text"),  # < 3 words: no shingles
        F.timestamp_seconds(F.lit(base + 700)).alias("ts"),
    )
    real = docs.unionByName(planted).unionByName(shorty)

    src = str(tmp_path / "near_src")
    # (ts, doc_id) order, ONE partition — makes the stream's arrival
    # order match the batch twin's (ts, doc_id) greedy order.
    real.orderBy("ts", "doc_id").coalesce(1).write.mode("overwrite").parquet(
        src
    )

    batch_keep = {
        r["doc_id"]
        for r in scur.near_dedup_docs(
            spark.read.parquet(src), watermark=None
        ).collect()
    }

    surv = scur.near_dedup_docs(
        spark.readStream.schema(real.schema).parquet(src)
    )
    out = str(tmp_path / "near_out")

    def _sink(batch_df, _bid):
        scur.near_dedup_finalize(batch_df).write.mode("append").parquet(out)

    q = (
        surv.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", str(tmp_path / "near_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}

    assert got == batch_keep
    assert 999_999 in got  # shingle-less docs pass through
    # Precision guard: the stage must not over-drop unique docs (the
    # 8-bit-band failure mode kept only 6% of this corpus).
    n_docs = real.count()
    assert len(got) > 0.8 * n_docs, (len(got), n_docs)

    # Pigeonhole recall at 4×16-bit bands: every in-horizon pair with
    # hamming ≤ 3 → the later doc was dropped.
    pairs = [
        p
        for p in neardup.simhash_pairs(real, max_hamming=7).collect()
        if p["hamming_distance"] <= 3
    ]
    assert len(pairs) >= 8  # planted + natural near-dups visible to batch
    for p in pairs:
        later = max(p["doc_a"], p["doc_b"])
        assert later not in got, (p, later)


def test_streaming_near_dedup_verified_drain_equals_batch_twin(
    spark, sf_dir, tmp_path
):
    """Verified-state near-dedup: the availableNow drain must keep
    EXACTLY the docs the batch twin keeps, drop the later doc of every
    hamming<=3 pair (pigeonhole recall through band state), pass
    shingle-less docs through, and never drop a doc without a verified
    match (precision 1.0 by construction)."""
    from snowflake_to_bq_pipeline_spark.operators import neardup
    from snowflake_to_bq_pipeline_spark.streaming import curation as scur

    base = 1_700_000_000
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.timestamp_seconds(F.lit(base) + F.col("doc_id")).alias("ts"),
    )
    planted = docs.limit(8).select(
        (F.col("doc_id") + 100_000).alias("doc_id"),
        F.regexp_replace("text", r"^(\S+ \S+ \S+) \S+", r"$1 zqzqzq").alias(
            "text"
        ),
        F.timestamp_seconds(
            F.lit(base) + F.col("doc_id") + F.lit(120)
        ).alias("ts"),
    )
    shorty = spark.range(1).select(
        F.lit(999_999).cast("long").alias("doc_id"),
        F.lit("one two").alias("text"),
        F.timestamp_seconds(F.lit(base + 700)).alias("ts"),
    )
    real = docs.unionByName(planted).unionByName(shorty)

    src = str(tmp_path / "nv_src")
    real.orderBy("ts", "doc_id").coalesce(1).write.mode("overwrite").parquet(
        src
    )

    batch_keep = {
        r["doc_id"]
        for r in scur.near_dedup_docs_verified(
            spark.read.parquet(src), watermark=None
        ).collect()
    }

    surv = scur.near_dedup_docs_verified(
        spark.readStream.schema(real.schema).parquet(src)
    )
    out = str(tmp_path / "nv_out")

    def _sink(batch_df, _bid):
        scur.near_dedup_verified_finalize(batch_df).write.mode(
            "append"
        ).parquet(out)

    q = (
        surv.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", str(tmp_path / "nv_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}

    assert got == batch_keep
    assert 999_999 in got  # shingle-less docs pass through

    # Ground truth: every doc with an EARLIER hamming<=3 partner must be
    # dropped (recall 1.0) and nothing else may be (precision 1.0) —
    # the verified variant's keep-set is exactly computable.
    order = {
        r["doc_id"]: (r["ts"], r["doc_id"]) for r in real.collect()
    }
    true_dropped = set()
    for p in neardup.simhash_pairs(real, max_hamming=7).collect():
        if p["hamming_distance"] <= 3:
            a, b = p["doc_a"], p["doc_b"]
            true_dropped.add(max((order[a], order[b]))[1])
    all_ids = set(order)
    assert got == all_ids - true_dropped


def test_near_dedup_verified_closes_dense_horizon_cliff(spark, sf_dir, tmp_path):
    """THE density cliff (r10 measurement: banding keeps ~10% of a
    5,080-doc horizon at 4x16-bit bands): on a dense horizon of ~5,080
    DISTINCT docs, the verified variant must (a) drain-equal its batch
    twin, (b) keep every doc without a true earlier hamming<=3 partner
    (recall 1.0 AND precision 1.0 vs ground truth), and (c) retain the
    corpus the banding stage collapses on."""
    from snowflake_to_bq_pipeline_spark.operators import neardup
    from snowflake_to_bq_pipeline_spark.streaming import curation as scur

    base = 1_700_000_000
    docs = load_table(spark, sf_dir, "documents")
    # 10 replicas, each salting every 20th word with a replica tag:
    # similar-but-distinct docs whose sign-sum signatures cluster — the
    # corpus shape that makes 16-bit bands over-collide (measured here:
    # banding keeps ~37%, while only ~15% of docs have a true earlier
    # hamming<=3 partner).
    dense = None
    for i in range(10):
        rep = docs.select(
            (F.col("doc_id") + 100_000 * i).alias("doc_id"),
            F.regexp_replace(
                "text", r"((\S+ ){19})\S+", r"$1w" + str(i)
            ).alias("text"),
            F.timestamp_seconds(
                F.lit(base + 30 * i) + F.col("doc_id") % 30
            ).alias("ts"),
        )
        dense = rep if dense is None else dense.unionByName(rep)

    src = str(tmp_path / "dense_src")
    dense.repartition(8).write.mode("overwrite").parquet(src)
    dense_r = spark.read.parquet(src)
    n_docs = dense_r.count()
    assert n_docs >= 5_000

    # (c) the banding stage's measured collapse on this horizon
    band_keep = scur.near_dedup_docs(dense_r, watermark=None).count()

    # (a) batch twin and drain must agree — one micro-batch, so the
    # per-group (ts, doc_id) sort makes the result partitioning-proof
    batch_keep = {
        r["doc_id"]
        for r in scur.near_dedup_docs_verified(
            dense_r, watermark=None
        ).collect()
    }

    surv = scur.near_dedup_docs_verified(
        spark.readStream.schema(dense_r.schema).parquet(src)
    )
    out = str(tmp_path / "dense_out")

    def _sink(batch_df, _bid):
        scur.near_dedup_verified_finalize(batch_df).write.mode(
            "append"
        ).parquet(out)

    q = (
        surv.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", str(tmp_path / "dense_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.exception() is None
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == batch_keep

    # (b) exact ground truth: recall 1.0 and precision 1.0
    order = {
        r["doc_id"]: (r["ts"], r["doc_id"]) for r in dense_r.collect()
    }
    true_dropped = set()
    for p in neardup.simhash_pairs(dense_r, max_hamming=7).collect():
        if p["hamming_distance"] <= 3:
            a, b = p["doc_a"], p["doc_b"]
            true_dropped.add(max((order[a], order[b]))[1])
    assert got == set(order) - true_dropped

    # (c) the cliff is closed: banding collapsed, verified retains
    assert band_keep < 0.5 * n_docs, band_keep
    assert len(got) > 0.8 * n_docs, (len(got), n_docs)
    assert len(got) > 1.5 * band_keep


def test_near_dedup_verified_string_doc_ids_drain_equal(spark, tmp_path):
    """The verified variant must handle STRING doc ids end-to-end: the
    stateful output schema derives the id type from the input (a
    hardcoded long broke only the streaming side, silently violating
    drain equality), and short docs pass through."""
    from snowflake_to_bq_pipeline_spark.streaming import curation as scur

    base = 1_700_000_000
    docs = spark.createDataFrame(
        [
            ("doc-a", "alpha beta gamma delta epsilon zeta eta theta", 0),
            ("doc-b", "alpha beta gamma delta epsilon zeta eta iota", 1),
            ("doc-c", "one two", 2),  # < 3 words: pass-through
            ("doc-d", "totally different words entirely unlike others here now", 3),
        ],
        "doc_id string, text string, off long",
    ).select(
        "doc_id",
        "text",
        F.timestamp_seconds(F.lit(base) + F.col("off")).alias("ts"),
    )
    src = str(tmp_path / "sv_src")
    docs.orderBy("ts", "doc_id").coalesce(1).write.mode("overwrite").parquet(src)

    batch_keep = {
        r["doc_id"]
        for r in scur.near_dedup_docs_verified(
            spark.read.parquet(src), watermark=None
        ).collect()
    }
    assert "doc-c" in batch_keep and "doc-d" in batch_keep

    surv = scur.near_dedup_docs_verified(
        spark.readStream.schema(docs.schema).parquet(src)
    )
    out = str(tmp_path / "sv_out")

    def _sink(batch_df, _bid):
        scur.near_dedup_verified_finalize(batch_df).write.mode(
            "append"
        ).parquet(out)

    q = (
        surv.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", str(tmp_path / "sv_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == batch_keep


def test_streaming_ivf_assign_drain_equals_batch_twin(spark, sf_dir, tmp_path):
    """Verdict r11 ask #6: the foreachBatch IVF maintenance pass
    (streaming/ann.maintain_ivf_index) over the daily increment must
    append EXACTLY the (vec_id, cent_id) rows the batch incremental
    assignment produces for the same vectors under the same standing
    model — regardless of micro-batch boundaries."""
    from snowflake_to_bq_pipeline_spark.registry import _centroids_for
    from snowflake_to_bq_pipeline_spark.streaming import ann as sann

    emb = load_table(spark, sf_dir, "embeddings")
    incr = emb.filter(F.col("vec_id") % 10 == 0).select("vec_id", "embedding")
    cents = _centroids_for(spark, sf_dir, 16, exclude_mod=10)

    batch_rows = {
        (r["vec_id"], r["cent_id"])
        for r in sann.assign_vectors_batch(incr, cents).collect()
    }
    assert batch_rows, "increment slice must be nonempty"

    src = str(tmp_path / "ivf_src")
    # several files -> several micro-batches under maxFilesPerTrigger
    incr.repartition(8).write.mode("overwrite").parquet(src)

    sink = str(tmp_path / "ivf_sink")
    q = sann.maintain_ivf_index(
        sann.read_vectors_stream(spark, src),
        cents,
        sink,
        str(tmp_path / "ivf_ckpt"),
    )
    q.awaitTermination(180)
    assert q.exception() is None

    got = {
        (r["vec_id"], r["cent_id"])
        for r in spark.read.parquet(sink).collect()
    }
    assert got == batch_rows


def test_streaming_ivf_assign_resumes_from_checkpoint(spark, sf_dir, tmp_path):
    """Index maintenance across a restart: drain half the files, stop,
    add the rest, restart with the SAME checkpoint — the sink must hold
    each increment row exactly once (idempotent append, no re-assign of
    already-committed batches)."""
    from snowflake_to_bq_pipeline_spark.registry import _centroids_for
    from snowflake_to_bq_pipeline_spark.streaming import ann as sann

    emb = load_table(spark, sf_dir, "embeddings")
    incr = emb.filter(F.col("vec_id") % 10 == 0).select("vec_id", "embedding")
    cents = _centroids_for(spark, sf_dir, 16, exclude_mod=10)
    first = incr.filter(F.col("vec_id") % 20 == 0)
    second = incr.filter(F.col("vec_id") % 20 != 0)

    src = str(tmp_path / "ivf_src")
    sink = str(tmp_path / "ivf_sink")
    ckpt = str(tmp_path / "ivf_ckpt")
    first.repartition(2).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    q1 = sann.maintain_ivf_index(
        sann.read_vectors_stream(spark, src, schema), cents, sink, ckpt
    )
    q1.awaitTermination(180)
    assert q1.exception() is None

    second.repartition(2).write.mode("append").parquet(src)
    q2 = sann.maintain_ivf_index(
        sann.read_vectors_stream(spark, src, schema), cents, sink, ckpt
    )
    q2.awaitTermination(180)
    assert q2.exception() is None

    got = [
        (r["vec_id"], r["cent_id"])
        for r in spark.read.parquet(sink).collect()
    ]
    batch_rows = {
        (r["vec_id"], r["cent_id"])
        for r in sann.assign_vectors_batch(incr, cents).collect()
    }
    assert len(got) == len(set(got)), "restart must not duplicate rows"
    assert set(got) == batch_rows


def test_streaming_quality_score_drain_equals_batch_classifier(
    spark, sf_dir, tmp_path
):
    """Ingest-time quality gate: the stateless literal-model scorer
    (operators/curation.score_docs_with_model) must produce — on a
    Structured Stream drain — exactly the rows the join-shaped batch
    classifier produces for the same docs (plan-diverse value equality:
    same rounded-decimal sums via constant-folded LUT fold vs broadcast
    join + groupBy)."""
    from snowflake_to_bq_pipeline_spark.operators import curation as cur
    from snowflake_to_bq_pipeline_spark.registry import _nbq_model_for

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    batch = {
        r["doc_id"]: tuple(r)
        for r in cur.nb_quality_classifier(docs, ("src0", "src1")).collect()
    }
    model = _nbq_model_for(spark, sf_dir)

    src = str(tmp_path / "nbq_src")
    docs.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    out = str(tmp_path / "nbq_out")

    def _sink(batch_df, _bid):
        cur.score_docs_with_model(batch_df, model).write.mode(
            "append"
        ).parquet(out)

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", str(tmp_path / "nbq_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None

    got = {
        r["doc_id"]: tuple(r) for r in spark.read.parquet(out).collect()
    }
    assert got == batch

    # scoring is STATELESS, so the literal-model plan also runs the
    # stream directly (no foreachBatch needed) — schema sanity only
    direct = cur.score_docs_with_model(stream, model)
    assert direct.isStreaming
    assert [f.name for f in direct.schema.fields] == [
        "doc_id",
        "source",
        "label_curated",
        "is_heldout",
        "n_grams",
        "log_odds",
        "pred_curated",
    ]


def test_streaming_ingest_drains_equal_to_daily_pipeline(spark, tmp_path):
    """The streaming corpus-ingestion twin (streaming/ingest.py): each
    micro-batch runs the SAME daily-increment pipeline, so draining two
    'days' through the stream must produce exactly the state two direct
    run_daily_increment calls produce — and both must equal the batch
    rebuild on the union (the merge≡recompute chain extended to the
    stream)."""
    from snowflake_to_bq_pipeline_spark import pipelines
    from snowflake_to_bq_pipeline_spark.streaming import ingest
    from tests.test_pipelines import _fixture

    model, inc_a, inc_b = _fixture(spark)
    src = str(tmp_path / "docs_src")
    stream_state = str(tmp_path / "stream_state")
    ckpt = str(tmp_path / "ingest_ckpt")

    # day 1 arrives; drain
    inc_a.repartition(2).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    q = ingest.maintain_corpus(
        ingest.read_docs_stream(spark, src, schema),
        stream_state,
        model,
        ckpt,
    )
    q.awaitTermination(180)
    assert q.exception() is None
    # day 2 arrives; restart from the same checkpoint and drain
    inc_b.repartition(2).write.mode("append").parquet(src)
    q = ingest.maintain_corpus(
        ingest.read_docs_stream(spark, src, schema),
        stream_state,
        model,
        ckpt,
    )
    q.awaitTermination(180)
    assert q.exception() is None

    direct_state = str(tmp_path / "direct_state")
    pipelines.run_daily_increment(spark, direct_state, inc_a, "d1", model)
    pipelines.run_daily_increment(spark, direct_state, inc_b, "d2", model)

    cols = ["doc_id", "source", "log_odds", "split", "shard_id", "n_tokens"]
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{stream_state}/corpus")
        .select(*cols)
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{direct_state}/corpus")
        .select(*cols)
        .collect()
    )
    assert got == want and got, "stream state must equal the daily runs"
    rebuilt = sorted(
        tuple(r)
        for r in pipelines.rebuild_corpus(
            spark, inc_a.unionByName(inc_b), model
        )
        .select("doc_id", "source", "log_odds", "split", "n_tokens")
        .collect()
    )
    stream_no_shard = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{stream_state}/corpus")
        .select("doc_id", "source", "log_odds", "split", "n_tokens")
        .collect()
    )
    assert stream_no_shard == rebuilt

    # at-least-once replay: re-running a COMMITTED batch id (the crash-
    # mid-append story) is a per-partition overwrite — state unchanged
    before = got
    pipelines.run_daily_increment(
        spark, stream_state, inc_a, "batch000000", model
    )
    after = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{stream_state}/corpus")
        .select(*cols)
        .collect()
    )
    assert after == before


def test_streaming_ingest_with_span_cutting_equals_daily_runs(
    spark, tmp_path
):
    """cut_spans forwards through the streaming twin: draining two days
    with span cutting produces exactly the state the direct cut daily
    runs produce — text included, so the cut boundaries ride the
    exactly-once idempotence argument unchanged."""
    from snowflake_to_bq_pipeline_spark import pipelines
    from snowflake_to_bq_pipeline_spark.streaming import ingest
    from tests.test_pipelines import _span_fixture

    model, inc_a, inc_b, _ = _span_fixture(spark)
    src = str(tmp_path / "docs_src")
    stream_state = str(tmp_path / "stream_state")
    ckpt = str(tmp_path / "ingest_ckpt")

    inc_a.coalesce(1).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    q = ingest.maintain_corpus(
        ingest.read_docs_stream(spark, src, schema),
        stream_state, model, ckpt, cut_spans=True,
    )
    q.awaitTermination(180)
    assert q.exception() is None
    inc_b.coalesce(1).write.mode("append").parquet(src)
    q = ingest.maintain_corpus(
        ingest.read_docs_stream(spark, src, schema),
        stream_state, model, ckpt, cut_spans=True,
    )
    q.awaitTermination(180)
    assert q.exception() is None

    direct = str(tmp_path / "direct_state")
    pipelines.run_daily_increment(
        spark, direct, inc_a, "d1", model, cut_spans=True
    )
    pipelines.run_daily_increment(
        spark, direct, inc_b, "d2", model, cut_spans=True
    )
    cols = ["doc_id", "source", "text", "log_odds", "split", "n_tokens"]
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{stream_state}/corpus")
        .select(*cols)
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{direct}/corpus")
        .select(*cols)
        .collect()
    )
    assert got == want and len(got) == 5
    cut_cols = ["doc_id", "orig_chars", "spans_cut", "chars_removed"]
    got_cuts = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{stream_state}/span_cuts")
        .select(*cut_cols)
        .collect()
    )
    want_cuts = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{direct}/span_cuts")
        .select(*cut_cols)
        .collect()
    )
    assert got_cuts == want_cuts and len(got_cuts) == 5
