"""SURVEY §2-A — sync / reconciliation / backfill / CDC queries.

Split from the monolithic registry.py (r9); every query body is
unchanged — registration still flows through registry._core.query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from ..catalog import load_table
from ..operators import cdc, dedup, quality, sync
from ._core import query


# ---------------------------------------------------------------------------
# §2-A  Sync / reconciliation
# ---------------------------------------------------------------------------

@query(
    "full_sync_snapshot",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders
    """,
)
def full_sync_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full extract with schema normalization (ref: *_sync_full/main.py)."""
    orders = load_table(spark, sf_dir, "orders")
    return sync.full_sync(orders, {"o_totalprice": "double"})


@query(
    "incremental_sync_window",
    oracle="""
    SELECT * FROM events
    WHERE ts >= (SELECT MAX(ts) - INTERVAL 30 DAY FROM events)
    """,
)
def incremental_sync_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day incremental extract (ref: *_sync_daily/main.py)."""
    events = load_table(spark, sf_dir, "events")
    return sync.incremental_window(events, "ts", days_back=30)


@query(
    "merge_upsert",
    oracle="""
    WITH base AS (
      SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
    ),
    upd AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
             'UPDATED' AS o_orderpriority
      FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    )
    SELECT b.* FROM base b
    WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.o_orderkey = b.o_orderkey)
    UNION ALL
    SELECT * FROM upd
    """,
)
def merge_upsert_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE semantics: updates override base on key (ref: daily
    delete+insert, snowflake_bq_sync_daily/main.py)."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    updates = orders.filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    ).withColumn("o_orderpriority", F.lit("UPDATED"))
    return sync.merge_upsert(base, updates, ["o_orderkey"])


@query(
    "orphaned_records",
    oracle="""
    SELECT e.* FROM events e
    WHERE NOT EXISTS (
      SELECT 1 FROM customer c
      WHERE c.c_custkey = e.user_id AND c.c_custkey % 7 != 0
    )
    """,
)
def orphaned_records_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target rows whose key vanished from source (ref:
    snowflake_bq_deduplication_sync.py:270 ``orphaned_items``).

    Source-side deletions are simulated deterministically (every 7th
    customer key removed) so the reconciliation path is exercised with a
    non-empty result at every scale factor.
    """
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    source_keys = customer.filter(F.col("c_custkey") % 7 != 0).select(
        F.col("c_custkey").alias("user_id")
    )
    return sync.orphaned_records(events, source_keys, ["user_id"])


@query(
    "missing_records",
    oracle="""
    SELECT c.* FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
    """,
)
def missing_records_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source rows never synced to target (ref: same, ``missing_items``)."""
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    target_keys = events.select(F.col("user_id").alias("c_custkey"))
    return sync.missing_records(customer, target_keys, ["c_custkey"])


@query(
    "dedup_latest_record",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC
      ) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def dedup_latest_record_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest snapshot per key (ref: work_item_details_latest_view.sql:58)."""
    events = load_table(spark, sf_dir, "events")
    return dedup.latest_record(
        events, ["user_id"], "ts", tiebreak_cols=["event_id"]
    )


@query(
    "sync_date_dedup",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id, event_type, value
        ORDER BY ts DESC, event_id DESC
      ) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def sync_date_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-key dedup keeping newest sync (ref: v5 view L56-104)."""
    events = load_table(spark, sf_dir, "events")
    return dedup.dedup_by_business_key(
        events.withColumn("__ord", F.struct("ts", "event_id")),
        ["user_id", "event_type", "value"],
        "__ord",
    ).drop("__ord")


_PAGE, _PAGE_SIZE = 2, 500


@query(
    "paginated_extract",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
           o_orderpriority
    FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn FROM orders
    )
    WHERE rn > {_PAGE * _PAGE_SIZE} AND rn <= {(_PAGE + 1) * _PAGE_SIZE}
    """,
)
def paginated_extract_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic page of a keyed extract (ref: main_paginated.py
    LIMIT/OFFSET loop, re-expressed as a window)."""
    return sync.paginated_extract(
        load_table(spark, sf_dir, "orders"), ["o_orderkey"], _PAGE, _PAGE_SIZE
    )


@query(
    "chunked_backfill_plan",
    oracle="""
    WITH b AS (SELECT CAST(MIN(o_orderdate) AS DATE) AS mind FROM orders),
    w AS (
      SELECT CAST(FLOOR(date_diff('day', mind, CAST(o_orderdate AS DATE))
                        / 7.0) AS BIGINT) AS chunk_id,
             mind
      FROM orders CROSS JOIN b
    )
    SELECT chunk_id,
           MIN(mind) + CAST(chunk_id * 7 AS INTEGER) AS chunk_start,
           MIN(mind) + CAST((chunk_id + 1) * 7 AS INTEGER) AS chunk_end,
           COUNT(*) AS row_count
    FROM w GROUP BY chunk_id
    """,
)
def chunked_backfill_plan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day chunk plan for a backfill (ref: main_progressive.py
    get_next_date_chunk state machine, planned in one pass)."""
    return sync.chunked_backfill_plan(
        load_table(spark, sf_dir, "orders"), "o_orderdate", chunk_days=7
    )


@query(
    "column_value_drift",
    oracle="""
    WITH c AS (SELECT MAX(o_orderdate) - INTERVAL 30 DAY AS cut FROM orders),
    t AS (SELECT o.* FROM orders o CROSS JOIN c WHERE o.o_orderdate < cut),
    sp AS (
      SELECT COUNT(*) AS rows,
        CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nu1,
        MIN(CAST(o_totalprice AS DOUBLE)) AS mn1,
        MAX(CAST(o_totalprice AS DOUBLE)) AS mx1,
        CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sm1,
        CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nu2,
        MIN(CAST(o_custkey AS DOUBLE)) AS mn2,
        MAX(CAST(o_custkey AS DOUBLE)) AS mx2,
        CAST(ROUND(SUM(CAST(o_custkey AS DECIMAL(18,6))), 2) AS DOUBLE) AS sm2
      FROM orders
    ),
    tp AS (
      SELECT COUNT(*) AS rows,
        CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nu1,
        MIN(CAST(o_totalprice AS DOUBLE)) AS mn1,
        MAX(CAST(o_totalprice AS DOUBLE)) AS mx1,
        CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sm1,
        CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nu2,
        MIN(CAST(o_custkey AS DOUBLE)) AS mn2,
        MAX(CAST(o_custkey AS DOUBLE)) AS mx2,
        CAST(ROUND(SUM(CAST(o_custkey AS DECIMAL(18,6))), 2) AS DOUBLE) AS sm2
      FROM t
    ),
    u AS (
      SELECT 'o_totalprice' AS column_name,
             sp.rows AS src_rows, tp.rows AS tgt_rows,
             sp.nu1 AS src_nulls, tp.nu1 AS tgt_nulls,
             sp.mn1 AS src_min, tp.mn1 AS tgt_min,
             sp.mx1 AS src_max, tp.mx1 AS tgt_max,
             sp.sm1 AS src_sum, tp.sm1 AS tgt_sum
      FROM sp CROSS JOIN tp
      UNION ALL
      SELECT 'o_custkey',
             sp.rows, tp.rows, sp.nu2, tp.nu2, sp.mn2, tp.mn2,
             sp.mx2, tp.mx2, sp.sm2, tp.sm2
      FROM sp CROSS JOIN tp
    )
    SELECT *,
           ROUND(src_sum - tgt_sum, 2) AS sum_delta,
           (src_rows IS DISTINCT FROM tgt_rows
            OR src_nulls IS DISTINCT FROM tgt_nulls
            OR src_min IS DISTINCT FROM tgt_min
            OR src_max IS DISTINCT FROM tgt_max
            OR src_sum IS DISTINCT FROM tgt_sum) AS drift
    FROM u
    """,
)
def column_value_drift_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column source-vs-target value drift (ref:
    validate_snowflake_data.py value comparisons): the target is the
    incremental-lag scenario — missing the trailing 30 days."""
    orders = load_table(spark, sf_dir, "orders")
    cutoff = orders.agg(
        F.timestamp_add("DAY", F.lit(-30), F.max("o_orderdate")).alias("__c")
    )
    target = (
        orders.crossJoin(F.broadcast(cutoff))
        .filter(F.col("o_orderdate") < F.col("__c"))
        .drop("__c")
    )
    return quality.column_drift_profile(
        orders, target, ["o_totalprice", "o_custkey"]
    )


@query(
    "backfill_progress",
    oracle="""
    WITH b AS (SELECT CAST(MIN(o_orderdate) AS DATE) AS mind FROM orders),
    w AS (
      SELECT CAST(FLOOR(date_diff('day', mind, CAST(o_orderdate AS DATE))
                        / 7.0) AS BIGINT) AS chunk_id,
             mind
      FROM orders CROSS JOIN b
    ),
    p AS (
      SELECT chunk_id,
             MIN(mind) + CAST(chunk_id * 7 AS INTEGER) AS chunk_start,
             MIN(mind) + CAST((chunk_id + 1) * 7 AS INTEGER) AS chunk_end,
             COUNT(*) AS row_count
      FROM w GROUP BY chunk_id
    )
    SELECT chunk_id, chunk_start, chunk_end, row_count,
           CAST(SUM(row_count) OVER (ORDER BY chunk_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS rows_cum,
           ROUND(CAST(SUM(row_count) OVER (ORDER BY chunk_id
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / CAST(SUM(row_count) OVER () AS DOUBLE), 6) AS coverage_frac
    FROM p
    """,
)
def backfill_progress_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-advance view of the progressive backfill — the plan plus
    cumulative coverage share (ref: main_progressive.py tracker table +
    get_progressive_date_range weekly cycle, derived in one pass)."""
    from ..operators import backfill

    return backfill.backfill_progress(
        load_table(spark, sf_dir, "orders"), "o_orderdate", chunk_days=7
    )


@query(
    "cdc_fold_snapshot",
    oracle="""
    WITH last AS (
      SELECT user_id, event_type, value FROM (
        SELECT user_id, event_type, value,
               ROW_NUMBER() OVER (
                 PARTITION BY user_id ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM events
      ) WHERE rn = 1
    ),
    upserts AS (
      SELECT l.user_id AS c_custkey,
             COALESCE(c.c_name, 'NEW_USER') AS c_name,
             COALESCE(c.c_nationkey, 0) AS c_nationkey,
             CAST(ROUND(l.value, 2) AS DOUBLE) AS c_acctbal,
             COALESCE(c.c_mktsegment, 'CDC') AS c_mktsegment
      FROM last l LEFT JOIN customer c ON c.c_custkey = l.user_id
      WHERE l.event_type != 'error'
    ),
    deletes AS (SELECT user_id FROM last WHERE event_type = 'error')
    SELECT * FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM deletes d WHERE d.user_id = c.c_custkey)
      AND NOT EXISTS (SELECT 1 FROM upserts u WHERE u.c_custkey = c.c_custkey)
    UNION ALL
    SELECT * FROM upserts
    """,
)
def cdc_fold_snapshot_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fold an event changelog onto the customer snapshot: each user's
    latest event upserts (with refreshed balance) or deletes ('error') the
    row — debezium-style compaction the reference approximated with full
    reloads + the deduplication sync."""
    customer = load_table(spark, sf_dir, "customer")
    events = load_table(spark, sf_dir, "events")
    joined = events.join(
        F.broadcast(customer), events.user_id == customer.c_custkey, "left"
    )
    changelog = joined.select(
        F.col("user_id").alias("c_custkey"),
        F.coalesce(F.col("c_name"), F.lit("NEW_USER")).alias("c_name"),
        F.coalesce(F.col("c_nationkey"), F.lit(0)).alias("c_nationkey"),
        F.round(F.col("value"), 2).alias("c_acctbal"),
        F.coalesce(F.col("c_mktsegment"), F.lit("CDC")).alias("c_mktsegment"),
        F.when(F.col("event_type") == "error", F.lit("DELETE"))
        .otherwise(F.lit("UPSERT"))
        .alias("__op"),
        "ts",
        "event_id",
    )
    return cdc.fold_changelog(
        customer, changelog, ["c_custkey"], "ts", tiebreak_cols=["event_id"]
    )


@query(
    "incremental_agg_maintenance",
    oracle="""
    SELECT o_custkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS total_spend,
           COUNT(*) AS order_count
    FROM orders GROUP BY o_custkey
    """,
)
def incremental_agg_maintenance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain a per-customer aggregate incrementally: combine the
    pre-1999 partial aggregate with the 1999+ delta aggregate — the oracle
    recomputes from scratch, proving merge ≡ recompute (exact decimal
    sums make them bit-equal)."""
    from ..functions import dec, money

    orders = load_table(spark, sf_dir, "orders")
    cut = F.lit("1999-01-01").cast("timestamp_ntz")

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.sum(dec(F.col("o_totalprice"))).alias("__sum_dec"),
            F.count(F.lit(1)).alias("order_count"),
        )

    old = agg(orders.filter(F.col("o_orderdate") < cut))
    delta = agg(orders.filter(F.col("o_orderdate") >= cut))
    merged = sync.merge_partial_aggs(
        old, delta, ["o_custkey"], ["__sum_dec"], ["order_count"]
    )
    return merged.select(
        "o_custkey", money(F.col("__sum_dec")).alias("total_spend"), "order_count"
    )


@query(
    "stale_snapshot_audit",
    oracle="""
    WITH mx AS (SELECT MAX(CAST(ts AS DATE)) AS d FROM events)
    SELECT e.* FROM events e JOIN mx ON CAST(e.ts AS DATE) = mx.d
    WHERE NOT EXISTS (
      SELECT 1 FROM customer c
      WHERE c.c_custkey = e.user_id AND c.c_custkey % 7 != 0
    )
    """,
)
def stale_snapshot_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAFE reconciliation-delete plan: stale keys of the LATEST snapshot
    day only (ref CRITICAL_DELETE_LOGIC_FIX_SUMMARY.md — key-absence
    scoped to the current snapshot, never a blind date-range delete;
    empty-source refusal covered in tests/test_scale_ops.py)."""
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    source_keys = customer.filter(F.col("c_custkey") % 7 != 0).select(
        F.col("c_custkey").alias("user_id")
    )
    return sync.stale_snapshot_records(
        events, source_keys, ["user_id"], F.to_date(F.col("ts"))
    )


@query(
    "snapshot_changelog",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 13 != 0
    ),
    new_ AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 16.0
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 11 != 0
    )
    SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           a.o_orderstatus AS old_o_orderstatus,
           a.o_totalprice AS old_o_totalprice,
           b.o_orderstatus AS new_o_orderstatus,
           b.o_totalprice AS new_o_totalprice,
           CASE WHEN a.o_orderkey IS NULL THEN 'INSERT'
                WHEN b.o_orderkey IS NULL THEN 'DELETE'
                WHEN a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
                  OR a.o_totalprice IS DISTINCT FROM b.o_totalprice
                THEN 'UPDATE' END AS change_op
    FROM old a FULL OUTER JOIN new_ b USING (o_orderkey)
    WHERE CASE WHEN a.o_orderkey IS NULL THEN 'INSERT'
               WHEN b.o_orderkey IS NULL THEN 'DELETE'
               WHEN a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
                 OR a.o_totalprice IS DISTINCT FROM b.o_totalprice
               THEN 'UPDATE' END IS NOT NULL
    """,
)
def snapshot_changelog_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff -> I/U/D changelog (cdc_fold's inverse; the engine
    form of the reference's Python-side orphaned/missing key sets).
    Deterministic simulation: every 13th key absent from old, every 11th
    absent from new, every 7th price-bumped."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    old = orders.filter(F.col("o_orderkey") % 13 != 0)
    new = orders.filter(F.col("o_orderkey") % 11 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + F.lit(16.0)
        ).otherwise(F.col("o_totalprice")),
    )
    return cdc.snapshot_diff(
        old, new, ["o_orderkey"], ["o_orderstatus", "o_totalprice"]
    )
