"""Query registry: every operator from SURVEY.md §2 as a named
(spark, sf_dir) -> DataFrame callable, plus the DuckDB oracle SQL used by
the driver's correctness gate.

Column-name discipline: every computed column is aliased identically in the
Spark plan and the oracle SQL (the driver sorts columns by name and hashes
values). Money aggregates are computed in exact decimal then emitted as
round(x, 2) doubles on BOTH sides — see functions.DEC for why.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .operators import dedup, sync
from .plans import budget

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` marks a rows-only (non-SQL) op."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


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


# ---------------------------------------------------------------------------
# §2-B  Analytical views
# ---------------------------------------------------------------------------

_NET = "CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))"

@query(
    "budget_vs_actual",
    oracle=f"""
    WITH li AS (
      SELECT l_orderkey,
             CAST(ROUND(SUM({_NET}), 2) AS DOUBLE) AS actual_amount,
             CAST(ROUND(SUM(CASE WHEN l_tax > 0 THEN {_NET}
                                 ELSE CAST(0 AS DECIMAL(18,6)) END), 2) AS DOUBLE)
               AS billable_amount,
             CAST(ROUND(SUM(l_quantity), 2) AS DOUBLE) AS actual_qty,
             COUNT(*) AS entry_count,
             COUNT(DISTINCT l_suppkey) AS unique_contributors,
             MIN(l_shipdate) AS first_entry_date,
             MAX(l_shipdate) AS last_entry_date
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT
      o.o_orderkey AS order_key,
      o.o_orderstatus AS order_status,
      o.o_orderpriority AS order_priority,
      o.o_orderdate AS order_date,
      CAST(ROUND(o.o_totalprice, 2) AS DOUBLE) AS budget_amount,
      CAST(ROUND(COALESCE(li.actual_amount, 0.0), 2) AS DOUBLE) AS actual_amount,
      COALESCE(li.billable_amount, 0.0) AS billable_amount,
      COALESCE(li.actual_qty, 0.0) AS actual_qty,
      COALESCE(li.entry_count, 0) AS entry_count,
      COALESCE(li.unique_contributors, 0) AS unique_contributors,
      li.first_entry_date,
      li.last_entry_date,
      CAST(ROUND(ROUND(o.o_totalprice, 2) - COALESCE(li.actual_amount, 0.0), 2)
           AS DOUBLE) AS variance_amount,
      CASE WHEN ROUND(o.o_totalprice, 2) > 0 THEN
        CAST(ROUND(COALESCE(li.actual_amount, 0.0) / ROUND(o.o_totalprice, 2) * 100,
                   2) AS DOUBLE)
      END AS utilization_pct,
      CASE
        WHEN ROUND(o.o_totalprice, 2) > 0
             AND COALESCE(li.actual_amount, 0.0) > ROUND(o.o_totalprice, 2)
          THEN 'OVER_BUDGET'
        WHEN ROUND(o.o_totalprice, 2) > 0
             AND COALESCE(li.actual_amount, 0.0) > ROUND(o.o_totalprice, 2) * 0.8
          THEN 'APPROACHING_BUDGET'
        WHEN ROUND(o.o_totalprice, 2) > 0 THEN 'WITHIN_BUDGET'
        ELSE 'NO_BUDGET_SET'
      END AS budget_status
    FROM orders o LEFT JOIN li ON o.o_orderkey = li.l_orderkey
    """,
)
def budget_vs_actual_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order budget vs actual (ref: v4 view)."""
    return budget.budget_vs_actual(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


@query(
    "individual_budget_tracking",
    oracle=f"""
    WITH alloc AS (
      SELECT l_orderkey, l_suppkey,
             CAST(ROUND(SUM({_NET}), 2) AS DOUBLE) AS ind_budget_amount,
             CAST(ROUND(SUM(l_quantity), 2) AS DOUBLE) AS ind_budget_qty,
             COUNT(*) AS allocation_count
      FROM lineitem WHERE l_returnflag IN ('A', 'R')
      GROUP BY l_orderkey, l_suppkey
    ),
    time_ AS (
      SELECT l_orderkey, l_suppkey,
             CAST(ROUND(SUM({_NET}), 2) AS DOUBLE) AS ind_actual_amount,
             CAST(ROUND(SUM(CASE WHEN l_tax > 0 THEN {_NET}
                                 ELSE CAST(0 AS DECIMAL(18,6)) END), 2) AS DOUBLE)
               AS ind_billable_amount,
             CAST(ROUND(SUM(l_quantity), 2) AS DOUBLE) AS ind_actual_qty,
             COUNT(*) AS time_entry_count,
             MIN(l_shipdate) AS first_entry_date,
             MAX(l_shipdate) AS last_entry_date
      FROM lineitem WHERE l_returnflag = 'N'
      GROUP BY l_orderkey, l_suppkey
    ),
    contributors AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM (
        SELECT l_orderkey, l_suppkey FROM alloc
        UNION ALL
        SELECT l_orderkey, l_suppkey FROM time_
      )
    )
    SELECT
      c.l_orderkey AS order_key,
      c.l_suppkey AS contributor_key,
      o.o_orderstatus AS order_status,
      o.o_orderpriority AS order_priority,
      CAST(ROUND(o.o_totalprice, 2) AS DOUBLE) AS order_budget_total,
      COALESCE(a.ind_budget_amount, 0.0) AS ind_budget_amount,
      COALESCE(a.ind_budget_qty, 0.0) AS ind_budget_qty,
      COALESCE(a.allocation_count, 0) AS allocation_count,
      COALESCE(t.ind_actual_amount, 0.0) AS ind_actual_amount,
      COALESCE(t.ind_billable_amount, 0.0) AS ind_billable_amount,
      COALESCE(t.ind_actual_qty, 0.0) AS ind_actual_qty,
      COALESCE(t.time_entry_count, 0) AS time_entry_count,
      t.first_entry_date,
      t.last_entry_date,
      CAST(ROUND(COALESCE(a.ind_budget_amount, 0.0)
                 - COALESCE(t.ind_actual_amount, 0.0), 2) AS DOUBLE)
        AS ind_variance_amount,
      CASE WHEN COALESCE(a.ind_budget_amount, 0.0) > 0 THEN
        CAST(ROUND(COALESCE(t.ind_actual_amount, 0.0)
                   / COALESCE(a.ind_budget_amount, 0.0) * 100, 2) AS DOUBLE)
      END AS ind_utilization_pct,
      CASE
        WHEN COALESCE(a.ind_budget_amount, 0.0) > 0
             AND COALESCE(t.ind_actual_amount, 0.0)
                 > COALESCE(a.ind_budget_amount, 0.0)
          THEN 'OVER_BUDGET'
        WHEN COALESCE(a.ind_budget_amount, 0.0) > 0
             AND COALESCE(t.ind_actual_amount, 0.0)
                 > COALESCE(a.ind_budget_amount, 0.0) * 0.8
          THEN 'APPROACHING_BUDGET'
        WHEN COALESCE(a.ind_budget_amount, 0.0) > 0 THEN 'WITHIN_BUDGET'
        ELSE 'NO_BUDGET_SET'
      END AS ind_budget_status,
      CASE WHEN a.ind_budget_amount IS NOT NULL THEN 'INDIVIDUAL_BUDGET'
           ELSE 'NO_BUDGET' END AS budget_source,
      a.ind_budget_amount IS NOT NULL AS has_individual_budget,
      t.ind_actual_amount IS NOT NULL AS has_time_logged
    FROM contributors c
    LEFT JOIN alloc a ON c.l_orderkey = a.l_orderkey AND c.l_suppkey = a.l_suppkey
    LEFT JOIN time_ t ON c.l_orderkey = t.l_orderkey AND c.l_suppkey = t.l_suppkey
    LEFT JOIN orders o ON c.l_orderkey = o.o_orderkey
    """,
)
def individual_budget_tracking_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(order, contributor) budget vs actual — flagship (ref: v5 view)."""
    return budget.individual_budget_tracking(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )
