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


def _corpus_fingerprint(sf_dir: str, *tables: str) -> str:
    """Snapshot fingerprint of the given tables' parquet files (path, size,
    mtime).  The cross-query model/intermediate memos below key on
    ``(sf_dir, fingerprint)`` instead of the path alone, so a dataset
    REWRITTEN at the same path misses the cache and recomputes rather than
    silently serving stale pairs/models for the life of the process.
    Cost: a handful of ``os.stat`` calls per lookup — no data is read."""
    import hashlib
    import os

    h = hashlib.md5()
    for table in tables:
        p = os.path.join(sf_dir, f"{table}.parquet")
        paths = []
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                paths.extend(os.path.join(root, f) for f in files)
        elif os.path.exists(p):
            paths = [p]
        for fp in sorted(paths):
            st = os.stat(fp)
            h.update(f"{fp}|{st.st_size}|{st.st_mtime_ns};".encode())
    return h.hexdigest()


class _ModelMemo:
    """LRU-bounded memo for driver-resident trained model state (collected
    centroid/merge rows — O(model), never O(corpus)).

    Keys are ``(sf_dir, fingerprint, *params)``. ``put`` first drops
    entries for the same ``sf_dir`` whose fingerprint is superseded (the
    single-live-snapshot lifecycle the DataFrame pair-table memos use),
    then evicts least-recently-used entries beyond ``maxsize`` so a
    long-lived session cycling many corpora stays bounded.
    ``clear_model_caches()`` remains the manual hard-reset hook."""

    def __init__(self, maxsize: int = 8) -> None:
        from collections import OrderedDict

        self._d: "OrderedDict[tuple, object]" = OrderedDict()
        self.maxsize = maxsize

    def get(self, key: tuple):
        v = self._d.get(key)
        if v is not None:
            self._d.move_to_end(key)
        return v

    def put(self, key: tuple, value) -> None:
        for k in [k for k in self._d if k[0] == key[0] and k[1] != key[1]]:
            del self._d[k]
        self._d[key] = value
        self._d.move_to_end(key)
        while len(self._d) > self.maxsize:
            self._d.popitem(last=False)

    def clear(self) -> None:
        self._d.clear()

    def __len__(self) -> int:
        return len(self._d)


def clear_model_caches() -> None:
    """Explicit invalidation hook for every cross-query memo (pair tables,
    k-means centroids, BPE merges, DSIR weights) — the embedded-session
    hard-reset API (used by tools/scale_smoke.py) regardless of
    fingerprints."""
    for cache in (
        _JACCARD_PAIRS_CACHE,
        _MINHASH_PAIRS_CACHE,
        _DSIR_W_CACHE,
        _TOK_COUNTS_CACHE,
        _ASSIGN_CACHE,
        _SHINGLE_CACHE,
    ):
        for df in cache.values():
            df.unpersist(blocking=False)
        cache.clear()
    _CENTROID_CACHE.clear()
    _BPE_MERGE_CACHE.clear()


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

_NET = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))"

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
      END AS budget_status,
      o.o_orderdate + INTERVAL 30 DAY AS due_date,
      CASE
        WHEN o.o_orderdate + INTERVAL 30 DAY < TIMESTAMP '1998-06-17 00:00:00'
             AND o.o_orderstatus <> 'F' THEN 'OVERDUE'
        WHEN o.o_orderdate + INTERVAL 30 DAY
               <= TIMESTAMP '1998-06-17 00:00:00' + INTERVAL 3 DAY
             AND o.o_orderstatus <> 'F' THEN 'DUE_SOON'
        ELSE 'ON_TRACK'
      END AS schedule_status,
      COALESCE(o.o_orderdate + INTERVAL 30 DAY < TIMESTAMP '1998-06-17 00:00:00'
               AND o.o_orderstatus <> 'F', FALSE) AS is_overdue
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
      t.ind_actual_amount IS NOT NULL AS has_time_logged,
      o.o_orderdate + INTERVAL 30 DAY AS order_due_date,
      CASE
        WHEN o.o_orderdate + INTERVAL 30 DAY < TIMESTAMP '1998-06-17 00:00:00'
             AND o.o_orderstatus <> 'F' THEN 'OVERDUE'
        WHEN o.o_orderdate + INTERVAL 30 DAY
               <= TIMESTAMP '1998-06-17 00:00:00' + INTERVAL 3 DAY
             AND o.o_orderstatus <> 'F' THEN 'DUE_SOON'
        ELSE 'ON_TRACK'
      END AS order_schedule_status,
      COALESCE(o.o_orderdate + INTERVAL 30 DAY < TIMESTAMP '1998-06-17 00:00:00'
               AND o.o_orderstatus <> 'F', FALSE) AS is_order_overdue
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


# ---------------------------------------------------------------------------
# §2-B  Enrichment / rollup / pivot views
# ---------------------------------------------------------------------------

from .plans import enrichment  # noqa: E402
from .operators import anomaly, quality  # noqa: E402
from .plans import tpch  # noqa: E402


@query(
    "work_item_enriched",
    oracle="""
    SELECT
      o.o_orderkey AS order_key,
      o.o_orderdate AS order_date,
      o.o_orderstatus AS order_status,
      o.o_orderpriority AS order_priority,
      CAST(ROUND(o.o_totalprice, 2) AS DOUBLE) AS budget_amount,
      c.c_custkey AS customer_key,
      c.c_name AS customer_name,
      c.c_mktsegment AS market_segment,
      c.c_acctbal AS customer_acctbal,
      n.n_name AS nation_name,
      r.r_name AS region_name
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def work_item_enriched_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact × dimension-chain enrichment (ref: v5 view joins L422-450)."""
    return enrichment.work_item_enriched(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


@query(
    "utilization_rollup",
    oracle=f"""
    WITH li AS (
      SELECT l_orderkey, SUM({_NET}) AS actual_dec
      FROM lineitem GROUP BY l_orderkey
    ),
    g AS (
      SELECT r.r_name AS region_name, n.n_name AS nation_name,
             COUNT(*) AS order_count,
             CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS budget_total,
             CAST(ROUND(SUM(COALESCE(li.actual_dec, 0)), 2) AS DOUBLE)
               AS actual_total
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      LEFT JOIN li ON o.o_orderkey = li.l_orderkey
      GROUP BY r.r_name, n.n_name
    )
    SELECT region_name, nation_name, order_count, budget_total, actual_total,
           CAST(ROUND(budget_total - actual_total, 2) AS DOUBLE) AS variance_total,
           CASE WHEN budget_total > 0
                THEN ROUND(actual_total / budget_total * 100, 2)
           END AS utilization_pct
    FROM g
    """,
)
def utilization_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region/nation budget-vs-actual rollup (ref: dashboard aggregations)."""
    return enrichment.utilization_rollup(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


_PIVOT_YEAR = 1998

@query(
    "monthly_hours_pivot",
    oracle="\n".join(
        ["SELECT li.l_suppkey AS contributor_key, s.s_name AS contributor_name,"]
        + [
            f"  ROUND(SUM(CASE WHEN EXTRACT(YEAR FROM l_shipdate) = {_PIVOT_YEAR}"
            f" AND EXTRACT(MONTH FROM l_shipdate) = {m} THEN l_quantity"
            f" ELSE 0.0 END), 2) AS qty_m{m:02d},"
            for m in range(1, 13)
        ]
        + [
            f"  COUNT(CASE WHEN EXTRACT(YEAR FROM l_shipdate) = {_PIVOT_YEAR}"
            " THEN 1 END) AS entries_in_year",
            "FROM lineitem li LEFT JOIN supplier s ON li.l_suppkey = s.s_suppkey",
            "GROUP BY li.l_suppkey, s.s_name",
        ]
    ),
)
def monthly_hours_pivot_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-contributor monthly pivot (ref: v5 hours_logged_* L23-34)."""
    return enrichment.monthly_pivot(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
        _PIVOT_YEAR,
    )


# ---------------------------------------------------------------------------
# §2-C  Monitoring / data quality
# ---------------------------------------------------------------------------

@query(
    "row_count_by_day",
    oracle="""
    SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS row_count
    FROM events GROUP BY CAST(ts AS DATE), event_type
    """,
)
def row_count_by_day_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day per-type volume counts (ref: pipeline_monitoring.sql)."""
    return quality.row_count_by_day(
        load_table(spark, sf_dir, "events"), "ts", "event_type"
    )


_PROFILE_COLS = (
    "o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority",
)

@query(
    "data_quality_metrics",
    oracle="\nUNION ALL\n".join(
        f"""
        SELECT '{c}' AS column_name, COUNT(*) AS row_count,
               COUNT({c}) AS non_null_count,
               COUNT(*) - COUNT({c}) AS null_count,
               COUNT(DISTINCT {c}) AS distinct_count
        FROM orders
        """
        for c in _PROFILE_COLS
    ),
)
def data_quality_metrics_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column null/distinct profile (ref: data_quality_agent.py)."""
    return quality.profile_columns(
        load_table(spark, sf_dir, "orders"), _PROFILE_COLS
    )


@query(
    "volume_anomaly",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS event_count
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    stats AS (
      SELECT COUNT(*) AS n, SUM(event_count) AS s,
             SUM(event_count * event_count) AS ss
      FROM daily
    ),
    derived AS (
      SELECT n, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
             CAST(ss AS DOUBLE) / CAST(n AS DOUBLE) AS msq
      FROM stats
    ),
    d2 AS (
      SELECT n, mean,
             SQRT(GREATEST((msq - mean * mean)
                  * (CAST(n AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0)), 0.0)) AS sd
      FROM derived
    ),
    flagged AS (
      SELECT day, event_count, mean, sd,
             CASE WHEN n > 1 AND sd > 0
                  THEN ROUND((CAST(event_count AS DOUBLE) - mean) / sd, 4)
             END AS z
      FROM daily CROSS JOIN d2
    )
    SELECT day, event_count,
           ROUND(mean, 4) AS mean_count,
           ROUND(sd, 4) AS stddev_count,
           z AS z_score,
           COALESCE(ABS(z) > 2.0, FALSE) AS is_anomaly
    FROM flagged
    """,
)
def volume_anomaly_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-volume z-score anomalies (ref: anomaly_detection_agent.py)."""
    return anomaly.volume_anomaly(load_table(spark, sf_dir, "events"), "ts")


@query(
    "volume_anomaly_dow",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS event_count
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    d2 AS (
      SELECT day, event_count, CAST(dayofweek(day) AS INT) AS dow FROM daily
    ),
    stats AS (
      SELECT dow, COUNT(*) AS n, SUM(event_count) AS s,
             SUM(event_count * event_count) AS ss
      FROM d2 GROUP BY dow
    ),
    derived AS (
      SELECT dow, n, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
             CAST(ss AS DOUBLE) / CAST(n AS DOUBLE) AS msq
      FROM stats
    ),
    d3 AS (
      SELECT dow, n, mean,
             SQRT(GREATEST((msq - mean * mean)
                  * (CAST(n AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0)), 0.0)) AS sd
      FROM derived
    ),
    z AS (
      SELECT day, d2.dow, event_count, mean, sd,
             CASE WHEN n > 1 AND sd > 0
                  THEN ROUND((CAST(event_count AS DOUBLE) - mean) / sd, 4)
             END AS z_score
      FROM d2 JOIN d3 USING (dow)
    )
    SELECT day, dow, event_count,
           ROUND(mean, 4) AS mean_count,
           ROUND(sd, 4) AS stddev_count,
           z_score,
           COALESCE(ABS(z_score) > 2.0, FALSE) AS is_anomaly
    FROM z
    """,
)
def volume_anomaly_dow_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware volume anomalies — each day vs its own weekday's
    history (ref: anomaly_detection_agent.py:109-110,223 features
    sync_day_of_week before flagging)."""
    return anomaly.volume_anomaly_dow(
        load_table(spark, sf_dir, "events"), "ts"
    )


@query(
    "multivariate_anomaly",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS event_count,
             SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS vm,
             SUM(CAST(EXTRACT(hour FROM ts) AS BIGINT)) AS hs
      FROM events GROUP BY 1, 2
    ),
    feats AS (
      SELECT event_type, day, event_count,
             ROUND(CAST(vm AS DOUBLE) / CAST(event_count AS DOUBLE)
                   / 1000000.0, 6) AS avg_value,
             ROUND(CAST(hs AS DOUBLE) / CAST(event_count AS DOUBLE), 6)
               AS avg_hour
      FROM daily
    ),
    stats AS (
      SELECT event_type, COUNT(*) AS nd,
             SUM(CAST(CAST(event_count AS DOUBLE) AS DECIMAL(38,12))) AS s1,
             SUM(CAST(avg_value AS DECIMAL(38,12))) AS s2,
             SUM(CAST(avg_hour AS DECIMAL(38,12))) AS s3,
             SUM(CAST(CAST(event_count AS DOUBLE) * CAST(event_count AS DOUBLE)
                 AS DECIMAL(38,12))) AS s11,
             SUM(CAST(CAST(event_count AS DOUBLE) * avg_value
                 AS DECIMAL(38,12))) AS s12,
             SUM(CAST(CAST(event_count AS DOUBLE) * avg_hour
                 AS DECIMAL(38,12))) AS s13,
             SUM(CAST(avg_value * avg_value AS DECIMAL(38,12))) AS s22,
             SUM(CAST(avg_value * avg_hour AS DECIMAL(38,12))) AS s23,
             SUM(CAST(avg_hour * avg_hour AS DECIMAL(38,12))) AS s33
      FROM feats GROUP BY event_type
    ),
    means AS (
      SELECT event_type, nd,
             CAST(s1 AS DOUBLE) / CAST(nd AS DOUBLE) AS m1,
             CAST(s2 AS DOUBLE) / CAST(nd AS DOUBLE) AS m2,
             CAST(s3 AS DOUBLE) / CAST(nd AS DOUBLE) AS m3,
             CAST(s11 AS DOUBLE) / CAST(nd AS DOUBLE) AS e11,
             CAST(s12 AS DOUBLE) / CAST(nd AS DOUBLE) AS e12,
             CAST(s13 AS DOUBLE) / CAST(nd AS DOUBLE) AS e13,
             CAST(s22 AS DOUBLE) / CAST(nd AS DOUBLE) AS e22,
             CAST(s23 AS DOUBLE) / CAST(nd AS DOUBLE) AS e23,
             CAST(s33 AS DOUBLE) / CAST(nd AS DOUBLE) AS e33
      FROM stats
    ),
    cov AS (
      SELECT event_type, nd, m1, m2, m3,
             e11 - m1 * m1 AS c11, e12 - m1 * m2 AS c12,
             e13 - m1 * m3 AS c13, e22 - m2 * m2 AS c22,
             e23 - m2 * m3 AS c23, e33 - m3 * m3 AS c33
      FROM means
    ),
    covd AS (
      SELECT *,
             c11 * (c22 * c33 - c23 * c23)
             - c12 * (c12 * c33 - c13 * c23)
             + c13 * (c12 * c23 - c13 * c22) AS det
      FROM cov
    ),
    scored AS (
      SELECT f.event_type, f.day, f.event_count, f.avg_value, f.avg_hour,
             c.nd,
             CASE WHEN c.nd > 3 AND ABS(c.det) > 1e-9 THEN
               ((CAST(f.event_count AS DOUBLE) - c.m1)
                  * (CAST(f.event_count AS DOUBLE) - c.m1)
                  * (c.c22 * c.c33 - c.c23 * c.c23)
                + (f.avg_value - c.m2) * (f.avg_value - c.m2)
                  * (c.c11 * c.c33 - c.c13 * c.c13)
                + (f.avg_hour - c.m3) * (f.avg_hour - c.m3)
                  * (c.c11 * c.c22 - c.c12 * c.c12)
                + 2.0 * (CAST(f.event_count AS DOUBLE) - c.m1)
                  * (f.avg_value - c.m2) * (c.c13 * c.c23 - c.c12 * c.c33)
                + 2.0 * (CAST(f.event_count AS DOUBLE) - c.m1)
                  * (f.avg_hour - c.m3) * (c.c12 * c.c23 - c.c13 * c.c22)
                + 2.0 * (f.avg_value - c.m2) * (f.avg_hour - c.m3)
                  * (c.c12 * c.c13 - c.c11 * c.c23)) / c.det
             END AS md2
      FROM feats f JOIN covd c USING (event_type)
    ),
    dist AS (
      SELECT event_type, day, event_count, avg_value, avg_hour, nd,
             CASE WHEN md2 IS NOT NULL
                  THEN ROUND(SQRT(GREATEST(md2, 0.0)), 6) END AS mahalanobis
      FROM scored
    ),
    ranked AS (
      SELECT *,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY mahalanobis DESC NULLS LAST, day
             ) AS BIGINT) AS md_rank
      FROM dist
    )
    SELECT event_type, day, event_count, avg_value, avg_hour, mahalanobis,
           md_rank,
           mahalanobis IS NOT NULL
             AND md_rank <= GREATEST(CAST(1 AS BIGINT),
                   CAST(FLOOR(0.1 * CAST(nd AS DOUBLE)) AS BIGINT))
             AS is_anomaly
    FROM ranked
    """,
)
def multivariate_anomaly_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream multivariate (Mahalanobis) daily outlier score — the
    deterministic engine form of the reference's per-table IsolationForest
    anomaly models (anomaly_detection_agent.py:124-156, contamination
    0.1): full-covariance joint distance over (volume, mean value, mean
    hour) so correlation-breaking days flag even when every single feature
    stays in range."""
    return anomaly.multivariate_anomaly(load_table(spark, sf_dir, "events"))


@query(
    "bloom_filtered_entries",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS entry_count,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS total_qty
    FROM lineitem
    WHERE l_orderkey IN (
      SELECT o_orderkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-07-01'
        AND o_orderdate < TIMESTAMP '1997-10-01'
    )
    GROUP BY l_returnflag
    """,
)
def bloom_filtered_entries_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sync-window entry rollup through a runtime Bloom filter: the fact
    side is pruned by the window's order-key bitmap BEFORE the shuffle,
    then exactly verified with a left-semi join (operators/bloom.py). The
    Bloom pass has false positives only, so the result is identical to the
    oracle's plain IN-subquery — what changes is the bytes shuffled at
    100 TB. Mirrors the reference's windowed incremental sync scoping
    (*_sync_daily date-window delete+insert)."""
    from .operators import bloom as bloom_op

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    window_orders = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    ).select("o_orderkey")
    pruned = bloom_op.bloom_prefilter(
        lineitem.select("l_orderkey", "l_returnflag", "l_quantity"),
        "l_orderkey",
        window_orders,
        "o_orderkey",
    )
    from .functions import DEC

    return (
        pruned.join(
            window_orders,
            pruned.l_orderkey == window_orders.o_orderkey,
            "left_semi",
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("entry_count"),
            F.round(F.sum(F.col("l_quantity").cast(DEC)), 2)
            .cast("double")
            .alias("total_qty"),
        )
    )


@query(
    "freshness_check",
    oracle="""
    WITH per_type AS (
      SELECT event_type, MAX(ts) AS last_event_ts, COUNT(*) AS row_count
      FROM events GROUP BY event_type
    ),
    g AS (SELECT MAX(ts) AS gmax FROM events)
    SELECT event_type, last_event_ts, row_count,
           CAST(FLOOR((epoch_us(gmax) - epoch_us(last_event_ts)) / 1000000)
                AS BIGINT) AS lag_seconds,
           CAST(FLOOR((epoch_us(gmax) - epoch_us(last_event_ts)) / 1000000)
                AS BIGINT) > 86400 AS is_stale
    FROM per_type CROSS JOIN g
    """,
)
def freshness_check_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream staleness vs global watermark (ref:
    pipeline_fallback_monitor.py)."""
    return quality.freshness_check(
        load_table(spark, sf_dir, "events"), "ts", "event_type"
    )


@query(
    "row_count_compare",
    oracle="""
    WITH s AS (
      SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS source_count
      FROM orders GROUP BY CAST(o_orderdate AS DATE)
    ),
    t AS (
      SELECT CAST(l_shipdate AS DATE) AS day, COUNT(*) AS target_count
      FROM lineitem GROUP BY CAST(l_shipdate AS DATE)
    )
    SELECT COALESCE(s.day, t.day) AS day,
           COALESCE(s.source_count, 0) AS source_count,
           COALESCE(t.target_count, 0) AS target_count,
           COALESCE(s.source_count, 0) - COALESCE(t.target_count, 0) AS count_diff,
           COALESCE(s.source_count, 0) = COALESCE(t.target_count, 0) AS counts_match
    FROM s FULL OUTER JOIN t ON s.day = t.day
    """,
)
def row_count_compare_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-vs-target day-level count reconciliation (ref:
    validate_snowflake_data.py)."""
    return quality.row_count_compare(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        "o_orderdate",
        "l_shipdate",
    )


from .operators import alerts as alerts_op  # noqa: E402

#: Shared oracle CTE chain building the unified alert dataset — consumed
#: by both pipeline_alerts (the dataset) and alert_digest (its severity
#: rollup), so the two oracles can never drift apart.
_ALERTS_SQL_CTES = """daily AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS event_count
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    stats AS (
      SELECT COUNT(*) AS n, SUM(event_count) AS s,
             SUM(event_count * event_count) AS ss
      FROM daily
    ),
    derived AS (
      SELECT n, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
             CAST(ss AS DOUBLE) / CAST(n AS DOUBLE) AS msq
      FROM stats
    ),
    d2 AS (
      SELECT n, mean,
             SQRT(GREATEST((msq - mean * mean)
                  * (CAST(n AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0)), 0.0)) AS sd
      FROM derived
    ),
    flagged AS (
      SELECT d, event_count,
             CASE WHEN n > 1 AND sd > 0
                  THEN ROUND((CAST(event_count AS DOUBLE) - mean) / sd, 4)
             END AS z
      FROM daily CROSS JOIN d2
    ),
    per_type AS (
      SELECT event_type, MAX(ts) AS last_ts FROM events GROUP BY event_type
    ),
    g AS (SELECT MAX(ts) AS gmax FROM events),
    fresh AS (
      SELECT event_type,
             CAST(FLOOR((epoch_us(gmax) - epoch_us(last_ts)) / 1000000)
                  AS BIGINT) AS lag_s
      FROM per_type CROSS JOIN g
    ),
    dup AS (
      SELECT user_id, event_type, value, COUNT(*) AS dup_count FROM events
      GROUP BY user_id, event_type, value HAVING COUNT(*) > 1
    ),
    s AS (
      SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS source_count
      FROM orders GROUP BY 1
    ),
    t AS (
      SELECT CAST(l_shipdate AS DATE) AS d, COUNT(*) AS target_count
      FROM lineitem GROUP BY 1
    ),
    recon AS (
      SELECT COALESCE(s.d, t.d) AS d, COALESCE(s.source_count, 0) AS sc,
             COALESCE(t.target_count, 0) AS tc
      FROM s FULL OUTER JOIN t ON s.d = t.d
    ),
    unioned AS (
      SELECT 'volume' AS alert_source, CAST(d AS VARCHAR) AS entity,
             'daily_volume_z' AS metric, ABS(z) AS observed,
             CAST(2.0 AS DOUBLE) AS threshold,
             CASE WHEN ABS(z) > 3.0 THEN 'CRITICAL' ELSE 'WARNING' END AS severity
      FROM flagged WHERE COALESCE(ABS(z) > 2.0, FALSE)
      UNION ALL
      SELECT 'freshness', event_type, 'watermark_lag_seconds',
             CAST(lag_s AS DOUBLE), CAST(1800.0 AS DOUBLE),
             CASE WHEN lag_s > 3600 THEN 'CRITICAL' ELSE 'WARNING' END
      FROM fresh WHERE lag_s > 1800
      UNION ALL
      SELECT 'dedup',
             CAST(user_id AS VARCHAR) || '|' || event_type || '|'
               || CAST(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS VARCHAR),
             'duplicate_key_count', CAST(dup_count AS DOUBLE), CAST(1.0 AS DOUBLE),
             CASE WHEN dup_count > 2 THEN 'CRITICAL' ELSE 'WARNING' END
      FROM dup
      UNION ALL
      SELECT 'reconciliation', CAST(d AS VARCHAR), 'day_count_drift',
             CAST(ABS(sc - tc) AS DOUBLE), CAST(0.0 AS DOUBLE),
             CASE WHEN CAST(ABS(sc - tc) AS DOUBLE) > 0.5 * CAST(sc AS DOUBLE)
                  THEN 'CRITICAL' ELSE 'WARNING' END
      FROM recon WHERE sc != tc
    ),
    alerts AS (
      SELECT *,
             CASE
               WHEN alert_source = 'freshness' AND severity = 'CRITICAL'
                 THEN 'trigger_fallback_sync'
               WHEN alert_source = 'freshness' THEN 'schedule_catchup_sync'
               WHEN alert_source = 'volume' AND severity = 'CRITICAL'
                 THEN 'trigger_full_resync'
               WHEN alert_source = 'volume' THEN 'flag_for_review'
               WHEN alert_source = 'dedup' THEN 'run_dedup_cleanup'
               WHEN severity = 'CRITICAL' THEN 'backfill_date_window'
               ELSE 'flag_for_review'
             END AS recommended_action,
             CASE
               WHEN alert_source = 'freshness'
                 THEN entity || '_fallback_daily_sync'
               WHEN alert_source = 'volume' THEN 'events_full_sync'
               WHEN alert_source = 'dedup' THEN 'dedup_reconciliation_sync'
               ELSE 'daily_incremental_sync'
             END AS target_pipeline
      FROM unioned
    )"""


@query(
    "pipeline_alerts",
    oracle=f"""
    WITH {_ALERTS_SQL_CTES}
    SELECT * FROM alerts
    """,
)
def pipeline_alerts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unified severity-ranked alert dataset folding the four monitors
    (ref: pipeline_fallback_monitor.py main flow + slack_integration_agent
    payloads, minus the delivery transport)."""
    return alerts_op.pipeline_alerts(
        load_table(spark, sf_dir, "events"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


@query(
    "alert_digest",
    oracle=f"""
    WITH {_ALERTS_SQL_CTES},
    summary AS (
      SELECT alert_source, COUNT(*) AS alerts_total,
             COUNT(CASE WHEN severity = 'CRITICAL' THEN 1 END)
               AS critical_count,
             COUNT(CASE WHEN severity != 'CRITICAL' THEN 1 END)
               AS warning_count,
             COUNT(DISTINCT entity) AS distinct_entities
      FROM alerts GROUP BY alert_source
    ),
    worst AS (
      SELECT alert_source, entity AS worst_entity,
             observed AS worst_observed, severity AS worst_severity,
             ROW_NUMBER() OVER (PARTITION BY alert_source ORDER BY
               CASE WHEN severity = 'CRITICAL' THEN 0 ELSE 1 END,
               observed DESC, entity) AS rn
      FROM alerts
    ),
    acts AS (
      SELECT alert_source, recommended_action, COUNT(*) AS n
      FROM alerts GROUP BY alert_source, recommended_action
    ),
    top_act AS (
      SELECT alert_source, recommended_action AS top_action,
             ROW_NUMBER() OVER (PARTITION BY alert_source
               ORDER BY n DESC, recommended_action) AS rn
      FROM acts
    )
    SELECT s.alert_source, s.alerts_total, s.critical_count,
           s.warning_count, s.distinct_entities, w.worst_entity,
           w.worst_observed, w.worst_severity, t.top_action
    FROM summary s
    JOIN worst w ON s.alert_source = w.alert_source AND w.rn = 1
    JOIN top_act t ON s.alert_source = t.alert_source AND t.rn = 1
    """,
)
def alert_digest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Severity-rolled alert digest — the reference's report-assembly step
    (pipeline_fallback_monitor.py:247, data_quality_agent.py:244 build
    severity-ranked digests) as a dataset: per monitor section, alert
    counts by severity, worst offender, dominant recommended action."""
    return alerts_op.alert_digest(
        load_table(spark, sf_dir, "events"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


# ---------------------------------------------------------------------------
# §2-D  Classic analytics (bench headliners)
# ---------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS sum_base_price,
           CAST(ROUND(SUM({_NET}), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                            AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
           ROUND(SUM(l_quantity) / COUNT(*), 4) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 4) AS avg_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{tpch.Q1_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch.q1_pricing_summary(load_table(spark, sf_dir, "lineitem"))


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey AS order_key,
           CAST(ROUND(SUM({_NET}), 2) AS DOUBLE) AS revenue,
           o.o_orderdate AS order_date,
           o.o_orderpriority AS order_priority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = '{tpch.Q3_SEGMENT}'
      AND o.o_orderdate < TIMESTAMP '{tpch.Q3_DATE}'
      AND l.l_shipdate > TIMESTAMP '{tpch.Q3_DATE}'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, order_key
    LIMIT 10
    """,
)
def q3_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch.q3_shipping_priority(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


@query(
    "q5_supplier_volume",
    oracle=f"""
    SELECT n.n_name AS nation_name,
           CAST(ROUND(SUM({_NET}), 2) AS DOUBLE) AS revenue
    FROM customer c, orders o, lineitem l, supplier s, nation n, region r
    WHERE c.c_custkey = o.o_custkey
      AND l.l_orderkey = o.o_orderkey
      AND l.l_suppkey = s.s_suppkey
      AND c.c_nationkey = s.s_nationkey
      AND s.s_nationkey = n.n_nationkey
      AND n.n_regionkey = r.r_regionkey
      AND r.r_name = '{tpch.Q5_REGION}'
      AND o.o_orderdate >= TIMESTAMP '{tpch.Q5_START}'
      AND o.o_orderdate < TIMESTAMP '{tpch.Q5_END}'
    GROUP BY n.n_name
    """,
)
def q5_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch.q5_supplier_volume(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


# ---------------------------------------------------------------------------
# §2-E  LLM-training-data ops
# ---------------------------------------------------------------------------

from .operators import neardup, similarity, text  # noqa: E402


@query(
    "dedup_exact",
    oracle="""
    WITH h AS (SELECT doc_id, md5(text) AS content_hash FROM documents),
    g AS (
      SELECT content_hash, MIN(doc_id) AS canonical_doc_id,
             COUNT(*) AS dup_group_size
      FROM h GROUP BY content_hash
    )
    SELECT h.doc_id, h.content_hash, g.canonical_doc_id,
           h.doc_id != g.canonical_doc_id AS is_duplicate,
           g.dup_group_size
    FROM h JOIN g USING (content_hash)
    """,
)
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dup groups via content hash (hash-groupBy dedup)."""
    return neardup.exact_dedup(load_table(spark, sf_dir, "documents"))


@query(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '[ \t\n\r]+', ' ', 'g')))
             AS fingerprint,
           CAST(LENGTH(trim(regexp_replace(lower(text), '[ \t\n\r]+', ' ', 'g')))
                AS BIGINT) AS n_chars_norm
    FROM documents
    """,
)
def doc_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 fingerprint of normalized text."""
    return text.fingerprint(load_table(spark, sf_dir, "documents"))


@query(
    "text_stats",
    oracle="""
    WITH t AS (
      SELECT doc_id, text,
             CAST(LENGTH(text) AS BIGINT) AS n_chars,
             CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(regexp_extract_all(text, '[a-z0-9]+')))
                  AS BIGINT) AS n_distinct_tokens,
             CAST(LENGTH(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT)
               AS n_alpha_chars,
             CAST(LENGTH(text) - LENGTH(regexp_replace(text, ' ', '', 'g'))
                  AS BIGINT) AS n_spaces
      FROM documents
    )
    SELECT doc_id, n_chars, n_tokens, n_distinct_tokens, n_alpha_chars,
           CASE WHEN n_tokens > 0
                THEN ROUND(CAST(n_alpha_chars AS DOUBLE) / n_tokens, 4)
           END AS avg_token_len,
           CASE WHEN n_chars > 0
                THEN ROUND(CAST(n_spaces AS DOUBLE) / n_chars, 4)
           END AS whitespace_ratio
    FROM t
    """,
)
def text_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token/size statistics."""
    return text.text_stats(load_table(spark, sf_dir, "documents"))


@query(
    "token_count_bpe",
    # The pretokenizer pattern embeds a single quote (contractions) —
    # doubled for the SQL literal.
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '{text.BPE_RE.replace("'", "''")}')) AS BIGINT)
               AS n_bpe_tokens,
             CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT)
               AS n_ws_tokens
      FROM documents
    )
    SELECT doc_id, n_bpe_tokens, n_ws_tokens,
           CASE WHEN n_ws_tokens > 0
                THEN ROUND(CAST(n_bpe_tokens AS DOUBLE) / n_ws_tokens, 4)
                ELSE 0.0
           END AS bpe_per_word
    FROM t
    """,
)
def token_count_bpe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counts under a BPE-ish pretokenizer (GPT-2-style segments,
    lookahead-free) vs whitespace words — the token-budget calibration
    view a training-data pipeline runs before sampling."""
    return text.bpe_token_stats(load_table(spark, sf_dir, "documents"))


@query(
    "text_quality_score",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(regexp_extract_all(text, '[a-z0-9]+')))
                  AS BIGINT) AS n_distinct,
             CAST(len(regexp_extract_all(text, '\b(the|a|is|and|of|to|in)\b'))
                  AS BIGINT) AS stop_hits
      FROM documents
    ),
    s AS (
      SELECT doc_id, n_tokens,
             ROUND(
               0.4 * LEAST(CAST(n_tokens AS DOUBLE) / 50.0, 1.0)
               + 0.3 * (1.0 - LEAST(
                   (CASE WHEN n_tokens > 0
                         THEN CAST(stop_hits AS DOUBLE) / n_tokens
                         ELSE 0.0 END) * 2.0, 1.0))
               + 0.3 * (CASE WHEN n_tokens > 0
                             THEN CAST(n_distinct AS DOUBLE) / n_tokens
                             ELSE 0.0 END),
               4) AS quality_score
      FROM t
    )
    SELECT doc_id, n_tokens, quality_score,
           CASE WHEN quality_score >= 0.75 THEN 'high'
                WHEN quality_score >= 0.5 THEN 'medium'
                ELSE 'low' END AS quality_bucket
    FROM s
    """,
)
def text_quality_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring (C4/Gopher-style filter composition)."""
    return text.quality_score(load_table(spark, sf_dir, "documents"))


@query(
    "lang_id",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_tokens,
             CAST(len(regexp_extract_all(text, '\b(the|a|is|and|of|to|in)\b'))
                  AS BIGINT) AS en_hits
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN n_tokens > 0 AND en_hits * 5 >= n_tokens THEN 'en'
                ELSE 'unknown' END AS predicted_lang,
           CASE WHEN n_tokens > 0
                THEN ROUND(CAST(en_hits AS DOUBLE) / n_tokens, 4)
           END AS en_hit_ratio
    FROM t
    """,
)
def lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language heuristic."""
    return text.lang_id(load_table(spark, sf_dir, "documents"))


_JACCARD_TAU = 0.6

_SHINGLE_SQL = """
    sp AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
        FROM sp
      )
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id)
"""

#: Shared hashed-shingle index (doc_id, __h): containment, novelty and
#: SimHash all start from exactly this table (same tokenizing, same
#: xxhash64) — the standing index a production near-dup pipeline keeps
#: between runs. Fingerprint-keyed, single live handle, MEMORY_AND_DISK.
_SHINGLE_CACHE: dict[tuple[str, str], DataFrame] = {}


def _shingles_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (sf_dir, _corpus_fingerprint(sf_dir, "documents"))
    df = _SHINGLE_CACHE.get(key)
    if df is None:
        for old in _SHINGLE_CACHE.values():
            old.unpersist(blocking=False)
        _SHINGLE_CACHE.clear()
        from pyspark.storagelevel import StorageLevel

        df = neardup.hashed_shingles(
            load_table(spark, sf_dir, "documents")
        ).persist(StorageLevel.MEMORY_AND_DISK)
        _SHINGLE_CACHE[key] = df
    return df


#: Shared exact-Jaccard pair table: the pair view (`ngram_jaccard_dups`)
#: and the cluster resolution built on it (`dedup_clusters`) consume the
#: SAME pairs — a real pipeline materializes that intermediate once. One
#: live handle (previous corpus released on swap, like operators/_cache);
#: the table is near-dup-pair sized (tiny vs corpus), MEMORY_AND_DISK.
_JACCARD_PAIRS_CACHE: dict[tuple[str, str], DataFrame] = {}


def _jaccard_pairs_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (sf_dir, _corpus_fingerprint(sf_dir, "documents"))
    df = _JACCARD_PAIRS_CACHE.get(key)
    if df is None:
        for old in _JACCARD_PAIRS_CACHE.values():
            old.unpersist(blocking=False)
        _JACCARD_PAIRS_CACHE.clear()
        from pyspark.storagelevel import StorageLevel

        # sh= : consume the shared hashed-shingle memo instead of letting
        # ngram_jaccard_pairs build (and _swap_cache-persist) a second
        # copy of the identical (doc_id, __h) index the containment/
        # novelty/simhash family already holds.
        df = neardup.ngram_jaccard_pairs(
            load_table(spark, sf_dir, "documents"),
            _JACCARD_TAU,
            sh=_shingles_for(spark, sf_dir),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        _JACCARD_PAIRS_CACHE[key] = df
    return df


@query(
    "ngram_jaccard_dups",
    oracle=f"""
    WITH {_SHINGLE_SQL},
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             COUNT(*) AS intersection_size
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, intersection_size,
           sa.sz AS size_a, sb.sz AS size_b,
           CAST(intersection_size AS DOUBLE)
             / (sa.sz + sb.sz - intersection_size) AS jaccard
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE CAST(intersection_size AS DOUBLE)
          / (sa.sz + sb.sz - intersection_size) >= {_JACCARD_TAU}
    """,
)
def ngram_jaccard_dups_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs."""
    return _jaccard_pairs_for(spark, sf_dir)


@query(
    "doc_novelty_profile",
    oracle=f"""
    WITH {_SHINGLE_SQL},
    first AS (
      SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle
    )
    SELECT s.doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           ROUND(CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0
                          END) AS DOUBLE) / COUNT(*), 6) AS novelty_share
    FROM sh s JOIN first f USING (shingle)
    GROUP BY s.doc_id
    """,
)
def doc_novelty_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc novelty share (first-occurrence shingle attribution) —
    dedup-aware corpus growth accounting; consumes the memoized
    hashed-shingle index shared with containment and SimHash."""
    return neardup.doc_novelty(
        load_table(spark, sf_dir, "documents"),
        sh=_shingles_for(spark, sf_dir),
    )


_CONTAINMENT_TAU = 0.8


@query(
    "ngram_containment_dups",
    oracle=f"""
    WITH {_SHINGLE_SQL},
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             COUNT(*) AS intersection_size
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, intersection_size,
           sa.sz AS size_a, sb.sz AS size_b,
           ROUND(CAST(intersection_size AS DOUBLE) / sa.sz, 6)
             AS containment_a,
           ROUND(CAST(intersection_size AS DOUBLE) / sb.sz, 6)
             AS containment_b
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE GREATEST(CAST(intersection_size AS DOUBLE) / sa.sz,
                   CAST(intersection_size AS DOUBLE) / sb.sz)
          >= {_CONTAINMENT_TAU}
    """,
)
def ngram_containment_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dups (Broder 1997): subset/quotation
    pairs that symmetric Jaccard misses; same hashed-shingle join shape
    as the Jaccard op, consuming the memoized shingle index."""
    return neardup.ngram_containment_pairs(
        load_table(spark, sf_dir, "documents"),
        _CONTAINMENT_TAU,
        sh=_shingles_for(spark, sf_dir),
    )


@query("minhash_recall_report")  # rows-only: minhash is xxhash64-dependent
def minhash_recall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dedup-QA report: recall/precision of the MinHash+LSH path
    vs exact Jaccard ground truth (floor asserted in tests); consumes the
    memoized pair tables the dedup queries already materialized."""
    return neardup.minhash_recall_report(
        _jaccard_pairs_for(spark, sf_dir),
        _minhash_pairs_for(spark, sf_dir),
    )


#: Memoized MinHash+LSH pair table per sf_dir — the pair view and the
#: recall report share it (same pattern/lifecycle as _JACCARD_PAIRS_CACHE).
_MINHASH_PAIRS_CACHE: dict[tuple[str, str], DataFrame] = {}


def _minhash_pairs_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (sf_dir, _corpus_fingerprint(sf_dir, "documents"))
    df = _MINHASH_PAIRS_CACHE.get(key)
    if df is None:
        for old in _MINHASH_PAIRS_CACHE.values():
            old.unpersist(blocking=False)
        _MINHASH_PAIRS_CACHE.clear()
        from pyspark.storagelevel import StorageLevel

        df = neardup.minhash_lsh_pairs(
            load_table(spark, sf_dir, "documents"), _JACCARD_TAU
        ).persist(StorageLevel.MEMORY_AND_DISK)
        _MINHASH_PAIRS_CACHE[key] = df
    return df


@query("dedup_minhash_lsh")  # rows-only: depends on Spark xxhash64
def dedup_minhash_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-verified (recall vs exact Jaccard
    is asserted in tests/test_neardup.py)."""
    return _minhash_pairs_for(spark, sf_dir)


@query("dedup_simhash")  # rows-only: depends on Spark xxhash64
def dedup_simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash hamming-banded near-dup pairs over the memoized
    hashed-shingle index (the feature hash is the Jaccard family's
    xxhash64 shingle hash)."""
    return neardup.simhash_pairs(
        load_table(spark, sf_dir, "documents"),
        sh=_shingles_for(spark, sf_dir),
    )


_ANN_DIMS = 64
_COS_SQL = (
    "list_aggregate(list_transform(range(1,{d}), i -> {a}.e[i]*{b}.e[i]), 'sum') "
    "/ (SQRT(list_aggregate(list_transform(range(1,{d}), i -> {a}.e[i]*{a}.e[i]), 'sum')) "
    "* SQRT(list_aggregate(list_transform(range(1,{d}), i -> {b}.e[i]*{b}.e[i]), 'sum')))"
)

@query(
    "ann_cosine_topk",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    q AS (SELECT vec_id, e FROM v WHERE vec_id < 10),
    pairs AS (
      SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
             ROUND({_COS_SQL.format(d=_ANN_DIMS + 1, a='q', b='v')}, 6) AS cosine
      FROM q JOIN v ON v.vec_id != q.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
             ) AS rank
      FROM pairs
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
    """,
)
def ann_cosine_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 per query vector (exactness baseline)."""
    df = similarity.cosine_topk(
        load_table(spark, sf_dir, "embeddings"), F.col("vec_id") < 10, k=5
    )
    return df.withColumn("rank", F.col("rank").cast("long"))


@query("ann_lsh_topk")  # rows-only: hyperplanes derive from Spark xxhash64
def ann_lsh_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucketed ANN (the 100 TB scale path; recall vs
    brute force asserted in tests/test_similarity.py)."""
    df = similarity.lsh_topk(
        load_table(spark, sf_dir, "embeddings"), F.col("vec_id") < 10, k=5
    )
    return df.withColumn("rank", F.col("rank").cast("long"))


_DUP_COS_TAU = 0.3  # synthetic embeddings are near-orthogonal; real
                    # text-embedding dedup would sit at ~0.95

@query(
    "embedding_dup_pairs",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
      WHERE vec_id % 10 = 0
    ),
    p AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             ROUND({_COS_SQL.format(d=_ANN_DIMS + 1, a='a', b='b')}, 6) AS cosine
      FROM v a JOIN v b ON a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, cosine FROM p WHERE cosine >= {_DUP_COS_TAU}
    """,
)
def embedding_dup_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs. τ=0.3 sits in the BULK of this
    corpus's cosine distribution, so no candidate generator can prune —
    the blocked exact scan (block-grid equi-join + BLAS-scored cells, no
    CartesianProduct node) is the honest plan; the LSH path stays the
    high-τ route and keeps full-recall tests. The keyspace sample keeps
    the all-pairs DuckDB oracle tractable."""
    return similarity.dup_pairs(
        load_table(spark, sf_dir, "embeddings"),
        _DUP_COS_TAU,
        sample_mod=10,
        method="blocked",
    )


# ---------------------------------------------------------------------------
# §2-F  Streaming (batch twin of the streaming windowed-count sync)
# ---------------------------------------------------------------------------

from .streaming import incremental  # noqa: E402


@query(
    "events_windowed_counts",
    oracle="""
    SELECT make_timestamp(epoch_us(ts) - epoch_us(ts) % 300000000)
             AS window_start,
           make_timestamp(epoch_us(ts) - epoch_us(ts) % 300000000 + 300000000)
             AS window_end,
           event_type,
           COUNT(*) AS event_count
    FROM events
    GROUP BY 1, 2, event_type
    """,
)
def events_windowed_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute windowed counts — batch twin of the streaming
    incremental sync (streaming/incremental.py); the streaming path is
    asserted equal to this in tests/test_streaming.py."""
    return incremental.windowed_counts_batch(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# §2-B/C widening: dashboard rollups, variance, sessions, pagination, TPC-H
# ---------------------------------------------------------------------------

from .plans import dashboard  # noqa: E402


@query(
    "client_budget_rollup",
    oracle=f"""
    WITH li AS (
      SELECT l_orderkey, SUM({_NET}) AS actual_dec
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT c.c_custkey AS client_key, c.c_name AS client_name,
           COUNT(*) AS order_count,
           CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS total_budgeted,
           CAST(ROUND(SUM(COALESCE(li.actual_dec, 0)), 2) AS DOUBLE)
             AS total_actual
    FROM orders o
    LEFT JOIN li ON o.o_orderkey = li.l_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def client_budget_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-client budget/actual totals (ref: dashboard/main.py L1660-1678)."""
    return dashboard.client_budget_rollup(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "customer"),
    )


@query(
    "contributor_utilization_rollup",
    oracle=f"""
    WITH per AS (
      SELECT l_suppkey AS contributor_key,
             COUNT(DISTINCT l_orderkey) AS orders_contributed,
             CAST(ROUND(SUM(CASE WHEN l_returnflag IN ('A', 'R')
                                 THEN {_NET} END), 2) AS DOUBLE) AS alloc_n,
             CAST(ROUND(SUM(CASE WHEN l_returnflag = 'N'
                                 THEN {_NET} END), 2) AS DOUBLE) AS actual_n,
             CAST(ROUND(SUM(CASE WHEN l_returnflag = 'N' AND l_tax > 0
                                 THEN {_NET} END), 2) AS DOUBLE) AS billable_n,
             COUNT(CASE WHEN l_returnflag IN ('A', 'R') THEN 1 END)
               AS allocation_count,
             COUNT(CASE WHEN l_returnflag = 'N' THEN 1 END)
               AS time_entry_count,
             MIN(CASE WHEN l_returnflag = 'N' THEN l_shipdate END)
               AS first_entry_date,
             MAX(CASE WHEN l_returnflag = 'N' THEN l_shipdate END)
               AS last_entry_date
      FROM lineitem GROUP BY l_suppkey
    ),
    en AS (
      SELECT p.*, d.s_name, d.n_name,
             COALESCE(p.alloc_n, 0.0) AS alloc_amount,
             COALESCE(p.actual_n, 0.0) AS actual_amount,
             CASE WHEN COALESCE(p.alloc_n, 0.0) > 0 THEN
               CAST(ROUND(COALESCE(p.actual_n, 0.0)
                          / COALESCE(p.alloc_n, 0.0) * 100, 2) AS DOUBLE)
             END AS util
      FROM per p
      LEFT JOIN (
        SELECT s.s_suppkey, s.s_name, n.n_name
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
      ) d ON p.contributor_key = d.s_suppkey
    )
    SELECT contributor_key, s_name AS contributor_name, n_name AS team_name,
           orders_contributed, alloc_amount, actual_amount,
           COALESCE(billable_n, 0.0) AS billable_amount,
           allocation_count, time_entry_count,
           first_entry_date, last_entry_date,
           util AS utilization_pct,
           CASE WHEN alloc_amount <= 0 THEN 'NO_BUDGET'
                WHEN util > 100 THEN 'OVER_ALLOCATED'
                WHEN util >= 80 THEN 'HIGH'
                WHEN util >= 50 THEN 'HEALTHY'
                ELSE 'UNDER_UTILIZED'
           END AS utilization_bucket
    FROM en
    """,
)
def contributor_utilization_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-member utilization with team attributes (ref: dashboard/main.py
    member/team grain tables; v5 view's primary dashboard consumer)."""
    return dashboard.contributor_utilization_rollup(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
    )


@query(
    "view_variance_detection",
    oracle=f"""
    WITH per AS (
      SELECT l_suppkey AS contributor_key,
             CAST(ROUND(SUM({_NET}), 2) AS DOUBLE) AS view_a_total,
             CAST(ROUND(SUM(CASE WHEN l_returnflag = 'N' THEN {_NET} END), 2)
                  AS DOUBLE) AS view_b_total_n,
             COUNT(*) AS view_a_entries,
             COUNT(CASE WHEN l_returnflag = 'N' THEN 1 END) AS view_b_entries
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT contributor_key, view_a_total,
           COALESCE(view_b_total_n, 0.0) AS view_b_total,
           view_a_entries, view_b_entries,
           CAST(ROUND(view_a_total - COALESCE(view_b_total_n, 0.0), 2) AS DOUBLE)
             AS variance_amount,
           ROUND(view_a_total - COALESCE(view_b_total_n, 0.0), 2) != 0.0
             AS has_variance
    FROM per
    """,
)
def view_variance_detection_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-view totals variance per contributor (ref:
    TIME_ENTRY_VARIANCE_ANALYSIS.md)."""
    return dashboard.view_variance_detection(load_table(spark, sf_dir, "lineitem"))


@query(
    "event_sessions",
    oracle="""
    WITH s AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s2 AS (
      SELECT *, CAST(SUM(is_new) OVER (
        PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
      ) AS BIGINT) AS session_seq
      FROM s
    )
    SELECT user_id, session_seq,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE)
             AS total_value
    FROM s2 GROUP BY user_id, session_seq
    """,
)
def event_sessions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-minute silence boundary)."""
    return dashboard.event_sessions(load_table(spark, sf_dir, "events"))


@query(
    "user_running_totals",
    oracle="""
    SELECT user_id, event_id, ts,
           CAST(COUNT(*) OVER w AS BIGINT) AS running_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))) OVER w, 4) AS DOUBLE)
             AS running_value
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
    )
    """,
)
def user_running_totals_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-user totals — batch twin of the streaming stateful
    operator (streaming/stateful.py)."""
    return dashboard.user_running_totals(load_table(spark, sf_dir, "events"))


@query(
    "sales_rollup_sets",
    oracle=f"""
    WITH base AS (
      SELECT r.r_name AS region_name, n.n_name AS nation_name,
             {_NET} AS net
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    )
    SELECT region_name, nation_name,
           CAST(ROUND(SUM(net), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS line_count,
           CAST(GROUPING(region_name, nation_name) AS BIGINT) AS grouping_level
    FROM base GROUP BY ROLLUP(region_name, nation_name)
    """,
)
def sales_rollup_sets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue ROLLUP over (region, nation) — drill-down totals in one pass."""
    return dashboard.sales_rollup_sets(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


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
    "distribution_drift_psi",
    oracle="""
    WITH c AS (SELECT MAX(o_orderdate) - INTERVAL 30 DAY AS cut FROM orders),
    tgt AS (SELECT o.* FROM orders o CROSS JOIN c WHERE o.o_orderdate < cut),
    bins(bin_id, bin_lo, bin_hi) AS (VALUES
      (0, 0.0, 25000.0), (1, 25000.0, 50000.0), (2, 50000.0, 75000.0),
      (3, 75000.0, 100000.0), (4, 100000.0, 150000.0),
      (5, 150000.0, 200000.0), (6, 200000.0, 300000.0),
      (7, 300000.0, NULL)),
    sb AS (
      SELECT b.bin_id, b.bin_lo, COUNT(o.o_orderkey) AS src_count
      FROM bins b LEFT JOIN orders o
        ON CAST(o.o_totalprice AS DOUBLE) >= b.bin_lo
       AND (b.bin_hi IS NULL OR CAST(o.o_totalprice AS DOUBLE) < b.bin_hi)
      GROUP BY b.bin_id, b.bin_lo
    ),
    tb AS (
      SELECT b.bin_id, COUNT(o.o_orderkey) AS tgt_count
      FROM bins b LEFT JOIN tgt o
        ON CAST(o.o_totalprice AS DOUBLE) >= b.bin_lo
       AND (b.bin_hi IS NULL OR CAST(o.o_totalprice AS DOUBLE) < b.bin_hi)
      GROUP BY b.bin_id
    ),
    tot AS (
      SELECT (SELECT COUNT(*) FROM orders) AS st,
             (SELECT COUNT(*) FROM tgt) AS tt
    )
    SELECT sb.bin_id, CAST(sb.bin_lo AS DOUBLE) AS bin_lo,
           sb.src_count, tb.tgt_count,
           ROUND((GREATEST(CAST(sb.src_count AS DOUBLE) / st, 1e-6)
                  - GREATEST(CAST(tb.tgt_count AS DOUBLE) / tt, 1e-6))
                 * LN(GREATEST(CAST(sb.src_count AS DOUBLE) / st, 1e-6)
                      / GREATEST(CAST(tb.tgt_count AS DOUBLE) / tt, 1e-6)),
                 8) AS psi_term
    FROM sb JOIN tb USING (bin_id) CROSS JOIN tot
    """,
)
def distribution_drift_psi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift between the full source and the
    incremental-lag target over fixed money bins — the shape-sensitive
    extension of the count/value monitors (row counts and min/max can
    both survive a re-scaling bug; PSI cannot)."""
    orders = load_table(spark, sf_dir, "orders")
    cutoff = orders.agg(
        F.timestamp_add("DAY", F.lit(-30), F.max("o_orderdate")).alias("__c")
    )
    target = (
        orders.crossJoin(F.broadcast(cutoff))
        .filter(F.col("o_orderdate") < F.col("__c"))
        .drop("__c")
    )
    return quality.distribution_drift_psi(orders, target, "o_totalprice")


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
    from .operators import backfill

    return backfill.backfill_progress(
        load_table(spark, sf_dir, "orders"), "o_orderdate", chunk_days=7
    )


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))),
                      2) AS DOUBLE) AS revenue,
           COUNT(*) AS line_count
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{tpch.Q6_START}'
      AND l_shipdate < TIMESTAMP '{tpch.Q6_END}'
      AND l_discount >= 0.02 AND l_discount <= 0.09
      AND l_quantity < 24
    """,
)
def q6_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch.q6_forecast_revenue(load_table(spark, sf_dir, "lineitem"))


@query(
    "q18_large_orders",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING ROUND(SUM(l_quantity), 2) > {tpch.Q18_QTY_THRESHOLD}
    )
    SELECT c.c_name AS customer_name, c.c_custkey AS customer_key,
           o.o_orderkey AS order_key, o.o_orderdate AS order_date,
           CAST(ROUND(o.o_totalprice, 2) AS DOUBLE) AS order_total,
           big.total_qty
    FROM big
    JOIN orders o ON big.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY big.total_qty DESC, order_key
    LIMIT 100
    """,
)
def q18_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch.q18_large_orders(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


# ---------------------------------------------------------------------------
# CDC folding, incremental view maintenance, corpus stats
# ---------------------------------------------------------------------------

from .operators import cdc, text as text_ops  # noqa: E402


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
    from .functions import dec, money

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


#: Shared unigram (doc_id, token, term_count) table — the common first
#: stage of tfidf_top_terms / vocab_top_k / vocab_coverage_curve (same
#: tokenizer, same explode+groupBy). Materialized once per corpus
#: snapshot, same single-live-handle lifecycle as _DSIR_W_CACHE.
_TOK_COUNTS_CACHE: dict[tuple[str, str], DataFrame] = {}


def _tok_counts_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (sf_dir, _corpus_fingerprint(sf_dir, "documents"))
    df = _TOK_COUNTS_CACHE.get(key)
    if df is None:
        for old in _TOK_COUNTS_CACHE.values():
            old.unpersist(blocking=False)
        _TOK_COUNTS_CACHE.clear()
        from pyspark.storagelevel import StorageLevel

        df = text_ops.unigram_tok_counts(
            load_table(spark, sf_dir, "documents")
        ).persist(StorageLevel.MEMORY_AND_DISK)
        _TOK_COUNTS_CACHE[key] = df
    return df


@query(
    "vocab_top_k",
    oracle="""
    SELECT token, COUNT(*) AS occurrences FROM (
      SELECT unnest(regexp_extract_all(text, '[a-z0-9]+')) AS token
      FROM documents
    ) GROUP BY token
    ORDER BY occurrences DESC, token
    LIMIT 20
    """,
)
def vocab_top_k_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary heavy hitters (top-20 tokens); exact-integer
    re-sum of the shared memoized unigram counts."""
    return text_ops.vocab_top_k(
        load_table(spark, sf_dir, "documents"),
        k=20,
        tok_counts=_tok_counts_for(spark, sf_dir),
    )


@query(
    "status_flap_audit",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev
      FROM events
    ),
    per AS (
      SELECT user_id,
             COUNT(*) AS n_events,
             CAST(SUM(CASE WHEN prev IS NOT NULL AND event_type != prev
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_transitions,
             COUNT(DISTINCT event_type) AS n_distinct_statuses
      FROM seq GROUP BY user_id
    )
    SELECT user_id, n_events, n_transitions, n_distinct_statuses,
           ROUND(CAST(n_transitions AS DOUBLE)
                 / GREATEST(n_events - 1, 1), 6) AS churn_ratio,
           n_transitions > GREATEST(n_distinct_statuses - 1, 1)
             * {quality.FLAP_FACTOR} AS is_flappy
    FROM per
    """,
)
def status_flap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key status flip-flop audit (the reference's sync-war symptom
    — conflicting writers toggling state — as a first-class monitor)."""
    return quality.status_flap_audit(load_table(spark, sf_dir, "events"))


@query(
    "char_entropy_score",
    oracle="""
    WITH c AS (
      SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
    ),
    rc AS (
      SELECT doc_id, ch, COUNT(*) AS n FROM c WHERE ch != ''
      GROUP BY doc_id, ch
    ),
    a AS (
      SELECT doc_id,
             CAST(SUM(n) AS BIGINT) AS n_chars_used,
             COUNT(*) AS distinct_chars,
             SUM(CAST(ROUND(n * LN(n), 9) AS DECIMAL(28,12))) AS s
      FROM rc GROUP BY doc_id
    )
    SELECT doc_id, n_chars_used, distinct_chars,
           ROUND(LN(n_chars_used) - CAST(s AS DOUBLE) / n_chars_used, 6)
             AS char_entropy
    FROM a
    """,
)
def char_entropy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution entropy per doc (gibberish detector);
    every term derives from integer counts via round-9 + exact decimal
    sums, so both engines agree bit-for-bit."""
    return text_ops.char_entropy_score(
        load_table(spark, sf_dir, "documents")
    )


@query(
    "vocab_coverage_curve",
    oracle=f"""
    WITH c AS (
      SELECT token, COUNT(*) AS occ FROM (
        SELECT unnest(regexp_extract_all(text, '[a-z0-9]+')) AS token
        FROM documents
      ) GROUP BY token
    ),
    r AS (
      SELECT occ, ROW_NUMBER() OVER (ORDER BY occ DESC, token) AS rk
      FROM c
    ),
    t AS (SELECT CAST(SUM(occ) AS BIGINT) AS tot FROM c),
    ks(k) AS (VALUES {", ".join(f"({k})" for k in text_ops.COVERAGE_KS)})
    SELECT CAST(ks.k AS BIGINT) AS k,
           COUNT(r.rk) AS tokens_in_vocab,
           CAST(COALESCE(SUM(r.occ), 0) AS BIGINT) AS occurrences_covered,
           ROUND(CAST(COALESCE(SUM(r.occ), 0) AS DOUBLE) / t.tot, 6)
             AS coverage_share
    FROM ks
    LEFT JOIN r ON r.rk <= ks.k
    CROSS JOIN t
    GROUP BY ks.k, t.tot
    """,
)
def vocab_coverage_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf vocabulary coverage at checkpoint sizes (tokenizer sizing /
    OOV-rate curve); two-phase global rank, one conditional aggregate,
    fed by the shared memoized unigram counts."""
    return text_ops.vocab_coverage_curve(
        load_table(spark, sf_dir, "documents"),
        tok_counts=_tok_counts_for(spark, sf_dir),
    )


@query(
    "doc_length_histogram",
    oracle="""
    WITH b AS (
      SELECT CAST(FLOOR(len(regexp_extract_all(text, '[a-z0-9]+')) / 10.0)
                  AS BIGINT) AS bucket_id
      FROM documents
    )
    SELECT bucket_id,
           CAST(bucket_id * 10 AS BIGINT) AS bucket_lo,
           CAST((bucket_id + 1) * 10 AS BIGINT) AS bucket_hi,
           COUNT(*) AS doc_count
    FROM b GROUP BY bucket_id
    """,
)
def doc_length_histogram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count histogram of the corpus (length-filter calibration)."""
    return text_ops.length_histogram(
        load_table(spark, sf_dir, "documents"), bucket_width=10
    )


@query("ann_ivf_topk")  # rows-only: ranking ties through Spark-side floats
def ann_ivf_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF inverted-list ANN (recall vs brute force asserted in tests)."""
    df = similarity.ivf_topk(
        load_table(spark, sf_dir, "embeddings"),
        F.col("vec_id") < 10,
        k=5,
        centroids=_centroids_for(spark, sf_dir, 16),
    )
    return df.withColumn("rank", F.col("rank").cast("long"))


from .operators import pq  # noqa: E402


@query("ann_pq_topk")  # rows-only: scores rank by the trained PQ model
def ann_pq_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-k (Jégou 2011): 8×16 codebooks, 32×
    embedding compression, search over codes via broadcast LUTs — the
    memory-bound scale path next to IVF; recall vs brute force asserted
    in tests/test_pq.py."""
    return pq.pq_topk(
        load_table(spark, sf_dir, "embeddings"), F.col("vec_id") < 10, k=5
    )


@query("ann_ivfpq_topk")  # rows-only: ranks by the trained composed model
def ann_ivfpq_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed ANN (FAISS IndexIVFPQ layout): coarse inverted
    lists route queries to n_probe lists, PQ codes on RESIDUALS score
    candidates via broadcast LUT + per-list bias — the deployable
    billion-scale configuration; recall vs brute force in
    tests/test_pq.py."""
    return pq.ivfpq_topk(
        load_table(spark, sf_dir, "embeddings"), F.col("vec_id") < 10, k=5
    )


@query("pq_compression_stats")  # rows-only: fidelity of the trained model
def pq_compression_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ fidelity report: raw vs coded bytes per vector and mean
    reconstruction cosine — the go/no-go number for enabling PQ on a
    corpus (near 1.0 = ranking survives compression)."""
    return pq.pq_compression_stats(load_table(spark, sf_dir, "embeddings"))


@query("sketch_distinct_users")  # rows-only: HLL estimate is engine-specific
def sketch_distinct_users_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approx distinct users per event type (HLL) with exact alongside."""
    return quality.sketch_distinct_counts(
        load_table(spark, sf_dir, "events"), "user_id", "event_type"
    )


@query("sketch_value_quantiles")  # rows-only: GK sketch is engine-specific
def sketch_value_quantiles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p95/p99 of order value per status (GK sketch)."""
    return quality.sketch_quantiles(
        load_table(spark, sf_dir, "orders"), "o_totalprice", "o_orderstatus"
    )


@query(
    "q4_order_priority",
    oracle=f"""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '{tpch.Q4_START}'
      AND o.o_orderdate < TIMESTAMP '{tpch.Q4_END}'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
      )
    GROUP BY o.o_orderpriority
    """,
)
def q4_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch.q4_order_priority(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey AS customer_key, c.c_name AS customer_name,
           c.c_acctbal AS customer_acctbal, n.n_name AS nation_name,
           CAST(ROUND(SUM({_NET}), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '{tpch.Q10_START}'
      AND o.o_orderdate < TIMESTAMP '{tpch.Q10_END}'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, customer_key
    LIMIT 20
    """,
)
def q10_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch.q10_returned_items(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "nation"),
    )


@query(
    "q14_promo_revenue",
    oracle=f"""
    WITH j AS (
      SELECT p.p_type, {_NET} AS net
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
        AND l.l_shipdate < TIMESTAMP '1997-10-01'
    ),
    a AS (
      SELECT SUM(CASE WHEN p_type = 'PROMO' THEN net END) AS promo_dec,
             SUM(net) AS total_dec
      FROM j
    )
    SELECT CAST(ROUND(COALESCE(promo_dec, CAST(0 AS DECIMAL(18,6))), 2)
                AS DOUBLE) AS promo_revenue,
           CAST(ROUND(total_dec, 2) AS DOUBLE) AS total_revenue,
           CASE WHEN CAST(total_dec AS DOUBLE) > 0 THEN
             ROUND(COALESCE(CAST(promo_dec AS DOUBLE), 0.0)
                   / CAST(total_dec AS DOUBLE) * 100, 4)
           END AS promo_pct
    FROM a
    """,
)
def q14_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch.q14_promo_revenue(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


@query(
    "dup_key_audit",
    oracle="""
    SELECT user_id, event_type, value, COUNT(*) AS dup_count
    FROM events GROUP BY user_id, event_type, value
    HAVING COUNT(*) > 1
    """,
)
def dup_key_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business keys violating uniqueness (ref:
    verify_view_deduplication.sql)."""
    return quality.dup_key_audit(
        load_table(spark, sf_dir, "events"), ["user_id", "event_type", "value"]
    )


@query(
    "embedding_doc_dedup",
    oracle=f"""
    WITH v AS (
      SELECT d.doc_id, d.lang, d.source, CAST(e.embedding AS DOUBLE[]) AS e
      FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    ),
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.lang AS lang_a, b.lang AS lang_b,
             ROUND({_COS_SQL.format(d=_ANN_DIMS + 1, a='a', b='b')}, 6) AS cosine
      FROM v a JOIN v b ON a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, lang_a, lang_b, cosine
    FROM p WHERE cosine >= {_DUP_COS_TAU}
    """,
)
def embedding_doc_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup DOCUMENT pairs: documents joined to their
    embedding vectors (doc_id = vec_id), pairs above threshold.

    Scale shape: blocked exact scan (block-grid equi-join, one BLAS matmul
    per cell) — at τ=0.3 the candidate set ≈ all pairs, so structured
    O(n²) beats any pruning attempt; no CartesianProduct node (asserted in
    tests/test_plans.py). The DuckDB oracle stays the all-pairs
    definition. At realistic dedup thresholds (τ ≥ 0.9) switch
    method='lsh', which prunes and keeps full recall (recall-tested).
    Ref posture: snowflake_bq_deduplication_sync.py done at corpus scale.
    """
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.join(docs, emb.vec_id == docs.doc_id, "left_semi")
    pairs = similarity.dup_pairs(vecs, _DUP_COS_TAU, method="blocked").select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b"), "cosine"
    )
    la = docs.select(F.col("doc_id").alias("doc_a"), F.col("lang").alias("lang_a"))
    lb = docs.select(F.col("doc_id").alias("doc_b"), F.col("lang").alias("lang_b"))
    return pairs.join(la, "doc_a").join(lb, "doc_b").select(
        "doc_a", "doc_b", "lang_a", "lang_b", "cosine"
    )


@query(
    "user_activity_trend",
    oracle="""
    WITH base AS (
      SELECT user_id,
             FLOOR((epoch_us(ts) - MIN(epoch_us(ts)) OVER (PARTITION BY user_id))
                   / 1000000.0) AS x,
             value AS y
      FROM events
    ),
    agg AS (
      SELECT user_id,
             COUNT(*) AS n_events,
             SUM(CAST(x AS BIGINT)) AS sx,
             SUM(CAST(x AS BIGINT) * CAST(x AS BIGINT)) AS sxx,
             SUM(CAST(y AS DECIMAL(18,6))) AS sy,
             SUM(CAST(x AS DECIMAL(12,0)) * CAST(y AS DECIMAL(18,6))) AS sxy
      FROM base GROUP BY user_id
    )
    SELECT user_id, n_events,
           CASE WHEN CAST(n_events AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) != 0
                THEN ROUND((CAST(n_events AS DOUBLE) * CAST(sxy AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                           / (CAST(n_events AS DOUBLE) * CAST(sxx AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                           * 3600.0, 6)
           END AS value_trend_per_hour
    FROM agg
    """,
)
def user_activity_trend_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS value trend from exact sufficient statistics."""
    return dashboard.user_activity_trend(load_table(spark, sf_dir, "events"))


from .operators import asof  # noqa: E402


@query(
    "asof_join_last_purchase",
    oracle="""
    WITH clicks AS (
      SELECT event_id, ts, user_id, value FROM events
      WHERE event_type = 'click'
    ),
    purch0 AS (
      SELECT event_id, ts, user_id, value FROM events
      WHERE event_type = 'purchase'
    ),
    purch AS (
      SELECT user_id, ts, event_id, value FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id, ts ORDER BY event_id DESC
        ) AS rn FROM purch0
      ) WHERE rn = 1
    )
    SELECT c.event_id, c.ts, c.user_id, c.value,
           p.event_id AS asof_event_id,
           p.value AS asof_value,
           p.ts AS asof_ts
    FROM clicks c
    ASOF LEFT JOIN purch p ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def asof_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click annotated with the user's newest purchase at
    or before it — the point-in-time operator Spark lacks natively,
    expressed as union + carry-forward (one shuffle, no range explosion)."""
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id", "value"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", "value"
    )
    return asof.asof_join(
        clicks, purchases, ["user_id"], "ts", "ts", ["event_id", "value", "ts"]
    )


@query(
    "tfidf_top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS token
      FROM documents
    ),
    tc AS (
      SELECT doc_id, token, COUNT(*) AS term_count
      FROM toks GROUP BY doc_id, token
    ),
    dt AS (
      SELECT doc_id, CAST(SUM(term_count) AS BIGINT) AS doc_tokens
      FROM tc GROUP BY doc_id
    ),
    dfc AS (SELECT token, COUNT(*) AS doc_freq FROM tc GROUP BY token),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tc.doc_id, tc.token, tc.term_count, dfc.doc_freq,
             ROUND((CAST(tc.term_count AS DOUBLE) / CAST(dt.doc_tokens AS DOUBLE))
                   * LN(CAST(n.n_docs AS DOUBLE) / CAST(dfc.doc_freq AS DOUBLE)),
                   6) AS tfidf
      FROM tc JOIN dt USING (doc_id) JOIN dfc USING (token) CROSS JOIN n
    )
    SELECT doc_id, token, term_count, doc_freq, tfidf, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, token
      ) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def tfidf_top_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 characteristic terms per document by TF-IDF; shares the
    memoized unigram tok_counts with the vocab queries."""
    return text_ops.tfidf_top_terms(
        load_table(spark, sf_dir, "documents"),
        k=5,
        tok_counts=_tok_counts_for(spark, sf_dir),
    )


@query(
    "q7_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS ship_year,
           CAST(ROUND(SUM({_NET}), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE l.l_shipdate >= TIMESTAMP '{tpch.Q7_START}'
      AND l.l_shipdate < TIMESTAMP '{tpch.Q7_END}'
      AND ((n1.n_name = '{tpch.Q7_NATION_A}' AND n2.n_name = '{tpch.Q7_NATION_B}')
           OR (n1.n_name = '{tpch.Q7_NATION_B}' AND n2.n_name = '{tpch.Q7_NATION_A}'))
    GROUP BY n1.n_name, n2.n_name, CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT)
    """,
)
def q7_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch.q7_nation_volume(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
    )


@query(
    "q19_bracket_revenue",
    oracle=f"""
    SELECT CAST(ROUND(SUM({_NET}), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS line_count
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 5 AND 20
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 10 AND 40
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def q19_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch.q19_bracket_revenue(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


@query(
    "q12_priority_shipping",
    oracle=f"""
    SELECT l.l_returnflag,
           COUNT(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_priority_count,
           COUNT(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_priority_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '{tpch.Q12_START}'
      AND l.l_shipdate < TIMESTAMP '{tpch.Q12_END}'
    GROUP BY l.l_returnflag
    """,
)
def q12_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch.q12_priority_shipping(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(ROUND(SUM({_NET}), 2) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{tpch.Q15_START}'
        AND l_shipdate < TIMESTAMP '{tpch.Q15_END}'
      GROUP BY l_suppkey
    )
    SELECT r.l_suppkey AS supplier_key, s.s_name AS supplier_name,
           r.total_revenue
    FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def q15_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch.q15_top_supplier(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "supplier")
    )


@query(
    "q13_order_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS order_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    SELECT order_count, COUNT(*) AS customer_count
    FROM per_cust GROUP BY order_count
    """,
)
def q13_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch.q13_order_distribution(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


@query(
    "q22_idle_accounts",
    oracle="""
    WITH a AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_bal
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_nationkey, COUNT(*) AS customer_count,
           CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS total_acctbal
    FROM customer c CROSS JOIN a
    WHERE c.c_acctbal > a.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c.c_nationkey
    """,
)
def q22_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tpch.q22_idle_accounts(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


@query(
    "q8_market_share",
    oracle=f"""
    WITH agg AS (
      SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS order_year,
             CAST(ROUND(COALESCE(SUM(CASE WHEN n2.n_name = '{tpch.Q8_NATION}'
                            THEN {_NET} END), 0), 2) AS DOUBLE)
               AS nation_revenue,
             CAST(ROUND(SUM({_NET}), 2) AS DOUBLE) AS total_revenue
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE p.p_type = '{tpch.Q8_TYPE}'
        AND r.r_name = '{tpch.Q8_REGION}'
        AND o.o_orderdate >= TIMESTAMP '{tpch.Q8_START}'
        AND o.o_orderdate < TIMESTAMP '{tpch.Q8_END}'
      GROUP BY CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT)
    )
    SELECT order_year, nation_revenue, total_revenue,
           ROUND(nation_revenue / total_revenue, 6) AS mkt_share
    FROM agg
    """,
)
def q8_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 adapted (ref has no bench suite; plan-shape showcase)."""
    return tpch.q8_market_share(
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS supp_nation,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS order_year,
           CAST(ROUND(SUM(CAST(
             l.l_extendedprice * (1.0 - l.l_discount)
               - p.p_retailprice * {tpch.Q9_COST_FACTOR} * l.l_quantity
             AS DECIMAL(18,6))), 2) AS DOUBLE) AS profit,
           COUNT(*) AS line_count
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%{tpch.Q9_PART_TOKEN}%'
    GROUP BY n.n_name, CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT)
    """,
)
def q9_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted: p_retailprice cost proxy (testdata lacks partsupp)."""
    return tpch.q9_product_profit(
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "nation"),
    )


@query(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH region_supp AS (
      SELECT s.s_suppkey, s.s_name, n.n_name AS supp_nation, s.s_acctbal
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = '{tpch.Q2_REGION}'
    ),
    ps AS (
      SELECT l.l_partkey, l.l_suppkey,
             MIN(ROUND(l.l_extendedprice / l.l_quantity, 6)) AS supply_cost
      FROM lineitem l JOIN region_supp rs ON l.l_suppkey = rs.s_suppkey
      GROUP BY l.l_partkey, l.l_suppkey
    ),
    best AS (
      SELECT l_partkey, MIN(supply_cost) AS best_cost FROM ps GROUP BY l_partkey
    )
    SELECT p.p_partkey AS part_key, p.p_name AS part_name,
           rs.s_name AS supplier_name, rs.supp_nation,
           rs.s_acctbal AS supplier_acctbal, ps.supply_cost
    FROM ps
    JOIN best b ON ps.l_partkey = b.l_partkey AND ps.supply_cost = b.best_cost
    JOIN part p ON ps.l_partkey = p.p_partkey
    JOIN region_supp rs ON ps.l_suppkey = rs.s_suppkey
    WHERE p.p_type = '{tpch.Q2_TYPE}' AND p.p_size <= {tpch.Q2_MAX_SIZE}
    """,
)
def q2_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 adapted: lineitem unit price proxies ps_supplycost."""
    return tpch.q2_min_cost_supplier(
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


@query(
    "q11_important_parts",
    oracle=f"""
    WITH traded AS (
      SELECT l.l_partkey, l.l_extendedprice, l.l_discount
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = '{tpch.Q11_NATION}'
    ),
    per_part AS (
      SELECT l_partkey,
             CAST(ROUND(SUM({_NET}), 2) AS DOUBLE) AS part_value
      FROM traded GROUP BY l_partkey
    ),
    total AS (
      SELECT CAST(ROUND(SUM({_NET}), 2) AS DOUBLE) AS total_value FROM traded
    )
    SELECT p.l_partkey AS part_key, p.part_value
    FROM per_part p CROSS JOIN total t
    WHERE p.part_value > t.total_value * {tpch.Q11_FRACTION}
    """,
)
def q11_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 adapted: traded net value proxies stock value."""
    return tpch.q11_important_parts(
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "nation"),
    )


@query(
    "q16_supplier_part_counts",
    oracle=f"""
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> '{tpch.Q16_EXCLUDE_BRAND}'
      AND p.p_type <> '{tpch.Q16_EXCLUDE_TYPE}'
      AND p.p_size IN {tpch.Q16_SIZES}
      AND NOT EXISTS (SELECT 1 FROM supplier s
                      WHERE s.s_suppkey = l.l_suppkey AND s.s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, CAST(p.p_size AS BIGINT)
    """,
)
def q16_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adapted: negative balance proxies complaint filter."""
    return tpch.q16_supplier_part_counts(
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "lineitem"),
    )


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH li AS (
      SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_brand = '{tpch.Q17_BRAND}' AND p.p_type = '{tpch.Q17_TYPE}'
    ),
    limits AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) * 0.2 AS qty_limit
      FROM li GROUP BY l_partkey
    )
    SELECT ROUND(COALESCE(CAST(SUM(CAST(li.l_extendedprice AS DECIMAL(18,6)))
                               AS DOUBLE), 0.0) / 7.0, 2) AS avg_yearly,
           COUNT(*) AS line_count
    FROM li JOIN limits ON li.l_partkey = limits.l_partkey
    WHERE li.l_quantity < limits.qty_limit
    """,
)
def q17_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 adapted: p_type stands in for p_container."""
    return tpch.q17_small_quantity_revenue(
        load_table(spark, sf_dir, "part"), load_table(spark, sf_dir, "lineitem")
    )


@query(
    "q20_dominant_suppliers",
    oracle=f"""
    WITH li AS (
      SELECT l.l_partkey, l.l_suppkey, l.l_quantity
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_name LIKE '%{tpch.Q20_TOKEN}%'
        AND l.l_shipdate >= TIMESTAMP '{tpch.Q20_START}'
        AND l.l_shipdate < TIMESTAMP '{tpch.Q20_END}'
    ),
    per_ps AS (
      SELECT l_partkey, l_suppkey,
             CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS supp_qty
      FROM li GROUP BY l_partkey, l_suppkey
    ),
    per_p AS (
      SELECT l_partkey,
             CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS part_qty
      FROM li GROUP BY l_partkey
    )
    SELECT DISTINCT s.s_suppkey AS supplier_key, s.s_name AS supplier_name,
           n.n_name AS supp_nation
    FROM per_ps ps
    JOIN per_p p ON ps.l_partkey = p.l_partkey
    JOIN supplier s ON ps.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE ps.supp_qty > p.part_qty * {tpch.Q20_SHARE}
    """,
)
def q20_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adapted: shipped-quantity share proxies availqty."""
    return tpch.q20_dominant_suppliers(
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "nation"),
    )


@query(
    "q21_waiting_suppliers",
    oracle=f"""
    WITH flagged AS (
      SELECT l.l_orderkey, l.l_suppkey,
             DATEDIFF('day', o.o_orderdate, l.l_shipdate)
               > {tpch.Q21_LATE_DAYS} AS late
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
    ),
    order_stats AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
      FROM flagged GROUP BY l_orderkey
    ),
    sole_late AS (
      SELECT DISTINCT f.l_orderkey, f.l_suppkey
      FROM flagged f JOIN order_stats os ON f.l_orderkey = os.l_orderkey
      WHERE f.late AND os.n_supp > 1 AND os.n_late = 1
    )
    SELECT s.s_suppkey AS supplier_key, s.s_name AS supplier_name,
           COUNT(*) AS numwait
    FROM sole_late sl JOIN supplier s ON sl.l_suppkey = s.s_suppkey
    GROUP BY s.s_suppkey, s.s_name
    """,
)
def q21_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 adapted: ship-lag lateness (no commit/receipt dates)."""
    return tpch.q21_waiting_suppliers(
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "nation"),
    )


from .operators import graph  # noqa: E402


@query(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_SHINGLE_SQL},
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             COUNT(*) AS intersection_size
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
      SELECT doc_a, doc_b
      FROM inter
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
      WHERE CAST(intersection_size AS DOUBLE)
            / (sa.sz + sb.sz - intersection_size) >= {_JACCARD_TAU}
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.node
    ),
    lab AS (SELECT node AS doc_id, MIN(r) AS canonical_id
            FROM reach GROUP BY node)
    SELECT l.doc_id, l.canonical_id, c.cluster_size,
           l.doc_id = l.canonical_id AS is_canonical
    FROM lab l
    JOIN (SELECT canonical_id, COUNT(*) AS cluster_size
          FROM lab GROUP BY canonical_id) c USING (canonical_id)
    """,
)
def dedup_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive dup-cluster resolution over exact Jaccard pairs — the
    KEEP/DROP worklist (ref: snowflake_bq_deduplication_sync.py:214
    keep-one-per-key, generalized to fuzzy matches). The oracle computes
    the same closure with a recursive CTE; Spark uses pointer-jumping
    label propagation (operators/graph.py) — both converge to the exact
    per-component minimum, so values hash-match."""
    return graph.dup_clusters(_jaccard_pairs_for(spark, sf_dir))


@query(
    "dedup_savings_report",
    oracle=f"""
    WITH RECURSIVE h AS (
      SELECT doc_id, md5(text) AS ch,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
      FROM documents
    ),
    g AS (SELECT ch, MIN(doc_id) AS cid FROM h GROUP BY ch),
    hd AS (
      SELECT h.doc_id, h.toks, h.doc_id != g.cid AS is_dup
      FROM h JOIN g ON h.ch = g.ch
    ),
    surv AS (SELECT doc_id, toks FROM hd WHERE NOT is_dup),
    {_SHINGLE_SQL},
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             COUNT(*) AS intersection_size
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
      SELECT doc_a, doc_b
      FROM inter
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
      WHERE CAST(intersection_size AS DOUBLE)
            / (sa.sz + sb.sz - intersection_size) >= {_JACCARD_TAU}
    ),
    spairs AS (
      SELECT doc_a, doc_b FROM pairs
      JOIN surv sa ON doc_a = sa.doc_id
      JOIN surv sb ON doc_b = sb.doc_id
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM spairs
      UNION
      SELECT doc_b, doc_a FROM spairs
    ),
    reach(node, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.r FROM edges e JOIN reach r ON e.dst = r.node
    ),
    lab AS (SELECT node AS doc_id, MIN(r) AS canonical
            FROM reach GROUP BY node),
    fz AS (
      SELECT COUNT(*) AS fuzzy_dup_docs,
             COALESCE(CAST(SUM(s.toks) AS BIGINT), 0) AS fuzzy_dup_tokens
      FROM lab l JOIN surv s USING (doc_id) WHERE l.doc_id != l.canonical
    ),
    ex AS (
      SELECT COUNT(*) AS n_docs,
             COUNT(CASE WHEN is_dup THEN 1 END) AS exact_dup_docs,
             CAST(SUM(toks) AS BIGINT) AS tokens_total,
             COALESCE(CAST(SUM(CASE WHEN is_dup THEN toks END) AS BIGINT), 0)
               AS exact_dup_tokens
      FROM hd
    )
    SELECT ex.n_docs, ex.exact_dup_docs, fz.fuzzy_dup_docs,
           ex.exact_dup_docs + fz.fuzzy_dup_docs AS docs_removable,
           ex.tokens_total, ex.exact_dup_tokens, fz.fuzzy_dup_tokens,
           ROUND(CAST(ex.exact_dup_docs + fz.fuzzy_dup_docs AS DOUBLE)
                 / CAST(ex.n_docs AS DOUBLE), 6) AS removable_doc_frac,
           ROUND(CAST(ex.exact_dup_tokens + fz.fuzzy_dup_tokens AS DOUBLE)
                 / CAST(ex.tokens_total AS DOUBLE), 6)
             AS removable_token_frac
    FROM ex CROSS JOIN fz
    """,
)
def dedup_savings_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus-dedup ROI report: documents and whitespace tokens
    removable by exact dedup (min-doc-per-content-hash) plus fuzzy dedup
    (non-canonical Jaccard-cluster members among the exact survivors —
    the same two stages, in the same order, as the composed training
    pipeline). The number a corpus owner checks before paying for a
    dedup pass; consumes the memoized pair table, so it adds one tiny
    rollup to work the dedup queries already did."""
    from .operators import graph

    docs = load_table(spark, sf_dir, "documents")
    toks = F.array_size(F.split(F.col("text"), " ")).cast("long")
    base = docs.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("ch"),
        toks.alias("toks"),
    )
    g = base.groupBy("ch").agg(F.min("doc_id").alias("cid"))
    hd = base.join(g, "ch").withColumn(
        "is_dup", F.col("doc_id") != F.col("cid")
    )
    ex = hd.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("is_dup"), F.lit(1))).alias("exact_dup_docs"),
        F.sum("toks").alias("tokens_total"),
        F.coalesce(
            F.sum(F.when(F.col("is_dup"), F.col("toks"))),
            F.lit(0).cast("long"),
        ).alias("exact_dup_tokens"),
    )
    surv = hd.filter(~F.col("is_dup")).select("doc_id", "toks")
    pairs = _jaccard_pairs_for(spark, sf_dir).select("doc_a", "doc_b")
    spairs = pairs.join(
        surv.select(F.col("doc_id").alias("doc_a")), "doc_a"
    ).join(surv.select(F.col("doc_id").alias("doc_b")), "doc_b")
    labels = graph.dup_clusters(spairs)
    fz = (
        labels.filter(~F.col("is_canonical"))
        .join(surv, "doc_id")
        .agg(
            F.count(F.lit(1)).alias("fuzzy_dup_docs"),
            F.coalesce(F.sum("toks"), F.lit(0).cast("long")).alias(
                "fuzzy_dup_tokens"
            ),
        )
    )
    removable = F.col("exact_dup_docs") + F.col("fuzzy_dup_docs")
    tok_removable = F.col("exact_dup_tokens") + F.col("fuzzy_dup_tokens")
    return ex.crossJoin(F.broadcast(fz)).select(
        "n_docs",
        "exact_dup_docs",
        "fuzzy_dup_docs",
        removable.alias("docs_removable"),
        "tokens_total",
        "exact_dup_tokens",
        "fuzzy_dup_tokens",
        F.round(
            removable.cast("double") / F.col("n_docs").cast("double"), 6
        ).alias("removable_doc_frac"),
        F.round(
            tok_removable.cast("double")
            / F.col("tokens_total").cast("double"),
            6,
        ).alias("removable_token_frac"),
    )


from .operators import curation  # noqa: E402

# The synthetic corpus contains no identifier-shaped strings, so the PII
# fixture deterministically appends synthetic contact details (same
# expression in both engines) — the operator is exercised with nonzero
# counts while staying oracle-checkable on read-only testdata.
_PII_AUG_SPARK = lambda: F.concat(  # noqa: E731
    F.col("text"),
    F.lit(" contact user"),
    F.col("doc_id").cast("string"),
    F.lit("@mail.example.com or 555-010-"),
    F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)).cast("string"), 4, "0"),
    F.lit(" from 10.0."),
    F.pmod(F.col("doc_id"), F.lit(256)).cast("string"),
    F.lit(".1 ref "),
    F.lpad((F.col("doc_id") + F.lit(100000000)).cast("string"), 9, "0"),
)
_PII_AUG_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@mail.example.com or 555-010-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1 ref '"
    " || lpad(CAST(doc_id + 100000000 AS VARCHAR), 9, '0')"
)


@query(
    "pii_redaction",
    oracle=f"""
    WITH aug AS (SELECT doc_id, {_PII_AUG_SQL} AS t FROM documents)
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
             '{curation.PII_PATTERNS[0][1]}', '<EMAIL>', 'g'),
             '{curation.PII_PATTERNS[1][1]}', '<PHONE>', 'g'),
             '{curation.PII_PATTERNS[2][1]}', '<IP>', 'g'),
             '{curation.PII_PATTERNS[3][1]}', '<ID>', 'g') AS redacted_text,
           len(regexp_extract_all(t, '{curation.PII_PATTERNS[0][1]}'))
             AS n_email,
           len(regexp_extract_all(t, '{curation.PII_PATTERNS[1][1]}'))
             AS n_phone,
           len(regexp_extract_all(t, '{curation.PII_PATTERNS[2][1]}')) AS n_ip,
           len(regexp_extract_all(t, '{curation.PII_PATTERNS[3][1]}'))
             AS n_id_number,
           len(regexp_extract_all(t, '{curation.PII_PATTERNS[0][1]}'))
             + len(regexp_extract_all(t, '{curation.PII_PATTERNS[1][1]}'))
             + len(regexp_extract_all(t, '{curation.PII_PATTERNS[2][1]}'))
             + len(regexp_extract_all(t, '{curation.PII_PATTERNS[3][1]}'))
             AS total_redactions
    FROM aug
    """,
)
def pii_redaction_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over the corpus (chained JVM regexp_replace)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", _PII_AUG_SPARK().alias("text")
    )
    return curation.pii_redact(docs)


_FUNNEL_TOKEN_RE = "[a-z0-9]+"


@query(
    "quality_filter_funnel",
    oracle=f"""
    WITH t AS (
      SELECT len(regexp_extract_all(text, '{_FUNNEL_TOKEN_RE}')) AS nt,
             len(list_distinct(regexp_extract_all(text, '{_FUNNEL_TOKEN_RE}')))
               AS nd,
             lang
      FROM documents
    ),
    a AS (
      SELECT COUNT(*) AS total,
             COUNT(CASE WHEN nt >= 20 THEN 1 END) AS s1,
             COUNT(CASE WHEN nt >= 20 AND nt <= 90 THEN 1 END) AS s2,
             COUNT(CASE WHEN nt >= 20 AND nt <= 90
                        AND CAST(nd AS DOUBLE) / nt >= 0.5 THEN 1 END) AS s3,
             COUNT(CASE WHEN nt >= 20 AND nt <= 90
                        AND CAST(nd AS DOUBLE) / nt >= 0.5
                        AND lang = 'en' THEN 1 END) AS s4
      FROM t
    ),
    staged AS (
      SELECT CAST(1 AS BIGINT) AS stage, 'min_tokens' AS gate_name,
             total AS docs_in, s1 AS docs_kept FROM a
      UNION ALL SELECT 2, 'max_tokens', s1, s2 FROM a
      UNION ALL SELECT 3, 'diversity', s2, s3 FROM a
      UNION ALL SELECT 4, 'lang_en', s3, s4 FROM a
    )
    SELECT stage, gate_name, docs_in, docs_kept,
           docs_in - docs_kept AS docs_dropped,
           CASE WHEN docs_in > 0
                THEN ROUND(CAST(docs_in - docs_kept AS DOUBLE)
                           / CAST(docs_in AS DOUBLE), 4)
                ELSE 0.0 END AS drop_rate
    FROM staged
    """,
)
def quality_filter_funnel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation funnel: per-gate survivor counts in one aggregate pass."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.col("text"), F.lit(_FUNNEL_TOKEN_RE), 0)
    nt = F.array_size(toks)
    nd = F.array_size(F.array_distinct(toks))
    flagged = docs.select(
        nt.alias("__nt"), nd.alias("__nd"), F.col("lang")
    )
    gates = [
        ("min_tokens", F.col("__nt") >= 20),
        ("max_tokens", F.col("__nt") <= 90),
        (
            "diversity",
            (F.col("__nd").cast("double") / F.col("__nt").cast("double"))
            >= 0.5,
        ),
        ("lang_en", F.col("lang") == "en"),
    ]
    return curation.quality_funnel(flagged, gates)


_MIX_RATES = {"en": 1.0, "zh": 0.5, "fr": 0.25, "es": 0.1, "de": 0.05}


@query(
    "stratified_sample_mix",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE CASE lang
            WHEN 'en' THEN TRUE
            WHEN 'zh' THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) < '800'
            WHEN 'fr' THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) < '400'
            WHEN 'es' THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) < '199'
            WHEN 'de' THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) < '0cc'
            ELSE TRUE END
    """,
)
def stratified_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mix downsampling: deterministic md5-bucket sampling so the
    selected training mix is reproducible on any engine/partitioning."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source"
    )
    return curation.stratified_sample(docs, "doc_id", "lang", _MIX_RATES)


@query(
    "dataset_split_assign",
    # Cumulative cutoffs for (train .90, val .05): .90 -> e66, .95 -> f33.
    oracle="""
    SELECT doc_id, source,
           CASE
             WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) < 'e66'
               THEN 'train'
             WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) < 'f33'
               THEN 'val'
             ELSE 'test'
           END AS split
    FROM documents
    """,
)
def dataset_split_assign_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split by key hash: a document's split
    is a pure function of its id, so eval membership survives corpus
    regeneration and cluster-size changes — no seed, no shuffle."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return curation.dataset_split(docs, "doc_id")


@query(
    "paragraph_dedup",
    oracle=f"""
    WITH sp AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    ch AS (
      SELECT doc_id,
             unnest(list_transform(
               range(0, CAST(ceil(len(w) / {float(curation.PARA_WORDS)}) AS BIGINT)),
               i -> struct_pack(
                 ci := i,
                 ct := array_to_string(
                   list_slice(w, i * {curation.PARA_WORDS} + 1,
                              (i + 1) * {curation.PARA_WORDS}), ' ')))) AS c
      FROM sp
    ),
    f AS (
      SELECT doc_id, c.ci AS chunk_idx, c.ct AS chunk_text FROM ch
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(chunk_text)
                                   ORDER BY doc_id, chunk_idx) AS rn
      FROM f
    )
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           COALESCE(string_agg(CASE WHEN rn = 1 THEN chunk_text END, ' '
                               ORDER BY chunk_idx), '') AS dedup_text
    FROM r GROUP BY doc_id
    """,
)
def paragraph_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level duplicated-chunk removal (CCNet/RefinedWeb line-dedup
    pattern over k-word windows): keep each distinct chunk's first
    occurrence, reassemble docs from survivors."""
    return curation.paragraph_dedup(load_table(spark, sf_dir, "documents"))


@query(
    "event_session_stats",
    # Islands oracle for native session windows. Spark merges an event
    # into the open session when ts < prev + gap (the window [ts, ts+gap)
    # is half-open), so the new-session condition is diff >= gap.
    oracle="""
    WITH m AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM m
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE)
             AS session_value
    FROM s GROUP BY user_id, sid
    """,
)
def event_session_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window sessionization (batch twin of the streaming
    op in streaming/sessions.py; the oracle derives the same sessions
    with the islands algorithm)."""
    from .streaming import sessions

    return sessions.session_stats_batch(load_table(spark, sf_dir, "events"))


@query(
    "sequence_packing",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS nt
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, nt,
             SUM(nt) OVER (PARTITION BY source ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) - nt AS start
      FROM t
    )
    SELECT doc_id, source, nt AS n_tokens,
           CAST(start // {curation.PACK_BUDGET} AS BIGINT) AS pack_id,
           CAST(start % {curation.PACK_BUDGET} AS BIGINT) AS offset_in_pack
    FROM c
    """,
)
def sequence_packing_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk pack assignment per source stream."""
    docs = load_table(spark, sf_dir, "documents")
    nt = F.array_size(
        F.regexp_extract_all(F.col("text"), F.lit("[a-z0-9]+"), 0)
    )
    return curation.sequence_packing(docs, nt)


_SHARD_RANK_SQL = f"""
    t AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT)
               AS n_tokens
      FROM documents
    ),
    r AS (
      SELECT doc_id, n_tokens,
             ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id) AS rn
      FROM t
    ),
    a AS (
      SELECT doc_id, n_tokens,
             CAST((rn - 1) % {curation.N_SHARDS} AS BIGINT) AS shard_id
      FROM r
    )
"""


@query(
    "shard_assignment_balanced",
    oracle=f"WITH {_SHARD_RANK_SQL} SELECT doc_id, n_tokens, shard_id FROM a",
)
def shard_assignment_balanced_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced output-shard assignment (rank-round-robin over the
    descending token order — the distributed stand-in for sequential
    first-fit-decreasing; two-phase global rank, no one-task sort)."""
    docs = load_table(spark, sf_dir, "documents")
    nt = F.array_size(
        F.regexp_extract_all(F.col("text"), F.lit("[a-z0-9]+"), 0)
    )
    return curation.shard_assignment(docs, nt)


@query(
    "shard_balance_summary",
    oracle=f"""
    WITH {_SHARD_RANK_SQL},
    per AS (
      SELECT shard_id, COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS tokens_total
      FROM a GROUP BY shard_id
    ),
    tot AS (SELECT CAST(SUM(tokens_total) AS BIGINT) AS corpus FROM per)
    SELECT shard_id, n_docs, tokens_total,
           ROUND(CAST(tokens_total AS DOUBLE) / corpus, 6) AS token_share,
           ROUND(CAST(tokens_total AS DOUBLE) * {curation.N_SHARDS} / corpus,
                 6) AS balance_ratio
    FROM per, tot
    """,
)
def shard_balance_summary_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard token-mass balance over the shard assignment — the
    straggler bound a training job actually watches (max/min
    balance_ratio)."""
    return curation.shard_balance(
        shard_assignment_balanced_q(spark, sf_dir)
    )


_TFIDF_SIM_TAU = 0.7


@query(
    "tfidf_doc_similarity",
    oracle=f"""
    WITH sp AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    toks AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS token
      FROM sp
    ),
    tc AS (
      SELECT doc_id, token, COUNT(*) AS term_count
      FROM toks GROUP BY doc_id, token
    ),
    dt AS (
      SELECT doc_id, CAST(SUM(term_count) AS BIGINT) AS doc_tokens
      FROM tc GROUP BY doc_id
    ),
    dfc AS (SELECT token, COUNT(*) AS doc_freq FROM tc GROUP BY token),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tc.doc_id, tc.token,
             ROUND((CAST(tc.term_count AS DOUBLE) / CAST(dt.doc_tokens AS DOUBLE))
                   * LN(CAST(n.n_docs AS DOUBLE) / CAST(dfc.doc_freq AS DOUBLE)),
                   6) AS w
      FROM tc JOIN dt USING (doc_id) JOIN dfc USING (token) CROSS JOIN n
    ),
    topk AS (
      SELECT doc_id, token, w FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY doc_id ORDER BY w DESC, token
        ) AS rank FROM scored
      ) WHERE rank <= 10
    ),
    norms AS (
      SELECT doc_id,
             SQRT(CAST(SUM(CAST(w * w AS DECIMAL(28,12))) AS DOUBLE)) AS nrm
      FROM topk GROUP BY doc_id
    ),
    dots AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(SUM(CAST(a.w * b.w AS DECIMAL(28,12))) AS DOUBLE) AS dot
      FROM topk a JOIN topk b ON a.token = b.token AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, ROUND(dot / (na.nrm * nb.nrm), 6) AS cosine
    FROM dots
    JOIN norms na ON doc_a = na.doc_id
    JOIN norms nb ON doc_b = nb.doc_id
    WHERE ROUND(dot / (na.nrm * nb.nrm), 6) >= {_TFIDF_SIM_TAU}
    """,
)
def tfidf_doc_similarity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse-vector doc similarity over top-10 TF-IDF 3-gram terms."""
    return text_ops.tfidf_doc_similarity(
        load_table(spark, sf_dir, "documents"), _TFIDF_SIM_TAU, k=10, ngram=3
    )


from .operators import ranges  # noqa: E402


@query(
    "error_window_events",
    oracle="""
    WITH err AS (
      SELECT event_id AS window_id, ts AS window_start,
             ts + INTERVAL 5 MINUTE AS wend
      FROM events WHERE event_type = 'error'
    ),
    pts AS (SELECT ts, event_type, value FROM events
            WHERE event_type <> 'error'),
    j AS (
      SELECT e.window_id, e.window_start, p.event_type, p.value
      FROM err e JOIN pts p ON p.ts >= e.window_start AND p.ts < e.wend
    )
    SELECT window_id, window_start, COUNT(*) AS n_events,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_clicks,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE)
             AS total_value
    FROM j GROUP BY window_id, window_start
    """,
)
def error_window_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity inside the 5 minutes after each error — a keyless
    point-in-interval join, planned as a binned equi-join (no nested-loop;
    see operators/ranges.py)."""
    events = load_table(spark, sf_dir, "events")
    err = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("window_start"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("__wend"),
    )
    pts = events.filter(F.col("event_type") != "error").select(
        F.col("ts").alias("__pts"), "event_type", "value"
    )
    joined = ranges.interval_join(
        pts, err, "__pts", "window_start", "__wend", bin_seconds=300
    )
    return joined.groupBy("window_id", "window_start").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col("event_type") == "purchase", F.lit(1))).alias(
            "n_purchases"
        ),
        F.count(F.when(F.col("event_type") == "click", F.lit(1))).alias(
            "n_clicks"
        ),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
        .cast("double")
        .alias("total_value"),
    )


@query(
    "pack_fill_summary",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS nt
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, nt,
             SUM(nt) OVER (PARTITION BY source ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) - nt AS start
      FROM t
    ),
    packed AS (
      SELECT source, CAST(start // {curation.PACK_BUDGET} AS BIGINT) AS pack_id,
             nt FROM c
    )
    SELECT source, pack_id, COUNT(*) AS n_docs,
           CAST(SUM(nt) AS BIGINT) AS tokens_started,
           ROUND(CAST(SUM(nt) AS DOUBLE) / {curation.PACK_BUDGET}, 4)
             AS fill_ratio
    FROM packed GROUP BY source, pack_id
    """,
)
def pack_fill_summary_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack-level fill statistics over sequence_packing assignments: how
    many docs START in each pack and the token mass they contribute —
    the calibration view for choosing the pack budget (fill_ratio ≈ 1
    means clean chunking; >> 1 means long docs straddle many windows)."""
    packed = sequence_packing_q(spark, sf_dir)
    return packed.groupBy("source", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("tokens_started"),
        F.round(
            F.sum("n_tokens").cast("double") / F.lit(float(curation.PACK_BUDGET)),
            4,
        ).alias("fill_ratio"),
    )


@query(
    "source_language_mix",
    oracle="""
    WITH c AS (
      SELECT source, lang, COUNT(*) AS n_docs,
             CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS chars_total
      FROM documents GROUP BY source, lang
    ),
    t AS (SELECT source, SUM(n_docs) AS src_docs FROM c GROUP BY source),
    p AS (
      SELECT c.source, c.lang, c.n_docs, c.chars_total, t.src_docs,
             CAST(c.n_docs AS DOUBLE) / CAST(t.src_docs AS DOUBLE) AS frac
      FROM c JOIN t USING (source)
    ),
    h AS (
      SELECT source,
             ROUND(-SUM(frac * LN(frac)), 6) AS lang_entropy
      FROM p GROUP BY source
    )
    SELECT p.source, p.lang, p.n_docs, p.chars_total,
           ROUND(p.frac, 6) AS doc_share, h.lang_entropy
    FROM p JOIN h USING (source)
    """,
)
def source_language_mix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source language composition with per-source entropy — the
    training-mix monitoring view (are sources drifting monolingual?).
    Entropy derives from exact integer counts through a fixed expression;
    the per-source entropy is a second partial aggregate of the first
    (already tiny) rollup joined back, never a window over raw docs."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_chars").cast("long")).alias("chars_total"),
    )
    t = c.groupBy("source").agg(F.sum("n_docs").alias("src_docs"))
    frac = F.col("n_docs").cast("double") / F.col("src_docs").cast("double")
    p = c.join(t, "source").select(
        "source", "lang", "n_docs", "chars_total", frac.alias("__frac")
    )
    h = p.groupBy("source").agg(
        F.round(
            -F.sum(
                (F.col("__frac") * F.log(F.col("__frac"))).cast(
                    "decimal(28,12)"
                )
            ).cast("double"),
            6,
        ).alias("lang_entropy")
    )
    return p.join(h, "source").select(
        "source",
        "lang",
        "n_docs",
        "chars_total",
        F.round(F.col("__frac"), 6).alias("doc_share"),
        "lang_entropy",
    )


@query(
    "repetition_filter",
    oracle="""
    WITH sp AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g AS (
      SELECT doc_id, k, gram FROM (
        SELECT doc_id, 2 AS k,
               unnest(list_transform(range(1, greatest(len(w), 1)),
                      i -> w[i] || ' ' || w[i+1])) AS gram
        FROM sp WHERE len(w) >= 2
        UNION ALL
        SELECT doc_id, 3 AS k,
               unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram
        FROM sp WHERE len(w) >= 3
      )
    ),
    c AS (
      SELECT doc_id, k, gram, COUNT(*) AS cnt FROM g GROUP BY doc_id, k, gram
    ),
    s AS (
      SELECT doc_id,
             MAX(CASE WHEN k = 2 THEN cnt END) AS m2,
             SUM(CASE WHEN k = 2 THEN cnt END) AS t2,
             SUM(CASE WHEN k = 3 AND cnt > 1 THEN cnt END) AS d3,
             SUM(CASE WHEN k = 3 THEN cnt END) AS t3
      FROM c GROUP BY doc_id
    ),
    r AS (
      SELECT d.doc_id,
             COALESCE(CASE WHEN s.t2 > 0
               THEN CAST(s.m2 AS DOUBLE) / CAST(s.t2 AS DOUBLE) END, 0.0)
               AS top_bigram_frac,
             COALESCE(CASE WHEN s.t3 > 0
               THEN CAST(COALESCE(s.d3, 0) AS DOUBLE)
                    / CAST(s.t3 AS DOUBLE) END, 0.0) AS dup_trigram_frac
      FROM documents d LEFT JOIN s USING (doc_id)
    )
    SELECT doc_id, top_bigram_frac, dup_trigram_frac,
           top_bigram_frac > 0.10 OR dup_trigram_frac > 0.50 AS repetitive
    FROM r
    """,
)
def repetition_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition metrics (top-bigram / duplicate-trigram
    shares) per document — curation gate for boilerplate-heavy docs."""
    return curation.repetition_score(load_table(spark, sf_dir, "documents"))


_EVAL_SOURCE = "src19"


@query(
    "decontamination_overlap",
    oracle=f"""
    WITH sp AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ),
    g AS (
      SELECT DISTINCT doc_id, source, gram FROM (
        SELECT doc_id, source,
               unnest(list_transform(range(1, greatest(len(w) - 3, 1)),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                           || w[i+3] || ' ' || w[i+4])) AS gram
        FROM sp WHERE len(w) >= 5
      )
    ),
    e AS (SELECT DISTINCT gram FROM g WHERE source = '{_EVAL_SOURCE}'),
    sh AS (
      SELECT g.doc_id, COUNT(*) AS n
      FROM g JOIN e USING (gram) WHERE g.source <> '{_EVAL_SOURCE}'
      GROUP BY g.doc_id
    )
    SELECT d.doc_id, d.source,
           COALESCE(sh.n, 0) AS n_shared_ngrams,
           COALESCE(sh.n, 0) > 0 AS contaminated
    FROM documents d LEFT JOIN sh USING (doc_id)
    WHERE d.source <> '{_EVAL_SOURCE}'
    """,
)
def decontamination_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-style eval-set decontamination: flag training docs sharing
    any word-5-gram with the held-out source's documents."""
    return curation.decontamination_overlap(
        load_table(spark, sf_dir, "documents"), _EVAL_SOURCE
    )


@query(
    "cross_split_contamination",
    oracle="""
    WITH sp AS (
      SELECT doc_id, string_split(text, ' ') AS w,
             CASE
               WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) < 'e66'
                 THEN 'train'
               WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) < 'f33'
                 THEN 'val'
               ELSE 'test'
             END AS split
      FROM documents
    ),
    g AS (
      SELECT DISTINCT doc_id, split, gram FROM (
        SELECT doc_id, split,
               unnest(list_transform(range(1, greatest(len(w) - 3, 1)),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                           || w[i+3] || ' ' || w[i+4])) AS gram
        FROM sp WHERE len(w) >= 5
      )
    ),
    t AS (SELECT DISTINCT gram FROM g WHERE split = 'train'),
    sh AS (
      SELECT g.doc_id, COUNT(*) AS n
      FROM g JOIN t USING (gram) WHERE g.split <> 'train'
      GROUP BY g.doc_id
    )
    SELECT s.doc_id, s.split,
           COALESCE(sh.n, 0) AS n_shared_train_ngrams,
           COALESCE(sh.n, 0) > 0 AS leaked
    FROM sp s LEFT JOIN sh USING (doc_id)
    WHERE s.split <> 'train'
    """,
)
def cross_split_contamination_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out-leakage QA: per val/test doc, distinct word-5-grams shared
    with ANY train-split doc under the deterministic md5 split — the check
    that near-dup documents haven't straddled the train/eval boundary
    (split-axis twin of decontamination_overlap; the held-out side is a
    corpus fraction, so the gram join shuffles both sides instead of
    assuming a broadcastable eval set)."""
    return curation.cross_split_contamination(
        load_table(spark, sf_dir, "documents")
    )


@query(
    "source_mix_weights",
    oracle="""
    WITH s AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    t AS (
      SELECT CAST(SUM(n_tokens) AS DOUBLE) AS total_tokens,
             COUNT(*) AS n_sources
      FROM s
    )
    SELECT source, n_docs, n_tokens,
           CAST(n_tokens AS DOUBLE) / total_tokens AS token_share,
           CAST(1 AS DOUBLE) / n_sources AS target_share,
           (CAST(1 AS DOUBLE) / n_sources)
             / (CAST(n_tokens AS DOUBLE) / total_tokens) AS sample_weight,
           LEAST((CAST(1 AS DOUBLE) / n_sources)
             / (CAST(n_tokens AS DOUBLE) / total_tokens), 5.0)
             AS capped_weight
    FROM s CROSS JOIN t
    """,
)
def source_mix_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token shares and capped sampling weights for a uniform
    training mix — the reweighting plan a data pipeline feeds its
    sampler."""
    return curation.source_mix_weights(load_table(spark, sf_dir, "documents"))


@query(
    "source_mix_temperature",
    oracle=f"""
    WITH s AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    t AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS tot FROM s),
    w AS (
      SELECT source, n_docs, n_tokens,
             CAST(n_tokens AS DOUBLE) / tot AS share,
             POW(CAST(n_tokens AS DOUBLE) / tot, {curation.MIX_ALPHA})
               AS pa
      FROM s CROSS JOIN t
    ),
    z AS (SELECT SUM(pa) AS z FROM w)
    SELECT source, n_docs, n_tokens,
           ROUND(share, 6) AS token_share,
           ROUND(pa / z, 6) AS smoothed_share,
           ROUND(pa / z / share, 6) AS sample_weight
    FROM w CROSS JOIN z
    """,
)
def source_mix_temperature_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed source mix (p^alpha renormalized — the
    mT5/XLM-R multilingual sampling rule, alpha=0.3): upweights tail
    sources without flattening the head like the uniform target does."""
    return curation.source_mix_temperature(
        load_table(spark, sf_dir, "documents")
    )


from .operators import scd, skew  # noqa: E402
from .plans import engagement  # noqa: E402


@query(
    "scd2_status_history",
    oracle="""
    WITH r AS (
      SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey)
           - ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderstatus
                                ORDER BY o_orderdate, o_orderkey) AS island
      FROM orders
    ),
    i AS (
      SELECT o_custkey, o_orderstatus, island,
             MIN(o_orderdate) AS valid_from,
             MIN(ROW(o_orderdate, o_orderkey)) AS first_key,
             COUNT(*) AS n_observations
      FROM r GROUP BY o_custkey, o_orderstatus, island
    )
    SELECT o_custkey, o_orderstatus, valid_from,
           LEAD(valid_from) OVER (PARTITION BY o_custkey
                                  ORDER BY first_key) AS valid_to,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY first_key) AS INT) AS version,
           n_observations,
           LEAD(valid_from) OVER (PARTITION BY o_custkey
                                  ORDER BY first_key) IS NULL AS is_current
    FROM i
    """,
)
def scd2_status_history_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history of each customer's order status: the validity
    intervals a warehouse dimension would keep, derived from the change
    stream the reference's full-refresh dimension sync discards
    (client_dimension_sync_full/main.py overwrites current state)."""
    return scd.scd2_history(
        load_table(spark, sf_dir, "orders"),
        key_cols=["o_custkey"],
        attr_col="o_orderstatus",
        ts_col="o_orderdate",
        tiebreak_cols=["o_orderkey"],
    )


@query(
    "retention_cohorts",
    oracle="""
    WITH f AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ),
    a AS (
      SELECT DISTINCT f.cohort_week, e.user_id,
             CAST(datediff('day', f.cohort_week,
                           CAST(date_trunc('week', e.ts) AS DATE)) // 7
                  AS BIGINT) AS week_offset
      FROM events e JOIN f USING (user_id)
    ),
    s AS (SELECT cohort_week, COUNT(*) AS cohort_size FROM f GROUP BY cohort_week)
    SELECT a.cohort_week, a.week_offset,
           COUNT(DISTINCT a.user_id) AS n_active, s.cohort_size,
           ROUND(CAST(COUNT(DISTINCT a.user_id) AS DOUBLE)
                 / CAST(s.cohort_size AS DOUBLE), 6) AS retention_rate
    FROM a JOIN s USING (cohort_week)
    WHERE a.week_offset <= 12
    GROUP BY a.cohort_week, a.week_offset, s.cohort_size
    """,
)
def retention_cohorts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention over the event stream (do synced users
    come back) — the engagement counterpart of the reference's KPI
    dashboard rollups."""
    return engagement.retention_cohorts(load_table(spark, sf_dir, "events"))


@query(
    "funnel_conversion",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts >= s1.t GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts >= s2.t GROUP BY e.user_id
    ),
    c AS (
      SELECT 1 AS stage_idx, 'view' AS stage, COUNT(*) AS n_users FROM s1
      UNION ALL SELECT 2, 'click', COUNT(*) FROM s2
      UNION ALL SELECT 3, 'purchase', COUNT(*) FROM s3
    )
    SELECT stage_idx, stage, n_users,
           ROUND(CAST(n_users AS DOUBLE)
                 / CAST(FIRST_VALUE(n_users) OVER (ORDER BY stage_idx)
                        AS DOUBLE), 6) AS conv_from_first,
           ROUND(CAST(n_users AS DOUBLE)
                 / CAST(COALESCE(LAG(n_users) OVER (ORDER BY stage_idx),
                                 n_users) AS DOUBLE), 6) AS conv_from_prev
    FROM c
    """,
)
def funnel_conversion_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase ordered funnel: min-timestamp chain,
    per-stage reach and conversion rates."""
    return engagement.funnel_conversion(load_table(spark, sf_dir, "events"))


@query(
    "key_skew_profile",
    oracle="""
    WITH c AS (
      SELECT CAST(l_suppkey AS VARCHAR) AS key_value, COUNT(*) AS n_rows
      FROM lineitem GROUP BY 1
    ),
    t AS (
      SELECT CAST(SUM(n_rows) AS DOUBLE) AS total,
             CAST(COUNT(*) AS DOUBLE) AS n_keys
      FROM c
    ),
    r AS (
      SELECT key_value, n_rows,
             ROW_NUMBER() OVER (ORDER BY n_rows DESC, key_value) AS key_rank
      FROM c
    )
    SELECT r.key_value, r.n_rows, CAST(r.key_rank AS INT) AS key_rank,
           ROUND(CAST(n_rows AS DOUBLE) / t.total, 6) AS share,
           ROUND(CAST(n_rows AS DOUBLE) / (t.total / t.n_keys), 4)
             AS skew_vs_mean
    FROM r CROSS JOIN t WHERE r.key_rank <= 20
    """,
)
def key_skew_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter profile of lineitem's supplier key — the diagnostic
    that decides whether a join needs salting/AQE skew handling."""
    return skew.key_skew_profile(
        load_table(spark, sf_dir, "lineitem"), "l_suppkey", top_k=20
    )


@query(
    "rolling_revenue_7d",
    oracle="""
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
      FROM orders GROUP BY 1
    )
    SELECT day,
           CAST(ROUND(rev, 2) AS DOUBLE) AS revenue,
           CAST(ROUND(SUM(rev) OVER w, 2) AS DOUBLE) AS revenue_7d,
           CAST(COUNT(*) OVER w AS BIGINT) AS days_in_window,
           FLOOR(CAST(SUM(rev) OVER w AS DOUBLE)
                 / CAST(COUNT(*) OVER w AS DOUBLE) * 100 + 0.5) / 100
             AS avg_daily_7d
    FROM d
    WINDOW w AS (ORDER BY datediff('day', DATE '1970-01-01', day)
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def rolling_revenue_7d_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily revenue with calendar-aware 7-day trailing sum/average (the
    dashboard trend smoothing)."""
    return dashboard.rolling_revenue_7d(load_table(spark, sf_dir, "orders"))


@query(
    "priority_sample_docs",
    oracle="""
    WITH p AS (
      SELECT source, doc_id, n_chars AS weight,
             CAST(n_chars AS DOUBLE) * 4503599627370496.0
               / CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)
                           AS BIGINT) + 1 AS DOUBLE) AS pri
      FROM documents
    ),
    r AS (
      SELECT source, doc_id, weight,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY pri DESC, doc_id) AS sample_rank
      FROM p
    )
    SELECT source, doc_id, weight, CAST(sample_rank AS INT) AS sample_rank
    FROM r WHERE sample_rank <= 25
    """,
)
def priority_sample_docs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (length-proportional) deterministic document sample per
    source via priority sampling — seedless, engine-reproducible
    training-mix subsampling."""
    return curation.priority_sample(
        load_table(spark, sf_dir, "documents"),
        key_col="doc_id",
        weight_col="n_chars",
        stratum_col="source",
        k=25,
    )


@query(
    "group_percentiles_exact",
    oracle="""
    SELECT event_type, COUNT(value) AS n,
           ROUND(quantile_cont(value, 0.5), 6) AS p50,
           ROUND(quantile_cont(value, 0.95), 6) AS p95,
           ROUND(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type
    """,
)
def group_percentiles_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-event-type value percentiles — the exact twin that
    validates sketch_value_quantiles (GK) and serves grouped data."""
    return quality.group_percentiles_exact(
        load_table(spark, sf_dir, "events"), "event_type", "value"
    )


from .streaming import joins as stream_joins  # noqa: E402


@query(
    "click_attribution",
    oracle="""
    SELECT p.user_id,
           p.event_id AS purchase_id,
           p.ts AS purchase_ts,
           c.event_id AS click_id,
           c.ts AS click_ts,
           epoch_us(p.ts) - epoch_us(c.ts) AS lag_micros,
           CAST(ROUND(CAST(p.value AS DECIMAL(18,6)), 4) AS DOUBLE)
             AS purchase_value
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND c.ts <= p.ts
     AND c.ts >= p.ts - INTERVAL 30 MINUTE
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    """,
)
def click_attribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click->purchase attribution pairs within a 30-minute lookback —
    batch twin of the watermarked stream-stream join
    (streaming/joins.py)."""
    return stream_joins.attribution_batch(load_table(spark, sf_dir, "events"))


#: Trained k-means centroids per (sf_dir, k, iters) — collected rows, the
#: same once-per-corpus model-memo pattern as _BPE_MERGE_CACHE (the model
#: IS driver state; re-learning it per consuming query is pure waste).
#: LRU-bounded + superseded-fingerprint eviction via _ModelMemo.
_CENTROID_CACHE = _ModelMemo()


def _centroids_for(
    spark: SparkSession, sf_dir: str, k: int = 8, iters: int = 3
) -> DataFrame:
    fp = _corpus_fingerprint(sf_dir, "embeddings")
    rows = _CENTROID_CACHE.get((sf_dir, fp, k, iters))
    if rows is None:
        rows = [
            (int(r["cent_id"]), list(r["ce"]))
            for r in similarity.train_centroids(
                load_table(spark, sf_dir, "embeddings").select(
                    "vec_id",
                    F.col("embedding").cast("array<double>").alias("e"),
                ),
                k,
                iters,
            ).collect()
        ]
        _CENTROID_CACHE.put((sf_dir, fp, k, iters), rows)
    return spark.createDataFrame(rows, "cent_id long, ce array<double>")


#: Shared k=8 assignment pass (vec_id, e, cent_id): kmeans_doc_clusters
#: and semdedup_prune assign the same embeddings to the same memoized
#: centroid model, so the mapInPandas scoring pass is materialized once
#: per corpus snapshot (same single-live-handle lifecycle as
#: _DSIR_W_CACHE). Deterministic given the model, so sharing is exact.
_ASSIGN_CACHE: dict[tuple[str, str, int], DataFrame] = {}


def _assigned_for(spark: SparkSession, sf_dir: str, k: int = 8) -> DataFrame:
    key = (sf_dir, _corpus_fingerprint(sf_dir, "embeddings"), k)
    df = _ASSIGN_CACHE.get(key)
    if df is None:
        for old in _ASSIGN_CACHE.values():
            old.unpersist(blocking=False)
        _ASSIGN_CACHE.clear()
        from pyspark.storagelevel import StorageLevel

        v = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("e")
        )
        df = similarity._assign(
            v, _centroids_for(spark, sf_dir, k), "vec_id", "e", 1
        ).persist(StorageLevel.MEMORY_AND_DISK)
        _ASSIGN_CACHE[key] = df
    return df


@query("kmeans_doc_clusters")  # rows-only: iterative float clustering
def kmeans_doc_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means topical clustering of document embeddings (assignments,
    cluster sizes, cosine-to-centroid); self-consistency and inertia
    properties asserted in tests/test_similarity.py. Shares the trained
    k=8 model AND the assignment pass with semdedup_prune via the
    centroid/assignment memos."""
    return similarity.kmeans_clusters(
        load_table(spark, sf_dir, "embeddings"),
        n_clusters=8,
        centroids=_centroids_for(spark, sf_dir, 8),
        assigned=_assigned_for(spark, sf_dir, 8),
    )


from .operators import semistructured  # noqa: E402


@query(
    "json_props_profile",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
             AS n_with_field,
           CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS field_sum,
           MIN(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
             AS field_min,
           MAX(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
             AS field_max,
           COUNT(DISTINCT TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
             AS field_distinct
    FROM events GROUP BY event_type
    """,
)
def json_props_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-extraction profile of the semi-structured props payload —
    the VARIANT-flattening readiness check (JVM-side get_json_object,
    one hash aggregation)."""
    return semistructured.props_profile(load_table(spark, sf_dir, "events"))


from .operators import bpe  # noqa: E402


#: Once-per-corpus tokenizer model cache: BPE merge induction is model
#: TRAINING (10 driver-coordinated vocab passes); every query that applies
#: the tokenizer shares the induced table rather than re-learning it, the
#: same driver-resident-model posture as the IVF centroids. Keyed by
#: (corpus dir, snapshot fingerprint); deterministic (exact counts,
#: lexicographic tie-break), so a cache hit is bit-identical to a re-run.
#: LRU-bounded + superseded-fingerprint eviction via _ModelMemo.
_BPE_MERGE_CACHE = _ModelMemo()


def _bpe_merges_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (sf_dir, _corpus_fingerprint(sf_dir, "documents"))
    rows = _BPE_MERGE_CACHE.get(key)
    if rows is None:
        rows = bpe.bpe_merge_rows(
            load_table(spark, sf_dir, "documents"), n_merges=10
        )
        _BPE_MERGE_CACHE.put(key, rows)
    return spark.createDataFrame(rows, bpe.MERGES_SCHEMA)


@query("bpe_merge_table")  # rows-only: iterative model induction, no SQL twin
def bpe_merge_table_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned BPE merge table over the document corpus (Sennrich BPE;
    exact integer pair counts, lexicographic tie-break — engine- and
    partitioning-deterministic; cross-checked against a pure-Python
    reference implementation in tests/test_bpe.py)."""
    return _bpe_merges_for(spark, sf_dir)


@query("bpe_encode_tokens")  # rows-only: applies the learned (non-SQL) model
def bpe_encode_tokens_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc BPE token counts from applying the learned merge table —
    the corpus token-budget view a tokenizer change actually produces
    (learn once per corpus via the shared model cache, then encode:
    merges replay over the distinct word vocab and broadcast-join back;
    tests/test_bpe.py cross-checks against pure-Python BPE)."""
    docs = load_table(spark, sf_dir, "documents")
    return bpe.bpe_encode_stats(docs, _bpe_merges_for(spark, sf_dir))


@query(
    "robust_value_stats",
    oracle="""
    WITH b AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS plo,
             quantile_cont(value, 0.95) AS phi
      FROM events GROUP BY event_type
    ),
    j AS (
      SELECT e.event_type, e.value, b.plo, b.phi
      FROM events e JOIN b USING (event_type)
    )
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_all,
           ROUND(MIN(plo), 6) AS p_lo,
           ROUND(MIN(phi), 6) AS p_hi,
           COUNT(*) FILTER (WHERE value >= plo AND value <= phi) AS n_kept,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6)))
                        FILTER (WHERE value >= plo AND value <= phi)
                      AS DOUBLE)
                 / COUNT(*) FILTER (WHERE value >= plo AND value <= phi),
                 6) AS trimmed_mean,
           ROUND(CAST(SUM(CAST(LEAST(GREATEST(value, plo), phi)
                               AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 6) AS winsorized_mean
    FROM j GROUP BY event_type
    """,
)
def robust_value_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trimmed + winsorized per-event-type value means — contamination-
    robust baselines for the anomaly monitors."""
    return quality.robust_value_stats(
        load_table(spark, sf_dir, "events"), "event_type", "value"
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
    "budget_fallback_allocation",
    oracle=f"""
    WITH sup AS (
      SELECT l_orderkey AS order_key, l_suppkey AS contributor_key,
             CAST(SUM({_NET}) * 1000000 AS BIGINT) AS sup_mic,
             CAST(ROUND(SUM({_NET}), 2) AS DOUBLE) AS time_amount
      FROM lineitem WHERE l_returnflag = 'N'
      GROUP BY 1, 2
    ),
    ord AS (
      SELECT order_key, CAST(SUM(sup_mic) AS BIGINT) AS ord_mic
      FROM sup GROUP BY order_key
    ),
    alloc AS (
      SELECT l_orderkey AS order_key, l_suppkey AS contributor_key,
             CAST(ROUND(SUM({_NET}), 2) AS DOUBLE) AS ind_budget
      FROM lineitem WHERE l_returnflag IN ('A', 'R')
      GROUP BY 1, 2
    )
    SELECT s.order_key, s.contributor_key,
           s.time_amount,
           ROUND(CASE WHEN o2.ord_mic > 0
                      THEN CAST(s.sup_mic AS DOUBLE)
                           / CAST(o2.ord_mic AS DOUBLE) END, 6)
             AS time_share,
           a.ind_budget IS NOT NULL AS has_individual_budget,
           a.ind_budget AS ind_budget_amount,
           CASE WHEN a.ind_budget IS NULL THEN
             FLOOR(o.o_totalprice
                   * (CASE WHEN o2.ord_mic > 0
                           THEN CAST(s.sup_mic AS DOUBLE)
                                / CAST(o2.ord_mic AS DOUBLE) END)
                   * 100 + 0.5) / 100
           END AS fallback_budget_amount,
           CASE WHEN a.ind_budget IS NOT NULL THEN a.ind_budget
                ELSE FLOOR(o.o_totalprice
                   * (CASE WHEN o2.ord_mic > 0
                           THEN CAST(s.sup_mic AS DOUBLE)
                                / CAST(o2.ord_mic AS DOUBLE) END)
                   * 100 + 0.5) / 100
           END AS effective_budget,
           CASE WHEN a.ind_budget IS NOT NULL THEN 'individual'
                ELSE 'fallback_distributed' END AS budget_source
    FROM sup s
    JOIN ord o2 USING (order_key)
    LEFT JOIN alloc a USING (order_key, contributor_key)
    JOIN orders o ON o.o_orderkey = s.order_key
    """,
)
def budget_fallback_allocation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v5 FALLBACK view: per-contributor budget with work-item-level
    proportional distribution when no individual allocation exists."""
    return budget.budget_fallback_allocation(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


@query(
    "open_orders_by_day",
    oracle="""
    WITH cl AS (
      SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS close_day
      FROM lineitem GROUP BY 1
    ),
    o AS (
      SELECT CAST(o_orderdate AS DATE) AS open_day,
             COALESCE(cl.close_day, CAST(o_orderdate AS DATE)) AS close_day
      FROM orders LEFT JOIN cl ON cl.l_orderkey = o_orderkey
    ),
    d AS (
      SELECT open_day AS day, 1 AS delta, 1 AS opened, 0 AS closed FROM o
      UNION ALL
      SELECT close_day + 1, -1, 0, 1 FROM o
    ),
    g AS (
      SELECT day, CAST(SUM(delta) AS BIGINT) AS delta,
             CAST(SUM(opened) AS BIGINT) AS n_opened,
             CAST(SUM(closed) AS BIGINT) AS n_closed
      FROM d GROUP BY day
    )
    SELECT day, n_opened, n_closed,
           CAST(SUM(delta) OVER (ORDER BY day
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS open_intervals
    FROM g
    """,
)
def open_orders_by_day_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backlog trend: orders open per day (open = orderdate, close = last
    shipment) via the sweep-line delta fold — two rows per order, never a
    day-spine cross join."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    close = lineitem.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.max(F.to_date("l_shipdate")).alias("close_day")
    )
    iv = orders.join(close, "o_orderkey", "left").select(
        F.to_date("o_orderdate").alias("open_day"),
        F.coalesce(F.col("close_day"), F.to_date("o_orderdate")).alias(
            "close_day"
        ),
    )
    from .operators import ranges

    return ranges.open_intervals_by_day(iv, "open_day", "close_day")


@query(
    "mad_outlier_profile",
    oracle="""
    WITH m AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY 1
    ),
    d AS (
      SELECT e.event_type, e.value, m.med,
             ABS(e.value - m.med) AS dev
      FROM events e JOIN m USING (event_type)
    ),
    s AS (
      SELECT event_type, COUNT(*) AS n, MIN(med) AS median,
             quantile_cont(dev, 0.5) AS mad
      FROM d GROUP BY 1
    )
    SELECT d.event_type, s.n,
           ROUND(s.median, 6) AS median,
           ROUND(s.mad, 6) AS mad,
           CAST(SUM(CASE WHEN d.dev > 3.0 * 1.4826 * s.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           ROUND(CAST(SUM(CASE WHEN d.dev > 3.0 * 1.4826 * s.mad
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(s.n AS DOUBLE), 6) AS outlier_frac
    FROM d JOIN s USING (event_type)
    GROUP BY d.event_type, s.n, s.median, s.mad
    """,
)
def mad_outlier_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier profile per event type — the
    breakdown-resistant twin of the z-score volume monitors."""
    return quality.mad_outlier_stats(
        load_table(spark, sf_dir, "events"), "event_type", "value"
    )


@query(
    "customer_revenue_deciles",
    oracle="""
    WITH cust AS (
      SELECT o_custkey AS customer_key,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2)
                  AS DOUBLE) AS revenue
      FROM orders GROUP BY o_custkey
    ),
    r AS (
      SELECT customer_key, revenue,
             ROW_NUMBER() OVER (ORDER BY revenue DESC, customer_key) AS rn,
             COUNT(*) OVER () AS n
      FROM cust
    ),
    p AS (
      SELECT customer_key, revenue,
             CAST((rn - 1) * 10 // n AS INT) + 1 AS decile
      FROM r
    ),
    t AS (SELECT SUM(CAST(revenue AS DECIMAL(18,6))) AS grand FROM p)
    SELECT decile, COUNT(*) AS n_customers,
           CAST(ROUND(SUM(CAST(revenue AS DECIMAL(18,6))), 2) AS DOUBLE)
             AS revenue_total,
           ROUND(CAST(ROUND(SUM(CAST(revenue AS DECIMAL(18,6))), 2)
                      AS DOUBLE) / CAST(t.grand AS DOUBLE), 6)
             AS revenue_share
    FROM p CROSS JOIN t
    GROUP BY decile, t.grand
    """,
)
def customer_revenue_deciles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer revenue deciles via the two-phase distributed ranking
    (no single-partition NTILE sort) with per-decile revenue shares."""
    return dashboard.customer_revenue_deciles(load_table(spark, sf_dir, "orders"))


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


@query(
    "event_lateness_profile",
    oracle="""
    WITH l AS (
      SELECT event_type,
             CAST(epoch_us(MAX(ts) OVER (PARTITION BY user_id
                                         ORDER BY event_id
                                         ROWS UNBOUNDED PRECEDING))
                  - epoch_us(ts) AS DOUBLE) / 1000000.0 AS late
      FROM events
    )
    SELECT event_type, COUNT(*) AS n,
           ROUND(quantile_cont(late, 0.5), 6) AS late_p50_s,
           ROUND(quantile_cont(late, 0.95), 6) AS late_p95_s,
           ROUND(quantile_cont(late, 0.99), 6) AS late_p99_s,
           ROUND(MAX(late), 6) AS late_max_s,
           CAST(CEIL(quantile_cont(late, 0.99)) AS BIGINT)
             AS suggested_watermark_s
    FROM l GROUP BY event_type
    """,
)
def event_lateness_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observed out-of-orderness per event type with a suggested
    watermark — turns streaming watermark choice into a query."""
    return incremental.event_lateness_profile(
        load_table(spark, sf_dir, "events")
    )


@query(
    "incremental_dedup_check",
    oracle=f"""
    WITH {_SHINGLE_SQL},
    inter AS (
      SELECT n.doc_id, o.doc_id AS corpus_id, COUNT(*) AS i
      FROM sh n JOIN sh o ON n.shingle = o.shingle
      WHERE n.doc_id % 5 = 0 AND o.doc_id % 5 != 0
      GROUP BY n.doc_id, o.doc_id
    ),
    scored AS (
      SELECT i.doc_id, i.corpus_id,
             CAST(i.i AS DOUBLE) / (sn.sz + so.sz - i.i) AS j
      FROM inter i
      JOIN sizes sn ON i.doc_id = sn.doc_id
      JOIN sizes so ON i.corpus_id = so.doc_id
      WHERE CAST(i.i AS DOUBLE) / (sn.sz + so.sz - i.i) >= {_JACCARD_TAU}
    ),
    best AS (
      SELECT doc_id, corpus_id AS best_match_id, ROUND(j, 6) AS best_jaccard
      FROM (
        SELECT doc_id, corpus_id, j,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY j DESC, corpus_id) AS rk
        FROM scored
      ) WHERE rk = 1
    )
    SELECT d.doc_id, b.best_match_id, b.best_jaccard,
           b.best_match_id IS NOT NULL AS is_duplicate
    FROM documents d LEFT JOIN best b USING (doc_id)
    WHERE d.doc_id % 5 = 0
    """,
)
def incremental_dedup_check_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-increment dedup: check incoming docs (every 5th) against the
    existing corpus via the asymmetric hashed-shingle inverted index;
    best corpus match per incoming doc or nulls."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    incoming = docs.filter(F.col("doc_id") % 5 == 0)
    # Slices of the shared hashed-shingle memo: shingling is per-doc, so
    # filtering the corpus-wide index by doc_id is exactly the index of
    # the filtered docs — no second explode+dedup+hash build.
    sh = _shingles_for(spark, sf_dir)
    return neardup.incremental_neardup_check(
        corpus,
        incoming,
        _JACCARD_TAU,
        sh_corpus=sh.filter(F.col("doc_id") % 5 != 0),
        sh_incoming=sh.filter(F.col("doc_id") % 5 == 0),
    )


_SUBSTR_W = 40
_SUBSTR_S = 10


@query(
    "substring_dup_profile",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text, length(text) AS len FROM documents
      WHERE length(text) >= {_SUBSTR_W}
    ),
    w AS (
      SELECT doc_id, text, len,
             unnest(range(1, len - {_SUBSTR_W} + 2, {_SUBSTR_S})) AS start
      FROM d
    ),
    w2 AS (
      SELECT doc_id, len, start, start + {_SUBSTR_W} - 1 AS fin,
             md5(substr(text, CAST(start AS INTEGER), {_SUBSTR_W})) AS h
      FROM w
    ),
    dh AS (SELECT h FROM w2 GROUP BY h HAVING COUNT(*) > 1),
    dup AS (SELECT w2.doc_id, w2.start, w2.fin FROM w2 JOIN dh USING (h)),
    isl AS (
      SELECT doc_id, start, fin,
             CASE WHEN start > COALESCE(
               MAX(fin) OVER (PARTITION BY doc_id ORDER BY start
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), -1)
             THEN 1 ELSE 0 END AS new_isl
      FROM dup
    ),
    isl2 AS (
      SELECT doc_id, start, fin,
             SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY start) AS isl_id
      FROM isl
    ),
    cov AS (
      SELECT doc_id, isl_id, MAX(fin) - MIN(start) + 1 AS covered
      FROM isl2 GROUP BY doc_id, isl_id
    ),
    per AS (
      SELECT doc_id, CAST(SUM(covered) AS BIGINT) AS dup_chars
      FROM cov GROUP BY doc_id
    ),
    dc AS (
      SELECT doc_id, COUNT(*) AS n_dup_windows FROM dup GROUP BY doc_id
    ),
    base AS (
      SELECT doc_id, len, COUNT(*) AS n_windows FROM w2 GROUP BY doc_id, len
    )
    SELECT base.doc_id, base.n_windows,
           COALESCE(dc.n_dup_windows, 0) AS n_dup_windows,
           COALESCE(per.dup_chars, 0) AS dup_chars,
           CAST(COALESCE(per.dup_chars, 0) AS DOUBLE)
             / CAST(base.len AS DOUBLE) AS dup_char_share
    FROM base
    LEFT JOIN dc USING (doc_id)
    LEFT JOIN per USING (doc_id)
    """,
)
def substring_dup_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc exact-substring duplication profile: rolling {W}-char
    windows at stride {S}, window content occurring >1x anywhere in the
    corpus marks its span duplicated; spans union via gaps-and-islands.
    The windowed (suffix-array-free) form of Lee et al. 2021 substring
    dedup — the sub-document generalization of the reference's row-level
    dedup sweep (snowflake_bq_deduplication_sync.py:214)."""
    return neardup.substring_dup_profile(
        load_table(spark, sf_dir, "documents"), _SUBSTR_W, _SUBSTR_S
    )


_CHARLM_REF = "src1"


@query(
    "charlm_perplexity",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, text, length(text) AS len FROM documents
    ),
    tri AS (
      SELECT doc_id, source,
             substr(text, CAST(i AS INTEGER), 3) AS g3,
             substr(text, CAST(i AS INTEGER), 2) AS g2
      FROM (
        SELECT doc_id, source, text, unnest(range(1, len - 1)) AS i
        FROM d WHERE len >= 3
      )
    ),
    c3 AS (SELECT g3, COUNT(*) AS c3 FROM tri
           WHERE source = '{_CHARLM_REF}' GROUP BY g3),
    c2 AS (SELECT g2, COUNT(*) AS c2 FROM tri
           WHERE source = '{_CHARLM_REF}' GROUP BY g2),
    scored AS (
      SELECT tri.doc_id, COUNT(*) AS n_trigrams,
             SUM(CAST(round(-ln(
               CAST(COALESCE(c3.c3, 0) + 1 AS DOUBLE)
               / CAST(COALESCE(c2.c2, 0) + {text_ops.CHARLM_ALPHABET}
                      AS DOUBLE)
             ), 9) AS DECIMAL(28,12))) AS nll
      FROM tri LEFT JOIN c3 USING (g3) LEFT JOIN c2 USING (g2)
      WHERE tri.source <> '{_CHARLM_REF}'
      GROUP BY tri.doc_id
    ),
    per AS (
      SELECT doc_id, n_trigrams,
             ROUND(CAST(nll AS DOUBLE) / CAST(n_trigrams AS DOUBLE), 6)
               AS avg_nll
      FROM scored
    )
    SELECT d.doc_id, d.source,
           COALESCE(p.n_trigrams, 0) AS n_trigrams,
           COALESCE(p.avg_nll, 0.0) AS avg_nll,
           COALESCE(p.avg_nll, 0.0) < {text_ops.CHARLM_NLL_CUTOFF}
             AS is_fluent
    FROM d LEFT JOIN per p USING (doc_id)
    WHERE d.source <> '{_CHARLM_REF}'
    """,
)
def charlm_perplexity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality scoring: char-trigram LM trained on a
    reference slice; per-doc average negative log-probability (exact
    count ratios, decimal-summed rounded logs — engine-reproducible)."""
    return text_ops.charlm_perplexity(
        load_table(spark, sf_dir, "documents"), _CHARLM_REF
    )


_DSIR_TARGET = "src0"

_DSIR_W_SQL = f"""
    sp AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ),
    g AS (
      SELECT doc_id, source,
             substr(md5(w[i] || ' ' || w[i+1]), 1, 3) AS bucket
      FROM (
        SELECT doc_id, source, w, unnest(range(1, len(w))) AS i
        FROM sp WHERE len(w) >= 2
      )
    ),
    tc AS (SELECT bucket, COUNT(*) AS ct FROM g
           WHERE source = '{_DSIR_TARGET}' GROUP BY bucket),
    rc AS (SELECT bucket, COUNT(*) AS cr FROM g
           WHERE source <> '{_DSIR_TARGET}' GROUP BY bucket),
    nt AS (SELECT COUNT(*) AS nt FROM g WHERE source = '{_DSIR_TARGET}'),
    nr AS (SELECT COUNT(*) AS nr FROM g WHERE source <> '{_DSIR_TARGET}'),
    scored AS (
      SELECT g.doc_id, COUNT(*) AS n_grams,
             SUM(CAST(round(ln(
               (CAST(COALESCE(tc.ct, 0) + 1 AS DOUBLE)
                * CAST(nr.nr + {curation.DSIR_BUCKETS} AS DOUBLE))
               / (CAST(COALESCE(rc.cr, 0) + 1 AS DOUBLE)
                  * CAST(nt.nt + {curation.DSIR_BUCKETS} AS DOUBLE))
             ), 9) AS DECIMAL(28,12))) AS lw
      FROM g
      LEFT JOIN tc USING (bucket)
      LEFT JOIN rc USING (bucket)
      CROSS JOIN nt CROSS JOIN nr
      WHERE g.source <> '{_DSIR_TARGET}'
      GROUP BY g.doc_id
    ),
    w AS (
      SELECT d.doc_id, d.source,
             COALESCE(s.n_grams, 0) AS n_grams,
             ROUND(CAST(COALESCE(s.lw, 0) AS DOUBLE), 6) AS log_weight,
             COALESCE(s.lw, 0) > 0 AS target_leaning
      FROM documents d LEFT JOIN scored s USING (doc_id)
      WHERE d.source <> '{_DSIR_TARGET}'
    )
"""

#: Selected fraction for DSIR hard top-k selection.
_DSIR_SELECT_FRAC = 0.2

#: The weight table feeds both the weight view and the selection pass —
#: materialized once per corpus (same shared-intermediate posture as the
#: Jaccard pair cache above).
_DSIR_W_CACHE: dict[tuple[str, str], DataFrame] = {}


def _dsir_weights_for(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (sf_dir, _corpus_fingerprint(sf_dir, "documents"))
    df = _DSIR_W_CACHE.get(key)
    if df is None:
        for old in _DSIR_W_CACHE.values():
            old.unpersist(blocking=False)
        _DSIR_W_CACHE.clear()
        from pyspark.storagelevel import StorageLevel

        df = curation.dsir_importance_weights(
            load_table(spark, sf_dir, "documents"), _DSIR_TARGET
        ).persist(StorageLevel.MEMORY_AND_DISK)
        _DSIR_W_CACHE[key] = df
    return df


@query(
    "dsir_importance_weights",
    oracle=f"WITH {_DSIR_W_SQL} SELECT * FROM w",
)
def dsir_importance_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): hashed-bigram bucket
    models of the target slice vs the raw corpus; per-doc summed
    log-likelihood ratio with add-one smoothing. The domain-targeting
    twin of stratified_sample_mix — weights feed a resampling pass."""
    return _dsir_weights_for(spark, sf_dir)


@query(
    "dsir_select_topk",
    oracle=f"""
    WITH {_DSIR_W_SQL},
    r AS (
      SELECT doc_id, source, log_weight,
             ROW_NUMBER() OVER (ORDER BY log_weight DESC, doc_id) AS rn,
             COUNT(*) OVER () AS cnt
      FROM w
    )
    SELECT doc_id, source, log_weight,
           CAST(rn AS BIGINT) AS selection_rank
    FROM r WHERE rn <= CAST(ceil({_DSIR_SELECT_FRAC} * cnt) AS BIGINT)
    """,
)
def dsir_select_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The selection pass DSIR weights exist for: keep the top fraction
    of background docs by importance weight (hard top-k selection, the
    deterministic variant used when the resampling temperature is 0).
    Rank is the two-phase global numbering — no one-task sort; ties
    break on doc_id so the selected set is engine-identical."""
    return curation.dsir_select_topk(
        _dsir_weights_for(spark, sf_dir), _DSIR_SELECT_FRAC
    )


@query(
    "reporting_lag_analysis",
    oracle="""
    WITH per AS (
      SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS last_entry,
             SUM(CAST(l_quantity AS DECIMAL(18,6))) AS hours_dec,
             COUNT(*) AS records
      FROM lineitem WHERE l_returnflag = 'N'
      GROUP BY l_orderkey, l_suppkey
    ),
    j AS (
      SELECT p.*, o.o_orderdate + INTERVAL 30 DAY AS due
      FROM per p JOIN orders o ON p.l_orderkey = o.o_orderkey
    )
    SELECT due AS reporting_date,
           COUNT(*) AS pair_count,
           CAST(SUM(records) AS BIGINT) AS total_records,
           CAST(ROUND(SUM(hours_dec), 2) AS DOUBLE) AS total_hours,
           ROUND(CAST(SUM(DATEDIFF('day', last_entry, due)) AS DOUBLE)
                 / COUNT(*), 6) AS avg_reporting_lag_days,
           CAST(MAX(DATEDIFF('day', last_entry, due)) AS BIGINT)
             AS max_reporting_lag_days,
           COUNT(DISTINCT l_orderkey) AS unique_orders,
           COUNT(DISTINCT l_suppkey) AS unique_contributors
    FROM j GROUP BY due
    """,
)
def reporting_lag_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reporting-lag profile (ref: dashboard/main.py:1846 date-timing
    analysis): staleness of recognized work at each reporting date."""
    return dashboard.reporting_lag_analysis(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
    )


from .plans import bom  # noqa: E402


@query(
    "bom_per_case_consumption",
    oracle="""
    WITH yields AS (
      SELECT l_orderkey AS batch_key,
             CAST(l_quantity AS DOUBLE) AS batch_yield
      FROM lineitem WHERE l_linenumber = 1
    ),
    consumed AS (
      SELECT l_orderkey AS batch_key, l_partkey AS material_key,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
               AS total_consumed
      FROM lineitem WHERE l_linenumber > 1
      GROUP BY l_orderkey, l_partkey
    )
    SELECT c.batch_key, c.material_key, p.p_name AS material_name,
           c.total_consumed, y.batch_yield,
           ROUND(CAST(c.total_consumed AS DOUBLE) / y.batch_yield, 6)
             AS per_case_qty
    FROM consumed c
    JOIN yields y USING (batch_key)
    JOIN part p ON c.material_key = p.p_partkey
    WHERE y.batch_yield > 0
      AND ROUND(CAST(c.total_consumed AS DOUBLE) / y.batch_yield, 6) > 0
    """,
)
def bom_per_case_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOM import rows: per-case material consumption per production
    batch (ref: Kelvin BOM creater/Code.gs:352 — totalConsumed /
    batchYield at 6dp). Batch = order; line 1 = finished-good yield."""
    return bom.bom_per_case(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
    )


@query(
    "source_quality_report",
    oracle=rf"""
    WITH t AS (
      SELECT source,
             CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT)
               AS n_tokens,
             CAST(len(list_distinct(regexp_extract_all(text, '[a-z0-9]+')))
                  AS BIGINT) AS n_distinct,
             CAST(len(regexp_extract_all(text,
                  '\b(the|a|is|and|of|to|in)\b')) AS BIGINT) AS stop_hits,
             regexp_extract_all(text, '{curation.GOPHER_WORD_RE}') AS ws,
             text
      FROM documents
    ),
    s AS (
      SELECT source,
             ROUND(
               0.4 * LEAST(CAST(n_tokens AS DOUBLE) / 50.0, 1.0)
               + 0.3 * (1.0 - LEAST(
                   (CASE WHEN n_tokens > 0
                         THEN CAST(stop_hits AS DOUBLE) / n_tokens
                         ELSE 0.0 END) * 2.0, 1.0))
               + 0.3 * (CASE WHEN n_tokens > 0
                             THEN CAST(n_distinct AS DOUBLE) / n_tokens
                             ELSE 0.0 END),
               4) AS score,
             len(ws) AS n_words,
             ROUND(CAST(list_sum(list_transform(ws, w -> len(w)))
                        AS DOUBLE) / len(ws), 6) AS mean_word_len,
             ROUND(CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-z]')))
                        AS DOUBLE) / len(ws), 6) AS alpha_frac,
             ROUND(CAST((len(text) - len(replace(text, '#', '')))
                        + (len(text) - len(replace(text, '...', ''))) / 3
                        AS DOUBLE) / len(ws), 6) AS symbol_ratio,
             len(list_intersect(list_distinct(ws),
                 [{", ".join(f"'{w}'" for w in curation.GOPHER_STOPWORDS)}]))
               AS n_stop
      FROM t
    ),
    k AS (
      SELECT source, score,
             CASE WHEN score >= 0.75 THEN 'high'
                  WHEN score >= 0.5 THEN 'medium'
                  ELSE 'low' END AS bucket,
             (n_words >= {curation.GOPHER_MIN_WORDS}
              AND n_words <= {curation.GOPHER_MAX_WORDS}
              AND mean_word_len >= {curation.GOPHER_MIN_MEAN_WORD_LEN}
              AND mean_word_len <= {curation.GOPHER_MAX_MEAN_WORD_LEN}
              AND alpha_frac >= {curation.GOPHER_MIN_ALPHA_FRAC}
              AND symbol_ratio <= {curation.GOPHER_MAX_SYMBOL_RATIO}
              AND n_stop >= {curation.GOPHER_MIN_STOPWORDS}) AS keep
      FROM s
    )
    SELECT source,
           COUNT(*) AS n_docs,
           ROUND(CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS gopher_keep_rate,
           ROUND(CAST(SUM(CAST(score AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_quality_score,
           COUNT(CASE WHEN bucket = 'high' THEN 1 END) AS n_high,
           COUNT(CASE WHEN bucket = 'medium' THEN 1 END) AS n_medium,
           COUNT(CASE WHEN bucket = 'low' THEN 1 END) AS n_low
    FROM k GROUP BY source
    """,
)
def source_quality_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality scoreboard (mix monitoring): Gopher keep rate,
    mean heuristic score, bucket composition — one scan, one rollup."""
    return curation.source_quality_report(
        load_table(spark, sf_dir, "documents")
    )


@query("semdedup_prune")  # rows-only: k-means model + float clustering
def semdedup_prune_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic dedup (Abbas et al. 2023): within-k-means-cluster
    cosine groups resolved transitively; keep = min-id representative.
    Group/keep invariants asserted in tests/test_similarity.py. Shares
    the trained k=8 model AND the assignment pass with
    kmeans_doc_clusters via the centroid/assignment memos."""
    return similarity.semdedup_prune(
        load_table(spark, sf_dir, "embeddings"),
        n_clusters=8,
        assigned=_assigned_for(spark, sf_dir, 8),
    )


_GOPHER_STOP_SQL = ", ".join(f"'{s}'" for s in curation.GOPHER_STOPWORDS)


@query(
    "gopher_quality_rules",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text,
             regexp_extract_all(text, '{curation.GOPHER_WORD_RE}') AS ws
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n_words,
             ROUND(CAST(list_sum(list_transform(ws, w -> len(w)))
                        AS DOUBLE) / len(ws), 6) AS mean_word_len,
             ROUND(CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-z]')))
                        AS DOUBLE) / len(ws), 6) AS alpha_word_frac,
             ROUND(CAST((len(text) - len(replace(text, '#', '')))
                        + (len(text) - len(replace(text, '...', ''))) / 3
                        AS DOUBLE) / len(ws), 6) AS symbol_ratio,
             CAST(len(list_intersect(list_distinct(ws),
                                     [{_GOPHER_STOP_SQL}]))
                  AS BIGINT) AS n_stopwords
      FROM t
    )
    SELECT doc_id, n_words, mean_word_len, alpha_word_frac, symbol_ratio,
           n_stopwords,
           n_words >= {curation.GOPHER_MIN_WORDS}
             AND n_words <= {curation.GOPHER_MAX_WORDS} AS pass_word_count,
           mean_word_len >= {curation.GOPHER_MIN_MEAN_WORD_LEN}
             AND mean_word_len <= {curation.GOPHER_MAX_MEAN_WORD_LEN}
             AS pass_mean_word_len,
           alpha_word_frac >= {curation.GOPHER_MIN_ALPHA_FRAC}
             AS pass_alpha_frac,
           symbol_ratio <= {curation.GOPHER_MAX_SYMBOL_RATIO}
             AS pass_symbol_ratio,
           n_stopwords >= {curation.GOPHER_MIN_STOPWORDS} AS pass_stopwords,
           (n_words >= {curation.GOPHER_MIN_WORDS}
            AND n_words <= {curation.GOPHER_MAX_WORDS}
            AND mean_word_len >= {curation.GOPHER_MIN_MEAN_WORD_LEN}
            AND mean_word_len <= {curation.GOPHER_MAX_MEAN_WORD_LEN}
            AND alpha_word_frac >= {curation.GOPHER_MIN_ALPHA_FRAC}
            AND symbol_ratio <= {curation.GOPHER_MAX_SYMBOL_RATIO}
            AND n_stopwords >= {curation.GOPHER_MIN_STOPWORDS}) AS keep
    FROM m
    """,
)
def gopher_quality_rules_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-appendix word-shape quality rules per document (Rae et al.
    2021 §A1.1) — the rule-based complement to the token-count funnel.
    Row-local plan: split + higher-order folds, zero shuffle."""
    return curation.gopher_quality_rules(
        load_table(spark, sf_dir, "documents")
    )


@query(
    "embedding_outlier_topk",
    oracle="""
    WITH v AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    d AS (
      SELECT vec_id, unnest(e) AS val, generate_subscripts(e, 1) AS pos
      FROM v
    ),
    cent AS (
      SELECT pos,
             CAST(SUM(CAST(val AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS c
      FROM d GROUP BY pos
    ),
    dist AS (
      SELECT d.vec_id,
             SUM(CAST((d.val - cent.c) * (d.val - cent.c)
                      AS DECIMAL(28,12))) AS s2
      FROM d JOIN cent USING (pos) GROUP BY d.vec_id
    )
    SELECT v.vec_id, v.label,
           ROUND(SQRT(CAST(dist.s2 AS DOUBLE)), 6) AS centroid_dist
    FROM dist JOIN v USING (vec_id)
    ORDER BY centroid_dist DESC, vec_id
    LIMIT 50
    """,
)
def embedding_outlier_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier triage: top-50 vectors by distance to the
    corpus centroid (exact decimal sums make the centroid and distances
    engine-identical; plan is one 1-row aggregate + TakeOrdered)."""
    return similarity.centroid_outliers(
        load_table(spark, sf_dir, "embeddings"), k=50, dims=_ANN_DIMS
    )


# ---------------------------------------------------------------------------
# Registration order = the driver's correctness window.
#
# The driver's CORRECTNESS gate hash-checks only the FIRST 50 entries of
# ``queries()`` (dict insertion order).  Definition order above is narrative
# (grouped by SURVEY §2 family), so we rebuild QUERIES here with an explicit
# priority order (r8 rotation): changed-this-round queries first (fresh
# hash signal), then the queries whose last driver verdict is OLDEST
# (r5-vintage, then the oldest r6-vintage) — so driver coverage cycles
# through the whole oracle-gated surface across rounds.  Rows-only ops
# (no oracle possible) must never hold a window slot.
#
# Every registered query MUST appear exactly once (asserted below), and the
# window-critical set — every name whose engine code changed this round —
# must sit at index < 50 (asserted below; replaces the stale slot-number
# comments that caused the r4 tfidf_top_terms off-by-one).
# ---------------------------------------------------------------------------

_WINDOW_ORDER = [
    # -- DRIVER WINDOW (first 50): the driver hash-checks only these --
    # engine code changed this round (r8): the two single-distinct date
    # partials now rejoin null-safely (eqNullSafe) so a null order-date
    # group can never silently vanish vs the single-aggregate oracle
    "reporting_lag_analysis",
    # r5-vintage stable passers — the oldest driver verdicts in the
    # registry (rotation cohort per VERDICT r7 item 1: the 28 queries
    # whose last driver verdict is r5)
    "cdc_fold_snapshot",
    "incremental_agg_maintenance",
    "row_count_by_day",
    "data_quality_metrics",
    "freshness_check",
    "row_count_compare",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_supplier_volume",
    "q6_forecast_revenue",
    "q18_large_orders",
    "dedup_exact",
    "doc_fingerprint",
    "text_stats",
    "text_quality_score",
    "lang_id",
    "ann_cosine_topk",
    "embedding_dup_pairs",
    "doc_length_histogram",
    "error_window_events",
    "event_sessions",
    "user_running_totals",
    "user_activity_trend",
    "events_windowed_counts",
    "pipeline_alerts",
    "volume_anomaly",
    "volume_anomaly_dow",
    "dup_key_audit",
    # oldest r6-vintage fill (longest-unchecked after the r5 block)
    "utilization_rollup",
    "client_budget_rollup",
    "contributor_utilization_rollup",
    "view_variance_detection",
    "budget_fallback_allocation",
    "budget_vs_actual",
    "individual_budget_tracking",
    "tfidf_top_terms",
    "vocab_top_k",
    "tfidf_doc_similarity",
    "asof_join_last_purchase",
    "bloom_filtered_entries",
    "decontamination_overlap",
    "embedding_doc_dedup",
    "monthly_hours_pivot",
    "pii_redaction",
    "quality_filter_funnel",
    "source_mix_weights",
    "stratified_sample_mix",
    "work_item_enriched",
    "q2_min_cost_supplier",
    # -- past the window: remaining r6-checked, then r7-checked -------
    "q4_order_priority",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_parts",
    "q12_priority_shipping",
    "q13_order_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q19_bracket_revenue",
    "q20_dominant_suppliers",
    "q21_waiting_suppliers",
    "q22_idle_accounts",
    "gopher_quality_rules",
    "embedding_outlier_topk",
    "bom_per_case_consumption",
    "ngram_containment_dups",
    "vocab_coverage_curve",
    "char_entropy_score",
    "doc_novelty_profile",
    "status_flap_audit",
    "source_quality_report",
    "shard_assignment_balanced",
    "shard_balance_summary",
    # r7-checked (freshest verdicts, rotated out of the window)
    "ngram_jaccard_dups",
    "incremental_dedup_check",
    "dedup_clusters",
    "dedup_savings_report",
    "sales_rollup_sets",
    "dsir_select_topk",
    "source_mix_temperature",
    "substring_dup_profile",
    "dsir_importance_weights",
    "charlm_perplexity",
    "scd2_status_history",
    "click_attribution",
    "json_props_profile",
    "robust_value_stats",
    "stale_snapshot_audit",
    "open_orders_by_day",
    "mad_outlier_profile",
    "customer_revenue_deciles",
    "snapshot_changelog",
    "event_lateness_profile",
    "retention_cohorts",
    "funnel_conversion",
    "key_skew_profile",
    "rolling_revenue_7d",
    "priority_sample_docs",
    "group_percentiles_exact",
    "backfill_progress",
    "column_value_drift",
    "token_count_bpe",
    "dataset_split_assign",
    "event_session_stats",
    "paragraph_dedup",
    "distribution_drift_psi",
    "sequence_packing",
    "pack_fill_summary",
    "source_language_mix",
    "repetition_filter",
    "multivariate_anomaly",
    "cross_split_contamination",
    "alert_digest",
    "full_sync_snapshot",
    "incremental_sync_window",
    "merge_upsert",
    "orphaned_records",
    "missing_records",
    "dedup_latest_record",
    "sync_date_dedup",
    "paginated_extract",
    "chunked_backfill_plan",
    # -- rows-only ops (no oracle possible, must never hold a slot) ---
    "bpe_merge_table",
    "bpe_encode_tokens",
    "kmeans_doc_clusters",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "semdedup_prune",
    "minhash_recall_report",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "pq_compression_stats",
    "sketch_distinct_users",
    "sketch_value_quantiles",
]

assert set(_WINDOW_ORDER) == set(QUERIES), (
    "registry window order out of sync: "
    f"missing={sorted(set(QUERIES) - set(_WINDOW_ORDER))} "
    f"stale={sorted(set(_WINDOW_ORDER) - set(QUERIES))}"
)
assert len(_WINDOW_ORDER) == len(set(_WINDOW_ORDER)), "duplicate names"

#: Names whose engine code is new or changed THIS round: each needs a fresh
#: driver hash verdict, so each must sit inside the 50-slot window.  Update
#: this set whenever a round touches a query's plan or oracle.
_WINDOW_CRITICAL = {
    # r8: the two-partial distinct rollup now rejoins on a null-safe
    # date key (plans/dashboard.py reporting_lag_analysis)
    "reporting_lag_analysis",
}
assert all(_WINDOW_ORDER.index(n) < 50 for n in _WINDOW_CRITICAL), (
    "changed-this-round query outside the driver's 50-slot window: "
    f"{[n for n in _WINDOW_CRITICAL if _WINDOW_ORDER.index(n) >= 50]}"
)
# rows-only ops (no oracle) can never produce a hash verdict — keep them out
assert all(
    _WINDOW_ORDER.index(n) >= 50 for n in QUERIES if n not in ORACLES
), "rows-only op occupies a driver window slot"

QUERIES = {name: QUERIES[name] for name in _WINDOW_ORDER}
ORACLES = {name: ORACLES[name] for name in _WINDOW_ORDER if name in ORACLES}


# ---------------------------------------------------------------------------
# Cross-query memo provenance (introspected, not hand-maintained).
#
# bench.py's best-of-N protocol structurally under-counts queries that
# consume the fingerprint memos above: the shared build cost (shingle
# index, tok counts, k-means model, ...) lands in the FIRST rep of the
# FIRST consumer and every recorded best is a warm-memo time. So the
# bench sidecar flags exactly which queries ride which memo — derived
# from each registered function's source at import (transitively: e.g.
# _jaccard_pairs_for itself builds on _shingles_for), so a new consumer
# can never silently escape the flag.
# ---------------------------------------------------------------------------

_MEMO_HELPERS = (
    "_shingles_for",
    "_jaccard_pairs_for",
    "_minhash_pairs_for",
    "_tok_counts_for",
    "_centroids_for",
    "_assigned_for",
    "_bpe_merges_for",
    "_dsir_weights_for",
)


def _memo_helpers_called(fn) -> frozenset:
    """Memo helpers a function's CODE actually calls.

    AST-based (ast.Call nodes only), so a helper merely MENTIONED in a
    docstring or comment — e.g. a query documenting why it does NOT ride
    ``_shingles_for(...)`` — is never falsely flagged as a memo consumer
    (a false flag would discount that query's genuine bench wins in
    bench_details' memo accounting)."""
    import ast
    import inspect
    import textwrap

    try:
        tree = ast.parse(textwrap.dedent(inspect.getsource(fn)))
    except (OSError, TypeError, SyntaxError):  # pragma: no cover
        return frozenset()
    called = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Call):
            f = node.func
            if isinstance(f, ast.Name):
                called.add(f.id)
            elif isinstance(f, ast.Attribute):
                called.add(f.attr)
    return frozenset(h for h in _MEMO_HELPERS if h in called)


_HELPER_DEPS = {
    h: _memo_helpers_called(globals()[h]) - {h} for h in _MEMO_HELPERS
}


def _memo_closure(helpers) -> frozenset:
    out, frontier = set(helpers), list(helpers)
    while frontier:
        for dep in _HELPER_DEPS[frontier.pop()]:
            if dep not in out:
                out.add(dep)
                frontier.append(dep)
    return frozenset(out)


#: query name -> sorted tuple of memo helpers its plan consumes
MEMO_CONSUMERS: dict[str, tuple[str, ...]] = {
    name: tuple(sorted(_memo_closure(_memo_helpers_called(fn))))
    for name, fn in QUERIES.items()
    if _memo_helpers_called(fn)
}
