"""Dashboard-style rollups and cross-view variance detection.

Reference parity:
- ``client_budget_rollup``: dashboard/main.py L1660-1678 — per-client
  budgeted/actual totals ordered for the dashboard's top table.
- ``view_variance_detection``: TIME_ENTRY_VARIANCE_ANALYSIS.md — the
  reference repeatedly debugged "view A reports N hours, view B reports
  N-94.77"; this operator makes that comparison a first-class query:
  aggregate the same measure through two view definitions and flag
  discrepancies per key.
- ``event_sessions`` / ``user_running_totals``: sessionization and
  cumulative per-user activity (the batch twin of
  streaming/stateful.running_user_totals).
- ``sales_rollup_sets``: ROLLUP over (region, nation) — the dashboard's
  drill-down totals in one pass instead of one query per level.

Scale: rollup aggregations are partial; sessionization/running totals are
one window per user-partition (single hash shuffle on user_id, ordered
within partition — no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import (
    dec,
    money,
    money_from_micros_sum,
    money_micros,
    net_price,
)

SESSION_GAP_MIN = 30


def client_budget_rollup(orders: DataFrame, lineitem: DataFrame, customer: DataFrame) -> DataFrame:
    """Per-client budget/actual totals (dashboard top-clients table)."""
    # Long-micros money sums (functions.money_micros): bit-identical to the
    # decimal path (same per-row 6dp rounding) with long-add aggregation.
    # Grain audit: per-client is FINE-grain — client count scales with the
    # corpus while orders-per-client stays bounded (TPC-H-shape: ~10-40
    # orders/customer at every sf), so a client's micros sum never nears
    # 2^63. Only fixed-group-count grains (nation/region/global) need the
    # salted two-phase sum (see plans/enrichment.py utilization_rollup).
    li = lineitem.groupBy("l_orderkey").agg(
        F.sum(
            money_micros(
                net_price(F.col("l_extendedprice"), F.col("l_discount"))
            )
        ).alias("__actual_mic")
    )
    return _client_select(orders, li, customer)


def client_budget_rollup_from(
    orders: DataFrame, rollup: DataFrame, customer: DataFrame
) -> DataFrame:
    """Per-client rollup derived from the shared budget-family cube
    (plans/budget.line_rollup) — identical output to
    :func:`client_budget_rollup` for any input: the per-order micros sum
    re-aggregates the cube's exact integer partials (associative), and
    the client-grain finalize is shared code."""
    li = rollup.groupBy("l_orderkey").agg(
        F.sum("net_mic").alias("__actual_mic")
    )
    return _client_select(orders, li, customer)


def _client_select(
    orders: DataFrame, li: DataFrame, customer: DataFrame
) -> DataFrame:
    """Shared finalize for the client rollup (both build paths)."""
    joined = orders.join(li, orders.o_orderkey == li.l_orderkey, "left").join(
        F.broadcast(customer.select("c_custkey", "c_name")),
        orders.o_custkey == F.col("c_custkey"),
    )
    return joined.groupBy(F.col("c_custkey").alias("client_key"), F.col("c_name").alias("client_name")).agg(
        F.count(F.lit(1)).alias("order_count"),
        money_from_micros_sum(
            F.sum(money_micros(F.col("o_totalprice")))
        ).alias("total_budgeted"),
        money_from_micros_sum(
            F.sum(F.coalesce(F.col("__actual_mic"), F.lit(0).cast("long")))
        ).alias("total_actual"),
    )


def contributor_utilization_rollup(
    lineitem: DataFrame, supplier: DataFrame, nation: DataFrame
) -> DataFrame:
    """Per-contributor (member) utilization rollup with team attributes —
    the dashboard's member grain (dashboard/main.py member/team tables;
    the v5 individual view's primary consumer).

    One conditional aggregation over lineitem at the contributor grain
    (allocation lines vs time lines, same mapping as the flagship), then a
    broadcast join to the supplier/nation dims for member name and team.
    Utilization buckets are derived from the already-rounded percentage so
    the bucket boundaries are engine-exact. Team-level rollups are a
    trivial groupBy("team_name") over this output — same shuffle key.

    Scale: one shuffle on l_suppkey (map-side combined), two broadcast
    dim joins; countDistinct(l_orderkey) is exact-distinct per contributor
    (orders-per-contributor is unbounded at scale, so no collect_set).
    """
    # Long-micros money sums (functions.money_micros): bit-identical to the
    # decimal path (same per-row 6dp rounding), ~40% faster on this
    # multi-aggregate groupBy (the flagship's round-4 lesson). Grain
    # audit: per-contributor is FINE-grain — contributor count scales
    # with the corpus, entries-per-contributor stays bounded (~600 lines
    # per supplier at every sf), so the long micros sum cannot overflow.
    net_mic = money_micros(
        net_price(F.col("l_extendedprice"), F.col("l_discount"))
    )
    is_alloc = F.col("l_returnflag").isin("A", "R")
    is_time = F.col("l_returnflag") == "N"
    per = lineitem.groupBy(F.col("l_suppkey").alias("contributor_key")).agg(
        F.countDistinct("l_orderkey").alias("orders_contributed"),
        money_from_micros_sum(F.sum(F.when(is_alloc, net_mic))).alias(
            "__alloc_n"
        ),
        money_from_micros_sum(F.sum(F.when(is_time, net_mic))).alias(
            "__actual_n"
        ),
        money_from_micros_sum(
            F.sum(F.when(is_time & (F.col("l_tax") > 0), net_mic))
        ).alias("__billable_n"),
        F.count(F.when(is_alloc, F.lit(1))).alias("allocation_count"),
        F.count(F.when(is_time, F.lit(1))).alias("time_entry_count"),
        F.min(F.when(is_time, F.col("l_shipdate"))).alias("first_entry_date"),
        F.max(F.when(is_time, F.col("l_shipdate"))).alias("last_entry_date"),
    )
    return _contributor_select(per, supplier, nation)


def contributor_utilization_rollup_from(
    rollup: DataFrame, supplier: DataFrame, nation: DataFrame
) -> DataFrame:
    """Per-contributor utilization derived from the shared budget-family
    cube (plans/budget.line_rollup) — identical output to
    :func:`contributor_utilization_rollup` for any input.

    Exactness at the contributor coarsening: integer micros partials sum
    exactly and F.sum's null-skipping matches the one-pass conditional
    sums (all-null side → NULL both ways); orders_contributed counts the
    cube's distinct (order, contributor) rows with a null-skipping
    count(l_orderkey) == countDistinct at this grain. Grain audit:
    per-contributor is fine-grain (entries-per-contributor bounded), so
    the long micros re-sum cannot overflow — same bound as the one-pass
    plan's own groups.
    """
    per = rollup.groupBy(F.col("l_suppkey").alias("contributor_key")).agg(
        F.count(F.col("l_orderkey")).alias("orders_contributed"),
        money_from_micros_sum(F.sum("alloc_mic")).alias("__alloc_n"),
        money_from_micros_sum(F.sum("time_mic")).alias("__actual_n"),
        money_from_micros_sum(F.sum("time_bill_mic")).alias("__billable_n"),
        F.sum("alloc_cnt").alias("allocation_count"),
        F.sum("time_cnt").alias("time_entry_count"),
        F.min("time_min_ship").alias("first_entry_date"),
        F.max("time_max_ship").alias("last_entry_date"),
    )
    return _contributor_select(per, supplier, nation)


def _contributor_select(
    per: DataFrame, supplier: DataFrame, nation: DataFrame
) -> DataFrame:
    """Shared finalize for the contributor rollup (both build paths)."""
    dims = supplier.select("s_suppkey", "s_name", "s_nationkey").join(
        nation.select("n_nationkey", "n_name"),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    joined = per.join(
        F.broadcast(dims), per.contributor_key == F.col("s_suppkey"), "left"
    )
    alloc = F.coalesce(F.col("__alloc_n"), F.lit(0.0))
    actual = F.coalesce(F.col("__actual_n"), F.lit(0.0))
    util = F.when(alloc > 0, money(actual / alloc * 100))
    bucket = (
        F.when(alloc <= 0, F.lit("NO_BUDGET"))
        .when(util > 100, F.lit("OVER_ALLOCATED"))
        .when(util >= 80, F.lit("HIGH"))
        .when(util >= 50, F.lit("HEALTHY"))
        .otherwise(F.lit("UNDER_UTILIZED"))
    )
    return joined.select(
        "contributor_key",
        F.col("s_name").alias("contributor_name"),
        F.col("n_name").alias("team_name"),
        "orders_contributed",
        alloc.alias("alloc_amount"),
        actual.alias("actual_amount"),
        F.coalesce(F.col("__billable_n"), F.lit(0.0)).alias("billable_amount"),
        "allocation_count",
        "time_entry_count",
        "first_entry_date",
        "last_entry_date",
        util.alias("utilization_pct"),
        bucket.alias("utilization_bucket"),
    )


def view_variance_detection(lineitem: DataFrame) -> DataFrame:
    """Per-contributor totals through two 'view' definitions, with the
    variance between them — detects a view silently dropping entries.

    View A: all entry lines. View B: only lines a narrower view would keep
    (here: 'N'-flagged lines, mirroring a view that filters by status).
    """
    net_mic = money_micros(
        net_price(F.col("l_extendedprice"), F.col("l_discount"))
    )
    per = lineitem.groupBy(F.col("l_suppkey").alias("contributor_key")).agg(
        money_from_micros_sum(F.sum(net_mic)).alias("view_a_total"),
        money_from_micros_sum(
            F.sum(F.when(F.col("l_returnflag") == "N", net_mic))
        ).alias("view_b_total_n"),
        F.count(F.lit(1)).alias("view_a_entries"),
        F.count(F.when(F.col("l_returnflag") == "N", F.lit(1))).alias(
            "view_b_entries"
        ),
    )
    return _variance_select(per)


def view_variance_detection_from(rollup: DataFrame) -> DataFrame:
    """Cross-view variance derived from the shared budget-family cube —
    identical output to :func:`view_variance_detection` for any input:
    per-contributor re-sums of the cube's exact integer micros partials
    (fine-grain: entries-per-contributor bounded), time-side nulls
    preserved by F.sum's null-skipping exactly as the one-pass
    conditional sums."""
    per = rollup.groupBy(F.col("l_suppkey").alias("contributor_key")).agg(
        money_from_micros_sum(F.sum("net_mic")).alias("view_a_total"),
        money_from_micros_sum(F.sum("time_mic")).alias("view_b_total_n"),
        F.sum("cnt").alias("view_a_entries"),
        F.sum("time_cnt").alias("view_b_entries"),
    )
    return _variance_select(per)


def _variance_select(per: DataFrame) -> DataFrame:
    """Shared finalize for the variance view (both build paths)."""
    vb = F.coalesce(F.col("view_b_total_n"), F.lit(0.0))
    return per.select(
        "contributor_key",
        "view_a_total",
        vb.alias("view_b_total"),
        "view_a_entries",
        "view_b_entries",
        money(F.col("view_a_total") - vb).alias("variance_amount"),
        (F.round(F.col("view_a_total") - vb, 2) != 0.0).alias("has_variance"),
    )


def event_sessions(events: DataFrame) -> DataFrame:
    """Gap-based sessionization: a >30-minute silence starts a new session.

    lag + running count of session starts = session id; then one aggregate
    per (user, session).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(
        gap_us.isNull() | (gap_us > SESSION_GAP_MIN * 60 * 1000000), 1
    ).otherwise(0)
    sessions = events.withColumn(
        "session_seq",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(dec(F.col("value"))), 4).cast("double").alias("total_value"),
    )


def user_running_totals(events: DataFrame) -> DataFrame:
    """Cumulative per-user event count and value sum ordered by time —
    batch twin of the streaming stateful operator."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "user_id",
        "event_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("running_events"),
        F.round(F.sum(dec(F.col("value"))).over(w), 4)
        .cast("double")
        .alias("running_value"),
    )


def sales_rollup_sets(
    orders: DataFrame,
    lineitem: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Revenue ROLLUP over (region, nation): leaf, subtotal, and grand
    total rows (dashboard drill-down).

    Two-phase: the fact rows are first reduced to the (region, nation)
    leaf grain with exact decimal sums, and ROLLUP runs on that
    ~|regions|x|nations| table. ROLLUP is an Expand under the hood
    (every input row replicated once per grouping set), so rolling up
    the RAW join output would triple the fact-grain rows through the
    aggregate — profiled at sf0.1 as ~0.65s of pure decimal-under-Expand
    overhead versus ~0 when Expand sees only the leaf aggregate. Sums
    of exact decimal partials are associative, so output is identical;
    the grand-total group keeps the decimal(38,x) width (a micros long
    would be the one aggregate here whose sum does NOT scale down with
    group count — the overflow contract from the salted-rollup work)."""
    net = net_price(F.col("l_extendedprice"), F.col("l_discount"))
    base = (
        lineitem.select("l_orderkey", "l_extendedprice", "l_discount")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
            net.alias("__net"),
        )
    )
    leaf = base.groupBy("region_name", "nation_name").agg(
        F.sum(F.col("__net")).alias("__net_sum"),
        F.count(F.lit(1)).alias("__n"),
    )
    return leaf.rollup("region_name", "nation_name").agg(
        money(F.sum(F.col("__net_sum"))).alias("revenue"),
        F.sum("__n").alias("line_count"),
        F.grouping_id().cast("long").alias("grouping_level"),
    )


def user_activity_trend(events: DataFrame) -> DataFrame:
    """Per-user least-squares trend of event value over time.

    Beyond-groupby analytics without MLlib: the OLS slope comes from the
    exact sufficient statistics (n, Σx, Σy, Σxy, Σx²) — integers and
    decimals, so any engine derives the identical double slope from the
    identical closed-form expression. x = whole seconds since the user's
    first event (window min, one shuffle shared with the aggregation).
    """
    w = Window.partitionBy("user_id")
    us = F.unix_micros(F.col("ts"))
    x = F.floor((us - F.min(us).over(w)) / F.lit(1000000.0))
    base = events.select(
        "user_id", x.alias("x"), F.col("value").alias("y")
    )
    agg = base.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("x").alias("__sx"),
        F.sum(F.col("x") * F.col("x")).alias("__sxx"),
        F.sum(dec(F.col("y"))).alias("__sy"),
        F.sum(F.col("x").cast("decimal(12,0)") * dec(F.col("y"))).alias("__sxy"),
    )
    n = F.col("n_events").cast("double")
    sx = F.col("__sx").cast("double")
    sxx = F.col("__sxx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    den = n * sxx - sx * sx
    slope_hr = F.round((n * sxy - sx * sy) / (n * sxx - sx * sx) * 3600.0, 6)
    return agg.select(
        "user_id",
        "n_events",
        F.when(den != 0, slope_hr).alias("value_trend_per_hour"),
    )


def rolling_revenue_7d(orders: DataFrame) -> DataFrame:
    """Daily revenue with a 7-day trailing window (sum / daily average).

    The KPI dashboard's trend chart smoothing: revenue by calendar day
    with a RANGE frame back 6 days (calendar-aware — missing days
    shorten the window rather than silently pulling older rows, which is
    why the frame is RANGE on an epoch-day ordinal, not ROWS).

    Scale: the window runs over the ALREADY-AGGREGATED day table —
    O(distinct days) rows regardless of fact size (a few thousand for
    years of data), so the unpartitioned sort is a deliberately tiny
    driver-of-one-partition step, same as backfill_progress. The heavy
    lifting is the per-day hash aggregation with map-side combine.
    """
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("day")
    ).agg(F.sum(dec(F.col("o_totalprice"))).alias("__rev"))
    day_num = F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.orderBy(day_num)
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "day",
        money(F.col("__rev")).alias("revenue"),
        money(F.sum("__rev").over(w)).alias("revenue_7d"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("days_in_window"),
        # Double division then a floor-based half-up round: engines disagree
        # both on decimal-quotient scale and on ROUND(double) tie behavior
        # (binary-value vs printed-value ties), while floor(x*100 + 0.5)/100
        # over bit-identical doubles is deterministic everywhere. Ties are
        # COMMON here (sums of cents divided by 2/4/5 land on .xx5 exactly).
        (
            F.floor(
                F.sum("__rev").over(w).cast("double")
                / F.count(F.lit(1)).over(w).cast("double")
                * 100
                + 0.5
            ).cast("double")
            / 100
        ).alias("avg_daily_7d"),
    )


def customer_revenue_deciles(orders: DataFrame) -> DataFrame:
    """Decile table over per-customer revenue (who drives the book).

    Rank-based bucketing needs a TOTAL order over the aggregated
    customer table; at warehouse scale that table is itself large, so
    the rank comes from operators.sync.global_row_number (two-phase
    range-partitioned ranking) — never a single-partition NTILE sort.
    Buckets use the balanced formula floor((rn-1)·10/n)+1, written
    identically in the oracle (SQL NTILE's remainder distribution is
    engine-defined, so it is avoided).
    """
    from ..functions import dec, money
    from ..operators.sync import global_row_number

    cust = orders.groupBy(F.col("o_custkey").alias("customer_key")).agg(
        money(F.sum(dec(F.col("o_totalprice")))).alias("revenue")
    )
    # Deterministic total order: revenue desc, then key. The negated
    # revenue is a sort helper (exact double negation).
    keyed = cust.withColumn("__neg_rev", -F.col("revenue"))
    n = keyed.count()
    ranked = global_row_number(
        keyed, ["__neg_rev", "customer_key"], row_col="__rn"
    ).drop("__neg_rev")
    decile = (
        F.floor((F.col("__rn") - 1) * 10 / F.lit(n)).cast("int") + 1
    ).alias("decile")
    per_cust = ranked.select("customer_key", "revenue", decile)
    totals = per_cust.agg(
        F.sum(dec(F.col("revenue"))).alias("__grand")
    )
    return (
        per_cust.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            money(F.sum(dec(F.col("revenue")))).alias("revenue_total"),
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "decile",
            "n_customers",
            "revenue_total",
            F.round(
                F.col("revenue_total")
                / F.col("__grand").cast("double"),
                6,
            ).alias("revenue_share"),
        )
    )


def reporting_lag_analysis(
    lineitem: DataFrame, orders: DataFrame, due_days: int = 30
) -> DataFrame:
    """Reporting-lag profile per reporting date — the dashboard's
    date-timing analysis (ref: dashboard/main.py:1846
    ``analyze_date_differences``: per REPORTING_DATE, lag between the
    last recognized time entry and the reporting date, with record/hour/
    client/user rollups; DATE_TIMING_ANALYSIS_REPORT.md).

    Mapping: a work item reports at its due date (order date +
    ``due_days`` — the flagship's schedule rule); each (order,
    contributor) pair's last time entry is its max ship date. Lag =
    days from last entry to the reporting date — how stale recognized
    work is when reported.

    Scale: one partial aggregation at the (order, contributor) grain,
    one broadcast-or-shuffle join to orders on the order key, then a
    date-grain rollup. The two exact distinct counts are on DIFFERENT
    keys, which in a single aggregate would ride Spark's Expand rewrite
    (3× row amplification of the pair grain through the shuffle — the
    SURVEY §4 "multi-distinct avoids Expand" rule). Instead the pair
    table is persisted once (swap_cache) and the rollup is two
    single-distinct aggregates joined on the date key: a single distinct
    plans as plain two-phase hash aggregation — no Expand node, which
    tests/test_plans.py asserts. Averages derive from exact integer
    sums, divided once and rounded 6.
    """
    from ..operators._cache import swap_cache

    per = (
        lineitem.filter(F.col("l_returnflag") == "N")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max("l_shipdate").alias("__last_entry"),
            F.sum(dec(F.col("l_quantity"))).alias("__hours_dec"),
            F.count(F.lit(1)).alias("__records"),
        )
    )
    due = F.timestamp_add("DAY", F.lit(due_days), F.col("o_orderdate"))
    lag = F.datediff(F.col("__due"), F.col("__last_entry"))
    # Persisted: the date-grain rollup and the contributor-distinct
    # aggregate both consume this pair-grain table, and Spark does not
    # reuse the aggregation exchange across consumers (module-wide
    # 0-ReusedExchange finding). Pair grain ≪ lineitem grain, so the
    # cache is small at any scale.
    joined = swap_cache(
        "dashboard.reporting_pairs",
        per.join(
            orders.select("o_orderkey", due.alias("__due")),
            per.l_orderkey == F.col("o_orderkey"),
        ).select(
            "l_orderkey", "l_suppkey", "__due", "__records", "__hours_dec",
            lag.alias("__lag"),
        ),
    )
    main = joined.groupBy(F.col("__due").alias("reporting_date")).agg(
        F.count(F.lit(1)).alias("pair_count"),
        F.sum("__records").alias("total_records"),
        money(F.sum("__hours_dec")).alias("total_hours"),
        F.round(
            F.sum("__lag").cast("double") / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("avg_reporting_lag_days"),
        F.max("__lag").cast("long").alias("max_reporting_lag_days"),
        F.countDistinct("l_orderkey").alias("unique_orders"),
    )
    contributors = joined.groupBy(F.col("__due").alias("reporting_date")).agg(
        F.countDistinct("l_suppkey").alias("unique_contributors")
    )
    # Null-safe date key: both aggregates derive from the same pair grain,
    # so every __due group — including a null order-date group, which a
    # plain equi-join would silently drop while the single-aggregate
    # oracle keeps it — exists on both sides and must rejoin. eqNullSafe
    # makes the two-partial split exactly equivalent to one aggregate for
    # ANY input, not just the non-null TPC-H dates.
    # broadcast (r15, guide §3.1): the contributors side is DATE-grain —
    # one row per distinct reporting date, bounded by the calendar, not
    # by data volume — but it hides behind an aggregate of a cached
    # table, so the planner's estimate balloons and it picked a
    # SortMergeJoin (plan: 2 extra Exchange + 2 Sort on a ~2.4k-row
    # join at sf0.1, and a full shuffle of both rollups at any scale).
    return main.join(
        F.broadcast(contributors),
        main["reporting_date"].eqNullSafe(contributors["reporting_date"]),
    ).select(
        main["reporting_date"],
        "pair_count",
        "total_records",
        "total_hours",
        "avg_reporting_lag_days",
        "max_reporting_lag_days",
        "unique_orders",
        "unique_contributors",
    )
