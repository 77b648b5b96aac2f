"""Classic analytical benchmarks (TPC-H Q1/Q3/Q5 adapted to the test
schema) — the throughput headliners for bench.py.

These exercise the heavy physical paths the sync/views also rely on:
full-scan aggregation with decimal sums (Q1), selective multi-join +
top-k (Q3), and a six-table join rollup with broadcast dimensions (Q5).

Scale: Q1 is a single partial-agg scan (no join). Q3/Q5 broadcast every
dimension side; only lineitem⋈orders shuffles, on the join key. Filters
sit directly on the scans so parquet pushdown prunes row groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import (
    DEC,
    MICROS,
    dec,
    money,
    money_from_micros_sum,
    net_price,
)

Q1_CUTOFF = "2001-08-06"
Q3_DATE = "1998-03-15"
Q3_SEGMENT = "BUILDING"
Q5_REGION = "ASIA"
Q5_START, Q5_END = "1996-01-01", "1997-01-01"


def q1_pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1: pricing summary report.

    The five exact sums run as the salted two-phase long-micros pattern
    (plans/budget.py): phase 1 partial-sums primitive longs per
    (group, salt) — the hash-agg buffer is a long, not a decimal —
    and phase 2 re-sums the ≤ |groups|×1024 partials in decimal(38,0),
    so the total is exact at ANY scale (a single long could overflow:
    Q1's group count is O(1), so per-group sums grow with the corpus —
    the coarse-grain regime of functions.money_micros' audit note).
    Per-(group, salt) phase-1 sums stay under long range up to ~10^5×
    this corpus; the decimal re-agg removes the ceiling entirely.
    Values are bit-identical to the single-phase decimal sums (micros
    are exact: every input fixes at ≤ 6dp via the DEC cast before
    scaling — that per-row DEC fix is the hash contract with the
    oracle's CAST(double AS DECIMAL(18,6)) and cannot be skipped).

    Measured attribution (r11, construct-vs-exec + component timings):
    scan+filter 0.22s, count-only agg 0.20s, full Q1 1.43s — the
    dominant cost is the five per-row double→decimal fixings, which
    the hash contract mandates on any plan. The two-phase rewrite is
    ~25% faster when scan splits are coarse (few partitions → the
    decimal aggregation buffer binds) and bench-neutral at the tuned
    1 MB splits; its standing value is the overflow-free coarse-grain
    posture."""
    li = lineitem.filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp"))
    net = net_price(F.col("l_extendedprice"), F.col("l_discount"))
    # charge in double per-row then exact-decimal cast: a 3-way decimal
    # product would overflow precision 38 with engine-specific rounding.
    charge = (
        F.col("l_extendedprice")
        * (F.lit(1.0) - F.col("l_discount"))
        * (F.lit(1.0) + F.col("l_tax"))
    ).cast(DEC)
    mic = lambda c: (c * MICROS).cast("long")  # noqa: E731  (exact: c is DEC)
    salt = F.pmod(F.xxhash64(F.col("l_orderkey")), F.lit(1024))
    p1 = li.groupBy(
        "l_returnflag", "l_linestatus", salt.alias("__salt")
    ).agg(
        F.sum(mic(dec(F.col("l_quantity")))).alias("__qty_m"),
        F.sum(mic(dec(F.col("l_extendedprice")))).alias("__base_m"),
        F.sum(mic(net)).alias("__net_m"),
        F.sum(mic(charge)).alias("__charge_m"),
        F.sum(mic(dec(F.col("l_discount")))).alias("__disc_m"),
        F.count(F.lit(1)).alias("__n"),
    )
    d38 = lambda c: F.sum(F.col(c).cast("decimal(38,0)"))  # noqa: E731
    cnt = F.sum("__n")
    qty_sum = d38("__qty_m") / MICROS
    base_sum = d38("__base_m") / MICROS
    disc_sum = d38("__disc_m") / MICROS
    # qty columns divide in DOUBLE (the oracle's SUM(double)/COUNT shape;
    # the exact decimal sum casts losslessly — quantities are integers)
    return p1.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(qty_sum.cast("double"), 2).alias("sum_qty"),
        money_from_micros_sum(d38("__base_m")).alias("sum_base_price"),
        money_from_micros_sum(d38("__net_m")).alias("sum_disc_price"),
        money_from_micros_sum(d38("__charge_m")).alias("sum_charge"),
        F.round(qty_sum.cast("double") / cnt, 4).alias("avg_qty"),
        F.round(base_sum.cast("double") / cnt, 4).alias("avg_price"),
        F.round(disc_sum.cast("double") / cnt, 4).alias("avg_disc"),
        cnt.alias("count_order"),
    )


def q3_shipping_priority(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """TPC-H Q3 (adapted): top-10 open orders by outstanding revenue."""
    cut = F.lit(Q3_DATE).cast("timestamp")
    cust = customer.filter(F.col("c_mktsegment") == Q3_SEGMENT).select("c_custkey")
    ords = orders.filter(F.col("o_orderdate") < cut).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = lineitem.filter(F.col("l_shipdate") > cut).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    net = net_price(F.col("l_extendedprice"), F.col("l_discount"))
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money(F.sum(net)).alias("revenue"))
        .select(
            F.col("l_orderkey").alias("order_key"),
            "revenue",
            F.col("o_orderdate").alias("order_date"),
            F.col("o_orderpriority").alias("order_priority"),
        )
        .orderBy(F.col("revenue").desc(), F.col("order_key"))
        .limit(10)
    )


def q5_supplier_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """TPC-H Q5 (adapted): revenue by nation for one region/year, where
    the supplier and customer share the nation."""
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(Q5_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q5_END).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    nations_in_region = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == Q5_REGION)),
            nation.n_regionkey == region.r_regionkey,
        )
        .select("n_nationkey", "n_name")
    )
    net = net_price(F.col("l_extendedprice"), F.col("l_discount"))
    # customer/supplier grow with scale factor in real TPC-H — no broadcast
    # hint (never hint a growing table); size estimates/AQE broadcast them
    # while they fit and fall back to shuffle joins beyond the threshold.
    # Only region-filtered nations (true dimension) keep the hint.
    return (
        lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(ords, F.col("l_orderkey") == ords.o_orderkey)
        .join(customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier.select("s_suppkey", "s_nationkey"),
              (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(nations_in_region),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(money(F.sum(net)).alias("revenue"))
        .select(F.col("n_name").alias("nation_name"), "revenue")
    )


Q6_START, Q6_END = "1996-01-01", "1997-01-01"
Q18_QTY_THRESHOLD = 150


def q6_forecast_revenue(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q6: potential revenue increase — pure filter+agg, the
    pushdown/pruning showcase (scan reads 4 columns, all filters pushed)."""
    rev = (
        F.col("l_extendedprice") * F.col("l_discount")
    ).cast(DEC)
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(Q6_START).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q6_END).cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.09)
            & (F.col("l_quantity") < 24)
        )
        .agg(money(F.sum(rev)).alias("revenue"), F.count(F.lit(1)).alias("line_count"))
    )


def q18_large_orders(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """TPC-H Q18 (adapted): largest-volume orders — a HAVING on a fact
    aggregate joined back to dimensions, top-100."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > Q18_QTY_THRESHOLD)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(customer.select("c_custkey", "c_name")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .select(
            F.col("c_name").alias("customer_name"),
            F.col("c_custkey").alias("customer_key"),
            F.col("o_orderkey").alias("order_key"),
            F.col("o_orderdate").alias("order_date"),
            money(F.col("o_totalprice")).alias("order_total"),
            "total_qty",
        )
        .orderBy(F.col("total_qty").desc(), F.col("order_key"))
        .limit(100)
    )


Q4_START, Q4_END = "1997-07-01", "1997-10-01"
Q10_START, Q10_END = "1997-10-01", "1998-01-01"


def q4_order_priority(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4 (adapted): order counts per priority where at least one
    line was returned — a LEFT SEMI join (no row multiplication)."""
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(Q4_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q4_END).cast("timestamp"))
    )
    flagged = lineitem.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        ords.join(flagged, ords.o_orderkey == flagged.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q10_returned_items(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """TPC-H Q10 (adapted): top-20 customers by lost revenue on returns."""
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(Q10_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q10_END).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    net = net_price(F.col("l_extendedprice"), F.col("l_discount"))
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(
            F.broadcast(customer.select("c_custkey", "c_name", "c_acctbal", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(money(F.sum(net)).alias("revenue"))
        .select(
            F.col("c_custkey").alias("customer_key"),
            F.col("c_name").alias("customer_name"),
            F.col("c_acctbal").alias("customer_acctbal"),
            F.col("n_name").alias("nation_name"),
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("customer_key"))
        .limit(20)
    )


def q14_promo_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14 (adapted): promo revenue share for one month."""
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    net = net_price(F.col("l_extendedprice"), F.col("l_discount"))
    joined = li.join(
        F.broadcast(part.select("p_partkey", "p_type")),
        li.l_partkey == F.col("p_partkey"),
    )
    agg = joined.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", net)).alias("__promo_dec"),
        F.sum(net).alias("__total_dec"),
    )
    promo = F.coalesce(F.col("__promo_dec").cast("double"), F.lit(0.0))
    total = F.col("__total_dec").cast("double")
    return agg.select(
        money(F.coalesce(F.col("__promo_dec"), F.lit(0).cast(DEC))).alias(
            "promo_revenue"
        ),
        money(F.col("__total_dec")).alias("total_revenue"),
        F.when(total > 0, F.round(promo / total * 100, 4)).alias("promo_pct"),
    )


Q7_NATION_A, Q7_NATION_B = "NATION_1", "NATION_2"
Q7_START, Q7_END = "1996-01-01", "1998-01-01"


def q7_nation_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """TPC-H Q7 (adapted): shipped volume between two nations by year and
    direction (supplier nation → customer nation)."""
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    net = net_price(F.col("l_extendedprice"), F.col("l_discount"))
    joined = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(Q7_START).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q7_END).cast("timestamp"))
        )
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                F.year("l_shipdate").alias("ship_year"))
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            (
                (F.col("supp_nation") == Q7_NATION_A)
                & (F.col("cust_nation") == Q7_NATION_B)
            )
            | (
                (F.col("supp_nation") == Q7_NATION_B)
                & (F.col("cust_nation") == Q7_NATION_A)
            )
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.col("ship_year").cast("long").alias("ship_year")
    ).agg(money(F.sum(net)).alias("revenue"), F.count(F.lit(1)).alias("line_count"))


def q19_bracket_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 (adapted): disjunctive brand/size/quantity brackets — the
    OR-of-ANDs predicate shape that stresses predicate simplification."""
    net = net_price(F.col("l_extendedprice"), F.col("l_discount"))
    joined = lineitem.select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    ).join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 10))
            & (F.col("l_quantity").between(1, 20))
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size").between(5, 20))
            & (F.col("l_quantity").between(10, 30))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(10, 40))
            & (F.col("l_quantity").between(20, 50))
        )
    )
    return joined.filter(cond).agg(
        money(F.sum(net)).alias("revenue"), F.count(F.lit(1)).alias("line_count")
    )


Q12_START, Q12_END = "1997-01-01", "1998-01-01"
Q15_START, Q15_END = "1997-01-01", "1997-04-01"


def q12_priority_shipping(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q12 (adapted): per return-flag class, how many high- vs
    low-priority orders shipped — the conditional-count CASE aggregation."""
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(Q12_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q12_END).cast("timestamp"))
    ).select("l_orderkey", "l_returnflag")
    joined = li.join(
        orders.select("o_orderkey", "o_orderpriority"),
        li.l_orderkey == F.col("o_orderkey"),
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return joined.groupBy("l_returnflag").agg(
        F.count(F.when(high, F.lit(1))).alias("high_priority_count"),
        F.count(F.when(~high, F.lit(1))).alias("low_priority_count"),
    )


def q15_top_supplier(lineitem: DataFrame, supplier: DataFrame) -> DataFrame:
    """TPC-H Q15 (adapted): supplier(s) with maximum revenue in a quarter —
    an aggregate joined against its own maximum (the view + subquery
    pattern), expressed with one extra 1-row broadcast instead of a
    correlated subquery."""
    net = net_price(F.col("l_extendedprice"), F.col("l_discount"))
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(Q15_START).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q15_END).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(money(F.sum(net)).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("__max_rev"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__max_rev"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            rev.l_suppkey == F.col("s_suppkey"),
        )
        .select(
            F.col("l_suppkey").alias("supplier_key"),
            F.col("s_name").alias("supplier_name"),
            "total_revenue",
        )
    )


def q13_order_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count (including
    zero-order customers) — the left-join + double-aggregation shape."""
    per_cust = (
        customer.select("c_custkey")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            customer.c_custkey == orders.o_custkey,
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count(F.col("o_orderkey")).alias("order_count"))
    )
    return per_cust.groupBy("order_count").agg(
        F.count(F.lit(1)).alias("customer_count")
    )


Q22_IDLE_SINCE = "2000-01-01"


def q22_idle_accounts(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q22 (adapted): above-average-balance customers with no orders
    since ``Q22_IDLE_SINCE`` (dormant accounts), grouped by nation —
    anti-join against a scalar-average filter. (The classic "no orders
    ever" form is degenerate on this dataset: every customer orders.)"""
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(dec(F.col("c_acctbal"))).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("__avg_bal")
    )
    rich = (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit(Q22_IDLE_SINCE).cast("timestamp")
    ).select("o_custkey")
    idle = rich.join(
        recent,
        rich.c_custkey == F.col("o_custkey"),
        "left_anti",
    )
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("customer_count"),
        money(F.sum(dec(F.col("c_acctbal")))).alias("total_acctbal"),
    )


Q8_REGION = "ASIA"
Q8_TYPE = "ECONOMY"
Q8_NATION = "NATION_2"
Q8_START, Q8_END = "1996-01-01", "1998-01-01"


def q8_market_share(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """TPC-H Q8 (adapted): one nation's market share of a part type sold
    into one region, by order year.

    Share is the conditional/total ratio of the SAME decimal aggregate —
    one scan, one shuffle (lineitem⋈orders), every dimension broadcast.
    The ratio divides the already-rounded money doubles so both engines
    see identical IEEE inputs.
    """
    pts = part.filter(F.col("p_type") == Q8_TYPE).select("p_partkey")
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(Q8_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q8_END).cast("timestamp"))
    ).select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("order_year"))
    region_nations = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == Q8_REGION)),
            nation.n_regionkey == region.r_regionkey,
        )
        .select(F.col("n_nationkey").alias("cust_nk"))
    )
    supp_nations = supplier.join(
        F.broadcast(
            nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))
        ),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    net = net_price(F.col("l_extendedprice"), F.col("l_discount"))
    vol = (
        lineitem.select(
            "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
        )
        .join(F.broadcast(pts), F.col("l_partkey") == F.col("p_partkey"))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(region_nations), F.col("c_nationkey") == F.col("cust_nk"))
        .join(F.broadcast(supp_nations), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    agg = vol.groupBy(F.col("order_year").cast("long").alias("order_year")).agg(
        money(
            F.coalesce(
                F.sum(F.when(F.col("supp_nation") == Q8_NATION, net)),
                F.lit(0).cast(DEC),
            )
        ).alias("nation_revenue"),
        money(F.sum(net)).alias("total_revenue"),
    )
    return agg.select(
        "order_year",
        "nation_revenue",
        "total_revenue",
        F.round(F.col("nation_revenue") / F.col("total_revenue"), 6).alias(
            "mkt_share"
        ),
    )


Q9_PART_TOKEN = "widget"
Q9_COST_FACTOR = 0.5


def q9_product_profit(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """TPC-H Q9 (adapted): profit on a part-name family by supplier nation
    and order year. The testdata has no partsupp/ps_supplycost, so cost is
    proxied as ``p_retailprice * Q9_COST_FACTOR * l_quantity`` — same join
    topology and aggregation grain as the original.

    Profit is a per-row double expression cast to exact decimal before the
    sum (add-order-independent), mirroring Q1's charge column.
    """
    pts = part.filter(F.col("p_name").contains(Q9_PART_TOKEN)).select(
        "p_partkey", "p_retailprice"
    )
    supp_nations = supplier.join(
        F.broadcast(
            nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))
        ),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    amount = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.col("p_retailprice") * F.lit(Q9_COST_FACTOR) * F.col("l_quantity")
    ).cast(DEC)
    return (
        lineitem.select(
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        )
        .join(F.broadcast(pts), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            orders.select("o_orderkey", F.year("o_orderdate").alias("order_year")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(supp_nations), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("supp_nation", F.col("order_year").cast("long").alias("order_year"))
        .agg(
            money(F.sum(amount)).alias("profit"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


Q2_REGION = "EUROPE"
Q2_TYPE = "STANDARD"
Q2_MAX_SIZE = 10


def q2_min_cost_supplier(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """TPC-H Q2 (adapted): cheapest regional supplier per part.

    The testdata has no partsupp, so supply cost is the supplier's minimum
    observed unit price (``l_extendedprice / l_quantity``) from lineitem.
    The correlated MIN subquery of the original becomes two aggregations
    over the same child (Catalyst reuses the exchange) joined on
    (part, cost=best) — the standard decorrelation Spark's optimizer
    applies to IN/scalar subqueries anyway, written explicitly.

    Unit price is a per-row double division rounded to 6dp (deterministic,
    no add-order dependence); MIN commutes, so no decimal pass is needed.
    """
    region_suppliers = (
        supplier.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == Q2_REGION)),
                    nation.n_regionkey == region.r_regionkey,
                ).select("n_nationkey", F.col("n_name").alias("supp_nation"))
            ),
            supplier.s_nationkey == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "supp_nation", "s_acctbal")
    )
    unit = F.round(F.col("l_extendedprice") / F.col("l_quantity"), 6)
    ps = (
        lineitem.select("l_partkey", "l_suppkey", unit.alias("__unit"))
        .join(F.broadcast(region_suppliers), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("__unit").alias("supply_cost"))
    )
    best = ps.groupBy("l_partkey").agg(F.min("supply_cost").alias("__best"))
    best = best.select(F.col("l_partkey").alias("__pk"), "__best")
    wanted_parts = part.filter(
        (F.col("p_type") == Q2_TYPE) & (F.col("p_size") <= Q2_MAX_SIZE)
    ).select("p_partkey", "p_name")
    return (
        ps.join(
            best,
            (F.col("l_partkey") == F.col("__pk"))
            & (F.col("supply_cost") == F.col("__best")),
        )
        .join(F.broadcast(wanted_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(region_suppliers), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .select(
            F.col("p_partkey").alias("part_key"),
            F.col("p_name").alias("part_name"),
            F.col("s_name").alias("supplier_name"),
            "supp_nation",
            F.col("s_acctbal").alias("supplier_acctbal"),
            "supply_cost",
        )
    )


Q11_NATION = "NATION_7"
Q11_FRACTION = 0.001


def q11_important_parts(
    supplier: DataFrame, lineitem: DataFrame, nation: DataFrame
) -> DataFrame:
    """TPC-H Q11 (adapted): parts representing a significant share of one
    nation's traded value (lineitem net price stands in for
    ps_supplycost * ps_availqty).

    Part value and grand total come from the same decimal aggregate (one
    rounded per part, one rounded once overall) so the share comparison
    sees identical doubles on both engines; the total is a 1-row broadcast.
    """
    nation_suppliers = supplier.join(
        F.broadcast(
            nation.filter(F.col("n_name") == Q11_NATION).select("n_nationkey")
        ),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey")
    net = net_price(F.col("l_extendedprice"), F.col("l_discount"))
    traded = lineitem.select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    ).join(F.broadcast(nation_suppliers), F.col("l_suppkey") == F.col("s_suppkey"))
    per_part = traded.groupBy("l_partkey").agg(money(F.sum(net)).alias("part_value"))
    total = traded.agg(money(F.sum(net)).alias("__total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("__total") * F.lit(Q11_FRACTION))
        .select(F.col("l_partkey").alias("part_key"), "part_value")
    )


Q16_EXCLUDE_BRAND = "Brand#1"
Q16_EXCLUDE_TYPE = "PROMO"
Q16_SIZES = (1, 4, 9, 14, 19, 23, 36, 49)


def q16_supplier_part_counts(
    part: DataFrame, supplier: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """TPC-H Q16 (adapted): distinct-supplier counts per (brand, type,
    size) bucket, excluding one brand/type and suppliers in bad standing
    (negative account balance proxies the original's complaint filter;
    lineitem links parts to suppliers in lieu of partsupp)."""
    parts = part.filter(
        (F.col("p_brand") != Q16_EXCLUDE_BRAND)
        & (F.col("p_type") != Q16_EXCLUDE_TYPE)
        & F.col("p_size").isin(*Q16_SIZES)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    links = (
        lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
    )
    return (
        links.groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .select(
            "p_brand",
            "p_type",
            F.col("p_size").cast("long").alias("p_size"),
            "supplier_cnt",
        )
    )


Q17_BRAND = "Brand#3"
Q17_TYPE = "SMALL"


def q17_small_quantity_revenue(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q17 (adapted): average yearly revenue lost if small-quantity
    orders (below 20% of the part's average quantity) were not taken.
    p_type stands in for the original's p_container.

    The per-part average is the classic self-aggregate: both passes hang
    off the same part-filtered join, so the exchange is reused; the
    average divides an exact decimal sum by the count before the 0.2
    scale, keeping both engines bit-identical.
    """
    parts = part.filter(
        (F.col("p_brand") == Q17_BRAND) & (F.col("p_type") == Q17_TYPE)
    ).select("p_partkey")
    li = lineitem.select("l_partkey", "l_quantity", "l_extendedprice").join(
        F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey")
    )
    limits = li.groupBy("l_partkey").agg(
        (
            F.sum(dec(F.col("l_quantity"))).cast("double")
            / F.count(F.lit(1)).cast("double")
            * F.lit(0.2)
        ).alias("__qty_limit")
    )
    small = li.join(limits, "l_partkey").filter(
        F.col("l_quantity") < F.col("__qty_limit")
    )
    agg = small.agg(
        F.sum(dec(F.col("l_extendedprice"))).alias("__rev"),
        F.count(F.lit(1)).alias("line_count"),
    )
    return agg.select(
        F.round(
            F.coalesce(F.col("__rev").cast("double"), F.lit(0.0)) / F.lit(7.0), 2
        ).alias("avg_yearly"),
        "line_count",
    )


Q20_TOKEN = "red"
Q20_SHARE = 0.3
Q20_START, Q20_END = "1997-01-01", "1998-01-01"


def q20_dominant_suppliers(
    part: DataFrame, supplier: DataFrame, lineitem: DataFrame, nation: DataFrame
) -> DataFrame:
    """TPC-H Q20 (adapted): suppliers who shipped more than ``Q20_SHARE``
    of some matching part's total quantity in a year — the nested
    semi-join of the original expressed as two decimal aggregates over
    the same filtered child joined on part, then a distinct supplier
    projection with dimensions broadcast."""
    parts = part.filter(F.col("p_name").contains(Q20_TOKEN)).select("p_partkey")
    li = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(Q20_START).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q20_END).cast("timestamp"))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
    )
    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.sum(dec(F.col("l_quantity"))), 2).cast("double").alias("__supp_qty")
    )
    per_p = li.groupBy("l_partkey").agg(
        F.round(F.sum(dec(F.col("l_quantity"))), 2).cast("double").alias("__part_qty")
    )
    dominant = (
        per_ps.join(per_p.withColumnRenamed("l_partkey", "__pk"),
                    per_ps.l_partkey == F.col("__pk"))
        .filter(F.col("__supp_qty") > F.col("__part_qty") * F.lit(Q20_SHARE))
        .select("l_suppkey")
        .distinct()
    )
    return dominant.join(
        F.broadcast(
            supplier.join(
                F.broadcast(
                    nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))
                ),
                supplier.s_nationkey == F.col("n_nationkey"),
            ).select("s_suppkey", "s_name", "supp_nation")
        ),
        F.col("l_suppkey") == F.col("s_suppkey"),
    ).select(
        F.col("s_suppkey").alias("supplier_key"),
        F.col("s_name").alias("supplier_name"),
        "supp_nation",
    )


Q21_LATE_DAYS = 90


def q21_waiting_suppliers(
    supplier: DataFrame, lineitem: DataFrame, orders: DataFrame, nation: DataFrame
) -> DataFrame:
    """TPC-H Q21 (adapted): suppliers who were the SOLE late shipper on a
    finished multi-supplier order. The testdata lacks commit/receipt
    dates, so "late" is shipping more than ``Q21_LATE_DAYS`` days after
    the order date.

    The original's EXISTS / NOT EXISTS pair over lineitem collapses into
    one per-order aggregate (distinct suppliers, distinct late suppliers)
    joined back to the late (order, supplier) pairs — two shuffles on
    l_orderkey total, no correlated re-scans.
    """
    li = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate").join(
        orders.filter(F.col("o_orderstatus") == "F").select(
            "o_orderkey", "o_orderdate"
        ),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    late = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > Q21_LATE_DAYS
    # One (order, supplier) reduction feeds everything: the two DISTINCT
    # aggregates become plain conditional counts over it (no Expand
    # doubling the input), and the late-pair set IS its filtered rows —
    # the reduction's exchange is reused for both consumers.
    pair_stats = (
        li.select("l_orderkey", "l_suppkey", late.alias("__late"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg((F.max(F.col("__late").cast("int")) == 1).alias("__was_late"))
    )
    order_stats = pair_stats.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("__n_supp"),
        F.count(F.when(F.col("__was_late"), F.lit(1))).alias("__n_late"),
    )
    sole_late = (
        pair_stats.filter(F.col("__was_late"))
        .select("l_orderkey", "l_suppkey")
        .join(order_stats, "l_orderkey")
        .filter((F.col("__n_supp") > 1) & (F.col("__n_late") == 1))
    )
    return (
        sole_late.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            F.col("s_suppkey").alias("supplier_key"),
            F.col("s_name").alias("supplier_name"),
            "numwait",
        )
    )
