"""SURVEY §2-D — classic analytics (TPC-H q1-q22) and bloom-filtered scans.

Split from the monolithic registry.py (r9); every query body is
unchanged — registration still flows through registry._core.query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from ..catalog import load_table
from ..plans import tpch
from ._core import query
from .section_b_analytics import _NET


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
    from ..operators import bloom as bloom_op

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
    from ..functions import DEC

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
