"""Relational operator surface (SURVEY.md §2 ⊕ operators).

Covers: equi/semi/anti/outer joins with broadcast hints (J5/J7), grouped
aggregation incl. rollup/cube/count-distinct (A4/A11), Pareto-frontier
reduction (A9, `knob_tuner.py:214-237` reshaped as a dominance anti-join),
arg-best selection (A10, `knob_tuner.py:252-261`), ranking windows (W4,
`knob_switcher.py:35-51`), running windows (W7), dedup (O5), set ops (O8),
global and per-group top-k (O9), and the scalar string/date function families
(§2.7).

Every query is declarative DataFrame API: Catalyst handles pushdown, pruning,
join ordering; AQE picks broadcast vs sort-merge at runtime.  Explicit
``broadcast()`` hints are reserved for genuinely bounded tables (region,
nation, one-row aggregates): a hint *forces* the plan with no AQE fallback,
so hinting tables that grow with scale factor (customer, supplier, per-doc
stats) would OOM at the 100 TB target.  For those, AQE's runtime
size-based choice already picks BHJ whenever the side actually fits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from video_etl_spark.functions.parity import (
    money_avg,
    money_avg_sql,
    money_sum,
    money_sum_sql,
)
from video_etl_spark.registry import query
from video_etl_spark.session import load_table


# --------------------------------------------------------------------------
# A4/A11 — grouped aggregation with partial (map-side) aggregation.
@query(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {money_sum_sql('l_quantity')} AS sum_qty,
           {money_sum_sql('l_extendedprice')} AS sum_base_price,
           {money_sum_sql('l_extendedprice * (1 - l_discount)', 10000)} AS sum_disc_price,
           {money_sum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 1000000)} AS sum_charge,
           {money_avg_sql('l_quantity')} AS avg_qty,
           {money_avg_sql('l_extendedprice')} AS avg_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped scan→filter→agg; exercises pushdown + partial agg."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity").alias("sum_qty"),
            money_sum("l_extendedprice").alias("sum_base_price"),
            money_sum(disc_price, 10000).alias("sum_disc_price"),
            money_sum(charge, 1000000).alias("sum_charge"),
            money_avg("l_quantity").alias("avg_qty"),
            money_avg("l_extendedprice").alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# J7 + O9 — fact⋈fact⋈dim join with broadcast dim, agg, global top-k.
@query(
    "top_revenue_orders",
    oracle=f"""
    SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
           {money_sum_sql('l.l_extendedprice * (1 - l.l_discount)', 10000)} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# J7 — five-way star join (Q5-shaped); dims broadcast, facts shuffle on keys.
@query(
    "regional_revenue",
    oracle=f"""
    SELECT n.n_name,
           {money_sum_sql('l.l_extendedprice * (1 - l.l_discount)', 10000)} AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (supp.s_suppkey == li.l_suppkey) & (supp.s_nationkey == cust.c_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
            ).alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# J7 — left-semi join (EXISTS).
@query(
    "orders_with_heavy_items",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
    """,
)
def orders_with_heavy_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    heavy = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return orders.join(
        heavy, orders.o_orderkey == heavy.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_totalprice")


# --------------------------------------------------------------------------
# J7 — left-anti join (NOT EXISTS).
@query(
    "customers_without_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# --------------------------------------------------------------------------
# J7 + A11 — left-outer join keeping empty groups.
@query(
    "customer_order_stats",
    oracle=f"""
    SELECT c.c_custkey,
           count(o.o_orderkey) AS n_orders,
           COALESCE({money_sum_sql('o.o_totalprice')}, CAST(0 AS DOUBLE)) AS total_spent
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(money_sum("o_totalprice"), F.lit(0.0)).alias("total_spent"),
        )
    )


# --------------------------------------------------------------------------
# O9 — global top-k with deterministic tiebreak.
@query(
    "top_orders_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15
    """,
)
def top_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(15)
    )


# --------------------------------------------------------------------------
# O9/W7 — per-group top-k via ranking window (TakeOrderedAndProject per key).
@query(
    "top_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 3
    """,
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# --------------------------------------------------------------------------
# W4/W7 — ranking windows (mirrors the switcher's per-category priority list,
# knob_switcher.py:35-51: sort configs by quality desc within category).
@query(
    "supplier_rank_in_nation",
    oracle="""
    SELECT n.n_name, s.s_suppkey, s.s_acctbal,
           CAST(rank() OVER (PARTITION BY s.s_nationkey
                             ORDER BY s.s_acctbal DESC, s.s_suppkey) AS BIGINT) AS bal_rank,
           CAST(dense_rank() OVER (PARTITION BY s.s_nationkey
                                   ORDER BY s.s_acctbal DESC, s.s_suppkey) AS BIGINT) AS bal_dense_rank
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    """,
)
def supplier_rank_in_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), "s_suppkey")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            "s_suppkey",
            "s_acctbal",
            F.rank().over(w).cast("long").alias("bal_rank"),
            F.dense_rank().over(w).cast("long").alias("bal_dense_rank"),
        )
    )


# --------------------------------------------------------------------------
# W7 — running aggregate + lag (A4's running score sums, simulate.py:29-41,
# as an ordered window instead of a driver loop).
@query(
    "running_customer_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                     OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                / 100 AS DOUBLE) AS running_spend,
           lag(o_totalprice) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS prev_price
    FROM orders
    """,
)
def running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(cents).over(w.rowsBetween(Window.unboundedPreceding, 0)) / 100
        ).cast("double").alias("running_spend"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
    )


# --------------------------------------------------------------------------
# A11 — ROLLUP hierarchy totals.
@query(
    "rollup_revenue",
    oracle=f"""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           {money_sum_sql('l_extendedprice', 100)} AS sum_price,
           count(*) AS n_items
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_extendedprice").alias("sum_price"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_price",
            "n_items",
        )
    )


# --------------------------------------------------------------------------
# A11 — CUBE over two dimensions.
@query(
    "cube_order_counts",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
           COALESCE(o_orderpriority, 'ALL') AS orderpriority,
           count(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n_orders",
        )
    )


# --------------------------------------------------------------------------
# A11 — exact count-distinct (single and composite key).
@query(
    "count_distinct_lineitem",
    oracle="""
    SELECT count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(DISTINCT CAST(l_partkey AS VARCHAR) || '_' || CAST(l_suppkey AS VARCHAR)) AS n_part_supp
    FROM lineitem
    """,
)
def count_distinct_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct(
            F.concat_ws("_", F.col("l_partkey").cast("string"), F.col("l_suppkey").cast("string"))
        ).alias("n_part_supp"),
    )


# --------------------------------------------------------------------------
# O8 — set operations (EXCEPT / INTERSECT / UNION semantics).
@query(
    "set_ops_users",
    oracle="""
    SELECT 'events_only' AS tag, user_id AS id FROM
      (SELECT DISTINCT user_id FROM events
       EXCEPT
       SELECT DISTINCT o_custkey FROM orders)
    UNION ALL
    SELECT 'both' AS tag, user_id AS id FROM
      (SELECT DISTINCT user_id FROM events
       INTERSECT
       SELECT DISTINCT o_custkey FROM orders)
    """,
)
def set_ops_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(F.col("user_id").alias("id")).distinct()
    oc = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("id")).distinct()
    only = ev.subtract(oc).select(F.lit("events_only").alias("tag"), "id")
    both = ev.intersect(oc).select(F.lit("both").alias("tag"), "id")
    return only.unionByName(both)


# --------------------------------------------------------------------------
# A9 — Pareto-frontier reduction (knob_tuner.py:214-237 dominance filter,
# re-expressed as a self-anti-join on the dominance predicate).
@query(
    "pareto_parts",
    oracle="""
    SELECT p.p_partkey, p.p_size, p.p_retailprice
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_size >= p.p_size AND q.p_retailprice <= p.p_retailprice
        AND (q.p_size > p.p_size OR q.p_retailprice < p.p_retailprice))
    """,
)
def pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").alias("p")
    q = load_table(spark, sf_dir, "part").alias("q")
    dominates = (
        (F.col("q.p_size") >= F.col("p.p_size"))
        & (F.col("q.p_retailprice") <= F.col("p.p_retailprice"))
        & (
            (F.col("q.p_size") > F.col("p.p_size"))
            | (F.col("q.p_retailprice") < F.col("p.p_retailprice"))
        )
    )
    return p.join(q, dominates, "left_anti").select(
        "p_partkey", "p_size", "p_retailprice"
    )


# --------------------------------------------------------------------------
# A10 — arg-best selection: cheapest candidate meeting a constraint
# (knob_tuner.py:252-261 "cheapest config with runtime <= realtime").
@query(
    "argbest_order_per_priority",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice
    FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice, o_orderkey) AS rn
          FROM orders WHERE o_orderstatus = 'F')
    WHERE rn = 1
    """,
)
def argbest_order_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
    )


# --------------------------------------------------------------------------
# §2.7 string family — split / regexp_extract / lpad / concat_ws
# (knob hash-string manipulation, knob_tuner.py:45-99; natural keys,
# object_detection.py:141).
@query(
    "string_functions",
    oracle="""
    SELECT p_partkey,
           CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS BIGINT) AS brand_num,
           split_part(p_type, ' ', 1) AS type_head,
           lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS key_padded,
           CAST(p_brand AS VARCHAR) || '|' || upper(split_part(p_type, ' ', 1)) AS brand_type
    FROM part
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("long").alias("brand_num"),
        F.split("p_type", " ").getItem(0).alias("type_head"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_padded"),
        F.concat(
            F.col("p_brand"),
            F.lit("|"),
            F.upper(F.split("p_type", " ").getItem(0)),
        ).alias("brand_type"),
    )


# --------------------------------------------------------------------------
# §2.7 date/time family — P14's filename-time arithmetic done with real
# timestamp types (knob_plan.py:23-32 re-expressed).
@query(
    "datetime_functions",
    oracle="""
    SELECT date_trunc('month', o_orderdate) AS order_month,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           count(*) AS n_orders,
           min(o_orderdate + INTERVAL 90 DAY) AS first_shipby
    FROM orders
    GROUP BY date_trunc('month', o_orderdate), CAST(year(o_orderdate) AS BIGINT)
    """,
)
def datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.date_trunc("month", "o_orderdate").alias("order_month"),
            F.year("o_orderdate").cast("long").alias("order_year"),
            (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("shipby"),
        )
        .groupBy("order_month", "order_year")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("shipby").alias("first_shipby"),
        )
    )


# --------------------------------------------------------------------------
# A11 — explicit GROUPING SETS (beyond rollup/cube): chosen subtotal combos.
@query(
    "grouping_sets_revenue",
    oracle=f"""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           {money_sum_sql('l_extendedprice')} AS sum_price,
           count(*) AS n_items
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem_gs")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100
                    AS DOUBLE) AS sum_price,
               count(*) AS n_items
        FROM v_lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                (l_returnflag, l_linestatus))
        """
    )


# --------------------------------------------------------------------------
# Skew discipline — salted two-phase aggregation over the 5 hot event_type
# keys; the oracle is the *direct* group-by (results must be identical).
@query(
    "salted_aggregation",
    oracle=f"""
    SELECT event_type,
           {money_sum_sql('value')} AS value_sum,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def salted_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from video_etl_spark.operators.skew import salted_sum

    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    out = salted_sum(ev, "event_type", cents, n_salts=16, out="cents")
    return out.select(
        "event_type",
        (F.col("cents") / 100).cast("double").alias("value_sum"),
        F.col("cents_n").alias("n"),
    )


# --------------------------------------------------------------------------
# J7/A11 — correlated aggregate subquery (TPC-H Q17 shape): revenue of
# lineitems under 20% of their part's average quantity.  Catalyst
# decorrelates this into an aggregate + join.
@query(
    "small_quantity_revenue",
    oracle="""
    SELECT CAST(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
                / 100 / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l
    WHERE l.l_quantity < (
      SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = l.l_partkey)
    """,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # decorrelated form: per-part avg qty (exact integer sums), join back
    per_part = li.groupBy("l_partkey").agg(
        (
            F.sum(F.round(F.col("l_quantity") * 100).cast("long"))
            / (F.count(F.lit(1)) * 100)
        ).alias("avg_qty")
    )
    joined = li.join(per_part, "l_partkey").filter(
        F.col("l_quantity") < 0.2 * F.col("avg_qty")
    )
    return joined.agg(
        (
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")) / 100 / 7.0
        ).cast("double").alias("avg_yearly")
    )


# --------------------------------------------------------------------------
# W7/A7 — correlated scalar comparison: customers above their segment's
# average balance (window-based decorrelation).
@query(
    "above_average_customers",
    oracle="""
    WITH seg AS (
      SELECT c_mktsegment,
             CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
               / (count(*) * 100) AS seg_avg
      FROM customer GROUP BY c_mktsegment)
    SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal, s.seg_avg
    FROM customer c JOIN seg s ON s.c_mktsegment = c.c_mktsegment
    WHERE c.c_acctbal > s.seg_avg
    """,
)
def above_average_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    with_avg = cust.withColumn(
        "seg_avg",
        (F.sum(cents).over(w) / (F.count(F.lit(1)).over(w) * 100)),
    )
    return with_avg.filter(F.col("c_acctbal") > F.col("seg_avg")).select(
        "c_custkey", "c_mktsegment", "c_acctbal", "seg_avg"
    )


# --------------------------------------------------------------------------
# J7 — nation-pair volume shipping (TPC-H Q7 shape): two dim joins on
# different keys of the same fact chain + year bucketing.
@query(
    "volume_shipping",
    oracle=f"""
    SELECT ns.n_name AS supp_nation,
           nc.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           {money_sum_sql('l.l_extendedprice * (1 - l.l_discount)', 10000)} AS volume
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    JOIN nation nc ON nc.n_nationkey = c.c_nationkey
    WHERE ns.n_nationkey <> nc.n_nationkey
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY ns.n_name, nc.n_name, CAST(year(l.l_shipdate) AS BIGINT)
    """,
)
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    ns = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    nc = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(ns), supp.s_nationkey == ns.s_nk)
        .join(F.broadcast(nc), cust.c_nationkey == nc.c_nk)
        .filter(F.col("s_nk") != F.col("c_nk"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
            ).alias("volume")
        )
    )


# --------------------------------------------------------------------------
# J7/A11 — order-priority checking (TPC-H Q4 shape: EXISTS + count).
@query(
    "order_priority_check",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05)
    GROUP BY o_orderpriority
    """,
)
def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.05)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------------------
# J7/A7 — global-relation analysis (TPC-H Q22 shape): substring bucketing,
# filter above the global average, anti-join against recent orders
# ("dormant but wealthy" customers).
@query(
    "dormant_customer_balance",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
               / (count(*) * 100) AS a
      FROM customer WHERE c_acctbal > 0)
    SELECT substr(c.c_name, length(c.c_name), 1) AS name_digit,
           count(*) AS numcust,
           CAST(CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS DOUBLE)
                / 100 AS DOUBLE) AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY substr(c.c_name, length(c.c_name), 1)
    """,
)
def dormant_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg((F.sum(cents) / (F.count(F.lit(1)) * 100)).alias("a"))
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("a")
    )
    dormant = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return dormant.groupBy(
        F.substring(F.col("c_name"), -1, 1).alias("name_digit")
    ).agg(
        F.count(F.lit(1)).alias("numcust"),
        (F.sum(cents) / 100).cast("double").alias("totacctbal"),
    )


# --------------------------------------------------------------------------
# A11 — exact quantiles (median/p90): Spark percentile() and DuckDB
# quantile_cont() both linear-interpolate over sorted values; on integer
# cents inputs the results are bit-identical.
@query(
    "price_quantiles",
    oracle="""
    SELECT l_returnflag,
           CAST(quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5)
                / 100 AS DOUBLE) AS median_price,
           CAST(quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.9)
                / 100 AS DOUBLE) AS p90_price,
           CAST(min(l_extendedprice) AS DOUBLE) AS min_price,
           CAST(max(l_extendedprice) AS DOUBLE) AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return li.groupBy("l_returnflag").agg(
        (F.percentile(cents, F.lit(0.5)) / 100).cast("double").alias("median_price"),
        (F.percentile(cents, F.lit(0.9)) / 100).cast("double").alias("p90_price"),
        F.min("l_extendedprice").cast("double").alias("min_price"),
        F.max("l_extendedprice").cast("double").alias("max_price"),
    )


# ==========================================================================
# Correlated-subquery / scalar-subquery TPC-H shapes (round 2).  The tables
# here are the driver's reduced TPC-H set (no partsupp, no commit/receipt
# dates), so Q2/Q11/Q21 are re-anchored on lineitem as the supply bridge;
# the plan shapes (correlated min, scalar-subquery HAVING, exists/not-exists
# anti-join) are the point, not the exact TPC-H predicate text.


# --------------------------------------------------------------------------
# TPC-H Q14 shape — conditional aggregation ratio over a fact⋈dim join.
# Both sums quantized to BIGINT so the single final division is the only
# float op (cross-engine exact).
@query(
    "promo_revenue_ratio",
    oracle="""
    SELECT CAST(100.0 * sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
                 ELSE 0 END)
           / sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
           AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc_l = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    joined = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    return joined.agg(
        (
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", disc_l).otherwise(0))
            / F.sum(disc_l)
        ).cast("double").alias("promo_revenue_pct")
    )


# --------------------------------------------------------------------------
# TPC-H Q15 shape — scalar MAX subquery: supplier(s) achieving the maximum
# quarterly revenue.  Revenue is kept in integer ten-thousandths until the
# final projection so the max-equality filter is an exact long comparison.
@query(
    "top_supplier_revenue",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS r
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name,
           CAST(CAST(r AS DOUBLE) / 10000 AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE r = (SELECT max(r) FROM rev)
    """,
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000)
            .cast("long")
        ).alias("r")
    )
    # scalar subquery as a broadcast 1-row cross join (always tiny)
    max_r = rev.agg(F.max("r").alias("max_r"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(max_r))
        .filter(F.col("r") == F.col("max_r"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("r").cast("double") / 10000).cast("double").alias("total_revenue"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q18 shape — HAVING-subquery semi-join: orders whose total quantity
# exceeds a threshold, with their customer.  The heavy-orders set is a
# grouped aggregate reused as a join side (no IN-list materialization).
@query(
    "large_order_customers",
    oracle="""
    WITH heavy AS (
      SELECT l_orderkey, sum(CAST(round(l_quantity) AS BIGINT)) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 300)
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(sum_qty AS BIGINT) AS sum_qty
    FROM heavy
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    heavy = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.round("l_quantity").cast("long")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        heavy.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            F.col("sum_qty").cast("long").alias("sum_qty"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q19 shape — disjunctive bracket predicates over a fact⋈dim join.
# Catalyst splits the OR into a common join key plus per-bracket residual
# filters; the common `l_quantity <= 30` and partkey equi-join still push to
# the scans.
@query(
    "bracket_disjunction_revenue",
    oracle="""
    SELECT CAST(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                 AS BIGINT)) AS DOUBLE) / 10000 AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def bracket_disjunction_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(part, F.col("p_partkey") == F.col("l_partkey"))
    bracket = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(bracket).agg(
        money_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --------------------------------------------------------------------------
# TPC-H Q21 shape (adapted: no receipt/commit dates) — exists / not-exists
# correlated pair as semi- + anti-join: suppliers in one nation who were
# the ONLY supplier returning goods ('R') in a multi-supplier order.
@query(
    "sole_returning_suppliers",
    oracle="""
    WITH r_lines AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
      WHERE l_returnflag = 'R'),
    all_lines AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
    SELECT s_name, count(*) AS numwait
    FROM r_lines l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_5'
      AND EXISTS (SELECT 1 FROM all_lines l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM r_lines l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    """,
)
def sole_returning_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE pass over lineitem (round-12 verdict #5): the old shape ran
    # TWO separate .distinct() scans (r_lines + all_lines) and then a
    # semi- plus an anti-join back against lineitem-sized sides — the
    # worst 10× exponent in the TPC-H family (6.6).  One
    # groupBy(l_orderkey, l_suppkey).agg(max(returnflag='R')) derives
    # both sides with a single lineitem shuffle; the EXISTS / NOT EXISTS
    # pair then collapses to per-ORDER counts (suppliers ≥ 2, returning
    # suppliers = 1) over the already-aggregated pair table, and the
    # sole returning supplier is recovered in the same order-grain agg
    # (max over the has_r branch — exactly one row feeds it when
    # n_r = 1, so max is just "the" supplier).
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("l_returnflag") == "R").alias("has_r")
    )
    orders = (
        pairs.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.sum(F.col("has_r").cast("int")).alias("n_r"),
            F.max(F.when(F.col("has_r"), F.col("l_suppkey"))).alias("r_supp"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_r") == 1))
        .select("l_orderkey", "r_supp")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_5"
    )
    return (
        orders.join(supp, F.col("s_suppkey") == F.col("r_supp"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# --------------------------------------------------------------------------
# TPC-H Q2 shape (adapted: lineitem as the supply bridge) — correlated MIN
# subquery: per part, the supplier(s) offering the minimum observed unit
# price.  Expressed as a window-min + equality filter (one shuffle on
# partkey), the Spark-native translation of the correlated scalar subquery.
@query(
    "min_cost_supplier_per_part",
    oracle="""
    WITH costs AS (
      SELECT l_partkey, l_suppkey,
             min(CAST(round(l_extendedprice / l_quantity * 100) AS BIGINT)) AS unit_c
      FROM lineitem GROUP BY l_partkey, l_suppkey)
    SELECT p_partkey, p_name, s_suppkey, s_name, n_name,
           CAST(CAST(c.unit_c AS DOUBLE) / 100 AS DOUBLE) AS unit_cost
    FROM part
    JOIN costs c ON c.l_partkey = p_partkey
    JOIN supplier ON s_suppkey = c.l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_size <= 15 AND p_type = 'LARGE'
      AND c.unit_c = (SELECT min(c2.unit_c) FROM costs c2
                      WHERE c2.l_partkey = p_partkey)
    """,
)
def min_cost_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "LARGE")
    ).select("p_partkey", "p_name")
    # Push the part predicate THROUGH to the lineitem aggregation
    # (round-12 verdict #5): the correlated-min is per part, and only
    # filtered parts survive the final join, so a semi-join before the
    # big groupBy shrinks its input by the part-filter selectivity —
    # the old plan aggregated unit costs for EVERY part and threw most
    # away (10× exponent 5.6).  AQE picks broadcast for the key side
    # when it fits; the semantics are unchanged either way.
    li_f = li.join(
        part.select("p_partkey"),
        F.col("p_partkey") == F.col("l_partkey"),
        "left_semi",
    )
    costs = li_f.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.round(F.col("l_extendedprice") / F.col("l_quantity") * 100).cast("long")
        ).alias("unit_c")
    )
    w = Window.partitionBy("l_partkey")
    best = (
        costs.withColumn("min_c", F.min("unit_c").over(w))
        .filter(F.col("unit_c") == F.col("min_c"))
        .drop("min_c")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        part.join(best, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            "p_partkey", "p_name", "s_suppkey", "s_name", "n_name",
            (F.col("unit_c").cast("double") / 100).cast("double").alias("unit_cost"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q11 shape (adapted) — scalar-subquery HAVING: parts whose supply
# value from one nation's suppliers exceeds a fixed fraction of the total.
# The total is a broadcast 1-row aggregate folded into the plan (single
# pass over the grouped values, no driver-side .count()/collect()).
@query(
    "important_parts_value",
    oracle="""
    WITH vals AS (
      SELECT l_partkey,
             sum(CAST(round(l_extendedprice * l_quantity * 100) AS BIGINT)) AS v
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey)
    SELECT l_partkey AS p_partkey,
           CAST(CAST(v AS DOUBLE) / 100 AS DOUBLE) AS part_value
    FROM vals
    WHERE CAST(v AS DOUBLE) > 0.001 * (SELECT CAST(sum(v) AS DOUBLE) FROM vals)
    """,
)
def important_parts_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    vals = (
        li.join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * F.col("l_quantity") * 100)
                .cast("long")
            ).alias("v")
        )
    )
    total = vals.agg(F.sum("v").alias("total_v"))
    return (
        vals.crossJoin(F.broadcast(total))
        .filter(F.col("v").cast("double") > 0.001 * F.col("total_v").cast("double"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("v").cast("double") / 100).cast("double").alias("part_value"),
        )
    )


# --------------------------------------------------------------------------
# A11⊕ — pivot (long→wide): per-nation order counts pivoted by priority.
# Spark's pivot() compiles to the same conditional-aggregate plan the SQL
# CASE columns express — one shuffle, no per-pivot-value scans.
@query(
    "pivot_orders_by_priority",
    oracle="""
    SELECT n_name,
           count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS p_urgent,
           count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS p_high,
           count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS p_medium,
           count(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS p_notspec,
           count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS p_low
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN nation ON n_nationkey = c_nationkey
    GROUP BY n_name
    """,
)
def pivot_orders_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    wide = (
        orders.join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .pivot(
            "o_orderpriority",
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
        )
        .count()
    )
    renames = {
        "1-URGENT": "p_urgent", "2-HIGH": "p_high", "3-MEDIUM": "p_medium",
        "4-NOT SPECIFIED": "p_notspec", "5-LOW": "p_low",
    }
    out = wide
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    # pivot count yields NULL for empty cells where SQL count(CASE) yields 0
    return out.select(
        "n_name",
        *[F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c) for c in renames.values()],
    )


# --------------------------------------------------------------------------
# W7⊕ — ranking-function surface beyond rank/row_number: ntile buckets,
# percent_rank, cume_dist over one window pass.
@query(
    "window_rank_surface",
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           ntile(4) OVER w AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           CAST(lead(c_custkey, 1, -1) OVER w AS BIGINT) AS next_cust
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def window_rank_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.col("c_custkey")
    )
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.lead("c_custkey", 1, -1).over(w).cast("long").alias("next_cust"),
    )


# --------------------------------------------------------------------------
# A11⊕ — bitwise and boolean aggregates (exact in both engines).
@query(
    "bitwise_bool_aggs",
    oracle="""
    SELECT l_returnflag,
           bit_and(CAST(round(l_quantity) AS BIGINT)) AS qty_bit_and,
           bit_or(CAST(round(l_quantity) AS BIGINT)) AS qty_bit_or,
           bit_xor(CAST(round(l_quantity) AS BIGINT)) AS qty_bit_xor,
           bool_and(l_discount <= 0.1) AS all_low_disc,
           bool_or(l_quantity >= 49) AS any_large_qty,
           CAST(count(CASE WHEN l_tax > 0.05 THEN 1 END) AS BIGINT) AS n_high_tax
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def bitwise_bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = F.round("l_quantity").cast("long")
    return li.groupBy("l_returnflag").agg(
        F.bit_and(q).alias("qty_bit_and"),
        F.bit_or(q).alias("qty_bit_or"),
        F.bit_xor(q).alias("qty_bit_xor"),
        F.bool_and(F.col("l_discount") <= 0.1).alias("all_low_disc"),
        F.bool_or(F.col("l_quantity") >= 49).alias("any_large_qty"),
        F.count_if(F.col("l_tax") > 0.05).cast("long").alias("n_high_tax"),
    )


# --------------------------------------------------------------------------
# TPC-H Q8 shape — market share: 6-table join tree (region→nation→customer
# →orders→lineitem→supplier→nation2), conditional share ratio per year.
# The deep join tree is the Catalyst join-REORDERING showcase: only
# region/nation carry explicit broadcast-worthy bounds; everything else is
# AQE's choice.
@query(
    "nation_market_share",
    oracle="""
    WITH flat AS (
      SELECT EXTRACT(year FROM o_orderdate) AS o_year,
             CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS vol,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation cn ON cn.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = cn.n_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation sn ON sn.n_nationkey = s_nationkey
      WHERE r_name = 'EUROPE'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                            AND TIMESTAMP '1997-12-31 00:00:00')
    SELECT CAST(o_year AS BIGINT) AS o_year,
           CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN vol ELSE 0 END)
                AS DOUBLE) / sum(vol) AS DOUBLE) AS mkt_share
    FROM flat GROUP BY o_year
    """,
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31 00:00:00").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cn = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    flat = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("cn_region"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"), vol.alias("vol"), "supp_nation"
        )
    )
    return flat.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("vol")).otherwise(0))
            .cast("double")
            / F.sum("vol")
        ).cast("double").alias("mkt_share")
    ).select(F.col("o_year").cast("long").alias("o_year"), "mkt_share")


# --------------------------------------------------------------------------
# TPC-H Q9 shape (adapted: p_retailprice stands in for ps_supplycost) —
# product profit by supplier nation and year over a 5-table join.
@query(
    "product_profit_by_nation",
    oracle="""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)
                    - p_retailprice * l_quantity) * 10000) AS BIGINT)) AS DOUBLE)
                / 10000 AS DOUBLE) AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%bolt%'
    GROUP BY n_name, EXTRACT(year FROM o_orderdate)
    """,
)
def product_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%bolt%")
    ).select("p_partkey", "p_retailprice")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = F.round(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - F.col("p_retailprice") * F.col("l_quantity")
        )
        * 10000
    ).cast("long")
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg((F.sum(amount).cast("double") / 10000).cast("double").alias("profit"))
    )


# --------------------------------------------------------------------------
# TPC-H Q10 shape — returned-item reporting: top 20 customers by revenue
# lost to returns in a quarter.
@query(
    "returned_item_customers",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                AS BIGINT)) AS DOUBLE) / 10000 AS DOUBLE) AS revenue,
           n_name,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name", F.col("c_acctbal").cast("double").alias("c_acctbal"))
        .agg(
            (
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                    ).cast("long")
                ).cast("double")
                / 10000
            ).cast("double").alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_name", "c_acctbal")
    )


# --------------------------------------------------------------------------
# A11⊕ — unpivot (wide→long, the pivot inverse): per-lineitem charge
# components stacked into (component, amount) rows.
@query(
    "unpivot_charge_components",
    oracle="""
    SELECT l_orderkey, l_linenumber, component,
           CAST(amount AS DOUBLE) AS amount
    FROM (
      SELECT l_orderkey, l_linenumber,
             l_extendedprice AS base_price,
             CAST(round(l_extendedprice * l_discount * 100) AS BIGINT) / 100.0
               AS discount_amt,
             CAST(round(l_extendedprice * l_tax * 100) AS BIGINT) / 100.0
               AS tax_amt
      FROM lineitem WHERE l_orderkey < 200)
    UNPIVOT (amount FOR component IN (base_price, discount_amt, tax_amt))
    """,
)
def unpivot_charge_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    wide = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").alias("base_price"),
        (F.round(F.col("l_extendedprice") * F.col("l_discount") * 100).cast("long")
         / 100.0).alias("discount_amt"),
        (F.round(F.col("l_extendedprice") * F.col("l_tax") * 100).cast("long")
         / 100.0).alias("tax_amt"),
    )
    return wide.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["base_price", "discount_amt", "tax_amt"],
        "component",
        "amount",
    ).select(
        "l_orderkey", "l_linenumber", "component",
        F.col("amount").cast("double").alias("amount"),
    )


# --------------------------------------------------------------------------
# TPC-H Q13 shape — customer order-count distribution: LEFT join so
# zero-order customers land in the c_count=0 bucket, then a second
# aggregation over the first (two shuffles, both on shrinking keys).
@query(
    "customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey)
    GROUP BY c_count
    """,
)
def customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# TPC-H Q16 shape (adapted: lineitem as the part-supplier bridge) —
# distinct-supplier counts per part attribute triple with an exclusion
# filter.
@query(
    "part_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#45' AND p_size IN (1, 4, 9, 14, 19, 23, 36, 49)
    GROUP BY p_brand, p_type, p_size
    """,
)
def part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 49)
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        part.join(li, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# TPC-H Q20 shape (adapted: shipped-share in place of availqty) — suppliers
# whose 1997 shipments of bolt parts exceed half their all-time shipments
# of that part: grouped ratio filter + distinct semi-join to supplier.
@query(
    "excess_share_suppliers",
    oracle="""
    WITH sp AS (
      SELECT l_suppkey, l_partkey,
             sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                       AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
                      THEN CAST(round(l_quantity) AS BIGINT) ELSE 0 END) AS q97,
             sum(CAST(round(l_quantity) AS BIGINT)) AS q_all
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%bolt%'
      GROUP BY l_suppkey, l_partkey)
    SELECT DISTINCT s_suppkey, s_name
    FROM supplier JOIN sp ON l_suppkey = s_suppkey
    WHERE CAST(q97 AS DOUBLE) > 0.5 * CAST(q_all AS DOUBLE)
    """,
)
def excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    bolts = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%bolt%")
    ).select("p_partkey")
    qty = F.round("l_quantity").cast("long")
    in97 = (
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    sp = (
        li.join(bolts, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in97, qty).otherwise(0)).alias("q97"),
            F.sum(qty).alias("q_all"),
        )
        .filter(F.col("q97").cast("double") > 0.5 * F.col("q_all").cast("double"))
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        supp.join(sp, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


# --------------------------------------------------------------------------
# TPC-H Q6 shape — forecasting revenue change: single-table filtered agg
# with range predicates on three columns; everything pushes to the scan.
@query(
    "forecast_revenue_change",
    oracle="""
    SELECT CAST(CAST(sum(CAST(round(l_extendedprice * l_discount * 10000)
                 AS BIGINT)) AS DOUBLE) / 10000 AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            money_sum(F.col("l_extendedprice") * F.col("l_discount"), 10000)
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# ⊕ data-quality op — referential-integrity audit: orphan counts across
# every FK edge of the star schema in ONE pass each (left-anti joins
# reduced to counts), plus the parent row totals that make zero-orphan
# results meaningful.  The shape a 100 TB nightly quality gate runs.
@query(
    "referential_integrity_audit",
    oracle="""
    SELECT 'lineitem->orders' AS fk_edge,
           (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
             (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
             AS n_orphans,
           (SELECT count(*) FROM lineitem) AS n_child_rows
    UNION ALL
    SELECT 'orders->customer',
           (SELECT count(*) FROM orders o WHERE NOT EXISTS
             (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
           (SELECT count(*) FROM orders)
    UNION ALL
    SELECT 'lineitem->part',
           (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
             (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)),
           (SELECT count(*) FROM lineitem)
    UNION ALL
    SELECT 'lineitem->supplier',
           (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
             (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)),
           (SELECT count(*) FROM lineitem)
    UNION ALL
    SELECT 'customer->nation',
           (SELECT count(*) FROM customer c WHERE NOT EXISTS
             (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)),
           (SELECT count(*) FROM customer)
    """,
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    def audit(edge, child, parent, ck, pk):
        # one lazy plan per edge: anti-join count x child total, no
        # driver-side actions (they'd serialize the audit into 2N jobs)
        orphans = (
            child.join(parent, child[ck] == parent[pk], "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
        )
        total = child.agg(F.count(F.lit(1)).alias("n_child_rows"))
        return (
            orphans.crossJoin(F.broadcast(total))
            .select(
                F.lit(edge).alias("fk_edge"), "n_orphans", "n_child_rows"
            )
        )

    frames = [
        audit("lineitem->orders", li, orders, "l_orderkey", "o_orderkey"),
        audit("orders->customer", orders, cust, "o_custkey", "c_custkey"),
        audit("lineitem->part", li, part, "l_partkey", "p_partkey"),
        audit("lineitem->supplier", li, supp, "l_suppkey", "s_suppkey"),
        audit("customer->nation", cust, nation, "c_nationkey", "n_nationkey"),
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


# --------------------------------------------------------------------------
# A11/W7⊕ — month-over-month revenue growth: windowed lag over a monthly
# aggregate (agg → window compose).  Growth is one division of two exact
# quantized sums, so cross-engine exact.
@query(
    "monthly_revenue_growth",
    oracle="""
    WITH monthly AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_c
      FROM orders GROUP BY date_trunc('month', o_orderdate))
    SELECT month,
           CAST(CAST(rev_c AS DOUBLE) / 100 AS DOUBLE) AS revenue,
           CAST(CASE WHEN lag(rev_c) OVER (ORDER BY month) IS NULL THEN NULL
                ELSE 100.0 * (rev_c - lag(rev_c) OVER (ORDER BY month))
                     / lag(rev_c) OVER (ORDER BY month) END AS DOUBLE)
             AS mom_growth_pct
    FROM monthly
    """,
)
def monthly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c"))
    w = Window.orderBy("month")
    prev = F.lag("rev_c").over(w)
    return monthly.select(
        "month",
        (F.col("rev_c").cast("double") / 100).cast("double").alias("revenue"),
        F.when(
            prev.isNull(), F.lit(None).cast("double")
        ).otherwise(
            (100.0 * (F.col("rev_c") - prev) / prev).cast("double")
        ).alias("mom_growth_pct"),
    )


# --------------------------------------------------------------------------
# J7/A11 — TPC-H Q12 shape (shipmode × order-priority conditional counts;
# reference capability: the relational join+conditional-agg family): IN-list
# scan filter + join-side date predicate + two CASE-sum counts per group.
# The synthetic schema has no l_shipmode/l_commitdate/l_receiptdate, so
# l_returnflag plays the shipmode IN-list and `l_shipdate > o_orderdate`
# plays the commit-before-receipt lateness predicate — same plan shape:
# pushed IN + range filters on the lineitem scan, one shuffle join on
# orderkey, conditional aggregation with zero extra shuffles.
@query(
    "shipmode_priority_counts",
    oracle="""
    SELECT l.l_returnflag AS shipmode,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_returnflag IN ('R', 'A')
      AND l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate > o.o_orderdate
    GROUP BY l.l_returnflag
    """,
)
def shipmode_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "A")
        & (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy(F.col("l_returnflag").alias("shipmode"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long")
              .alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long")
              .alias("low_line_count"),
        )
    )
