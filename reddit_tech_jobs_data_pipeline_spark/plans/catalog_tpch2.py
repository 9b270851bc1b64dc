"""Second wave of TPC-H-style analogs — the remaining canonical query
shapes (bidirectional nation-pair volume, market share, profit attribution,
distribution histograms, scalar-subquery thresholds, exists/not-exists
analogs) adapted to the driver's schema.

Adaptations forced by the synthetic schema (TESTDATA.md):
* no ``partsupp`` → Q11/Q16/Q20 shapes use ``lineitem`` as the
  part↔supplier relationship (revenue/quantity stand in for
  supplycost*availqty);
* no ``l_shipmode``/``l_commitdate``/``l_receiptdate`` → Q12/Q21 latency
  semantics are re-expressed over ``l_shipdate`` vs ``o_orderdate``;
* no ``c_phone`` → Q22's country code becomes ``c_nationkey``.

Scale notes (SCALE.md): every small-dimension join is broadcast; the
scalar thresholds (Q11/Q15/Q17/Q20/Q22) are computed as 1-row aggregates
and cross-joined (broadcast) rather than window-over-empty-partition,
which would serialize onto one task at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.plans.catalog import _t, register


@register(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
          OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=["tpch", "join", "agg"],
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 analog: shipping volume between nation pairs by year —
    cross-nation join with the year derived pre-aggregation."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n1), sup.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8"))
            | ((F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3"))
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q8_market_share",
    """
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
        AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=["tpch", "join", "agg"],
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 analog: one nation's share of ECONOMY-part revenue per
    year — conditional-sum ratio inside a single aggregation."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .join(F.broadcast(n2), sup.s_nationkey == F.col("n2_key"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    """
    SELECT nation, o_year,
           CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
               - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) * CAST(0.1 AS DECIMAL(2,1)) AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    tags=["tpch", "join", "agg"],
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 analog: profit by nation and year, DECIMAL-exact sums."""
    # no partsupp in the synthetic schema: ps_supplycost is proxied by
    # 10% of part retail price (identical formula on the oracle side).
    # All source money columns are exact 2dp, so DECIMAL arithmetic makes
    # the sum bit-identical across engines regardless of summation order
    # (a plain double sum can land on a .xx5 rounding boundary).
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    amount = dec("l_extendedprice") * (
        F.lit(1) - dec("l_discount")
    ) - dec("p_retailprice") * dec("l_quantity") * F.lit(0.1).cast("decimal(2,1)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(amount), 2).cast("double").alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


@register(
    "q11_important_parts",
    """
    WITH part_value AS (
      SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS value
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, round(value, 2) AS value
    FROM part_value
    WHERE value > (SELECT avg(value) * 1.5 FROM part_value)
    ORDER BY value DESC, l_partkey
    """,
    tags=["tpch", "agg", "subquery"],
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part_value = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value")
    )
    # scalar threshold as a broadcast 1-row cross join — partial aggregation
    # map-side, no single-partition window at scale
    # relative threshold (1.5× mean part value) so the predicate stays
    # selective-but-nonempty at every SF — Q11's fraction-of-total breaks
    # down when part cardinality scales with the fact table
    threshold = part_value.agg((F.avg("value") * 1.5).alias("__thr"))
    return (
        part_value.join(F.broadcast(threshold))
        .filter(F.col("value") > F.col("__thr"))
        .select("l_partkey", F.round("value", 2).alias("value"))
        .orderBy(F.col("value").desc(), F.col("l_partkey"))
    )


@register(
    "q12_late_shipping",
    """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    tags=["tpch", "join", "agg"],
)
def q12_late_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no l_shipmode/l_commitdate in the synthetic schema: Q12's
    # "late lines by mode" becomes "late lines (shipped >60d after order)
    # by linestatus", keeping the CASE-sum pivot shape
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    orders = _t(spark, sf_dir, "orders")
    urgent = (F.col("o_orderpriority") == "1-URGENT").cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(urgent).alias("high_line_count"),
            F.sum(1 - urgent).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=["tpch", "join", "agg"],
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=["tpch", "join", "subquery"],
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    sup = _t(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    top = revenue.agg(F.max("total_revenue").alias("__max_rev"))
    return (
        revenue.join(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("__max_rev"))
        .join(F.broadcast(sup), F.col("supplier_no") == sup.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_part_cnt",
    """
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=["tpch", "join", "agg"],
)
def q16_supplier_part_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    # lineitem stands in for partsupp as the part↔supplier relationship
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q17_small_quantity_revenue",
    """
    WITH brand_li AS (
      SELECT l_partkey, l_quantity, l_extendedprice
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
    ), part_avg AS (
      SELECT l_partkey, 0.5 * avg(l_quantity) AS half_avg
      FROM brand_li GROUP BY l_partkey
    )
    SELECT round(coalesce(sum(l_extendedprice), 0) / 7.0, 2) AS avg_yearly
    FROM brand_li JOIN part_avg USING (l_partkey)
    WHERE l_quantity < half_avg
    """,
    tags=["tpch", "join", "subquery", "agg"],
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    )
    li = _t(spark, sf_dir, "lineitem")
    brand_li = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part_avg = brand_li.groupBy("l_partkey").agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        brand_li.join(F.broadcast(part_avg), "l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.round(F.coalesce(F.sum("l_extendedprice"), F.lit(0.0)) / 7.0, 2).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "q20_promo_heavy_suppliers",
    """
    WITH per_supp AS (
      SELECT l_suppkey, sum(l_quantity) AS qty_sum
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_type = 'PROMO'
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, round(qty_sum, 2) AS qty_sum
    FROM supplier JOIN per_supp ON s_suppkey = l_suppkey
    WHERE qty_sum > (SELECT avg(qty_sum) FROM per_supp)
    ORDER BY s_suppkey
    """,
    tags=["tpch", "join", "subquery"],
)
def q20_promo_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 analog: suppliers shipping above-average PROMO volume
    in the window (availqty predicate re-expressed without partsupp)."""
    # Q20's availqty>half-shipped predicate re-expressed without partsupp:
    # suppliers shipping above-average PROMO volume in the window
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    sup = _t(spark, sf_dir, "supplier")
    per_supp = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty_sum"))
    )
    thr = per_supp.agg(F.avg("qty_sum").alias("__thr"))
    return (
        per_supp.join(F.broadcast(thr))
        .filter(F.col("qty_sum") > F.col("__thr"))
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .select("s_suppkey", "s_name", F.round("qty_sum", 2).alias("qty_sum"))
        .orderBy("s_suppkey")
    )


@register(
    "q21_last_to_ship_suppliers",
    """
    WITH order_stats AS (
      SELECT l_orderkey,
             max(l_shipdate) AS order_max,
             count(DISTINCT l_suppkey) AS n_supp
      FROM lineitem GROUP BY l_orderkey
    ), supp_order AS (
      SELECT l_orderkey, l_suppkey, max(l_shipdate) AS supp_max
      FROM lineitem GROUP BY l_orderkey, l_suppkey
    )
    SELECT s_name, count(*) AS numwait
    FROM supp_order
    JOIN order_stats USING (l_orderkey)
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE n_supp >= 2 AND supp_max = order_max
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
    tags=["tpch", "join", "agg", "window"],
)
def q21_last_to_ship_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analog: the supplier whose lines shipped last within
    each multi-supplier order (no commit/receipt dates in the schema)."""
    # Q21 "suppliers who kept orders waiting" without commit/receipt dates:
    # the supplier whose lines shipped last in a multi-supplier order.
    # One shuffle on l_orderkey serves both aggregates via a window over
    # the (orderkey, suppkey) pre-aggregation.
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    supp_order = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("supp_max")
    )
    w = Window.partitionBy("l_orderkey")
    stats = supp_order.withColumn("order_max", F.max("supp_max").over(w)).withColumn(
        "n_supp", F.count(F.lit(1)).over(w)
    )
    return (
        stats.filter((F.col("n_supp") >= 2) & (F.col("supp_max") == F.col("order_max")))
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


@register(
    "q22_idle_customers",
    """
    WITH avg_bal AS (
      SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey AS cntrycode,
           count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT a FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    ORDER BY cntrycode
    """,
    tags=["tpch", "anti", "subquery", "agg"],
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Q22's phone-prefix country code becomes c_nationkey (no c_phone col);
    # "no orders at all" is vacuous at ~10 orders/customer, so the idle
    # predicate is "no URGENT orders" — keeps the NOT EXISTS anti-join live
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@register(
    "q19_discounted_revenue",
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=["tpch", "join", "agg"],
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, disjunctive predicate) adapted to
    the available columns (no l_shipmode/shipinstruct/p_container —
    the brand x size x quantity bands carry the OR-of-ANDs structure
    that makes Q19 interesting): Catalyst must evaluate a disjunction
    mixing build-side (part) and probe-side (lineitem) predicates on a
    broadcast join without losing the partkey equi-join — the classic
    planner trap where the OR blocks all pushdown. The part filter
    (brand IN ...) is pre-applied as the union of the brand clauses, so
    the broadcast side shrinks before the join even though no single
    conjunct is common."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    # union-of-brands prefilter: every OR branch pins one of 3 brands,
    # so the broadcast side prunes 25 -> 3 brands before the join
    part = part.filter(F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#3"))
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    b = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(b).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q2_min_cost_supplier",
    """
    WITH offers AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY 1, 2
    ),
    best AS (
      SELECT partkey, suppkey, unit_cost,
             row_number() OVER (PARTITION BY partkey
                                ORDER BY unit_cost, suppkey) AS rn
      FROM offers
    )
    SELECT p.p_partkey, p.p_brand, s.s_name, n.n_name,
           b.unit_cost AS unit_cost
    FROM best b
    JOIN part p ON p.p_partkey = b.partkey
    JOIN supplier s ON s.s_suppkey = b.suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE b.rn = 1 AND p.p_size = 15
    """,
    tags=["tpch", "join", "window", "subquery"],
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier) adapted to the schema: the
    testdata has no partsupp table, so the offer book is derived from
    observed lineitem prices (min unit price per (part, supplier) —
    itself a realistic catalog reconstruction). The correlated
    'ps_supplycost = (SELECT min ...)' becomes the argmin window with a
    suppkey tiebreaker — the scalable form of a correlated aggregate
    subquery (one shuffle on partkey, no self-join re-scan). Dimension
    joins (part filter p_size = 15, supplier, nation) broadcast; the
    p_size filter prunes before the join.

    unit_cost is emitted UNROUNDED: it is one IEEE division of two
    parquet-exact doubles followed by an exact min — bit-identical on
    both engines — whereas rounding it is the unsafe step (a price/8
    lands exactly on a decimal .xxxx5 boundary, where Spark's
    BigDecimal HALF_UP and DuckDB's scaled-multiply round can disagree;
    observed at sf0.001)."""
    li = _t(spark, sf_dir, "lineitem")
    offers = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    w = Window.partitionBy("partkey").orderBy("unit_cost", "suppkey")
    best = offers.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        best.join(F.broadcast(part), best.partkey == part.p_partkey)
        .join(F.broadcast(supp), best.suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            "n_name",
            "unit_cost",
        )
    )
