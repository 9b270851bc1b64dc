"""Ad-hoc SQL analytics surface (SURVEY §3 EP3): the reference ships a
Postgres sink + pgAdmin precisely so users can run arbitrary SQL over it.
This module proves the engine's coverage of that surface — grouping sets,
pivot, set operations, semi/anti joins, correlated and scalar subqueries,
HAVING, string/date function batteries — plus the salted two-phase
aggregation pattern (the skew-mitigation rewrite, proven equivalent to the
plain aggregation by its oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.plans.catalog import _t, register


@register(
    "rollup_pricing",
    """
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=["agg", "grouping-sets"],
)
def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n")
    )


@register(
    "cube_orders",
    """
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus, o_orderpriority) AS gid,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=["agg", "grouping-sets"],
)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n", "total")
    )


@register(
    "pivot_lineitem_status",
    """
    SELECT l_returnflag,
           round(coalesce(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 0), 2) AS qty_o,
           round(coalesce(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 0), 2) AS qty_f
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=["pivot"],
)
def pivot_lineitem_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity"))
        .select(
            "l_returnflag",
            F.round(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("qty_o"),
            F.round(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("qty_f"),
        )
    )


@register(
    "customers_without_orders",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=["join", "anti"],
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "active_suppliers_semi",
    """
    SELECT s_suppkey, s_name FROM supplier s
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 45
    )
    """,
    tags=["join", "semi"],
)
def active_suppliers_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return sup.join(li, sup.s_suppkey == li.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


@register(
    "brand_type_intersect",
    """
    SELECT p_brand FROM part WHERE p_type = 'PROMO'
    INTERSECT
    SELECT p_brand FROM part WHERE p_type = 'ECONOMY'
    """,
    tags=["setop"],
)
def brand_type_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    promo = part.filter(F.col("p_type") == "PROMO").select("p_brand")
    econ = part.filter(F.col("p_type") == "ECONOMY").select("p_brand")
    return promo.intersect(econ)


@register(
    "brand_type_except",
    """
    SELECT p_brand FROM part WHERE p_type = 'PROMO'
    EXCEPT
    SELECT p_brand FROM part WHERE p_type = 'ECONOMY'
    """,
    tags=["setop"],
)
def brand_type_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    promo = part.filter(F.col("p_type") == "PROMO").select("p_brand")
    econ = part.filter(F.col("p_type") == "ECONOMY").select("p_brand")
    # subtract == EXCEPT (set semantics); exceptAll would keep surplus
    # duplicate occurrences and diverge from SQL EXCEPT
    return promo.subtract(econ)


@register(
    "orders_above_customer_avg",
    """
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders o
    WHERE o_totalprice > 1.5 * (
      SELECT avg(o_totalprice) FROM orders i WHERE i.o_custkey = o.o_custkey
    )
    """,
    tags=["subquery", "correlated"],
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — decorrelated by Catalyst into an
    aggregate + join; expressed here as the equivalent window rewrite
    (one shuffle on the correlation key, no rescan)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        orders.withColumn("cust_avg", F.avg("o_totalprice").over(w))
        .filter(F.col("o_totalprice") > 1.5 * F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


@register(
    "parts_above_avg_price",
    """
    SELECT p_partkey, p_name
    FROM part
    WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
    """,
    tags=["subquery", "scalar"],
)
def parts_above_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    part.createOrReplaceTempView("__part_sq")
    return spark.sql(
        "SELECT p_partkey, p_name FROM __part_sq "
        "WHERE p_retailprice > (SELECT avg(p_retailprice) FROM __part_sq)"
    )


@register(
    "supplier_having",
    """
    SELECT l_suppkey, count(*) AS n_items, round(sum(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY l_suppkey
    HAVING count(*) > 100
    """,
    tags=["agg", "having"],
)
def supplier_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_items"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        .filter(F.col("n_items") > 100)
    )


@register(
    "string_date_battery",
    """
    SELECT o_orderkey,
           upper(o_orderpriority)                         AS prio_upper,
           substr(o_orderpriority, 1, 1)                  AS prio_code,
           replace(o_orderpriority, '-', '_')             AS prio_repl,
           length(o_orderpriority)                        AS prio_len,
           lpad(CAST(o_orderkey AS VARCHAR), 12, '0')     AS key_padded,
           CAST(year(o_orderdate) AS INTEGER)             AS y,
           CAST(month(o_orderdate) AS INTEGER)            AS m,
           CAST(day(o_orderdate) AS INTEGER)              AS d,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') AS INTEGER) AS days_to_y2k
    FROM orders WHERE o_orderkey % 11 = 0
    """,
    tags=["projection", "string", "time"],
)
def string_date_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 0)
    return orders.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("prio_upper"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.replace(F.col("o_orderpriority"), F.lit("-"), F.lit("_")).alias("prio_repl"),
        F.length("o_orderpriority").cast("long").alias("prio_len"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias("key_padded"),
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").alias("due_date"),
        F.datediff(F.lit("2000-01-01"), F.col("o_orderdate")).alias("days_to_y2k"),
    )


@register(
    "salted_agg_equivalence",
    """
    SELECT l_returnflag, round(sum(l_extendedprice), 2) AS total, count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=["agg", "skew"],
)
def salted_agg_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigation pattern: salt the hot key 16 ways, partially
    aggregate per (key, salt), then re-aggregate per key. The oracle is
    the PLAIN aggregation — proving the rewrite is semantics-preserving.
    (With AQE skew handling on, Spark does this automatically for joins;
    the manual salt remains the tool for skewed aggregations.)"""
    li = _t(spark, sf_dir, "lineitem")
    salted = li.withColumn("__salt", F.pmod(F.col("l_orderkey"), F.lit(16)))
    partial = salted.groupBy("l_returnflag", "__salt").agg(
        F.sum("l_extendedprice").alias("s"), F.count(F.lit(1)).alias("c")
    )
    return partial.groupBy("l_returnflag").agg(
        F.round(F.sum("s"), 2).alias("total"), F.sum("c").alias("n")
    )


@register(
    "salted_join_equivalence",
    """
    SELECT o.o_orderpriority,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    tags=["join", "skew"],
)
def salted_join_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigation JOIN pattern (completes the salted family next to
    salted_agg_equivalence): the probe side gets a random-free
    deterministic salt in [0,16); the build side is replicated 16× with
    every salt value; the join key becomes (key, salt), so one hot key's
    probe rows spread across 16 tasks instead of one straggler. The
    oracle is the PLAIN join — the rewrite must be semantics-preserving.
    At 100 TB this is the manual fallback when AQE's skew-join split
    can't kick in (e.g. the skew is in a broadcast-ineligible build side
    or a key is hot enough to overflow a single AQE sub-partition);
    replication cost is 16× the (small) build side, never the fact."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    n_salt = 16
    probe = li.withColumn("__salt", F.pmod(F.xxhash64("l_linenumber"), F.lit(n_salt)))
    build = orders.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    joined = probe.join(build, (probe.l_orderkey == build.o_orderkey) & (probe.__salt == build.__salt))
    return joined.groupBy("o_orderpriority").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "try_error_battery",
    """
    SELECT p_partkey,
           TRY_CAST(CASE WHEN p_partkey % 3 = 0
                         THEN CAST(p_partkey AS VARCHAR) ELSE p_name END
                    AS BIGINT) AS maybe_int,
           strftime(try_strptime('2024-' || lpad(CAST(p_partkey % 15 + 1 AS VARCHAR), 2, '0') || '-28',
                                 '%Y-%m-%d'), '%Y-%m-%d') AS maybe_date,
           round(CASE WHEN p_partkey % 5 = 0 THEN NULL
                      ELSE p_retailprice / (p_partkey % 5) END, 4) AS maybe_ratio
    FROM part
    """,
    tags=["errors", "sql"],
)
def try_error_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe per-expression error tolerance — the engine-level
    generalization of the reference's per-row try/except skips
    (dags/dag.py:210,270-272,417-419; §2.3 F5): ``try_cast`` /
    ``try_to_timestamp`` / ``try_divide`` turn malformed ints,
    impossible dates (month 13-15), and zero divides into NULLs instead
    of killing the task — row-level tolerance with zero Python and no
    exception-control-flow, safe under ANSI mode. The oracle mirrors
    with TRY_CAST / try_strptime / NULL-guarded division."""
    part = _t(spark, sf_dir, "part")
    maybe_int = (
        F.when(F.col("p_partkey") % 3 == 0, F.col("p_partkey").cast("string"))
        .otherwise(F.col("p_name"))
        .try_cast("bigint")
    )
    date_str = F.concat(
        F.lit("2024-"),
        F.lpad((F.col("p_partkey") % 15 + 1).cast("string"), 2, "0"),
        F.lit("-28"),
    )
    maybe_date = F.date_format(
        F.try_to_timestamp(date_str, F.lit("yyyy-MM-dd")), "yyyy-MM-dd"
    )
    maybe_ratio = F.round(F.try_divide("p_retailprice", F.col("p_partkey") % 5), 4)
    return part.select(
        "p_partkey",
        maybe_int.alias("maybe_int"),
        maybe_date.alias("maybe_date"),
        maybe_ratio.alias("maybe_ratio"),
    )


@register(
    "unpivot_measures",
    """
    WITH wide AS (
      SELECT l_returnflag,
             round(sum(l_quantity), 2)      AS qty,
             round(sum(l_extendedprice), 2) AS price,
             round(sum(l_discount), 2)      AS disc
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, measure, value
    FROM wide UNPIVOT (value FOR measure IN (qty, price, disc))
    """,
    tags=["unpivot"],
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshaping (unpivot/melt), the inverse of pivot."""
    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("price"),
        F.round(F.sum("l_discount"), 2).alias("disc"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["qty", "price", "disc"],
        variableColumnName="measure",
        valueColumnName="value",
    )


@register(
    "q2_min_within_group",
    """
    SELECT s.s_suppkey, s.s_name, n.n_name, round(s.s_acctbal, 2) AS s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN (
      SELECT s_nationkey, min(s_acctbal) AS min_bal
      FROM supplier GROUP BY s_nationkey
    ) m ON s.s_nationkey = m.s_nationkey AND s.s_acctbal = m.min_bal
    """,
    tags=["join", "subquery"],
)
def q2_min_within_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: rows matching their group's minimum — aggregate
    then join back (the decorrelated form of a correlated MIN subquery)."""
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    mins = sup.groupBy(F.col("s_nationkey").alias("nk")).agg(F.min("s_acctbal").alias("min_bal"))
    return (
        sup.join(
            F.broadcast(mins),
            (sup.s_nationkey == mins.nk) & (sup.s_acctbal == mins.min_bal),
        )
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )


@register(
    "latest_order_per_customer",
    """
    SELECT o_custkey,
           arg_max(o_orderkey, CAST(floor(epoch(o_orderdate)) AS BIGINT) * 100000000 + o_orderkey) AS latest_orderkey,
           strftime(max(o_orderdate), '%Y-%m-%d') AS latest_date,
           round(arg_max(o_totalprice, CAST(floor(epoch(o_orderdate)) AS BIGINT) * 100000000 + o_orderkey), 2) AS latest_price
    FROM orders
    GROUP BY o_custkey
    """,
    tags=["agg", "argmax"],
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by / arg_max: the latest row per key as a single aggregation
    (ties on the date broken by orderkey via the scalar composite
    ordering key) — one shuffle, map-side combinable."""
    orders = _t(spark, sf_dir, "orders")
    # scalar composite ordering key (date-seconds · 1e8 + orderkey): DuckDB
    # 1.0's arg_max has no struct-key overload
    order_key = F.unix_timestamp("o_orderdate") * 100000000 + F.col("o_orderkey")
    return orders.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", order_key).alias("latest_orderkey"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("latest_date"),
        F.round(F.max_by("o_totalprice", order_key), 2).alias("latest_price"),
    )


@register(
    "null_safe_join",
    """
    WITH a AS (
      SELECT doc_id, nullif(lang, 'en') AS lang_key FROM documents WHERE doc_id % 3 = 0
    ),
    b AS (
      SELECT lang AS lang_raw, nullif(lang, 'en') AS lang_key, count(*) AS n_docs
      FROM documents GROUP BY lang
    )
    SELECT a.doc_id, coalesce(b.lang_raw, '?') AS matched_lang, b.n_docs
    FROM a JOIN b ON a.lang_key IS NOT DISTINCT FROM b.lang_key
    """,
    tags=["join", "null-safe"],
)
def null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other — the semantics ordinary equi-joins silently drop."""
    docs = _t(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") % 3 == 0).select(
        "doc_id", F.nullif("lang", F.lit("en")).alias("lang_key")
    )
    b = docs.groupBy(F.col("lang").alias("lang_raw")).agg(F.count(F.lit(1)).alias("n_docs")).select(
        "lang_raw", F.nullif("lang_raw", F.lit("en")).alias("lang_key"), "n_docs"
    )
    return a.join(F.broadcast(b), a.lang_key.eqNullSafe(b.lang_key)).select(
        "doc_id", F.coalesce("lang_raw", F.lit("?")).alias("matched_lang"), "n_docs"
    )


@register(
    "recursive_cte_part_ancestry",
    """
    WITH RECURSIVE anc(k, node, depth, cost) AS (
      SELECT p_partkey, p_partkey, 0, CAST(0 AS BIGINT)
      FROM part WHERE p_partkey BETWEEN 1 AND 511
      UNION ALL
      SELECT a.k, a.node // 2, a.depth + 1, a.cost + a.node % 7 + 1
      FROM anc a WHERE a.node >= 2
    )
    SELECT k, max(depth) AS depth, max(cost) AS root_cost
    FROM anc GROUP BY k
    """,
    tags=["sql", "recursive-cte", "iterative"],
)
def recursive_cte_part_ancestry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4.1's native WITH RECURSIVE (UnionLoop in the plan) run on
    the ENGINE side, not just the oracle: binary-heap ancestry
    (node -> node div 2, edge weight node%7+1) gives every part a unique
    root path, so UNION ALL recursion terminates in ~log2(512) = 9 steps
    with O(n log n) total rows and no path explosion (the shape to avoid:
    recursing over a multi-path DAG under UNION ALL enumerates every
    path). The iterative SSSP/BFS operators remain the right tool for
    shared-path graphs; this covers the genuinely-hierarchical cases
    (BOM explosion, org charts, category trees) where the declarative
    recursion IS the natural plan. Only dialect difference vs the DuckDB
    oracle: integer division spells DIV in Spark, // in DuckDB —
    identical floor-toward-zero on the non-negative keys used here."""
    _t(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        WITH RECURSIVE anc(k, node, depth, cost) AS (
          SELECT p_partkey, p_partkey, 0, CAST(0 AS BIGINT)
          FROM part WHERE p_partkey BETWEEN 1 AND 511
          UNION ALL
          SELECT a.k, a.node DIV 2, a.depth + 1, a.cost + a.node % 7 + 1
          FROM anc a WHERE a.node >= 2
        )
        SELECT k, max(depth) AS depth, max(cost) AS root_cost
        FROM anc GROUP BY k
        """
    )


@register(
    "lateral_top2_orders",
    """
    SELECT c.c_custkey, o.o_orderkey, round(o.o_totalprice, 2) AS price
    FROM customer c JOIN LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o ON true
    WHERE c.c_custkey % 5 = 0
    """,
    tags=["subquery", "lateral", "topk"],
)
def lateral_top2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT — the
    SQL surface for top-k-per-group (same result shape as the
    row_number window in top3_parts_per_brand, different plan: Catalyst
    DECORRELATES the lateral into a window under the hood via
    RewriteLateralSubquery, so the 100 TB plan is one shuffle, not a
    per-customer probe). Engine-surface coverage: a reference user
    migrating TimescaleDB/Postgres LATERAL idioms needs this to parse
    and match. Ranked on the raw price (doubles load identically from
    parquet on both engines; no arithmetic before comparison) with
    o_orderkey tiebreak."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("__lat_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("__lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, round(o.o_totalprice, 2) AS price
        FROM __lat_customer c JOIN LATERAL (
          SELECT o_orderkey, o_totalprice FROM __lat_orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        WHERE c.c_custkey % 5 = 0
        """
    )
