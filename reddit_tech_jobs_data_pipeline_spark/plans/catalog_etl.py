"""Warehouse-maintenance query shapes: SCD Type 2 dimension build,
time-range rolling windows, sketch aggregates with tolerance-band
oracles, and a regexp-extract-all battery.

The reference's sink is a flat last-writer-wins upsert (`dags/dag.py:
380-421`) — it keeps no history. SCD2 is the standard generalization a
warehouse needs: collapse a change log into versioned rows with
validity intervals. The rolling-revenue shape generalizes the
reference's created_datetime index scan (`dags/dag.py:511`) to windowed
trailing aggregates; the regexp battery generalizes its re.findall
tokenizer (`dags/dag.py:132-140`) to bulk extraction.

Determinism notes (playbook rules):
* SCD2 ordering uses (o_orderdate, o_orderkey) — a total order — so
  lag/lead agree across engines; interval bounds are emitted as
  yyyy-MM-dd strings, never timestamp dtypes;
* the rolling sum adds day-level revenues that are ALREADY rounded to
  2 dp, so frame-order differences are ~1 ulp and the outer 2-dp round
  is safe;
* sketches (HyperLogLog distinct, t-digest-style approx percentile)
  cannot hash-match an exact oracle; instead the Spark side emits the
  EXACT statistic plus a boolean "approx within 10% of exact" check,
  and the oracle emits the exact value plus literal TRUE — the sketch
  is verified, not just smoke-tested (weaker than equality, but
  deterministic: both sketch implementations are deterministic
  functions of the data);
* regexp battery guards NULL text identically on both sides and joins
  arrays to '|' strings (list-representation differences).

Scale notes (SCALE.md): SCD2 is one shuffle on the business key —
windows and the change-collapse filter share it; the rolling window is
one shuffle on custkey over pre-aggregated day rows; sketches are the
POINT at 100 TB — approx_count_distinct and approx_percentile are
single-pass, mergeable, fixed-memory partial aggregates where the exact
forms need a full shuffle of distinct values; regexp extraction is
embarrassingly parallel JVM codegen (no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.plans.catalog import _t, register


@register(
    "scd2_customer_priority",
    """
    WITH ordered AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
             lag(o_orderpriority) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
      FROM orders
    ), chg AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
      FROM ordered WHERE prev IS NULL OR prev <> o_orderpriority
    )
    SELECT o_custkey AS custkey, o_orderpriority AS priority,
           strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
           strftime(lead(o_orderdate) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             '%Y-%m-%d') AS valid_to,
           lead(o_orderdate) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             IS NULL AS is_current
    FROM chg ORDER BY custkey, valid_from, priority
    """,
    tags=["etl", "scd2", "window"],
)
def scd2_customer_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 build: treat each customer's order stream as a change
    log of their o_orderpriority attribute, collapse consecutive
    no-change rows, and emit versioned rows with [valid_from, valid_to)
    intervals and an is_current flag. Replaces the reference's
    history-destroying upsert (dag.py:380-421) with full history. One
    shuffle on o_custkey — the lag, the change filter, and the lead all
    share the partitioning."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    chg = (
        orders.select(
            "o_custkey",
            "o_orderpriority",
            "o_orderdate",
            "o_orderkey",
            F.lag("o_orderpriority").over(w).alias("prev"),
        )
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("o_orderpriority")))
        .drop("prev")
    )
    vt = F.lead("o_orderdate").over(w)
    return chg.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("valid_from"),
        F.date_format(vt, "yyyy-MM-dd").alias("valid_to"),
        vt.isNull().alias("is_current"),
    ).orderBy("custkey", "valid_from", "priority")


@register(
    "rolling_7d_revenue",
    """
    WITH d AS (
      SELECT o_custkey AS custkey,
             strftime(o_orderdate, '%Y-%m-%d') AS day,
             CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS dnum,
             round(sum(o_totalprice), 2) AS day_rev
      FROM orders GROUP BY 1, 2, 3
    )
    SELECT custkey, day, day_rev,
           round(sum(day_rev) OVER (
             PARTITION BY custkey ORDER BY dnum
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS rev_7d
    FROM d ORDER BY custkey, day
    """,
    tags=["timeseries", "window", "range-frame"],
)
def rolling_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day revenue per customer via a RANGE frame over
    integer day numbers — a time-range window, not a row-count one
    (days with no orders still shrink the frame). Pre-aggregating to
    (customer, day) first bounds the window input to one row per day,
    and the frame sums 2-dp-rounded day revenues so engine frame-order
    differences stay ~1 ulp. One shuffle on custkey shared by the
    day-level agg and the window."""
    orders = _t(spark, sf_dir, "orders")
    d = orders.groupBy(
        F.col("o_custkey").alias("custkey"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("dnum"),
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("day_rev"))
    w = Window.partitionBy("custkey").orderBy("dnum").rangeBetween(-6, 0)
    return d.select(
        "custkey",
        "day",
        "day_rev",
        F.round(F.sum("day_rev").over(w), 2).alias("rev_7d"),
    ).orderBy("custkey", "day")


@register(
    "sketch_tolerance_battery",
    """
    SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS hll_within_10pct,
           round(quantile_cont(value, 0.5), 4) AS median_value,
           TRUE AS apx_median_within_10pct
    FROM events
    """,
    tags=["sketch", "approx", "scale"],
)
def sketch_tolerance_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates verified against their exact counterparts in
    one pass: HyperLogLog++ distinct users (approx_count_distinct, rsd
    0.05) and t-digest-style approx median (approx_percentile, accuracy
    10000) must land within 10% of the exact statistics computed in the
    SAME aggregation. The oracle checks the exact values and the
    literal-TRUE band flags. At 100 TB the sketches are the production
    path — single-pass, mergeable, fixed-memory partial aggregates —
    and this query is the continuous calibration check against them."""
    ev = _t(spark, sf_dir, "events")
    s = ev.agg(
        F.count_distinct("user_id").cast("long").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.05).alias("hll"),
        F.expr("percentile(value, 0.5D)").alias("med"),
        F.expr("approx_percentile(value, 0.5D, 10000)").alias("apx"),
    )
    return s.select(
        "exact_users",
        (
            F.abs(F.col("hll") - F.col("exact_users"))
            <= 0.1 * F.col("exact_users")
        ).alias("hll_within_10pct"),
        F.round("med", 4).alias("median_value"),
        (F.abs(F.col("apx") - F.col("med")) <= 0.1 * F.abs(F.col("med"))).alias(
            "apx_median_within_10pct"
        ),
    )


@register(
    "regex_extract_all_battery",
    """
    SELECT doc_id,
           array_to_string(regexp_extract_all(text, '[A-Za-z]{5,}'), '|')
             AS long_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]{5,}')) AS BIGINT)
             AS n_tokens,
           CAST(len(list_distinct(regexp_extract_all(text, '[A-Za-z]{5,}')))
             AS BIGINT) AS n_distinct
    FROM documents WHERE text IS NOT NULL
    ORDER BY doc_id
    """,
    tags=["text", "regex", "extract"],
)
def regex_extract_all_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk regexp extraction: ALL matches of a pattern per document
    (the reference's re.findall at dag.py:132-140 generalized from
    first-match ladders), plus match and distinct-match counts. The
    pattern sticks to the regex subset Java and RE2-ish dialects agree
    on (character classes + bounded repetition). Pure JVM codegen — no
    Python in the loop — and embarrassingly parallel at any scale."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = F.regexp_extract_all("text", F.lit("[A-Za-z]{5,}"), 0)
    return docs.select(
        "doc_id",
        F.array_join(toks, "|").alias("long_tokens"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
    ).orderBy("doc_id")


@register(
    "scd2_point_in_time_join",
    """
    WITH ordered AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
             lag(o_orderpriority) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
      FROM orders
    ), chg AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
      FROM ordered WHERE prev IS NULL OR prev <> o_orderpriority
    ), vers AS (
      SELECT o_custkey AS custkey, o_orderdate AS vdate,
             o_orderpriority AS priority
      FROM (
        SELECT *, row_number() OVER (
          PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn
        FROM chg
      ) WHERE rn = 1
    )
    SELECT e.o_orderkey, e.o_custkey AS custkey,
           strftime(e.o_orderdate, '%Y-%m-%d') AS order_date,
           v.priority AS priority_asof
    FROM orders e ASOF JOIN vers v
      ON e.o_custkey = v.custkey AND e.o_orderdate >= v.vdate
    """,
    tags=["etl", "scd2", "asof"],
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (versioned-dimension) join: every order picks up
    the attribute version valid AT its date — the read side of SCD2,
    done with the engine's as-of operator (union + window: one shuffle
    on the key, NO per-key range blowup) composed against the same
    change-log the scd2_customer_priority build emits. The version
    table is deduped to one change per (custkey, date) so the as-of
    pick is unambiguous; the oracle runs DuckDB's NATIVE ASOF JOIN —
    two entirely different physical strategies, same rows."""
    from reddit_tech_jobs_data_pipeline_spark.operators.asof import asof_join

    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    chg = (
        orders.select(
            "o_custkey",
            "o_orderpriority",
            "o_orderdate",
            "o_orderkey",
            F.lag("o_orderpriority").over(w).alias("prev"),
        )
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("o_orderpriority")))
        .drop("prev")
    )
    w2 = Window.partitionBy("o_custkey", "o_orderdate").orderBy(F.col("o_orderkey").desc())
    vers = (
        chg.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderdate").alias("o_orderdate"),
            F.col("o_orderpriority").alias("priority"),
        )
    )
    ev = orders.select(
        "o_orderkey", F.col("o_custkey").alias("custkey"), "o_orderdate"
    )
    joined = asof_join(ev, vers, by=["custkey"], ts_col="o_orderdate", payload_cols=["priority"])
    return joined.select(
        "o_orderkey",
        "custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.col("priority_asof"),
    )


# ===========================================================================
# Z-order (Morton) layout audit — the Delta/Iceberg OPTIMIZE ZORDER
# story, measured: interleave the bits of two quantized sort keys,
# chunk rows into files along that order, and compare per-file min/max
# span + point-slice file pruning against the row-major (x-then-y) sort.
# Pure integer arithmetic end to end -> hash-exact across engines.
# ===========================================================================


@register(
    "zorder_layout_audit",
    """
    WITH q AS (
      SELECT l_orderkey, l_linenumber,
             CAST(floor(l_partkey * 16.0 / ((SELECT max(l_partkey) FROM lineitem) + 1)) AS BIGINT) AS qx,
             CAST(floor(l_suppkey * 16.0 / ((SELECT max(l_suppkey) FROM lineitem) + 1)) AS BIGINT) AS qy
      FROM lineitem
    ),
    m AS (
      SELECT *,
             (((qx >> 0) & 1) << 0) + (((qy >> 0) & 1) << 1)
           + (((qx >> 1) & 1) << 2) + (((qy >> 1) & 1) << 3)
           + (((qx >> 2) & 1) << 4) + (((qy >> 2) & 1) << 5)
           + (((qx >> 3) & 1) << 6) + (((qy >> 3) & 1) << 7) AS morton,
             qx * 16 + qy AS rowmajor
      FROM q
    ),
    files AS (
      SELECT 'zorder' AS layout, qx, qy,
             ntile(32) OVER (ORDER BY morton, l_orderkey, l_linenumber) AS file_id
      FROM m
      UNION ALL
      SELECT 'rowmajor' AS layout, qx, qy,
             ntile(32) OVER (ORDER BY rowmajor, l_orderkey, l_linenumber) AS file_id
      FROM m
    ),
    stats AS (
      SELECT layout, file_id,
             max(qx) - min(qx) AS x_span, max(qy) - min(qy) AS y_span,
             min(qy) AS y_min, max(qy) AS y_max
      FROM files GROUP BY layout, file_id
    )
    SELECT layout,
           round(avg(x_span), 4) AS avg_x_span,
           round(avg(y_span), 4) AS avg_y_span,
           CAST(max(x_span) AS BIGINT) AS max_x_span,
           CAST(max(y_span) AS BIGINT) AS max_y_span,
           CAST(sum(CASE WHEN y_min <= 5 AND 5 <= y_max THEN 1 ELSE 0 END) AS BIGINT)
             AS files_hit_y5
    FROM stats GROUP BY layout
    """,
    tags=["etl", "layout", "scale"],
)
def zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton/Z-order clustering audit: quantize (l_partkey, l_suppkey)
    to a 16x16 grid, bit-interleave into a Morton code, chunk the sorted
    order into 32 files, and report per-file min/max spans of BOTH
    dimensions plus how many files a point-slice on the SECOND dimension
    (qy = 5) must read. Row-major sorting pins x perfectly but smears y
    across every file (files_hit_y5 = all files holding the slice's x
    range); Z-order bounds both spans, so min/max file stats prune
    multi-dimensional predicates — the measurable payoff of
    OPTIMIZE ZORDER in Delta/Iceberg, reproduced on plain parquet.

    Integer-exact throughout (bit ops, ntile ranks, integer spans; the
    one division quantizes via floor to BIGINT), so the oracle
    hash-matches. The ntile window is a global sort — exactly what a
    layout-rewrite job does (repartitionByRange(morton) at 100 TB writes
    the same order without a single-task window; the audit here reads
    the SAME file boundaries on both engines, which needs the total
    order pinned by (morton, l_orderkey, l_linenumber))."""
    li = _t(spark, sf_dir, "lineitem")
    mx = li.agg(
        F.max("l_partkey").alias("mxp"), F.max("l_suppkey").alias("mxs")
    )
    q = li.join(F.broadcast(mx)).select(
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("l_partkey") * 16.0 / (F.col("mxp") + 1)).alias("qx"),
        F.floor(F.col("l_suppkey") * 16.0 / (F.col("mxs") + 1)).alias("qy"),
    )
    morton = None
    for i in range(4):
        for col, off in (("qx", 0), ("qy", 1)):
            term = F.shiftleft(
                F.shiftright(F.col(col), i).bitwiseAND(F.lit(1)), 2 * i + off
            )
            morton = term if morton is None else morton + term
    m = q.select(
        "*",
        morton.alias("morton"),
        (F.col("qx") * 16 + F.col("qy")).alias("rowmajor"),
    )
    files = None
    for layout, key in (("zorder", "morton"), ("rowmajor", "rowmajor")):
        f = m.select(
            F.lit(layout).alias("layout"),
            "qx",
            "qy",
            F.ntile(32)
            .over(Window.orderBy(key, "l_orderkey", "l_linenumber"))
            .alias("file_id"),
        )
        files = f if files is None else files.unionByName(f)
    stats = files.groupBy("layout", "file_id").agg(
        (F.max("qx") - F.min("qx")).alias("x_span"),
        (F.max("qy") - F.min("qy")).alias("y_span"),
        F.min("qy").alias("y_min"),
        F.max("qy").alias("y_max"),
    )
    return stats.groupBy("layout").agg(
        F.round(F.avg("x_span"), 4).alias("avg_x_span"),
        F.round(F.avg("y_span"), 4).alias("avg_y_span"),
        F.max("x_span").cast("long").alias("max_x_span"),
        F.max("y_span").cast("long").alias("max_y_span"),
        F.sum(
            ((F.col("y_min") <= 5) & (F.lit(5) <= F.col("y_max"))).cast("int")
        )
        .cast("long")
        .alias("files_hit_y5"),
    )
