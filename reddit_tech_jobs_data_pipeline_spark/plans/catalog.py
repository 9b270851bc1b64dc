"""Query catalog: every implemented operator as a (Spark query, DuckDB
oracle SQL) pair over the driver's synthetic tables.

Contract (driver __spark_entry__.py): each entry's Spark callable takes
(spark, sf_dir) and returns a DataFrame; the oracle is ANSI SQL DuckDB runs
on the same parquet (views pre-registered). The driver compares row count +
schema + order-insensitive value hash, sorting columns by name — so both
sides alias every computed column identically.

Determinism rules applied throughout (SURVEY.md §5):
* double aggregates rounded (2 dp for money-scale sums where the two
  engines' summation orders can differ by ~1e-4 absolute; 4 dp for
  unit-scale ratios) identically on both sides;
* arrays serialized with a join to a single string (robust to list-type
  representation differences);
* timestamps reduced to DATE or epoch integers at the output boundary
  (Spark date_trunc returns TIMESTAMP where DuckDB returns DATE);
* every top-k has a total-order tiebreaker;
* no NOW()/current_timestamp — time anchors derive from the data.

Operator IDs (p1, f2, d1 …) refer to SURVEY.md §2's inventory.
"""

from __future__ import annotations

import re
from collections.abc import Callable
from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.functions import extract
from reddit_tech_jobs_data_pipeline_spark.operators import merge as merge_ops
from reddit_tech_jobs_data_pipeline_spark.pipeline import dedup_first_seen
from reddit_tech_jobs_data_pipeline_spark.sources.testdata import load_table


@dataclass
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only check
    tags: list[str] = dc_field(default_factory=list)


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, tags: list[str] | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name, fn, oracle, tags or [])
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Corpus vocabulary for the synthetic ``documents`` table (its text is drawn
# from a small word list — see TESTDATA.md). The reference vocab (job titles)
# would never match, so catalog queries parameterize the same operators with
# corpus-appropriate word lists; unit tests cover the faithful reference vocab.
# ---------------------------------------------------------------------------
CORPUS_TECH = ["spark", "hash", "vector", "stream", "batch", "window"]
CORPUS_POSITIVE = ["join", "merge", "sort"]
CORPUS_NEGATIVE = ["slow", "dup"]
CORPUS_LADDER = [r"(hash join|merge sort|table scan)", r"(join|merge|sort|scan)"]


# ===========================================================================
# Flagship: TPC-H Q1-style pricing summary (SURVEY §2.5 engine-level aggs)
# ===========================================================================
@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=["agg", "flagship"],
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ===========================================================================
# P1 — salary regex extraction (currency sentinel + ×1000 bounds)
# Titles synthesized deterministically from ``part`` so the pattern
# exercises match / no-currency / no-match branches.
# ===========================================================================
_SALARY_TITLE_SQL = (
    "p_name || CASE WHEN p_partkey % 3 = 0 THEN ' ' ELSE ' usd ' END || "
    "CAST(p_size AS VARCHAR) || 'k - ' || CAST(p_size * 2 AS VARCHAR) || 'k'"
)
_SALARY_PAT_SQL = r"([A-Za-z$€£]*)\s*(\d+(?:\.\d+)?)k\s?-\s?(\d+(?:\.\d+)?)k"


@register(
    "p1_salary_extract",
    f"""
    WITH titled AS (
      SELECT p_partkey,
             CASE WHEN p_partkey % 5 = 0 THEN p_name
                  ELSE {_SALARY_TITLE_SQL} END AS title
      FROM part
    ), m AS (
      SELECT p_partkey, title, lower(title) AS lt FROM titled
    )
    SELECT p_partkey, title,
      CASE WHEN regexp_extract(lt, '{_SALARY_PAT_SQL}', 2) <> ''
           THEN coalesce(nullif(trim(regexp_extract(lt, '{_SALARY_PAT_SQL}', 1)), ''), 'None')
      END AS salary_currency,
      CASE WHEN regexp_extract(lt, '{_SALARY_PAT_SQL}', 2) <> ''
           THEN CAST(regexp_extract(lt, '{_SALARY_PAT_SQL}', 2) AS DOUBLE) * 1000
      END AS lower_salary,
      CASE WHEN regexp_extract(lt, '{_SALARY_PAT_SQL}', 2) <> ''
           THEN CAST(regexp_extract(lt, '{_SALARY_PAT_SQL}', 3) AS DOUBLE) * 1000
      END AS upper_salary
    FROM m
    """,
    tags=["projection", "regex"],
)
def p1_salary_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    title = F.when(
        F.col("p_partkey") % 5 == 0, F.col("p_name")
    ).otherwise(
        F.concat(
            F.col("p_name"),
            F.when(F.col("p_partkey") % 3 == 0, F.lit(" ")).otherwise(F.lit(" usd ")),
            F.col("p_size").cast("string"),
            F.lit("k - "),
            (F.col("p_size") * 2).cast("string"),
            F.lit("k"),
        )
    )
    df = part.select("p_partkey", title.alias("title"))
    return df.select(
        "p_partkey",
        "title",
        extract.salary_currency(F.col("title")).alias("salary_currency"),
        extract.salary_bound(F.col("title"), "lower").alias("lower_salary"),
        extract.salary_bound(F.col("title"), "upper").alias("upper_salary"),
    )


# ===========================================================================
# P2/P3/P4 — ordered first-match ladder over documents.text
# ===========================================================================
@register(
    "p2_first_match_ladder",
    """
    SELECT doc_id,
      coalesce(
        nullif(regexp_extract(text, '(?i)(hash join|merge sort|table scan)', 1), ''),
        nullif(regexp_extract(text, '(?i)(join|merge|sort|scan)', 1), '')
      ) AS matched_phrase
    FROM documents
    """,
    tags=["projection", "regex"],
)
def p2_first_match_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", extract.first_match(F.col("text"), CORPUS_LADDER).alias("matched_phrase")
    )


# ===========================================================================
# P5 — dictionary detection over token set (sorted array → string)
# ===========================================================================
@register(
    "p5_technologies",
    f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\\W+'), x -> x <> '') AS ws
      FROM documents
    )
    SELECT doc_id,
           coalesce(array_to_string(
             list_sort(list_filter({CORPUS_TECH!r}::VARCHAR[], k -> list_contains(ws, k))),
             ','), '') AS technologies
    FROM toks
    """,
    tags=["projection", "array"],
)
def p5_technologies(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.array_join(extract.technologies(F.col("text"), CORPUS_TECH), ",").alias("technologies"),
    )


# ===========================================================================
# F2/F3 — keyword classifier predicate + validity filter
# ===========================================================================
@register(
    "f2_keyword_filter",
    """
    SELECT doc_id, text
    FROM documents
    WHERE NOT regexp_matches(lower(text), 'slow|dup')
      AND regexp_matches(lower(text), 'join|merge|sort')
    """,
    tags=["filter"],
)
def f2_keyword_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.filter(
        extract.is_job_post(F.col("text"), positive=CORPUS_POSITIVE, negative=CORPUS_NEGATIVE)
    ).select("doc_id", "text")


# ===========================================================================
# F1 — closed-interval timestamp range filter (dag.py:227)
# ===========================================================================
@register(
    "f1_ts_range_filter",
    """
    SELECT event_id, user_id, event_type, round(value, 2) AS value
    FROM events
    WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00' AND TIMESTAMP '2024-01-20 00:00:00'
    """,
    tags=["filter"],
)
def f1_ts_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.filter(
        F.col("ts").between("2024-01-10 00:00:00", "2024-01-20 00:00:00")
    ).select("event_id", "user_id", "event_type", F.round("value", 2).alias("value"))


# ===========================================================================
# P6 — unix-ms ↔ timestamp conversion (dag.py:221-224)
# ===========================================================================
@register(
    "p6_ts_millis_roundtrip",
    """
    SELECT event_id,
           epoch_ms(ts) AS ts_millis,
           strftime(ts, '%Y-%m-%d') AS ts_date
    FROM events
    WHERE event_id % 7 = 0
    """,
    tags=["projection", "time"],
)
def p6_ts_millis_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0)
    ms = F.unix_millis(F.col("ts")).alias("ts_millis")
    # round-trip back through the P6 builder, then reduce to DATE for a
    # representation-stable comparison
    return ev.select(
        "event_id", ms, F.date_format(extract.ts_from_millis(F.unix_millis(F.col("ts"))), "yyyy-MM-dd").alias("ts_date")
    )


# ===========================================================================
# P8 — leading-integer parse with 0 default (dag.py:230-237)
# ===========================================================================
@register(
    "p8_leading_int",
    """
    WITH t AS (
      SELECT doc_id,
             CASE WHEN doc_id % 4 = 0 THEN CAST(n_chars AS VARCHAR) || ' comments'
                  WHEN doc_id % 4 = 1 THEN 'comment'
                  WHEN doc_id % 4 = 2 THEN '  ' || CAST(n_chars AS VARCHAR) || 'x tail'
                  ELSE NULL END AS raw
      FROM documents
    )
    SELECT doc_id,
      CASE WHEN regexp_extract(trim(coalesce(raw, '')), '^(\\S+)', 1) ~ '^\\d+$'
           THEN CAST(regexp_extract(trim(raw), '^(\\S+)', 1) AS INTEGER)
           ELSE 0 END AS comments_count
    FROM t
    """,
    tags=["projection"],
)
def p8_leading_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    raw = (
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.col("n_chars").cast("string"), F.lit(" comments")))
        .when(F.col("doc_id") % 4 == 1, F.lit("comment"))
        .when(F.col("doc_id") % 4 == 2, F.concat(F.lit("  "), F.col("n_chars").cast("string"), F.lit("x tail")))
    )
    return docs.select(
        "doc_id", extract.parse_leading_int(raw).alias("comments_count")
    )


# ===========================================================================
# D1 — deterministic first-seen dedup (dag.py:322)
# ===========================================================================
@register(
    "d1_dedup_first_seen",
    """
    SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber
    FROM (
      SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber,
             row_number() OVER (PARTITION BY l_partkey, l_suppkey
                                ORDER BY l_orderkey, l_linenumber) AS rn
      FROM lineitem
    ) WHERE rn = 1
    """,
    tags=["dedup"],
)
def d1_dedup_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "__seq", F.col("l_orderkey") * 10 + F.col("l_linenumber")
    )
    return dedup_first_seen(li, ["l_partkey", "l_suppkey"], "__seq").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_linenumber"
    )


# ===========================================================================
# D2/S8 — keyed last-writer-wins merge (ON CONFLICT DO UPDATE analog)
# ===========================================================================
@register(
    "d2_merge_upsert",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 10 = 0 THEN round(o_totalprice + 1000, 2)
                ELSE round(o_totalprice, 2) END AS o_totalprice,
           CASE WHEN o_orderkey % 10 = 0 THEN 2 ELSE 1 END AS version
    FROM orders
    """,
    tags=["merge", "dedup"],
)
def d2_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", F.lit(1).alias("version")
    )
    updates = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1000)
        .withColumn("version", F.lit(2))
    )
    merged = merge_ops.merge_upsert(orders, updates, ["o_orderkey"], "version")
    return merged.select(
        "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "version"
    )


# ===========================================================================
# A1/F4 — watermark probe: filtered MAX with fallback (dag.py:144-170)
# ===========================================================================
@register(
    "a1_watermark_max",
    """
    SELECT strftime(max(o_orderdate), '%Y-%m-%d') AS watermark
    FROM orders
    WHERE o_orderdate >= (SELECT max(o_orderdate) FROM orders) - INTERVAL 30 DAY
    """,
    tags=["agg", "scalar"],
)
def a1_watermark_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    anchor = orders.agg(F.max("o_orderdate")).first()[0]
    wm = merge_ops.watermark_lower_bound(orders, "o_orderdate", now=anchor, lookback_days=30)
    return spark.createDataFrame([(wm.strftime("%Y-%m-%d"),)], "watermark string")


# ===========================================================================
# Engine-level analytics (SURVEY §2.5: the queries the sink exists to serve)
# ===========================================================================
@register(
    "events_per_day",
    """
    SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=["agg", "time"],
)
def events_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@register(
    "top_revenue_customers",
    """
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 10
    """,
    tags=["join", "agg", "topk"],
)
def top_revenue_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 customers by lineitem revenue with nation attached —
    TakeOrderedAndProject top-k, no global sort."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    # dimension sides broadcast: customer and nation are small at any SF we
    # test; at 100 TB customer would exceed the threshold and AQE falls back
    # to sort-merge — the plan stays valid either way.
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(10)
    )


@register(
    "running_total_window",
    """
    SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
    FROM orders
    """,
    tags=["window"],
)
def running_total_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


# Window rotation: the driver's per-round correctness gate verifies the
# FIRST 50 entries of queries() in order. Registration order front-loads
# the reference surface; this pinned list additionally promotes one
# representative per NEWEST round-family into the sampled window, so the
# external gate always covers recent work instead of nothing newer than
# round 8 (r10 advisor item 3). Promoted names are hoisted to a fixed
# position right after the reference+structure block; every displaced
# query remains value-checked by the full-catalog tools/check_oracle.py
# run. Membership changes are recorded in CORRECTNESS_WINDOW.md
# (tools/window_membership.py --write; tests/test_window_membership.py
# fails the suite when the file drifts from the live registry).
_WINDOW_PROMOTED = [
    "srp_lsh_ann_topk",          # r10: SRP-LSH ANN
    "streaming_cusum_monitor",   # r10: restartable streaming CUSUM
    "ann_srp_index_topk",        # r11: persisted SRP index probe
    "knn_label_vote_accuracy",   # r11 stats2 family (holdout bounded r12)
    "streaming_pq_index_ingest",       # r12: streaming index ingest (r12 item 3)
    "streaming_video_dedup_ingest",    # r13: per-frame vote dedup-at-ingest
    "multimodal_combined_clusters",    # r13: cross-modal duplicate identity
]
_PROMOTE_AT = 26  # after the reference-surface + hygiene/classifier block


def _window_order(names: list[str]) -> list[str]:
    promoted = [n for n in _WINDOW_PROMOTED if n in REGISTRY]
    rest = [n for n in names if n not in set(promoted)]
    return rest[:_PROMOTE_AT] + promoted + rest[_PROMOTE_AT:]


def get_registry() -> dict[str, QuerySpec]:
    # import for side effect: registers the other catalog modules.
    # REGISTRATION ORDER is owned by plans/__init__.py (the package
    # import triggers it first — see its docstring: the driver samples
    # the first 50 registered queries); this list only guarantees
    # completeness when catalog is imported directly.
    from reddit_tech_jobs_data_pipeline_spark.plans import (  # noqa: F401
        catalog_analytics,
        catalog_behavior,
        catalog_corpus,
        catalog_drift,
        catalog_etl,
        catalog_hof,
        catalog_pipelineops,
        catalog_posts,
        catalog_quality,
        catalog_sampling,
        catalog_scale,
        catalog_sessions,
        catalog_sources,
        catalog_sql,
        catalog_stats,
        catalog_stats2,
        catalog_structure,
        catalog_timeseries,
        catalog_tpch,
        catalog_tpch2,
    )

    return {n: REGISTRY[n] for n in _window_order(list(REGISTRY))}
