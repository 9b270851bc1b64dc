"""Source-side operators as oracle-checked queries: HTML record parse
(S2/S5/S4), ISO-8601 serialization casts (P7), and permissive
corrupt-record quarantine (F5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.plans.catalog import _t, register
from reddit_tech_jobs_data_pipeline_spark.sources.html_parse import drop_pinned, parse_post_records
from reddit_tech_jobs_data_pipeline_spark.workdirs import stable_work_key

# deterministic HTML synthesis from documents — same construction on both
# engines; every 25th record is the pinned/stickied one (S5)
_HTML_SQL = """
  '<div class="thing" data-fullname="t3_' || CAST(doc_id AS VARCHAR) || '"'
  || CASE WHEN doc_id % 25 = 0 THEN ' data-stickied="true"' ELSE '' END
  || ' data-author="user' || CAST(doc_id % 50 AS VARCHAR)
  || '" data-timestamp="' || CAST(1704067200000 + doc_id * 3600000 AS VARCHAR)
  || '" data-score="' || CAST(n_chars AS VARCHAR)
  || '"><p class="title"><a class="title" href="https://ex.am/p/' || CAST(doc_id AS VARCHAR)
  || '">' || substr(coalesce(text, ''), 1, 40)
  || '</a></p><a class="comments">' || CAST(doc_id % 40 AS VARCHAR) || ' comments</a></div>'
"""


def _html_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    d, n = F.col("doc_id"), F.col("n_chars")
    html = F.concat(
        F.lit('<div class="thing" data-fullname="t3_'), d.cast("string"), F.lit('"'),
        F.when(d % 25 == 0, F.lit(' data-stickied="true"')).otherwise(F.lit("")),
        F.lit(' data-author="user'), (d % 50).cast("string"),
        F.lit('" data-timestamp="'), (F.lit(1704067200000) + d * 3600000).cast("string"),
        F.lit('" data-score="'), n.cast("string"),
        F.lit('"><p class="title"><a class="title" href="https://ex.am/p/'), d.cast("string"),
        F.lit('">'), F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 40),
        F.lit('</a></p><a class="comments">'), (d % 40).cast("string"),
        F.lit(" comments</a></div>"),
    )
    return docs.select(html.alias("html"))


@register(
    "html_record_parse",
    f"""
    WITH pages AS (SELECT {_HTML_SQL} AS html FROM documents),
    parsed AS (
      SELECT
        nullif(regexp_extract(html, 'data-fullname="([^"]*)"', 1), '') AS post_id,
        nullif(regexp_extract(html, '<a[^>]*class="title"[^>]*>([^<]*)</a>', 1), '') AS title,
        nullif(regexp_extract(html, '<a[^>]*class="title"[^>]*href="([^"]*)"', 1), '') AS url,
        nullif(regexp_extract(html, 'data-author="([^"]*)"', 1), '') AS author,
        CAST(regexp_extract(html, 'data-timestamp="([^"]*)"', 1) AS BIGINT) AS ts_ms,
        CAST(regexp_extract(html, 'data-score="([^"]*)"', 1) AS INTEGER) AS upvotes,
        CASE WHEN regexp_extract(trim(regexp_extract(html, '<a[^>]*class="comments"[^>]*>([^<]*)</a>', 1)), '^(\\S+)', 1) ~ '^\\d+$'
             THEN CAST(regexp_extract(trim(regexp_extract(html, '<a[^>]*class="comments"[^>]*>([^<]*)</a>', 1)), '^(\\S+)', 1) AS INTEGER)
             ELSE 0 END AS comments_count,
        (regexp_extract(html, 'data-stickied="([^"]*)"', 1) = 'true') AS is_pinned
      FROM pages
    )
    SELECT post_id, title, url, author, ts_ms,
           strftime(epoch_ms(ts_ms), '%Y-%m-%dT%H:%M:%S') || 'Z' AS created_iso,
           upvotes, comments_count
    FROM parsed
    WHERE NOT coalesce(is_pinned, false)
      AND ts_ms >= 1704067200000 + 100 * 3600000
    """,
    tags=["source", "regex"],
)
def html_record_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 HTML field extraction + S5 pinned skip + S4 watermark bound +
    P7 ISO serialization — the whole scrape-parse stage, set-oriented."""
    from reddit_tech_jobs_data_pipeline_spark.functions.extract import ts_to_iso

    parsed = parse_post_records(_html_df(spark, sf_dir))
    out = drop_pinned(parsed)
    wm_ms = 1704067200000 + 100 * 3600000
    return (
        out.withColumn("ts_ms", F.unix_millis("created_datetime"))
        .filter(F.col("ts_ms") >= wm_ms)
        .select(
            "post_id",
            "title",
            "url",
            "author",
            "ts_ms",
            ts_to_iso(F.col("created_datetime")).alias("created_iso"),
            "upvotes",
            "comments_count",
        )
    )


@register(
    "corrupt_record_quarantine",
    """
    WITH raw AS (
      SELECT event_type,
             CASE WHEN event_id % 13 = 0 THEN '{bad' ELSE props END AS props_raw
      FROM events
    ),
    parsed AS (
      SELECT event_type,
             CASE WHEN json_valid(props_raw)
                  THEN json_extract_string(props_raw, '$.k') END AS k
      FROM raw
    )
    SELECT event_type,
           count(*) FILTER (WHERE k IS NOT NULL) AS n_valid,
           count(*) FILTER (WHERE k IS NULL)     AS n_quarantined,
           CAST(sum(CAST(k AS INTEGER)) AS BIGINT) AS sum_k
    FROM parsed GROUP BY event_type
    """,
    tags=["filter", "quality"],
)
def corrupt_record_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 — per-row error tolerance as a quarantine split instead of the
    reference's silent try/except skips (dag.py:270-272,417-419): corrupt
    payloads are counted aside, never dropped silently."""
    ev = _t(spark, sf_dir, "events")
    raw = ev.withColumn(
        "props_raw",
        F.when(F.col("event_id") % 13 == 0, F.lit("{bad")).otherwise(F.col("props")),
    )
    parsed = raw.withColumn("k", F.get_json_object("props_raw", "$.k"))
    return parsed.groupBy("event_type").agg(
        F.count(F.when(F.col("k").isNotNull(), 1)).alias("n_valid"),
        F.count(F.when(F.col("k").isNull(), 1)).alias("n_quarantined"),
        F.sum(F.col("k").cast("int")).alias("sum_k"),
    )


@register(
    "csv_permissive_quarantine",
    """
    WITH lines AS (
      SELECT doc_id,
        CASE WHEN doc_id % 11 = 0 THEN CAST(doc_id AS VARCHAR)
             WHEN doc_id % 13 = 0 THEN CAST(doc_id AS VARCHAR) || ',xERR'
             WHEN doc_id % 17 = 0 THEN CAST(doc_id AS VARCHAR) || ',' || CAST(n_chars AS VARCHAR) || ',extra'
             ELSE CAST(doc_id AS VARCHAR) || ',' || CAST(n_chars AS VARCHAR)
        END AS line
      FROM documents
    ),
    split AS (
      SELECT doc_id, line, str_split(line, ',') AS fs FROM lines
    )
    SELECT doc_id,
           TRY_CAST(fs[1] AS BIGINT) AS a,
           CASE WHEN length(fs) >= 2 THEN TRY_CAST(fs[2] AS BIGINT) END AS b,
           (length(fs) <> 2 OR TRY_CAST(fs[2] AS BIGINT) IS NULL) AS was_quarantined
    FROM split
    """,
    tags=["source", "csv", "errors"],
)
def csv_permissive_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV parse with PERMISSIVE per-row tolerance (§2.3 F5 for the CSV
    format): from_csv + columnNameOfCorruptRecord marks short rows, bad
    casts, and extra-field rows as quarantined while still salvaging the
    parseable fields (a missing trailing field parses as NULL; an extra
    field still yields both columns) — no task death, no row loss, the
    split the reference's try/except loop approximated one row at a
    time. The oracle reproduces the same triage with str_split +
    TRY_CAST."""
    docs = _t(spark, sf_dir, "documents")
    line = (
        F.when(F.col("doc_id") % 11 == 0, F.col("doc_id").cast("string"))
        .when(
            F.col("doc_id") % 13 == 0,
            F.concat(F.col("doc_id").cast("string"), F.lit(",xERR")),
        )
        .when(
            F.col("doc_id") % 17 == 0,
            F.concat_ws(
                ",",
                F.col("doc_id").cast("string"),
                F.col("n_chars").cast("string"),
                F.lit("extra"),
            ),
        )
        .otherwise(
            F.concat_ws(",", F.col("doc_id").cast("string"), F.col("n_chars").cast("string"))
        )
    )
    parsed = docs.select(
        "doc_id",
        F.from_csv(
            line,
            "a bigint, b bigint, _corrupt string",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("p"),
    )
    return parsed.select(
        "doc_id",
        F.col("p.a").alias("a"),
        F.col("p.b").alias("b"),
        F.col("p._corrupt").isNotNull().alias("was_quarantined"),
    )


@register(
    "udtf_table_arg_stats",
    """
    SELECT event_type, count(*) AS n,
           min(event_id) AS first_id, max(event_id) AS last_id
    FROM events GROUP BY event_type
    """,
    tags=["udtf", "source"],
)
def udtf_table_arg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TABLE-argument UDTF end-to-end: partition_stats consumes the
    events table PARTITION BY event_type ORDER BY event_id and emits one
    summary row per partition from terminate(); the oracle is the plain
    GROUP BY the custom walker must agree with (first/last under the
    declared order = min/max). Proves the partition-by + ordered-row
    delivery contract, not just the function body."""
    from reddit_tech_jobs_data_pipeline_spark.functions.udtfs import partition_stats

    spark.udtf.register("partition_stats_udtf", partition_stats)
    _t(spark, sf_dir, "events").select("event_id", "event_type").createOrReplaceTempView(
        "udtf_events_v"
    )
    return spark.sql(
        "SELECT * FROM partition_stats_udtf(TABLE(udtf_events_v) "
        "PARTITION BY event_type ORDER BY event_id)"
    )


@register(
    "orc_roundtrip_agg",
    """
    SELECT event_type,
           strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value,
           CAST(min(epoch_us(ts)) AS BIGINT) AS first_us
    FROM events
    GROUP BY event_type, day
    """,
    tags=["source", "sink", "format"],
)
def orc_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + source fidelity: write the events table to ORC, read
    it back, and aggregate — counts, a money-scale sum, and the min
    timestamp at microsecond precision must equal what the parquet
    oracle computes, proving the second columnar format's type mapping
    (LTZ timestamps, doubles, strings) roundtrips losslessly. ZLIB ORC
    with schema-on-read; partition layout is whatever the write's
    parallelism produced — the agg must not care.

    100 TB: a format-conversion pass is one read + one write, both
    embarrassingly parallel; the value here is the pinned type contract,
    not the shuffle (the agg is one map-side-combined groupBy)."""
    import os
    import tempfile

    ev = _t(spark, sf_dir, "events")
    path = os.path.join(
        tempfile.gettempdir(), f"spark_graft_orc_{stable_work_key(sf_dir)}"
    )
    ev.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.min(F.unix_micros("ts")).alias("first_us"),
    )
