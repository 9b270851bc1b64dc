"""HTML record parsing as native column expressions (S2, SURVEY.md §2.1).

The reference BeautifulSoup-parses one record per ``div.thing`` and pulls
fields from attributes/child elements (dags/dag.py:204-249). The engine's
scale path lands raw HTML as a string column and extracts the same fields
with ``regexp_extract`` — JVM-side, codegen'd, no Python parser in the hot
loop. (The interactive scrape path lives in sources/reddit_source.py as a
Python Data Source; this module is the set-oriented equivalent.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.functions.extract import parse_leading_int, ts_from_millis


def _attr(html: Column, name: str) -> Column:
    return F.nullif(F.regexp_extract(html, f'{name}="([^"]*)"', 1), F.lit(""))


def parse_post_records(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Extract the reference's post fields from one-record-per-row HTML.

    Field mapping mirrors dag.py:212-249: data-fullname -> post_id,
    a.title text -> title, a.title href -> url, data-author -> author,
    data-timestamp (unix ms) -> created_datetime, data-score -> upvotes,
    a.comments text -> comments_count (leading int, 0 default).
    """
    h = F.col(html_col)
    return df.select(
        _attr(h, "data-fullname").alias("post_id"),
        F.nullif(
            F.regexp_extract(h, r'<a[^>]*class="title"[^>]*>([^<]*)</a>', 1), F.lit("")
        ).alias("title"),
        F.nullif(
            F.regexp_extract(h, r'<a[^>]*class="title"[^>]*href="([^"]*)"', 1), F.lit("")
        ).alias("url"),
        _attr(h, "data-author").alias("author"),
        ts_from_millis(_attr(h, "data-timestamp")).alias("created_datetime"),
        _attr(h, "data-score").cast("int").alias("upvotes"),
        parse_leading_int(
            F.regexp_extract(h, r'<a[^>]*class="comments"[^>]*>([^<]*)</a>', 1)
        ).alias("comments_count"),
        (_attr(h, "data-stickied") == "true").alias("is_pinned"),
    )


def drop_pinned(df: DataFrame) -> DataFrame:
    """S5 — skip stickied rows (reference drops the first record per page,
    dag.py:207-209; the flag-based filter is the set-oriented analog)."""
    return df.filter(~F.coalesce(F.col("is_pinned"), F.lit(False))).drop("is_pinned")
