"""The reference pipeline end-to-end as one oracle-checked query.

Synthesizes a deterministic raw-post corpus from ``part`` whose titles
exercise the REAL reference vocabulary (job keywords, salary ranges,
position/location/field ladders, tech dictionary, negative keywords,
duplicate injection), then runs the full silver transform
(dedup → enrich → validity filter — reference dags/dag.py:294-365) on
Spark, with a DuckDB oracle generated from the same vocab constants.

This is the parity centerpiece: every P1-P5/F2/F3/D1 semantic from
SURVEY.md §2 in one query, hash-compared.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark import pipeline
from reddit_tech_jobs_data_pipeline_spark.functions import vocab
from reddit_tech_jobs_data_pipeline_spark.plans.catalog import _t, register

# ---------------------------------------------------------------------------
# deterministic title corpus from `part`
# ---------------------------------------------------------------------------

_TITLE_CASES_SQL = """
  CASE p_partkey % 7
    WHEN 0 THEN 'Hiring Data Engineer usd ' || CAST(p_size AS VARCHAR) || 'k - '
                || CAST(p_size * 2 AS VARCHAR) || 'k Remote python aws ' || p_name
    WHEN 1 THEN 'Question about ' || p_name || ' salaries'
    WHEN 2 THEN p_name || ' contractor 85k - 95k London sql'
    WHEN 3 THEN 'Looking for advice on ' || p_name
    WHEN 4 THEN 'ML Engineer opportunity in Berlin, Machine Learning, pytorch tensorflow £70.5k - 90k'
    WHEN 5 THEN 'We are hiring a Research Scientist - Zurich - NLP ' || p_name
    ELSE 'open discussion: compensation megathread ' || p_name
  END
"""


def _titles_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    pk, sz, nm = F.col("p_partkey"), F.col("p_size"), F.col("p_name")
    title = (
        F.when(pk % 7 == 0, F.concat(F.lit("Hiring Data Engineer usd "), sz.cast("string"),
                                     F.lit("k - "), (sz * 2).cast("string"),
                                     F.lit("k Remote python aws "), nm))
        .when(pk % 7 == 1, F.concat(F.lit("Question about "), nm, F.lit(" salaries")))
        .when(pk % 7 == 2, F.concat(nm, F.lit(" contractor 85k - 95k London sql")))
        .when(pk % 7 == 3, F.concat(F.lit("Looking for advice on "), nm))
        .when(pk % 7 == 4, F.lit("ML Engineer opportunity in Berlin, Machine Learning, pytorch tensorflow £70.5k - 90k"))
        .when(pk % 7 == 5, F.concat(F.lit("We are hiring a Research Scientist - Zurich - NLP "), nm))
        .otherwise(F.concat(F.lit("open discussion: compensation megathread "), nm))
    )
    base = part.select(
        F.concat(F.lit("t3_"), pk.cast("string")).alias("post_id"),
        title.alias("title"),
        pk.alias("scrape_seq"),
    )
    # duplicate injection: every 5th post scraped again later (higher seq)
    dups = base.filter(F.col("scrape_seq") % 5 == 0).withColumn(
        "scrape_seq", F.col("scrape_seq") + 1000000
    )
    return base.unionByName(dups)


_CORPUS_SQL = f"""
  base AS (
    SELECT 't3_' || CAST(p_partkey AS VARCHAR) AS post_id,
           {_TITLE_CASES_SQL} AS title,
           p_partkey AS scrape_seq
    FROM part
  ),
  raw AS (
    SELECT * FROM base
    UNION ALL
    SELECT post_id, title, scrape_seq + 1000000 FROM base WHERE scrape_seq % 5 = 0
  ),
  deduped AS (
    SELECT post_id, title, scrape_seq FROM (
      SELECT *, row_number() OVER (PARTITION BY post_id, title ORDER BY scrape_seq) AS rn
      FROM raw
    ) WHERE rn = 1
  )
"""

# ---------------------------------------------------------------------------
# oracle enrichment SQL generated from the vocab constants
# ---------------------------------------------------------------------------

_SAL = vocab.SALARY_PATTERN
_SAL_MATCHED = f"regexp_extract(lt, '{_SAL}', 2) <> ''"


def _ladder_sql(patterns: list[str]) -> str:
    rungs = ", ".join(
        f"nullif(regexp_extract(title, '(?i){p}', 1), '')" for p in patterns
    )
    return f"coalesce({rungs})" if len(patterns) > 1 else rungs


_NEG_PAT = "|".join(_re.escape(k) for k in vocab.NEGATIVE_JOB_KEYWORDS)
_POS_PAT = "|".join(_re.escape(k) for k in vocab.POSITIVE_JOB_KEYWORDS)
_TECH_LIST = "['" + "','".join(vocab.TECH_KEYWORDS) + "']"

_ORACLE = f"""
    WITH {_CORPUS_SQL},
    enriched AS (
      SELECT post_id, title, lower(title) AS lt,
        list_filter(regexp_split_to_array(lower(title), '\\W+'), x -> x <> '') AS ws
      FROM deduped
    ),
    projected AS (
      SELECT post_id, title,
        CASE WHEN {_SAL_MATCHED}
             THEN coalesce(nullif(trim(regexp_extract(lt, '{_SAL}', 1)), ''), 'None')
        END AS salary_currency,
        CASE WHEN {_SAL_MATCHED}
             THEN CAST(regexp_extract(lt, '{_SAL}', 2) AS DOUBLE) * 1000
        END AS lower_salary,
        CASE WHEN {_SAL_MATCHED}
             THEN CAST(regexp_extract(lt, '{_SAL}', 3) AS DOUBLE) * 1000
        END AS upper_salary,
        {_ladder_sql(list(vocab.JOB_POSITION_PATTERNS))} AS job_position,
        {_ladder_sql(list(vocab.LOCATION_PATTERNS))} AS location,
        {_ladder_sql([vocab.FIELD_PATTERN])} AS field,
        coalesce(array_to_string(
          list_sort(list_filter({_TECH_LIST}::VARCHAR[], k -> list_contains(ws, k))), ','), '')
          AS technologies,
        (NOT regexp_matches(lt, '{_NEG_PAT}')) AND regexp_matches(lt, '{_POS_PAT}')
          AS is_job
      FROM enriched
    )
    SELECT post_id, title, salary_currency, lower_salary, upper_salary,
           job_position, location, field, technologies
    FROM projected
    WHERE is_job OR lower_salary IS NOT NULL OR upper_salary IS NOT NULL
"""


@register("posts_pipeline_e2e", _ORACLE, tags=["pipeline", "flagship"])
def posts_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = _titles_df(spark, sf_dir)
    out = pipeline.transform(raw)
    return out.select(
        "post_id",
        "title",
        "salary_currency",
        "lower_salary",
        "upper_salary",
        "job_position",
        "location",
        "field",
        F.array_join("technologies", ",").alias("technologies"),
    )
