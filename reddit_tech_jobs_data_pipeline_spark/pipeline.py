"""The end-to-end posts pipeline: raw scrape records → enriched, filtered,
deduplicated posts → keyed merge into the gold table.

Mirrors the reference transform task order (dags/dag.py:294-365):
dedup (D1) → salary (P1) → job details (P2-P5) → validity filter (F3) —
but as one lazy DataFrame lineage (the reference crosses XCom/JSON between
every stage). The reference's two latent positional-index misalignment bugs
(dag.py:334-338, dag.py:345 — pandas .at/concat after drop_duplicates left
index gaps) cannot occur here: every derived column is computed on the same
rows via withColumns (SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.functions import extract


def dedup_first_seen(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """D1 — ``drop_duplicates(subset=keys)`` with pandas keep='first'
    semantics made deterministic: survivor = row with lowest ``order_col``
    (dag.py:322; SURVEY.md §7.4.6).

    Implemented as ``min_by(struct(payload), order)`` aggregation rather
    than a row_number window: the aggregate gets map-side partial
    combining (each upstream task pre-reduces its duplicates), so the
    shuffle carries one row per key per task instead of every duplicate,
    and no per-key sort is needed. At 100 TB with heavy duplication that
    is the difference between shuffling the corpus and shuffling the
    distinct keys. (Locally a row_number window is ~20% faster — CPU-bound
    regime; see SCALE.md.) Requires non-null ``order_col`` (min_by ignores
    null-ordered rows)."""
    others = [c for c in df.columns if c not in keys]
    packed = df.groupBy(*keys).agg(
        F.min_by(F.struct(*others), F.col(order_col)).alias("__s")
    )
    unpacked = packed.select(*keys, *[F.col(f"__s.{c}").alias(c) for c in others])
    return unpacked.select(*df.columns)


def enrich(df: DataFrame, title_col: str = "title") -> DataFrame:
    """P1-P5: salary triple, position/location/field ladders, technologies —
    all native expressions, one projection, no shuffle."""
    t = F.col(title_col)
    return df.withColumns(
        {
            "salary_currency": extract.salary_currency(t),
            "lower_salary": extract.salary_bound(t, "lower"),
            "upper_salary": extract.salary_bound(t, "upper"),
            "job_position": extract.job_position(t),
            "location": extract.location(t),
            "field": extract.field(t),
            "technologies": extract.technologies(t),
        }
    )


def validity_filter(df: DataFrame, title_col: str = "title") -> DataFrame:
    """F3 — keep rows where is_job_post(title) OR a salary bound extracted
    (dag.py:348-349). The flag is never materialized (P11: the reference
    adds then drops an ``is_valid_post`` column)."""
    keep = (
        extract.is_job_post(F.col(title_col))
        | F.col("lower_salary").isNotNull()
        | F.col("upper_salary").isNotNull()
    )
    return df.filter(keep)


def transform(raw: DataFrame) -> DataFrame:
    """Full silver transform: D1 → P1-P5 → F3 (reference task 2,
    dag.py:294-365)."""
    df = dedup_first_seen(raw, ["post_id", "title"], "scrape_seq")
    df = enrich(df)
    return validity_filter(df)
