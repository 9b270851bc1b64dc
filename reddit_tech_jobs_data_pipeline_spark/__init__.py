"""PySpark-native analytics engine with the capabilities of
wiktornazaruk/reddit_tech_jobs_data_pipeline (reference: an Airflow batch ETL
that scrapes job posts, enriches with regex/keyword extraction, dedups and
upserts into Postgres — see SURVEY.md).

This package re-expresses every reference operator as idiomatic Spark
DataFrame/SQL, and adds the large-scale training-data-pipeline operators
(dedup families, similarity search, text analysis, multimodal plumbing)
designed for a 1000-executor / 100 TB deployment while testable on local[*].
"""

from reddit_tech_jobs_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
