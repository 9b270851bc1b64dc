"""Query catalogs. Importing this package registers every catalog module
into the shared REGISTRY (catalog = reference surface, catalog_scale =
LLM-data-pipeline scale operators)."""

from reddit_tech_jobs_data_pipeline_spark.plans import (  # noqa: F401
    catalog,
    catalog_analytics,
    catalog_behavior,
    catalog_corpus,
    catalog_drift,
    catalog_etl,
    catalog_hof,
    catalog_posts,
    catalog_quality,
    catalog_sampling,
    catalog_sources,
    catalog_scale,
    catalog_sessions,
    catalog_sql,
    catalog_stats,
    catalog_timeseries,
    catalog_tpch,
    catalog_tpch2,
)
