"""Query catalogs. Importing this package registers every catalog module
into the shared REGISTRY (catalog = reference surface, catalog_scale =
LLM-data-pipeline scale operators).

ORDER MATTERS for external samplers: the driver's per-round CORRECTNESS
check verifies the FIRST 50 registered queries (verified against
CORRECTNESS_r0{4..8}.json — always registration order, indices 0-49), so
catalog_structure (the newest operator families: corpus hygiene, trained
quality classifier, HLL sketch stores) registers right after the
reference-surface catalog to keep recent work inside the sampled window.
Name-keyed consumers are order-insensitive."""

from reddit_tech_jobs_data_pipeline_spark.plans import (  # noqa: F401
    catalog,
    catalog_structure,
)
from reddit_tech_jobs_data_pipeline_spark.plans import (  # noqa: F401
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
    catalog_stats2,
    catalog_timeseries,
    catalog_tpch,
    catalog_tpch2,
)
