"""Distribution-drift monitoring queries — snapshot PSI and per-source
token-divergence over the documents corpus (operators/drift.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators import drift
from reddit_tech_jobs_data_pipeline_spark.plans.catalog import _t, register

_TOKS = r"list_filter(regexp_split_to_array(lower(text), '\W+'), x -> x <> '')"


@register(
    "corpus_snapshot_psi",
    """
    WITH binned AS (
      SELECT source, CAST(floor(n_chars / 25) AS BIGINT) AS bin,
             count(*) FILTER (WHERE doc_id % 2 = 0) AS ca,
             count(*) FILTER (WHERE doc_id % 2 = 1) AS cb
      FROM documents
      GROUP BY source, CAST(floor(n_chars / 25) AS BIGINT)
    ),
    tot AS (
      SELECT source, ca, cb,
             sum(ca) OVER (PARTITION BY source) AS ta,
             sum(cb) OVER (PARTITION BY source) AS tb,
             count(*) OVER (PARTITION BY source) AS nb
      FROM binned
    ),
    p AS (
      SELECT source, ca, cb,
             (ca + 0.5) / (ta + 0.5 * nb) AS pa,
             (cb + 0.5) / (tb + 0.5 * nb) AS pb
      FROM tot
    )
    SELECT source,
           count(*) AS n_bins,
           CAST(sum(ca) AS BIGINT) AS n_a,
           CAST(sum(cb) AS BIGINT) AS n_b,
           round(sum((pa - pb) * ln(pa / pb)), 6) AS psi
    FROM p GROUP BY source
    """,
    tags=["drift", "quality", "scale"],
)
def corpus_snapshot_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Population Stability Index of the document-length
    distribution between two interleaved corpus snapshots (even doc_ids
    stand in for yesterday's crawl, odd for today's — at production
    scale the two sides are different snapshot paths unioned with a
    side tag). Fixed-width 25-char bins keep the binning stats-free and
    cross-engine exact; see operators/drift.psi for the one-pass plan
    and the smoothing contract."""
    docs = _t(spark, sf_dir, "documents")
    tagged = docs.select(
        "source",
        F.floor(F.col("n_chars") / 25).alias("len_bin"),
        F.when(F.col("doc_id") % 2 == 0, "a").otherwise("b").alias("side"),
    )
    return drift.psi(tagged, "len_bin", "side", group_cols=["source"])


@register(
    "source_token_divergence",
    f"""
    WITH tok AS (
      SELECT source, unnest({_TOKS}) AS token FROM documents
    ),
    st AS (SELECT source, token, count(*) AS c_st FROM tok GROUP BY source, token),
    m AS (
      SELECT source, c_st,
             sum(c_st) OVER (PARTITION BY token) AS c_t,
             sum(c_st) OVER () AS g_total,
             sum(c_st) OVER (PARTITION BY source) AS s_total
      FROM st
    ),
    terms AS (
      SELECT source, c_st,
             (c_st / s_total) * ln((c_st / s_total) / (c_t / g_total)) AS kl_term,
             0.5 * ((c_st / s_total)
                      * ln(2 * (c_st / s_total) / ((c_st / s_total) + (c_t / g_total)))
                    + (c_t / g_total)
                      * ln(2 * (c_t / g_total) / ((c_st / s_total) + (c_t / g_total)))
                   ) AS js_term,
             c_t / g_total AS q
      FROM m
    )
    SELECT source,
           CAST(sum(c_st) AS BIGINT) AS n_tokens,
           count(*) AS n_vocab,
           round(sum(kl_term), 6) AS kl,
           round(sum(js_term) + 0.5 * ln(2) * (1 - sum(q)), 6) AS js
    FROM terms GROUP BY source
    """,
    tags=["drift", "quality", "scale"],
)
def source_token_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL and Jensen-Shannon divergence of each source's token unigram
    distribution against the corpus-wide mix — the mixture-monitoring
    companion to corpus_mixture_waterfill (is any source drifting away
    from the blend it was weighted for?). One explode+groupBy corpus
    pass; JS uses the vocabulary-mass closed form so absent tokens are
    never materialized (operators/drift.source_token_divergence)."""
    docs = _t(spark, sf_dir, "documents")
    return drift.source_token_divergence(docs, "text", "source")


@register(
    "streaming_drift_psi",
    """
    WITH v AS (
      SELECT user_id % 4 AS tag, CAST(floor(value / 5.0) AS BIGINT) AS bin
      FROM events WHERE value IS NOT NULL
    ),
    g AS (SELECT bin, count(*) AS ca FROM v GROUP BY bin),
    t AS (SELECT tag, bin, count(*) AS cb FROM v GROUP BY tag, bin),
    grid AS (
      SELECT tg.tag, g.bin, g.ca, coalesce(t.cb, 0) AS cb
      FROM (SELECT DISTINCT tag FROM v) tg CROSS JOIN g
      LEFT JOIN t ON t.tag = tg.tag AND t.bin = g.bin
    ),
    tot AS (
      SELECT tag, ca, cb,
             sum(ca) OVER (PARTITION BY tag) AS ta,
             sum(cb) OVER (PARTITION BY tag) AS tb,
             count(*) OVER (PARTITION BY tag) AS nb
      FROM grid
    ),
    p AS (
      SELECT tag, ca, cb,
             (ca + 0.5) / (ta + 0.5 * nb) AS pa,
             (cb + 0.5) / (tb + 0.5 * nb) AS pb
      FROM tot
    )
    SELECT tag, count(*) AS n_bins,
           CAST(sum(ca) AS BIGINT) AS n_a,
           CAST(sum(cb) AS BIGINT) AS n_b,
           round(sum((pa - pb) * ln(pa / pb)), 6) AS psi
    FROM p GROUP BY tag
    """,
    tags=["streaming", "drift"],
)
def streaming_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-micro-batch PSI against a persisted baseline histogram, run
    to completion over a deterministic tag-sliced replay (one parquet
    file = one micro-batch = one user_id%4 slice). Per-batch cost is one
    aggregation of the batch plus K-row model arithmetic — corpus-size
    independent, the property that lets the monitor run forever. The
    oracle recomputes each slice's PSI vs the full-table distribution in
    batch SQL (the baseline includes the slice itself by construction —
    it is the whole reference corpus). See streaming/drift_monitor.py."""
    from reddit_tech_jobs_data_pipeline_spark.streaming.drift_monitor import (
        run_drift_psi_batchlike,
    )

    return run_drift_psi_batchlike(spark, sf_dir, n_tags=4, bin_width=5.0)


@register(
    "embedding_centroid_drift",
    """
    WITH e AS (
      SELECT label, CASE WHEN vec_id % 2 = 0 THEN 'a' ELSE 'b' END AS side,
             unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v,
             unnest(generate_series(1, length(embedding))) AS pos
      FROM embeddings
    ),
    cen AS (
      SELECT label, pos,
             avg(v) FILTER (WHERE side = 'a') AS ma,
             avg(v) FILTER (WHERE side = 'b') AS mb
      FROM e GROUP BY label, pos
    ),
    per AS (
      SELECT label,
             round(sum(ma * mb) / (sqrt(sum(ma * ma)) * sqrt(sum(mb * mb))), 4)
               AS centroid_cos
      FROM cen GROUP BY label
    ),
    cnt AS (
      SELECT label,
             count(*) FILTER (WHERE vec_id % 2 = 0) AS n_a,
             count(*) FILTER (WHERE vec_id % 2 = 1) AS n_b
      FROM embeddings GROUP BY label
    )
    SELECT cnt.label, n_a, n_b, centroid_cos
    FROM cnt JOIN per ON per.label = cnt.label
    """,
    tags=["drift", "similarity"],
)
def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label cosine between the two interleaved snapshots' mean
    embeddings — the vector-space leg of the drift family (PSI watches
    scalar shapes, KL/JS token mixes). One posexplode pass to a
    labels×D model table; see operators/drift.centroid_drift."""
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "side", F.when(F.col("vec_id") % 2 == 0, "a").otherwise("b")
    )
    return drift.centroid_drift(emb, "embedding", "side", group_cols=["label"])
