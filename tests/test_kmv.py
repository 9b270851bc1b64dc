"""KMV sketch mergeability + PII scrub semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.functions import text as textfn

K = 8


def _hash_col(c):
    return F.conv(F.substring(F.md5(F.col(c).cast("string")), 1, 8), 16, 10).cast("long")


def _kmin(df, col="h"):
    """k smallest distinct hashes of a DataFrame with column ``h``."""
    return [r[col] for r in df.select(col).distinct().orderBy(col).limit(K).collect()]


def test_kmv_union_equals_merged_partials(spark):
    """The scale claim behind kmv_distinct_sketch: k-min over the full
    data equals k-min over the UNION OF PARTIAL K-MINS — so partition-
    or day-level sketches (k longs each) merge without raw data."""
    a = spark.range(0, 500).select(_hash_col("id").alias("h"))
    b = spark.range(300, 900).select(_hash_col("id").alias("h"))

    full = _kmin(a.unionAll(b))

    pa, pb = _kmin(a), _kmin(b)
    merged = spark.createDataFrame([(v,) for v in pa + pb], "h long")
    assert _kmin(merged) == full


def test_kmv_estimate_within_tolerance(spark):
    """(k-1)·M/h_(k) with k=64 has rsd ≈ 1/sqrt(k-1) ≈ 12.6%; on 1000
    uniform keys the estimate must land well inside 4 sigma."""
    df = spark.range(0, 1000).select(_hash_col("id").alias("h"))
    kth = df.distinct().orderBy("h").limit(64).agg(F.max("h")).first()[0]
    est = 63 * 4294967296.0 / kth
    assert abs(est - 1000) / 1000 < 0.5


def test_pii_redact_replaces_all_types(spark):
    row = spark.createDataFrame(
        [(1, "mail a.b@x.io, call 555-123-4567, host 10.0.0.1 end")],
        "id int, text string",
    ).select(
        textfn.pii_redact("text").alias("clean"),
        *[textfn.pii_count("text", k).alias(f"n_{k}") for k, _ in textfn.PII_PATTERNS],
    ).first()
    assert row.clean == "mail <EMAIL>, call <PHONE>, host <IPV4> end"
    assert (row.n_email, row.n_ipv4, row.n_phone) == (1, 1, 1)


def test_pii_redact_null_and_clean_text(spark):
    rows = spark.createDataFrame(
        [(1, None), (2, "no pii here at all")], "id int, text string"
    ).select("id", textfn.pii_redact("text").alias("clean")).collect()
    out = {r.id: r.clean for r in rows}
    assert out[1] == ""
    assert out[2] == "no pii here at all"


def test_hll_sketch_agg_merges_within_tolerance(spark):
    """Spark 4 Datasketches HLL: partial per-group sketches merged with
    hll_union_agg estimate the same cardinality as one direct sketch —
    the binary-mergeable industrial twin of the KMV proof above (exact
    equality is not guaranteed across merge topologies, closeness is:
    default lgConfigK=12 → rsd ≈ 1.6%, assert 4 sigma)."""
    df = spark.range(0, 10000)
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("id")).alias("est")
    ).first().est
    merged = (
        df.repartition(8)
        .groupBy(F.pmod("id", F.lit(4)).alias("g"))
        .agg(F.hll_sketch_agg("id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .first()
        .est
    )
    for est in (direct, merged):
        assert abs(est - 10000) / 10000 < 0.065
    assert abs(direct - merged) / 10000 < 0.065
