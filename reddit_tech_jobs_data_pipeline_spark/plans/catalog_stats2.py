"""Round-11 statistics / time-series / curation batch.

Rank statistics (Spearman, Kendall tau-b, Cliff's delta) follow the
repo's order-independent rank-arithmetic contract: fractional ranks are
exact multiples of 0.5 (rank-min + half the tie count), so both engines
compute identical rationals and no float fold can diverge. Time-series
recurrences (Holt-Winters) run the identical IEEE-754 sequence as the
oracle's recursive CTE over a 2-dp-rounded daily series. Pair-based
statistics (Kendall, ACF) are quadratic only in DAYS (bounded by the
calendar, not the corpus) — the corpus-sized work is one groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from reddit_tech_jobs_data_pipeline_spark.plans.catalog import _t, register

# DuckDB twin of functions.extract.tokens (same as catalog_pipelineops)
_TOKS = r"list_filter(regexp_split_to_array(lower(text), '\W+'), x -> x <> '')"

# Daily revenue series (2-dp rounded so engine-side sum reassociation
# noise cannot flip a comparison downstream), plus a dense row index.
_DAILY_SQL = """
    daily AS (
      SELECT o_orderdate AS day, round(sum(o_totalprice), 2) AS rev,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT day, rev, n_orders,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM daily
    )
"""


def _daily_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy("day")
    return daily.select(
        "day",
        "rev",
        "n_orders",
        F.row_number().over(w).cast("long").alias("t"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("n"),
    )


@register(
    "spearman_corr_by_type",
    """
    WITH r AS (
      SELECT event_type,
        rank() OVER (PARTITION BY event_type ORDER BY value)
          + (count(*) OVER (PARTITION BY event_type, value) - 1) / 2.0 AS rv,
        rank() OVER (PARTITION BY event_type ORDER BY hour(ts))
          + (count(*) OVER (PARTITION BY event_type, hour(ts)) - 1) / 2.0 AS rh
      FROM events
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round(corr(rv, rh), 4) AS spearman_rho
    FROM r GROUP BY event_type
    """,
    tags=["stats"],
)
def spearman_corr_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation per event type between metric value and
    hour-of-day ("does this metric drift across the day, monotonically,
    regardless of scale?") — the robust complement to stats_battery's
    Pearson corr. Fractional ranks handle ties exactly (rank-min + half
    the tie count: every rank is a multiple of 0.5 computed from integer
    window counts, identical on any engine/partitioning); the rho is
    then plain Pearson over the ranks. Two windows + one agg — one
    shuffle on event_type."""
    ev = _t(spark, sf_dir, "events")
    h = F.hour("ts")
    rv = F.rank().over(Window.partitionBy("event_type").orderBy("value")) + (
        F.count(F.lit(1)).over(Window.partitionBy("event_type", "value")) - 1
    ) / 2.0
    rh = F.rank().over(Window.partitionBy("event_type").orderBy(h)) + (
        F.count(F.lit(1)).over(Window.partitionBy("event_type", h)) - 1
    ) / 2.0
    return (
        ev.select("event_type", rv.alias("rv"), rh.alias("rh"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.corr("rv", "rh"), 4).alias("spearman_rho"),
        )
    )


@register(
    "kendall_tau_daily",
    f"""
    WITH {_DAILY_SQL},
    pairs AS (
      SELECT (b.rev - a.rev) AS dx,
             (b.n_orders - a.n_orders) AS dy
      FROM idx a JOIN idx b ON b.t > a.t
    ),
    c AS (
      SELECT CAST(count(*) AS BIGINT) AS n0,
        CAST(sum(CASE WHEN dx * dy > 0 THEN 1 ELSE 0 END) AS BIGINT) AS conc,
        CAST(sum(CASE WHEN dx * dy < 0 THEN 1 ELSE 0 END) AS BIGINT) AS disc,
        CAST(sum(CASE WHEN dx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
        CAST(sum(CASE WHEN dy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ty
      FROM pairs
    )
    SELECT n0, conc, disc,
           round((conc - disc) / sqrt((n0 - tx) * 1.0 * (n0 - ty)), 4) AS tau_b
    FROM c
    """,
    tags=["stats", "timeseries"],
)
def kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between daily revenue and daily order count — the
    tie-corrected concordance statistic ("do busier days earn more,
    monotonically?"). Quadratic ONLY in days (calendar-bounded: ~400
    pairs² rows per year, constant w.r.t. corpus size) over the 2-dp
    daily aggregate; the corpus-sized work is one groupBy(day).
    Concordant/discordant/tie counts are integers, so tau_b is exact up
    to one final sqrt."""
    daily = _daily_df(spark, sf_dir)
    a = daily.select(F.col("t").alias("ta"), F.col("rev").alias("ra"), F.col("n_orders").alias("ca"))
    b = daily.select(F.col("t").alias("tb"), F.col("rev").alias("rb"), F.col("n_orders").alias("cb"))
    pairs = a.join(F.broadcast(b), F.col("tb") > F.col("ta")).select(
        (F.col("rb") - F.col("ra")).alias("dx"),
        (F.col("cb") - F.col("ca")).alias("dy"),
    )
    c = pairs.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(F.when(F.col("dx") * F.col("dy") > 0, 1).otherwise(0)).alias("conc"),
        F.sum(F.when(F.col("dx") * F.col("dy") < 0, 1).otherwise(0)).alias("disc"),
        F.sum(F.when(F.col("dx") == 0, 1).otherwise(0)).alias("tx"),
        F.sum(F.when(F.col("dy") == 0, 1).otherwise(0)).alias("ty"),
    )
    return c.select(
        "n0",
        "conc",
        "disc",
        F.round(
            (F.col("conc") - F.col("disc"))
            / F.sqrt((F.col("n0") - F.col("tx")) * 1.0 * (F.col("n0") - F.col("ty"))),
            4,
        ).alias("tau_b"),
    )


@register(
    "acf_daily_revenue",
    f"""
    WITH {_DAILY_SQL},
    lags AS (SELECT unnest(generate_series(1, 7)) AS lag),
    paired AS (
      SELECT l.lag, a.rev AS x, b.rev AS y
      FROM idx a JOIN lags l ON true JOIN idx b ON b.t = a.t + l.lag
    )
    SELECT CAST(lag AS BIGINT) AS lag, CAST(count(*) AS BIGINT) AS n_pairs,
           round(corr(x, y), 4) AS pearson_r
    FROM paired GROUP BY lag ORDER BY lag
    """,
    tags=["stats", "timeseries"],
)
def acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation profile of daily revenue at lags 1-7 (Pearson r
    between the series and its k-day shift) — the weekly-seasonality
    fingerprint a forecasting or anomaly job reads before choosing its
    window. The lag join runs on the DAYS table (calendar-bounded); the
    7 lags come from one exploded sequence, so the whole profile is one
    small join + one grouped corr."""
    daily = _daily_df(spark, sf_dir)
    lags = spark.range(1, 8).select(F.col("id").alias("lag"))
    a = daily.select(F.col("t").alias("ta"), F.col("rev").alias("x"))
    b = daily.select(F.col("t").alias("tb"), F.col("rev").alias("y"))
    paired = (
        a.crossJoin(F.broadcast(lags))
        .join(F.broadcast(b), F.col("tb") == F.col("ta") + F.col("lag"))
    )
    return (
        paired.groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.corr("x", "y"), 4).alias("pearson_r"),
        )
        .orderBy("lag")
    )


@register(
    "effect_size_click_view",
    """
    WITH cv AS (
      SELECT value, CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_c
      FROM events WHERE event_type IN ('click', 'view')
    ),
    ranked AS (
      SELECT is_c,
             rank() OVER (ORDER BY value)
               + (count(*) OVER (PARTITION BY value) - 1) / 2.0 AS fr
      FROM cv
    ),
    m AS (
      SELECT
        CAST(sum(is_c) AS BIGINT) AS n1,
        CAST(sum(1 - is_c) AS BIGINT) AS n2,
        avg(CASE WHEN is_c = 1 THEN value END) AS m1,
        avg(CASE WHEN is_c = 0 THEN value END) AS m2,
        var_samp(CASE WHEN is_c = 1 THEN value END) AS v1,
        var_samp(CASE WHEN is_c = 0 THEN value END) AS v2,
        (SELECT sum(CASE WHEN is_c = 1 THEN fr ELSE 0 END) FROM ranked) AS r1
      FROM cv
    )
    SELECT n1, n2,
      round((m1 - m2) / sqrt(((n1 - 1) * v1 + (n2 - 1) * v2)
                             / (n1 + n2 - 2)), 4) AS cohens_d,
      round(2.0 * (r1 - n1 * (n1 + 1) / 2.0) / (n1 * 1.0 * n2) - 1.0, 4)
        AS cliffs_delta
    FROM m
    """,
    tags=["stats", "quality"],
)
def effect_size_click_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effect sizes between click and view metric values — the numbers
    that belong NEXT TO welch_ttest_click_view's p-value before anyone
    acts on it: Cohen's d (standardized mean difference, pooled sd) and
    Cliff's delta (P(x>y) - P(x<y), derived from the Mann-Whitney U via
    fractional ranks — O(n log n) rank arithmetic, never the quadratic
    pair sweep). Ranks are exact 0.5-multiples; d's moments follow the
    stats_battery contract (round 4)."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    cv = ev.select(
        "value", F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_c")
    )
    fr = F.rank().over(Window.orderBy("value")) + (
        F.count(F.lit(1)).over(Window.partitionBy("value")) - 1
    ) / 2.0
    r1 = (
        cv.select("is_c", fr.alias("fr"))
        .filter(F.col("is_c") == 1)
        .agg(F.sum("fr").alias("r1"))
    )
    m = cv.agg(
        F.sum("is_c").alias("n1"),
        F.sum(1 - F.col("is_c")).alias("n2"),
        F.avg(F.when(F.col("is_c") == 1, F.col("value"))).alias("m1"),
        F.avg(F.when(F.col("is_c") == 0, F.col("value"))).alias("m2"),
        F.var_samp(F.when(F.col("is_c") == 1, F.col("value"))).alias("v1"),
        F.var_samp(F.when(F.col("is_c") == 0, F.col("value"))).alias("v2"),
    )
    return m.crossJoin(F.broadcast(r1)).select(
        "n1",
        "n2",
        F.round(
            (F.col("m1") - F.col("m2"))
            / F.sqrt(
                ((F.col("n1") - 1) * F.col("v1") + (F.col("n2") - 1) * F.col("v2"))
                / (F.col("n1") + F.col("n2") - 2)
            ),
            4,
        ).alias("cohens_d"),
        F.round(
            2.0
            * (F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2.0)
            / (F.col("n1") * 1.0 * F.col("n2"))
            - 1.0,
            4,
        ).alias("cliffs_delta"),
    )


@register(
    "late_arrival_audit",
    """
    WITH arr AS (
      SELECT event_type, epoch_ms(ts) AS ems,
             max(epoch_ms(ts)) OVER (
               PARTITION BY user_id % 8 ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      FROM events
    ),
    lateness AS (
      SELECT event_type,
             greatest(0, coalesce(prev_max, ems) - ems) AS late_ms
      FROM arr
    )
    SELECT event_type,
      CAST(count(*) AS BIGINT) AS n_events,
      CAST(sum(CASE WHEN late_ms = 0 THEN 1 ELSE 0 END) AS BIGINT) AS in_order,
      CAST(sum(CASE WHEN late_ms > 0 AND late_ms <= 60000 THEN 1 ELSE 0 END)
           AS BIGINT) AS late_le_60s,
      CAST(sum(CASE WHEN late_ms > 60000 AND late_ms <= 600000 THEN 1 ELSE 0 END)
           AS BIGINT) AS late_le_600s,
      CAST(sum(CASE WHEN late_ms > 600000 THEN 1 ELSE 0 END) AS BIGINT)
        AS dropped_by_10m_watermark
    FROM lateness GROUP BY event_type
    """,
    tags=["streaming", "stats", "quality"],
)
def late_arrival_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-sizing audit: how out-of-order does each event type
    ARRIVE? Arrival order is the ingest sequence (event_id) within a
    source shard (user_id % 8 — the kafka-partition model: order is only
    meaningful per shard); an event's lateness is how far the shard's
    running max ts had already advanced past it. The bucket counts are
    exactly the rows a Structured Streaming job with a 1-min / 10-min
    watermark would accept vs drop — measured from data, which is how a
    watermark should be chosen. One window per shard (32-way parallel),
    integer-ms arithmetic, exact on both engines."""
    ev = _t(spark, sf_dir, "events")
    # dividend-sign % on BOTH engines (Spark's % matches DuckDB's %); the
    # earlier pmod form would silently shard negative user_ids into
    # different groups than the oracle (round-11 advisor finding) — the
    # shard is only a grouping key, so sign semantics just have to AGREE
    shard = F.col("user_id") % F.lit(8)
    ems = F.unix_millis("ts")
    prev_max = F.max(ems).over(
        Window.partitionBy(shard)
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    late_ms = F.greatest(F.lit(0), F.coalesce(prev_max, ems) - ems)
    return (
        ev.select("event_type", late_ms.alias("late_ms"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("late_ms") == 0, 1).otherwise(0)).alias("in_order"),
            F.sum(
                F.when((F.col("late_ms") > 0) & (F.col("late_ms") <= 60000), 1)
                .otherwise(0)
            ).alias("late_le_60s"),
            F.sum(
                F.when(
                    (F.col("late_ms") > 60000) & (F.col("late_ms") <= 600000), 1
                ).otherwise(0)
            ).alias("late_le_600s"),
            F.sum(F.when(F.col("late_ms") > 600000, 1).otherwise(0)).alias(
                "dropped_by_10m_watermark"
            ),
        )
    )


_HW_SCHEMA = T.StructType(
    [
        T.StructField("t", T.LongType()),
        T.StructField("rev", T.DoubleType()),
        T.StructField("level", T.DoubleType()),
        T.StructField("trend", T.DoubleType()),
    ]
)


@register(
    "holt_winters_daily",
    f"""
    WITH RECURSIVE {_DAILY_SQL},
    hw(t, l, b) AS (
      SELECT CAST(1 AS BIGINT), i1.rev, i2.rev - i1.rev
      FROM idx i1 JOIN idx i2 ON i1.t = 1 AND i2.t = 2
      UNION ALL
      SELECT hw.t + 1,
             0.5 * i.rev + 0.5 * (hw.l + hw.b),
             0.3 * ((0.5 * i.rev + 0.5 * (hw.l + hw.b)) - hw.l) + 0.7 * hw.b
      FROM hw JOIN idx i ON i.t = hw.t + 1
    )
    SELECT hw.t, i.rev, round(hw.l, 4) AS level, round(hw.b, 4) AS trend
    FROM hw JOIN idx i ON i.t = hw.t
    WHERE hw.t > i.n - 14
    """,
    tags=["timeseries", "iterative"],
)
def holt_winters_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's double exponential smoothing (level + trend, alpha=0.5,
    beta=0.3) over daily revenue — the forecasting state a monitoring
    job carries to flag 'revenue off trend'; emits the last 14 days.
    The recurrence is inherently sequential, but over the DAILY
    aggregate (calendar-bounded, a few hundred rows), so the Spark plan
    is: corpus-sized groupBy(day) shuffle, then ONE single-partition
    mapInPandas pass over the tiny series — the designed escape-hatch
    shape (operators/sequential.py), with the partition deliberately
    singular because the series itself is small, not the corpus. The
    Python floats execute the identical IEEE-754 sequence as the
    oracle's recursive CTE."""
    import pandas as pd

    daily = _daily_df(spark, sf_dir)
    n = daily.count()  # scalar: bounds the output window

    def _hw(chunks):
        rows = []
        for pdf in chunks:
            rows.append(pdf)
        if not rows:
            return
        pdf = pd.concat(rows).sort_values("t")
        ts = pdf["t"].tolist()
        xs = pdf["rev"].tolist()
        if len(xs) < 2:
            return
        l, b = xs[0], xs[1] - xs[0]
        out = [(ts[0], xs[0], l, b)]
        for i in range(1, len(xs)):
            l_new = 0.5 * xs[i] + 0.5 * (l + b)
            b = 0.3 * (l_new - l) + 0.7 * b
            l = l_new
            out.append((ts[i], xs[i], l, b))
        yield pd.DataFrame(out, columns=["t", "rev", "level", "trend"])

    hw = (
        daily.select("t", "rev")
        .coalesce(1)
        .sortWithinPartitions("t")
        .mapInPandas(_hw, schema=_HW_SCHEMA)
    )
    return hw.filter(F.col("t") > n - 14).select(
        "t",
        "rev",
        F.round("level", 4).alias("level"),
        F.round("trend", 4).alias("trend"),
    )


@register(
    "degree_powerlaw_fit",
    """
    WITH edges AS (
      SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) a
      JOIN (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) b
        ON a.l_partkey = b.l_partkey AND a.l_suppkey <> b.l_suppkey
    ),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS degree FROM edges GROUP BY src),
    hist AS (
      SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes FROM deg GROUP BY degree
    ),
    fit AS (
      SELECT regr_slope(ln(n_nodes), ln(degree)) AS slope,
             regr_intercept(ln(n_nodes), ln(degree)) AS icept,
             corr(ln(n_nodes), ln(degree)) AS r
      FROM hist
    )
    SELECT degree, n_nodes,
           round((SELECT slope FROM fit), 4) AS loglog_slope,
           round((SELECT r FROM fit), 4) AS loglog_r
    FROM hist ORDER BY degree
    """,
    tags=["graph", "stats"],
)
def degree_powerlaw_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the supplier co-supply graph plus a
    log-log OLS slope — the skew fingerprint read BEFORE running
    pagerank/k-core on a graph (a steep power law predicts hub-bound
    shuffle skew; partition_skew_report's graph sibling). The histogram
    is two grouped counts (edges → degrees → histogram rows, each
    map-side combined); the fit runs on the HISTOGRAM (≤ max-degree
    rows), broadcast back across it."""
    from reddit_tech_jobs_data_pipeline_spark.operators.graph import (
        cooccurrence_edges,
    )

    li = _t(spark, sf_dir, "lineitem")
    edges = cooccurrence_edges(li, "l_partkey", "l_suppkey")
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    hist = deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))
    fit = hist.agg(
        F.regr_slope(F.ln("n_nodes"), F.ln("degree")).alias("slope"),
        F.corr(F.ln("n_nodes"), F.ln("degree")).alias("r"),
    )
    return (
        hist.crossJoin(F.broadcast(fit))
        .select(
            "degree",
            "n_nodes",
            F.round("slope", 4).alias("loglog_slope"),
            F.round("r", 4).alias("loglog_r"),
        )
        .orderBy("degree")
    )


@register(
    "ngram_novelty_profile",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS ws FROM documents),
    sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
        generate_series(1, greatest(length(ws) - 2, 0)),
        i -> array_to_string(ws[i:i+2], ' ')))) AS shingle
      FROM toks WHERE length(ws) >= 3
    ),
    firsts AS (SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY shingle)
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           round(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 4) AS novelty
    FROM sh s JOIN firsts f ON f.shingle = s.shingle
    GROUP BY s.doc_id
    """,
    tags=["dedup", "quality", "text", "scale"],
)
def ngram_novelty_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 3-gram novelty: the fraction of a doc's distinct
    shingles not already contributed by any earlier (lower doc_id) doc —
    the marginal-value curve of an ingest stream ('is shard N still
    adding new content, or re-crawling what we have?'). Curation reads
    the tail of this profile to decide when a source is exhausted. Plan:
    the shared shingle edge list (one explode), a min(doc_id) groupBy
    over shingles (map-side combined), one join back — no pairwise
    comparisons anywhere, so it scales exactly like the MinHash
    pipeline's shingle stage."""
    from reddit_tech_jobs_data_pipeline_spark.operators.dedup import _shingle_table

    docs = _t(spark, sf_dir, "documents")
    sh = _shingle_table(docs, "text", "doc_id", 3).withColumnRenamed("id", "doc_id")
    firsts = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(firsts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.round(F.col("n_novel") * 1.0 / F.col("n_grams"), 4).alias("novelty"),
        )
    )


def _hubness_sql() -> str:
    from reddit_tech_jobs_data_pipeline_spark.plans.catalog_scale import (
        _DVEC,
        _cosine_sql,
    )

    return f"""
    WITH c AS (SELECT vec_id AS neighbor_id, {_DVEC} AS cvec FROM embeddings),
    q AS (SELECT vec_id AS query_id, {_DVEC} AS qvec
          FROM embeddings WHERE vec_id < 200),
    scored AS (
      SELECT query_id, neighbor_id,
             round({_cosine_sql("qvec", "cvec")}, 4) AS cosine
      FROM c JOIN q ON neighbor_id <> query_id
    ),
    top AS (
      SELECT neighbor_id FROM (
        SELECT neighbor_id, row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id) AS rn
        FROM scored
      ) WHERE rn <= 5
    ),
    occ AS (SELECT neighbor_id AS vec_id, count(*) AS k_occ
            FROM top GROUP BY neighbor_id)
    SELECT coalesce(o.k_occ, 0) AS k_occ,
           CAST(count(*) AS BIGINT) AS n_vectors
    FROM embeddings e LEFT JOIN occ o ON o.vec_id = e.vec_id
    GROUP BY 1 ORDER BY 1
    """


@register(
    "ann_hubness_audit",
    _hubness_sql(),
    tags=["similarity", "stats", "scale"],
)
def ann_hubness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness audit of the embedding space: the k-occurrence histogram
    — for a 200-query sample, how many corpus vectors appear in 0, 1,
    2, ... of the exact top-5 lists. High-dimensional spaces grow hub
    points that dominate every neighbor list (Radovanović et al. 2010),
    which silently skews ANN-driven dedup/mining toward the hubs; this
    is the health check read before trusting top-k pipelines. The heavy
    work is the same broadcast-scored exact top-k as ann_cosine_topk
    (bounded query side); the histogram is two grouped counts plus a
    left anti fill for the never-retrieved (k_occ = 0) population."""
    from reddit_tech_jobs_data_pipeline_spark.operators import similarity
    from reddit_tech_jobs_data_pipeline_spark.operators.parallelism import fan_out

    emb = _t(spark, sf_dir, "embeddings")
    # fan_out: single-split scan + 200-query broadcast fold is core-bound
    top = similarity.brute_force_topk(fan_out(emb), emb.filter(F.col("vec_id") < 200), k=5)
    occ = top.groupBy(F.col("neighbor_id").alias("vec_id")).agg(
        F.count(F.lit(1)).alias("k_occ")
    )
    filled = emb.select("vec_id").join(occ, "vec_id", "left").select(
        F.coalesce("k_occ", F.lit(0)).alias("k_occ")
    )
    return (
        filled.groupBy("k_occ")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .orderBy("k_occ")
    )


def _knn_vote_sql() -> str:
    from reddit_tech_jobs_data_pipeline_spark.plans.catalog_scale import (
        _DVEC,
        _cosine_sql,
    )

    return f"""
    WITH c AS (SELECT vec_id AS neighbor_id, label AS nlabel, {_DVEC} AS cvec
               FROM embeddings WHERE vec_id % 10 <> 0),
    q AS (SELECT vec_id AS query_id, label AS tlabel, {_DVEC} AS qvec
          FROM embeddings WHERE vec_id % 10 = 0 AND vec_id < 2000),
    scored AS (
      SELECT query_id, tlabel, nlabel,
             round({_cosine_sql("qvec", "cvec")}, 4) AS cosine, neighbor_id
      FROM c JOIN q ON true
    ),
    top AS (
      SELECT query_id, tlabel, nlabel FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id) AS rn
        FROM scored
      ) WHERE rn <= 5
    ),
    votes AS (
      SELECT query_id, tlabel, nlabel, count(*) AS cnt FROM top GROUP BY 1, 2, 3
    ),
    pred AS (
      SELECT query_id, tlabel, nlabel AS plabel FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY cnt DESC, nlabel) AS rn
        FROM votes
      ) WHERE rn = 1
    )
    SELECT tlabel AS label, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN plabel = tlabel THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           round(sum(CASE WHEN plabel = tlabel THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4) AS accuracy
    FROM pred GROUP BY tlabel ORDER BY label
    """


@register(
    "knn_label_vote_accuracy",
    _knn_vote_sql(),
    tags=["similarity", "ml", "stats", "scale"],
)
def knn_label_vote_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN-classifier evaluation over the embedding space: hold out a
    FIXED-SIZE sample of every-10th vectors (vec_id % 10 == 0 AND
    vec_id < 2000 — at most 200 queries regardless of corpus size),
    predict each label by exact 5-NN majority vote (ties -> lowest
    label, the deterministic argmax), report per-label accuracy — the
    standard embedding-quality probe ('do labels cluster in this
    space?') run before trusting embedding-driven curation like SemDeDup
    or hard-negative mining. The scoring pass is the broadcast exact
    top-k; the absolute vec_id cap is what makes the broadcast side
    genuinely bounded (a bare modulo is a corpus FRACTION that grows
    linearly and turns the broadcast into an OOM + the scoring into
    0.1*N^2 work at 100 TB — the round-11 verdict's scale finding).
    A statistical accuracy estimate doesn't need more queries anyway:
    the confidence interval depends on |holdout|, not on corpus share.
    The vote and the accuracy are two grouped counts with integer
    arithmetic."""
    from reddit_tech_jobs_data_pipeline_spark.operators import similarity
    from reddit_tech_jobs_data_pipeline_spark.operators.parallelism import fan_out

    emb = _t(spark, sf_dir, "embeddings")
    # the embeddings table is a single parquet split at test SFs, and
    # the |holdout| x |corpus| scoring fold is CPU-bound per corpus row
    # — without the fan-out the whole cross score runs on ONE core
    # (observed: single-task stage pinning a core for minutes at sf1.0)
    corpus = fan_out(emb.filter(F.col("vec_id") % 10 != 0))
    held = emb.filter((F.col("vec_id") % 10 == 0) & (F.col("vec_id") < 2000))
    top = similarity.brute_force_topk(corpus, held, k=5)
    labels = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nlabel"))
    # truth only needs the HOLDOUT rows (<=200 by the vec_id cap), so it
    # is safe to broadcast; labels stays corpus-sized and unhinted — the
    # top side (5 x holdout rows) is the small one there and AQE picks
    # the right build side
    truth = F.broadcast(
        held.select(F.col("vec_id").alias("query_id"), F.col("label").alias("tlabel"))
    )
    votes = (
        top.join(labels, "neighbor_id")
        .groupBy("query_id", "nlabel")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cnt").desc(), F.col("nlabel").asc())
    pred = (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("nlabel").alias("plabel"))
    )
    return (
        pred.join(truth, "query_id")
        .groupBy(F.col("tlabel").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("plabel") == F.col("tlabel"), 1).otherwise(0)).alias(
                "n_correct"
            ),
        )
        .select(
            "label",
            "n",
            "n_correct",
            F.round(F.col("n_correct") * 1.0 / F.col("n"), 4).alias("accuracy"),
        )
        .orderBy("label")
    )
