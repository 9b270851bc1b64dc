"""As-of join + statistical/collection aggregate batteries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators.asof import asof_join
from reddit_tech_jobs_data_pipeline_spark.plans.catalog import _t, register


@register(
    "asof_last_error_before_purchase",
    """
    WITH tagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_l
      FROM events WHERE event_type IN ('purchase', 'error')
    ),
    carried AS (
      SELECT user_id, ts, event_id, value, is_l,
        last_value(CASE WHEN is_l = 0 THEN value END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY ts, event_id, is_l
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS error_value_asof
      FROM tagged
    )
    SELECT event_id, user_id,
           round(value, 2) AS value,
           round(error_value_asof, 2) AS error_value_asof
    FROM carried WHERE is_l = 1
    """,
    tags=["asof", "window"],
)
def asof_last_error_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the value of the user's most recent prior (or
    simultaneous) error event — the canonical as-of shape (DuckDB's native
    ASOF JOIN expresses the same; the oracle uses the identical
    union+window construction to pin tie semantics)."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    errors = ev.filter(F.col("event_type") == "error").withColumnRenamed(
        "value", "error_value"
    )
    joined = asof_join(
        purchases,
        errors,
        by=["user_id"],
        ts_col="ts",
        payload_cols=["error_value"],
        tiebreaker="event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("value"),
        F.round("error_value_asof", 2).alias("error_value_asof"),
    )


@register(
    "stats_battery",
    """
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 4) AS sd_price,
           round(var_samp(l_quantity), 4)         AS var_qty,
           round(corr(l_extendedprice, l_quantity), 4) AS corr_pq,
           round(covar_samp(l_extendedprice, l_discount), 4) AS cov_pd,
           round(min(l_extendedprice), 2) AS min_price,
           round(max(l_extendedprice), 2) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=["agg", "stats"],
)
def stats_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 4).alias("corr_pq"),
        F.round(F.covar_samp("l_extendedprice", "l_discount"), 4).alias("cov_pd"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


@register(
    "collect_agg_battery",
    """
    SELECT o_orderstatus,
           array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders GROUP BY o_orderstatus
    """,
    tags=["agg", "array"],
)
def collect_agg_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderpriority")), ",").alias("priorities"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


@register(
    "window_function_battery",
    """
    WITH w AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
        row_number()   OVER win AS rn,
        rank()         OVER win AS rnk,
        dense_rank()   OVER win AS drnk,
        CAST(ntile(4) OVER win AS BIGINT) AS quartile,
        round(percent_rank() OVER win, 4) AS pct_rank,
        round(cume_dist()    OVER win, 4) AS cdist,
        round(lag(o_totalprice)  OVER win, 2) AS prev_price,
        round(lead(o_totalprice) OVER win, 2) AS next_price,
        round(first_value(o_totalprice) OVER win, 2) AS first_price,
        round(nth_value(o_totalprice, 2) OVER win, 2) AS second_price
      FROM orders
      WINDOW win AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    )
    SELECT o_custkey, o_orderkey, rn, rnk, drnk, quartile, pct_rank, cdist,
           prev_price, next_price, first_price, second_price
    FROM w WHERE o_custkey % 10 = 0
    """,
    tags=["window"],
)
def window_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = _t(spark, sf_dir, "orders")
    win = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    out = orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(win).cast("long").alias("rn"),
        F.rank().over(win).cast("long").alias("rnk"),
        F.dense_rank().over(win).cast("long").alias("drnk"),
        F.ntile(4).over(win).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(win), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(win), 4).alias("cdist"),
        F.round(F.lag("o_totalprice").over(win), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(win), 2).alias("next_price"),
        F.round(F.first("o_totalprice").over(win), 2).alias("first_price"),
        F.round(F.nth_value("o_totalprice", 2).over(win), 2).alias("second_price"),
    )
    return out.filter(F.col("o_custkey") % 10 == 0)


@register(
    "zscore_outliers",
    """
    WITH stats AS (
      SELECT event_type,
             avg(value) AS mu,
             stddev_samp(value) AS sigma
      FROM events GROUP BY event_type
    )
    SELECT event_id, e.event_type,
           round(value, 2) AS value,
           round((value - mu) / sigma, 4) AS zscore
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE abs((value - mu) / sigma) > 2.5
    """,
    tags=["stats", "quality"],
)
def zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier flagging: group stats (tiny) broadcast
    back onto the stream — the standard data-quality anomaly gate."""
    ev = _t(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 2.5)
        .select(
            "event_id",
            "event_type",
            F.round("value", 2).alias("value"),
            F.round(z, 4).alias("zscore"),
        )
    )


@register(
    "monthly_revenue_growth",
    """
    WITH monthly AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
             round(sum(o_totalprice), 2) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT month, revenue,
           round(revenue - lag(revenue) OVER (ORDER BY month), 2) AS delta,
           round((revenue - lag(revenue) OVER (ORDER BY month))
                 / lag(revenue) OVER (ORDER BY month) * 100, 4) AS pct_change
    FROM monthly
    """,
    tags=["window", "time", "agg"],
)
def monthly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window over an aggregate: month-over-month revenue deltas. The
    single-partition lag window is fine — input is one row per month."""
    from pyspark.sql import Window as W

    orders = _t(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    w = W.orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month",
        "revenue",
        F.round(F.col("revenue") - prev, 2).alias("delta"),
        F.round((F.col("revenue") - prev) / prev * 100, 4).alias("pct_change"),
    )


@register(
    "q19_disjunctive_filter",
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 10)
       OR (p_brand = 'Brand#2' AND p_type = 'PROMO' AND l_quantity >= 20)
       OR (p_size >= 40 AND l_discount BETWEEN 0.05 AND 0.1)
    """,
    tags=["tpch", "join", "filter"],
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive predicates across both
    join sides — exercises predicate normalization/pushdown through the
    join (per-side common factors get pushed, the residual stays on the
    join output)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_type") == "PROMO") & (F.col("l_quantity") >= 20))
        | ((F.col("p_size") >= 40) & F.col("l_discount").between(0.05, 0.1))
    )
    return joined.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "revenue_trend_regression",
    """
    WITH daily AS (
      SELECT n_name,
             CAST(EXTRACT(epoch FROM date_trunc('day', o_orderdate)) / 86400 AS DOUBLE) AS day_num,
             sum(o_totalprice) AS day_revenue
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY 1, 2
    )
    SELECT n_name,
           round(regr_slope(day_revenue, day_num), 4)     AS slope,
           round(regr_intercept(day_revenue, day_num), 2) AS intercept,
           round(regr_r2(day_revenue, day_num), 4)        AS r2,
           count(*) AS n_days
    FROM daily
    GROUP BY n_name
    ORDER BY n_name
    """,
    tags=["stats", "regression", "agg"],
)
def revenue_trend_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-nation linear trend of daily revenue — native regr_* aggregates
    # (Spark ≥3.4), no UDF; two shuffles: (nation, day) partial-agg then
    # nation regression
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    daily = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            "n_name",
            (F.unix_timestamp(F.date_trunc("day", "o_orderdate")) / 86400)
            .cast("double")
            .alias("day_num"),
        )
        .agg(F.sum("o_totalprice").alias("day_revenue"))
    )
    return (
        daily.groupBy("n_name")
        .agg(
            F.round(F.regr_slope("day_revenue", "day_num"), 4).alias("slope"),
            F.round(F.regr_intercept("day_revenue", "day_num"), 2).alias("intercept"),
            F.round(F.regr_r2("day_revenue", "day_num"), 4).alias("r2"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .orderBy("n_name")
    )


@register(
    "grouping_sets_orders",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    ORDER BY gid, o_orderstatus, o_orderpriority
    """,
    tags=["agg", "grouping-sets"],
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # explicit GROUPING SETS via the SQL API (DataFrame API only exposes
    # rollup/cube); same Catalyst Expand operator underneath
    orders = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
               count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM __gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        ORDER BY gid, o_orderstatus, o_orderpriority
        """
    )


@register(
    "mode_event_type_per_user",
    """
    SELECT user_id, event_type AS modal_type, n
    FROM (
      SELECT user_id, event_type, n,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY n DESC, event_type) AS rn
      FROM (
        SELECT user_id, event_type, count(*) AS n
        FROM events GROUP BY user_id, event_type
      )
    ) WHERE rn = 1
    ORDER BY user_id
    """,
    tags=["agg", "window", "mode"],
)
def mode_event_type_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deterministic mode: count-argmax with lexicographic tiebreak
    # (built-in F.mode breaks ties arbitrarily — not oracle-safe)
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), F.col("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("modal_type"), "n")
        .orderBy("user_id")
    )


@register(
    "approx_distinct_accuracy",
    """
    SELECT count(DISTINCT o_custkey) AS exact_customers,
           true AS approx_within_5pct
    FROM orders
    """,
    tags=["agg", "sketch"],
)
def approx_distinct_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HLL++ sketch exercised with a verifiable contract: the catalog
    # result carries the exact count plus a bound-check flag, because the
    # raw estimate differs across engines' sketch implementations
    orders = _t(spark, sf_dir, "orders")
    agg = orders.agg(
        F.countDistinct("o_custkey").alias("exact_customers"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("__approx"),
    )
    within = (
        F.abs(F.col("__approx") - F.col("exact_customers"))
        <= 0.05 * F.col("exact_customers")
    ).alias("approx_within_5pct")
    return agg.select("exact_customers", within)


@register(
    "kmv_distinct_sketch",
    """
    WITH dh AS (
      SELECT DISTINCT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
      FROM events
    ),
    ranked AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM dh
    ),
    sk AS (
      SELECT event_type, max(h) AS kth, count(*) AS n_kept
      FROM ranked WHERE rn <= 64 GROUP BY event_type
    ),
    ex AS (
      SELECT event_type, count(DISTINCT user_id) AS exact_distinct FROM events
      GROUP BY event_type
    )
    SELECT sk.event_type, ex.exact_distinct,
           round(CASE WHEN n_kept < 64 THEN n_kept * 1.0
                      ELSE 63 * 4294967296.0 / kth END, 2) AS kmv_estimate,
           round(abs(CASE WHEN n_kept < 64 THEN n_kept * 1.0
                          ELSE 63 * 4294967296.0 / kth END - exact_distinct)
                 / exact_distinct, 4) AS rel_err
    FROM sk JOIN ex ON ex.event_type = sk.event_type
    """,
    tags=["agg", "sketch", "scale"],
)
def kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct sketch (Bar-Yossef et al. 2002): keep
    the k=64 smallest distinct 32-bit hashes per group; estimate
    |D| = (k-1)·M/h_(k). Unlike HLL++ (whose estimate is
    implementation-defined — see approx_distinct_accuracy's bound-check
    contract), KMV is ENGINE-AGNOSTIC deterministic: md5-derived hashes
    + an order statistic reproduce bit-identically anywhere, so the
    oracle matches the estimate itself, not just a tolerance. Mergeable
    by construction — k-min of a union is the k-min of the partials'
    k-mins (tests/test_kmv.py proves it), so partial sketches combine
    across partitions/days without re-reading raw data; state is k longs
    per group vs count-distinct's full key set. The per-group
    row_number window is a per-group sort, hash-partitioned on the
    group key — no global sort anywhere."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    h = F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    dh = ev.select("event_type", h.alias("h")).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    kept = dh.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 64)
    sk = kept.groupBy("event_type").agg(
        F.max("h").alias("kth"), F.count(F.lit(1)).alias("n_kept")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    est = F.when(F.col("n_kept") < 64, F.col("n_kept").cast("double")).otherwise(
        F.lit(63 * 4294967296.0) / F.col("kth")
    )
    return (
        sk.join(exact, "event_type")
        .select(
            "event_type",
            "exact_distinct",
            F.round(est, 2).alias("kmv_estimate"),
            F.round(F.abs(est - F.col("exact_distinct")) / F.col("exact_distinct"), 4).alias(
                "rel_err"
            ),
        )
    )


@register(
    "mann_whitney_u",
    """
    WITH s AS (
      SELECT value AS v,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_c
      FROM events WHERE event_type IN ('click', 'view')
    ),
    g AS (SELECT v, count(*) AS t, sum(is_c) AS c FROM s GROUP BY v),
    w AS (
      SELECT v, t, c,
             sum(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) - t AS below
      FROM g
    ),
    agg AS (
      SELECT CAST(sum(c) AS BIGINT)                       AS n1,
             CAST(sum(t - c) AS BIGINT)                   AS n2,
             sum(c * (below + (t + 1) / 2.0))             AS r1,
             CAST(sum(t * t * t - t) AS BIGINT)           AS tie3
      FROM w
    )
    SELECT n1, n2,
           round(r1 - n1 * (n1 + 1) / 2.0, 2) AS u1,
           round((r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)
                 / sqrt(n1 * n2 / 12.0 *
                        ((n1 + n2 + 1) - tie3 * 1.0
                         / ((n1 + n2) * (n1 + n2 - 1.0)))), 4) AS z
    FROM agg
    """,
    tags=["stats"],
)
def mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) comparing click vs view event
    values — the distribution-free location test that complements the
    parametric Welch t (welch_ttest_click_view): it detects shifts the
    t-test misses under heavy tails. Ties get average ranks with the
    standard tie-corrected normal variance.

    Determinism: average rank = below + (t+1)/2 is always a multiple of
    0.5 and `c` is an integer, so every term of the R1 float sum is
    exactly representable and the sum is order-independent (exact until
    2^52); tie correction is pure integer arithmetic until one final
    division — both engines produce bit-identical z before rounding.

    Scale: one groupBy on the value domain, one running-count window
    over |distinct values| rows (global order — same regime as the KS
    statistic; at 100 TB bin the value domain into fixed-width buckets
    first, which preserves ranks up to bin width), one scalar agg."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    s = ev.select(
        F.col("value").alias("v"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("is_c"),
    )
    g = s.groupBy("v").agg(
        F.count(F.lit(1)).alias("t"), F.sum("is_c").alias("c")
    )
    w_below = (
        F.sum("t").over(
            Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
        )
        - F.col("t")
    )
    w = g.withColumn("below", w_below)
    agg = w.agg(
        F.sum("c").cast("long").alias("n1"),
        F.sum(F.col("t") - F.col("c")).cast("long").alias("n2"),
        F.sum(F.col("c") * (F.col("below") + (F.col("t") + 1) / 2.0)).alias("r1"),
        F.sum(
            F.col("t") * F.col("t") * F.col("t") - F.col("t")
        ).cast("long").alias("tie3"),
    )
    n1, n2, r1, tie3 = F.col("n1"), F.col("n2"), F.col("r1"), F.col("tie3")
    u1 = r1 - n1 * (n1 + 1) / 2.0
    nn = n1 + n2
    sigma = F.sqrt(
        n1 * n2 / 12.0 * ((nn + 1) - tie3 * 1.0 / (nn * (nn - 1.0)))
    )
    return agg.select(
        "n1",
        "n2",
        F.round(u1, 2).alias("u1"),
        F.round((u1 - n1 * n2 / 2.0) / sigma, 4).alias("z"),
    )


@register(
    "bootstrap_mean_ci",
    """
    WITH x AS (
      SELECT event_id, value FROM events WHERE event_type = 'purchase'
    ),
    rep AS (
      SELECT b.b, value,
             -ln(((('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':' ||
                                   CAST(b.b AS VARCHAR)), 1, 8))::BIGINT + 1)
                  / 4294967296.0) ) AS w
      FROM x CROSS JOIN (SELECT unnest(generate_series(1, 20)) AS b) b
    ),
    means AS (SELECT b, sum(w * value) / sum(w) AS m FROM rep GROUP BY b),
    ord AS (SELECT m, row_number() OVER (ORDER BY m) AS r FROM means)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM x) AS n,
           (SELECT round(avg(value), 4) FROM x) AS mean,
           round(max(CASE WHEN r = 2 THEN m END), 4) AS ci_lo,
           round(max(CASE WHEN r = 19 THEN m END), 4) AS ci_hi
    FROM ord
    """,
    tags=["stats", "sampling"],
)
def bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bayesian bootstrap (Rubin 1981) 90% CI for the mean purchase
    value: 20 replicates, each weighting every row by an Exponential(1)
    draw derived from md5(event_id, replicate) — deterministic,
    engine-independent randomness (the repo's seeded-sampling idiom),
    so the whole resampling plan is reproducible and oracle-checkable,
    unlike rand()-based bootstraps. CI bounds are the 2nd/19th order
    statistics of the replicate means.

    Scale: the corpus streams ONCE through a 20-way explode (constant
    fan-out) into a 20-group map-side-combined agg — no per-replicate
    rescan, no driver-side resampling; the classic counting-bootstrap
    would need a Poisson draw per (row, replicate) and this weighted
    form is its smooth equivalent at identical cost. Replicate-mean
    float sums carry ~1e-14 cross-engine reassociation noise, absorbed
    by the 4-dp round (accepted-noise class, cf. embedding_standardize)."""
    ev = _t(spark, sf_dir, "events")
    x = ev.filter(F.col("event_type") == "purchase").select("event_id", "value")
    rep = x.select(
        "value",
        F.explode(F.sequence(F.lit(1), F.lit(20))).alias("b"),
        "event_id",
    ).select(
        "b",
        "value",
        (-F.log(
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("event_id").cast("string"),
                                F.lit(":"),
                                F.col("b").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                + 1
            )
            / F.lit(4294967296.0)
        )).alias("w"),
    )
    means = rep.groupBy("b").agg(
        (F.sum(F.col("w") * F.col("value")) / F.sum("w")).alias("m")
    )
    ordw = Window.orderBy("m")
    ordd = means.withColumn("r", F.row_number().over(ordw))
    stats = x.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg("value"), 4).alias("mean"),
    )
    ci = ordd.agg(
        F.round(F.max(F.when(F.col("r") == 2, F.col("m"))), 4).alias("ci_lo"),
        F.round(F.max(F.when(F.col("r") == 19, F.col("m"))), 4).alias("ci_hi"),
    )
    return stats.join(ci)


@register(
    "theil_sen_daily_trend",
    """
    WITH d AS (
      SELECT epoch(date_trunc('day', ts)) / 86400 AS day,
             round(sum(value), 2) AS rev
      FROM events GROUP BY 1
    ),
    slopes AS (
      SELECT (b.rev - a.rev) / (b.day - a.day) AS slope
      FROM d a JOIN d b ON b.day > a.day
    ),
    ms AS (
      SELECT slope, row_number() OVER (ORDER BY slope) AS r,
             count(*) OVER () AS n
      FROM slopes
    ),
    med_slope AS (
      SELECT avg(slope) AS m FROM ms
      WHERE r IN ((n + 1) // 2, (n + 2) // 2)
    ),
    resid AS (
      SELECT d.rev - ms.m * d.day AS b0, ms.m AS m
      FROM d CROSS JOIN med_slope ms
    ),
    rms AS (
      SELECT b0, m, row_number() OVER (ORDER BY b0) AS r, count(*) OVER () AS n
      FROM resid
    )
    SELECT round(max(m), 6) AS slope,
           round(avg(b0), 4) AS intercept,
           (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_days
    FROM rms WHERE r IN ((n + 1) // 2, (n + 2) // 2)
    """,
    tags=["stats", "timeseries"],
)
def theil_sen_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily revenue: median of all pairwise
    day-to-day slopes, intercept = median residual — the estimator that
    shrugs off the outlier days that wreck OLS
    (cf. revenue_trend_regression). Medians over even counts average the
    two middle order statistics (row_number pins both engines to the
    same pair).

    Scale: the pair join is quadratic in DAYS, not rows — the daily
    pre-aggregation reduces any corpus to |date-range| rows first, so
    the pair set is bounded (~66k pairs for a year) and broadcastable;
    daily sums are rounded to 2 dp before differencing (exact-operand
    class), making every slope bit-identical across engines."""
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(
        (F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / 86400)
        .cast("long")
        .alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("rev"))
    a = d.select(F.col("day").alias("day_a"), F.col("rev").alias("rev_a"))
    slopes = a.join(d, F.col("day") > F.col("day_a")).select(
        (
            (F.col("rev") - F.col("rev_a")) / (F.col("day") - F.col("day_a"))
        ).alias("slope")
    )
    wn = Window.orderBy("slope")
    ms = slopes.select(
        "slope",
        F.row_number().over(wn).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    med_slope = ms.filter(
        (F.col("r") == F.floor((F.col("n") + 1) / 2))
        | (F.col("r") == F.floor((F.col("n") + 2) / 2))
    ).agg(F.avg("slope").alias("m"))
    resid = d.join(F.broadcast(med_slope)).select(
        (F.col("rev") - F.col("m") * F.col("day")).alias("b0"), "m"
    )
    wb = Window.orderBy("b0")
    rms = resid.select(
        "b0",
        "m",
        F.row_number().over(wb).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    med_int = rms.filter(
        (F.col("r") == F.floor((F.col("n") + 1) / 2))
        | (F.col("r") == F.floor((F.col("n") + 2) / 2))
    ).agg(
        F.round(F.max("m"), 6).alias("slope"),
        F.round(F.avg("b0"), 4).alias("intercept"),
    )
    n_days = d.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    return med_int.join(n_days)


@register(
    "asof_next_purchase_after_error",
    """
    WITH tagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN event_type = 'error' THEN 0 ELSE 1 END AS tag
      FROM events WHERE event_type IN ('purchase', 'error')
    ),
    carried AS (
      SELECT user_id, ts, event_id, value, tag,
        first_value(CASE WHEN tag = 1 THEN value END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY ts, event_id, tag
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS purchase_value_asof
      FROM tagged
    )
    SELECT event_id, user_id,
           round(value, 2) AS value,
           round(purchase_value_asof, 2) AS purchase_value_asof
    FROM carried WHERE tag = 0
    """,
    tags=["asof", "window"],
)
def asof_next_purchase_after_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: for every error, the value of the user's NEXT
    purchase at-or-after it — the mirror of
    asof_last_error_before_purchase (operators/asof.asof_join_forward,
    same union+window plan, one shuffle, no range join). Ties at equal
    (ts, event_id) resolve with the purchase sorting after the error,
    so a simultaneous purchase matches — the same at-boundary semantics
    as the backward join."""
    from reddit_tech_jobs_data_pipeline_spark.operators.asof import asof_join_forward

    ev = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error")
    purchases = ev.filter(F.col("event_type") == "purchase").withColumnRenamed(
        "value", "purchase_value"
    )
    joined = asof_join_forward(
        errors,
        purchases,
        by=["user_id"],
        ts_col="ts",
        payload_cols=["purchase_value"],
        tiebreaker="event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("value"),
        F.round("purchase_value_asof", 2).alias("purchase_value_asof"),
    )


@register(
    "winsorized_stats",
    """
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) - 1 AS r,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    marks AS (
      SELECT event_type, max(n) AS n,
        max(CASE WHEN r = CAST(floor(0.05 * (n - 1)) AS BIGINT)     THEN value END) AS v05a,
        max(CASE WHEN r = CAST(floor(0.05 * (n - 1)) AS BIGINT) + 1 THEN value END) AS v05b,
        max(CASE WHEN r = CAST(floor(0.95 * (n - 1)) AS BIGINT)     THEN value END) AS v95a,
        max(CASE WHEN r = CAST(floor(0.95 * (n - 1)) AS BIGINT) + 1 THEN value END) AS v95b
      FROM ranked GROUP BY event_type
    ),
    q AS (
      SELECT event_type, n,
        v05a + (0.05 * (n - 1) - floor(0.05 * (n - 1)))
             * (coalesce(v05b, v05a) - v05a) AS q05,
        v95a + (0.95 * (n - 1) - floor(0.95 * (n - 1)))
             * (coalesce(v95b, v95a) - v95a) AS q95
      FROM marks
    )
    SELECT e.event_type,
           CAST(max(q.n) AS BIGINT) AS n,
           round(max(q05), 4) AS q05,
           round(max(q95), 4) AS q95,
           round(avg(value), 4) AS mean_raw,
           round(avg(greatest(q05, least(q95, value))), 4) AS mean_wins,
           round(stddev_samp(value), 4) AS sd_raw,
           round(stddev_samp(greatest(q05, least(q95, value))), 4) AS sd_wins
    FROM events e JOIN q ON e.event_type = q.event_type
    GROUP BY e.event_type
    """,
    tags=["stats", "quality"],
)
def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized moments per event type: clip values to the exact
    [p05, p95] band (linear-interpolated order statistics computed
    MANUALLY from row_number ranks — percentile_cont/percentile built-ins
    interpolate with engine-specific arithmetic, so both engines here
    run the identical lo + frac*(hi-lo) on the identical positional
    values) and report raw vs clipped mean/std — the outlier-robust
    moment pair a metrics pipeline publishes alongside zscore_outliers'
    row-level flags. One rank window + K-row quantile table broadcast
    back onto the stream; two aggs share the event_type partitioning."""
    ev = _t(spark, sf_dir, "events")
    wr = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = ev.select(
        "event_type",
        "value",
        (F.row_number().over(wr) - 1).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )

    def at(pos_expr):
        return F.max(F.when(F.col("r") == pos_expr, F.col("value")))

    lo05 = F.floor(0.05 * (F.col("n") - 1))
    lo95 = F.floor(0.95 * (F.col("n") - 1))
    marks = ranked.groupBy("event_type").agg(
        F.max("n").alias("n"),
        at(lo05).alias("v05a"),
        at(lo05 + 1).alias("v05b"),
        at(lo95).alias("v95a"),
        at(lo95 + 1).alias("v95b"),
    )
    f05 = 0.05 * (F.col("n") - 1) - F.floor(0.05 * (F.col("n") - 1))
    f95 = 0.95 * (F.col("n") - 1) - F.floor(0.95 * (F.col("n") - 1))
    q = marks.select(
        "event_type",
        "n",
        (
            F.col("v05a")
            + f05 * (F.coalesce(F.col("v05b"), F.col("v05a")) - F.col("v05a"))
        ).alias("q05"),
        (
            F.col("v95a")
            + f95 * (F.coalesce(F.col("v95b"), F.col("v95a")) - F.col("v95a"))
        ).alias("q95"),
    )
    clipped = F.greatest(F.col("q05"), F.least(F.col("q95"), F.col("value")))
    return (
        ev.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.round(F.max("q05"), 4).alias("q05"),
            F.round(F.max("q95"), 4).alias("q95"),
            F.round(F.avg("value"), 4).alias("mean_raw"),
            F.round(F.avg(clipped), 4).alias("mean_wins"),
            F.round(F.stddev_samp("value"), 4).alias("sd_raw"),
            F.round(F.stddev_samp(clipped), 4).alias("sd_wins"),
        )
    )


@register(
    "seasonal_residual_outliers",
    """
    WITH prof AS (
      SELECT event_type, CAST(hour(ts) AS BIGINT) AS h,
             avg(value) AS mu, stddev_samp(value) AS sigma
      FROM events GROUP BY 1, 2
    )
    SELECT event_id, e.event_type, CAST(hour(ts) AS BIGINT) AS h,
           round(value, 2) AS value,
           round((value - mu) / sigma, 4) AS seasonal_z
    FROM events e JOIN prof p
      ON e.event_type = p.event_type AND CAST(hour(e.ts) AS BIGINT) = p.h
    WHERE sigma > 0 AND abs(round((value - mu) / sigma, 4)) > 3.0
    """,
    tags=["stats", "timeseries", "quality"],
)
def seasonal_residual_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly detection: z-score each event against
    its OWN (type, hour-of-day) profile instead of the global moments —
    the detector that doesn't page you for the nightly traffic dip
    zscore_outliers would flag. The profile is |types|x24 rows
    (broadcast); the corpus streams through once. Degenerate cells
    (sigma = 0) are excluded on both engines. Membership gates on the
    4-dp ROUNDED z (the same value the output carries), not the raw
    one: Spark and DuckDB can disagree in the last ulp of avg/stddev
    (partition merge order), and a raw > 3.0 gate would let a
    borderline event flip in/out of the result set — the r10 advisor's
    row-count divergence. boundary_margin.py covers the residual
    rounding-boundary risk as for every rounded column."""
    ev = _t(spark, sf_dir, "events")
    h = F.hour("ts").cast("long")
    prof = ev.groupBy(F.col("event_type"), h.alias("h")).agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.withColumn("h", h)
        .join(F.broadcast(prof), ["event_type", "h"])
        .filter((F.col("sigma") > 0) & (F.abs(F.round(z, 4)) > 3.0))
        .select(
            "event_id",
            "event_type",
            "h",
            F.round("value", 2).alias("value"),
            F.round(z, 4).alias("seasonal_z"),
        )
    )
