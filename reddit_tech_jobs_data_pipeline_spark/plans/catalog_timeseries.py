"""Time-series and ranked-analytics query shapes over ``events`` and the
sales tables: OHLC daily resampling (ordered-aggregate), fixed-width
histogram, event-sequence funnel, top-k-per-group, and a banded range
self-join.

Determinism notes: ordered aggregates (open/close) break ts ties with
``event_id`` on both engines; ranked top-k orders on the ROUNDED measure
with a key tiebreaker; histogram buckets use plain floor arithmetic
because DuckDB lacks ``width_bucket`` — identical doubles floor
identically in both engines.

Scale notes (SCALE.md): OHLC and the funnel are single-shuffle
aggregations on (day,type)/user_id; the range join shuffles both sides
on user_id and applies the time band as a post-join filter — at 100 TB
add a coarse time-bucket equi-key (date) to the join key to bound the
per-key cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.plans.catalog import _t, register


@register(
    "ohlc_daily",
    """
    SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
           round(first(value ORDER BY ts, event_id), 2) AS open,
           round(max(value), 2)                          AS high,
           round(min(value), 2)                          AS low,
           round(last(value ORDER BY ts, event_id), 2)   AS close,
           count(*) AS n
    FROM events
    GROUP BY 1, 2
    ORDER BY day, event_type
    """,
    tags=["timeseries", "agg"],
)
def ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    # open/close = min_by/max_by over a (ts, event_id) struct — Spark
    # orders structs lexicographically, matching the oracle's
    # first(... ORDER BY ts, event_id)
    ev = _t(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type")
        .agg(
            F.round(F.min_by("value", key), 2).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(F.max_by("value", key), 2).alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("day", "event_type")
    )


@register(
    "price_histogram",
    """
    SELECT CAST(least(floor(o_totalprice / 25000.0), 19) AS INTEGER) AS bucket,
           count(*) AS n_orders,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price
    FROM orders
    GROUP BY bucket
    ORDER BY bucket
    """,
    tags=["agg", "histogram"],
)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 25000.0), F.lit(19)).cast("int")
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("bucket")
    )


@register(
    "conversion_funnel",
    """
    WITH per_user AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view'     THEN ts END) AS first_view,
             max(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase
      FROM events GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           CAST(sum(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed,
           CAST(sum(CASE WHEN first_view IS NOT NULL
                          AND last_purchase > first_view THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
    FROM per_user
    """,
    tags=["timeseries", "funnel", "agg"],
)
def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # two-stage sequence funnel (view → later purchase) as conditional
    # min/max per user — one shuffle, no self-join
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "last_purchase"
        ),
    )
    viewed = F.col("first_view").isNotNull()
    converted = viewed & (F.col("last_purchase") > F.col("first_view"))
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(viewed.cast("long")).alias("n_viewed"),
        F.sum(converted.cast("long")).alias("n_converted"),
    )


@register(
    "top3_parts_per_brand",
    """
    SELECT p_brand, l_partkey, revenue, rn
    FROM (
      SELECT p_brand, l_partkey, revenue,
             CAST(row_number() OVER (PARTITION BY p_brand
                                     ORDER BY revenue DESC, l_partkey) AS BIGINT) AS rn
      FROM (
        SELECT p_brand, l_partkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, l_partkey
      )
    ) WHERE rn <= 3
    ORDER BY p_brand, rn
    """,
    tags=["window", "topk", "join"],
)
def top3_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rank on the ROUNDED revenue so cross-engine summation-order noise
    # can't reorder near-ties; l_partkey makes the order total
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    per_part = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "l_partkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )
    w = Window.partitionBy("p_brand").orderBy(F.col("revenue").desc(), F.col("l_partkey"))
    return (
        per_part.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .orderBy("p_brand", "rn")
    )


@register(
    "error_purchase_range_join",
    """
    SELECT e1.user_id AS user_id, count(*) AS n_pairs
    FROM events e1 JOIN events e2
      ON e1.user_id = e2.user_id
     AND e1.event_type = 'error'
     AND e2.event_type = 'purchase'
     AND e2.ts > e1.ts
     AND e2.ts <= e1.ts + INTERVAL 1 HOUR
    GROUP BY e1.user_id
    ORDER BY user_id
    """,
    tags=["join", "range", "timeseries"],
)
def error_purchase_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # banded range self-join: equi-shuffle on user_id, band predicate as
    # join condition (Catalyst evaluates it inside the sort-merge join)
    ev = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id"), F.col("ts").alias("err_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("buy_ts")
    )
    pairs = errors.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("buy_ts") > F.col("err_ts"))
        & (F.col("buy_ts") <= F.col("err_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    return (
        pairs.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("user_id")
    )


@register(
    "locf_forward_fill",
    """
    SELECT event_id, user_id,
           round(last_value(CASE WHEN event_type = 'purchase' THEN value END
                            IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             4) AS last_purchase_value
    FROM events ORDER BY user_id, event_id
    """,
    tags=["timeseries", "window", "imputation"],
)
def locf_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward imputation: every event carries
    the user's most recent purchase value (NULL before the first
    purchase) — the standard sparse-signal densification for feature
    pipelines. Spark's `last(..., ignorenulls=True)` over a running
    frame ≡ DuckDB's `last_value(... IGNORE NULLS)`; the (ts, event_id)
    ordering is total so both engines pick the same carried row. One
    shuffle on user_id; the carried value is data, not arithmetic, so
    the round is representational only."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    observed = F.when(F.col("event_type") == "purchase", F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.last(observed, ignorenulls=True).over(w), 4).alias(
            "last_purchase_value"
        ),
    ).orderBy("user_id", "event_id")


@register(
    "linear_interpolate_value",
    """
    WITH s AS (
      SELECT event_id, user_id, epoch_us(ts) AS tu,
        last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END
                   IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
        first_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END
                    IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM events
    )
    SELECT event_id, user_id,
           round(CASE WHEN nt = pt THEN pv
                      ELSE pv + (nv - pv) * ((tu - pt) / (nt - pt)) END,
                 4) AS interp_value
    FROM s ORDER BY user_id, event_id
    """,
    tags=["timeseries", "window", "imputation"],
)
def linear_interpolate_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of the purchase-value signal at every event
    time: blend the nearest purchase before and after by the elapsed-
    time fraction (NULL outside the observed range) — LOCF's smooth
    sibling for feature densification. Time runs in integer
    microseconds, the blend fraction is one IEEE division of identical
    integers, and the arithmetic is ordered identically on both
    engines. One shuffle on user_id; the forward and backward
    ignore-nulls windows share it."""
    ev = _t(spark, sf_dir, "events")
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    is_p = F.col("event_type") == "purchase"
    tu = F.unix_micros("ts")
    pv = F.last(F.when(is_p, F.col("value")), ignorenulls=True).over(fwd)
    pt = F.last(F.when(is_p, tu), ignorenulls=True).over(fwd)
    nv = F.first(F.when(is_p, F.col("value")), ignorenulls=True).over(bwd)
    nt = F.first(F.when(is_p, tu), ignorenulls=True).over(bwd)
    s = ev.select(
        "event_id",
        "user_id",
        tu.alias("tu"),
        pv.alias("pv"),
        pt.alias("pt"),
        nv.alias("nv"),
        nt.alias("nt"),
    )
    interp = F.when(F.col("nt") == F.col("pt"), F.col("pv")).otherwise(
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * ((F.col("tu") - F.col("pt")) / (F.col("nt") - F.col("pt")))
    )
    return s.select(
        "event_id", "user_id", F.round(interp, 4).alias("interp_value")
    ).orderBy("user_id", "event_id")


@register(
    "hopping_window_counts",
    """
    WITH h AS (
      SELECT event_type, value,
             make_timestamp((epoch_us(ts) // 1800000000 - i) * 1800000000)
               AS wstart
      FROM events, unnest([0, 1]) AS t(i)
      WHERE epoch_us(ts) >= (epoch_us(ts) // 1800000000 - i) * 1800000000
        AND epoch_us(ts) <
            (epoch_us(ts) // 1800000000 - i) * 1800000000 + 3600000000
    )
    SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM h GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["timeseries", "window", "hopping", "streaming-semantics"],
)
def hopping_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) window aggregation — 1-hour windows every 30
    minutes, so each event lands in width/slide = 2 windows. Spark's
    native `window(ts, width, slide)` expands the assignment inside
    codegen (the same operator Structured Streaming uses, here in
    batch); the oracle replicates the epoch-aligned window starts with
    integer-microsecond arithmetic and a 2-element unnest. Window
    starts stay tz-naive on both engines (make_timestamp, not
    to_timestamp). One shuffle on (window, event_type)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


# ===========================================================================
# CUSUM changepoint scan + finite-window EWMA — the two classic control-
# chart smoothers over per-user event streams. CUSUM's reset-on-alarm is
# a clamped recurrence (sequential partition scan vs recursive-CTE oracle, precedent:
# capped_running_balance); EWMA over a FINITE K-lag window is a banded
# self-join with an ordered fold so both engines sum in lag order.
# ===========================================================================


_CUSUM_ORACLE = """
    WITH RECURSIVE
    ev AS (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    sc(user_id, event_id, rn, s, alarm) AS (
      SELECT user_id, event_id, rn,
             greatest(CAST(0.0 AS DOUBLE), value - CAST(55.0 AS DOUBLE)),
             greatest(CAST(0.0 AS DOUBLE), value - CAST(55.0 AS DOUBLE))
               > CAST(150.0 AS DOUBLE)
      FROM ev WHERE rn = 1
      UNION ALL
      SELECT e.user_id, e.event_id, e.rn,
             greatest(CAST(0.0 AS DOUBLE),
                      (CASE WHEN b.alarm THEN CAST(0.0 AS DOUBLE) ELSE b.s END)
                      + e.value - CAST(55.0 AS DOUBLE)),
             greatest(CAST(0.0 AS DOUBLE),
                      (CASE WHEN b.alarm THEN CAST(0.0 AS DOUBLE) ELSE b.s END)
                      + e.value - CAST(55.0 AS DOUBLE)) > CAST(150.0 AS DOUBLE)
      FROM sc b JOIN ev e ON e.user_id = b.user_id AND e.rn = b.rn + 1
    )
    SELECT event_id, user_id, round(s, 4) AS cusum, alarm FROM sc
    """


@register(
    "cusum_changepoint",
    _CUSUM_ORACLE,
    tags=["timeseries", "sequential", "drift"],
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM control chart per user (Page 1954): accumulate
    positive drift of `value` above the in-control mean, alarm when the
    statistic crosses the decision threshold, reset after alarm — the
    standard sequential changepoint detector for per-key metric streams
    (a drift monitor that reacts in O(shift) samples, unlike windowed
    means). Reset-on-alarm makes the state non-window-expressible
    (clamped recurrence class, see operators/sequential.py) — Spark runs
    the designed sequential partition scan (operators/sequential.py: one
    mapInPandas pass over user-sorted partitions); the oracle replays the
    identical recurrence as a recursive CTE. Python floats and DuckDB
    doubles execute the same IEEE-754 sequence, so values are
    bit-identical before the cosmetic 4-dp round."""
    from reddit_tech_jobs_data_pipeline_spark.operators.sequential import cusum_scan

    ev = _t(spark, sf_dir, "events")
    out = cusum_scan(ev, target=55.0, threshold=150.0)
    return out.select(
        "event_id", "user_id", F.round("cusum", 4).alias("cusum"), "alarm"
    )


@register(
    "ewma_window_smoothing",
    """
    WITH ev AS (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    pairs AS (
      SELECT a.user_id, a.event_id, a.rn,
             a.rn - b.rn AS lag,
             b.value * power(CAST(0.75 AS DOUBLE), a.rn - b.rn) AS wx,
             power(CAST(0.75 AS DOUBLE), a.rn - b.rn) AS w
      FROM ev a JOIN ev b
        ON b.user_id = a.user_id AND b.rn BETWEEN a.rn - 15 AND a.rn
    )
    SELECT user_id, event_id,
           round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                          list(wx ORDER BY lag)),
                             (acc, x) -> acc + x)
                 / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                            list(w ORDER BY lag)),
                               (acc, x) -> acc + x), 4) AS ewma
    FROM pairs GROUP BY user_id, event_id
    """,
    tags=["timeseries", "window"],
)
def ewma_window_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Finite-window EWMA (Roberts 1959, truncated at K=16 lags,
    alpha=0.25): weighted mean of the last K observations with weights
    (1-alpha)^lag, normalized by the realized weight mass so early rows
    with short history are proper means. Truncation keeps the recurrence
    window-expressible AND numerically stable (the closed-form infinite
    EWMA rewrite overflows (1-a)^-rn past ~700 rows).

    Determinism: both engines fold the <=16 weighted terms in explicit
    lag order (Spark: array_sort(collect_list(struct(lag, wx))) then an
    aggregate fold; DuckDB: list(wx ORDER BY lag) then list_reduce), so
    the float sums are bit-identical — the same ordered-fold idiom as
    the pagerank oracle.

    Scale: one window for rn, one banded self-join (row growth = K, a
    constant), one groupBy — all shuffle on user_id and share the
    partitioning. At 100 TB the banded join is the honest cost of
    exactness; the streaming form is the infinite-EWMA recurrence via
    the sequential-scan escape hatch."""
    ev = _t(spark, sf_dir, "events")
    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
    )
    base = ev.select("user_id", "event_id", "ts", "value").withColumn(
        "rn", rn
    ).drop("ts")
    a = base.select(
        "user_id", "event_id", F.col("rn").alias("rn_a")
    )
    b = base.select(
        F.col("user_id").alias("user_id_b"),
        F.col("value").alias("value_b"),
        F.col("rn").alias("rn_b"),
    )
    lag = F.col("rn_a") - F.col("rn_b")
    w = F.pow(F.lit(0.75), lag)
    pairs = a.join(
        b,
        (F.col("user_id_b") == F.col("user_id"))
        & F.col("rn_b").between(F.col("rn_a") - 15, F.col("rn_a")),
    ).select(
        "user_id",
        "event_id",
        lag.alias("lag"),
        (F.col("value_b") * w).alias("wx"),
        w.alias("w"),
    )

    def _folded(col: str):
        arr = F.array_sort(F.collect_list(F.struct(F.col("lag"), F.col(col))))
        return F.aggregate(
            F.transform(arr, lambda s: s[col]),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return pairs.groupBy("user_id", "event_id").agg(
        F.round(_folded("wx") / _folded("w"), 4).alias("ewma")
    )


@register(
    "streaming_cusum_monitor",
    _CUSUM_ORACLE,
    tags=["timeseries", "sequential", "streaming", "drift"],
)
def streaming_cusum_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUSUM control chart as a STREAMING monitor: the event history
    is replayed in 5 chronological micro-batches (one time-span parquet
    file per trigger) with the per-user statistic carried across batch
    boundaries through a persisted state store
    (streaming/cusum_monitor.py). The recurrence is exact under
    splitting, so the output must hash-match the SAME recursive-CTE
    oracle as the one-shot batch scan (cusum_changepoint) — the
    strongest correctness statement a stateful stream can make: state
    carry-over provably loses nothing."""
    from reddit_tech_jobs_data_pipeline_spark.streaming.cusum_monitor import (
        run_cusum_monitor_batchlike,
    )

    out = run_cusum_monitor_batchlike(
        spark, sf_dir, n_chunks=5, target=55.0, threshold=150.0
    )
    return out.select(
        "event_id", "user_id", F.round("cusum", 4).alias("cusum"), "alarm"
    )
