"""As-of join + statistical/collection aggregate batteries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
