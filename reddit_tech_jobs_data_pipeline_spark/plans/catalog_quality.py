"""Statistical-quality and profiling query shapes: Shannon entropy,
chi-squared independence, Welch's t-test, the Kolmogorov-Smirnov
statistic, time-weighted averages, gaps-and-islands runs, single-pass
table profiling, and ratio-to-report shares.

These are the distribution-monitoring operators a training-data pipeline
runs continuously (drift detection, A/B gating, corpus audits) — the
statistical complement to the dedup/quality gates in catalog_scale.py.
The reference's analytics stop at frequency dashboards (dags/dag.py
aggregates post counts by month/technology at dag.py:430-460); these
generalize that to distributional comparisons.

Determinism notes (playbook rules):
* every statistic is computed with IDENTICAL arithmetic on both engines
  (same operand order, same constants), so the doubles agree to ~1 ulp
  and a 4-dp round is safe;
* time weights are integer microseconds — Spark's loader truncates the
  parquet NANOS timestamps to µs exactly like DuckDB (sources/
  testdata.py), so ``unix_micros`` ≡ ``epoch_us`` bit-for-bit;
* KS cumulative counts are integers over distinct values (no ties inside
  a window frame), and IEEE division of identical integers is exact-
  deterministic, so the max-of-abs-diffs agrees before rounding;
* the profile emits numeric min/max as rounded doubles and string/date
  min/max as strings — never double→string casts (engine formatting
  differs).

Scale notes (SCALE.md): entropy/TWAP/islands are one shuffle on user_id
(windows + final agg share the partitioning); chi²/t-test/KS reduce to
tiny keyed aggregates; the profile reads the table ONCE for all columns
(the oracle's UNION ALL re-scans per column — wrong at 100 TB); KS's
global-sort window is over |distinct values| rows — at 100 TB bin the
ECDF (fixed-width histogram) instead of exact sorting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.plans.catalog import _t, register


@register(
    "user_event_entropy",
    """
    WITH c AS (
      SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2
    ), w AS (
      SELECT user_id, n, sum(n) OVER (PARTITION BY user_id) AS tot FROM c
    )
    SELECT user_id,
           round(-sum((n * 1.0 / tot) * ln(n * 1.0 / tot)), 4) AS entropy,
           CAST(count(*) AS BIGINT) AS n_types
    FROM w GROUP BY user_id ORDER BY user_id
    """,
    tags=["stats", "entropy", "drift"],
)
def user_event_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution — the
    standard per-key diversity/drift signal. One shuffle on user_id: the
    (user, type) count, the per-user total (window sum), and the final
    per-user aggregation all share the partitioning."""
    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    tot = F.sum("n").over(Window.partitionBy("user_id"))
    p = F.col("n") / F.col("tot")
    return (
        c.withColumn("tot", tot)
        .groupBy("user_id")
        .agg(
            F.round(-F.sum(p * F.log(p)), 4).alias("entropy"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
        )
        .orderBy("user_id")
    )


@register(
    "chi_squared_type_bucket",
    """
    WITH o AS (
      SELECT event_type AS t,
             CAST(json_extract_string(props, '$.k') AS INTEGER) // 25 AS b,
             count(*) AS o
      FROM events GROUP BY 1, 2
    ), e AS (
      SELECT o,
             sum(o) OVER (PARTITION BY t) AS rt,
             sum(o) OVER (PARTITION BY b) AS ct,
             sum(o) OVER () AS n, t, b
      FROM o
    )
    SELECT round(sum((o - rt * ct * 1.0 / n) * (o - rt * ct * 1.0 / n)
                     / (rt * ct * 1.0 / n)), 4) AS chi2,
           CAST((count(DISTINCT t) - 1) * (count(DISTINCT b) - 1) AS BIGINT) AS dof
    FROM e
    """,
    tags=["stats", "chisq", "drift"],
)
def chi_squared_type_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-squared independence test of event_type × props-k
    quartile bucket. The contingency table is tiny (|types|×|buckets|
    cells), so the marginals are window sums over it — no re-scan of the
    fact table, and the expected-count arithmetic is ordered identically
    on both engines."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    o = ev.groupBy(
        F.col("event_type").alias("t"), F.floor(k / 25).alias("b")
    ).agg(F.count(F.lit(1)).alias("o"))
    cell = o.select(
        "t",
        "b",
        "o",
        F.sum("o").over(Window.partitionBy("t")).alias("rt"),
        F.sum("o").over(Window.partitionBy("b")).alias("ct"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    exp = F.col("rt") * F.col("ct") * F.lit(1.0) / F.col("n")
    dev = F.col("o") - exp
    return cell.agg(
        F.round(F.sum(dev * dev / exp), 4).alias("chi2"),
        ((F.count_distinct("t") - 1) * (F.count_distinct("b") - 1))
        .cast("long")
        .alias("dof"),
    )


@register(
    "welch_ttest_click_view",
    """
    WITH s AS (
      SELECT count(*) FILTER (WHERE event_type = 'click') AS n1,
             avg(value) FILTER (WHERE event_type = 'click') AS m1,
             var_samp(value) FILTER (WHERE event_type = 'click') AS v1,
             count(*) FILTER (WHERE event_type = 'view') AS n2,
             avg(value) FILTER (WHERE event_type = 'view') AS m2,
             var_samp(value) FILTER (WHERE event_type = 'view') AS v2
      FROM events WHERE event_type IN ('click', 'view')
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           round(m1 - m2, 4) AS mean_diff,
           round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 4) AS t_stat,
           round((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
                 / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                    + (v2 / n2) * (v2 / n2) / (n2 - 1)), 2) AS dof
    FROM s
    """,
    tags=["stats", "abtest"],
)
def welch_ttest_click_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test comparing `value` between the
    click and view arms — the A/B-gating primitive. ONE conditional-
    aggregation pass produces both arms' (n, mean, var); the statistic
    and Welch-Satterthwaite dof are scalar arithmetic on that single
    row, ordered identically in both engines."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type").isin("click", "view"))

    def arm(t: str, agg, col="value"):
        return agg(F.when(F.col("event_type") == t, F.col(col)))

    s = ev.agg(
        arm("click", F.count).alias("n1"),
        arm("click", F.avg).alias("m1"),
        arm("click", F.var_samp).alias("v1"),
        arm("view", F.count).alias("n2"),
        arm("view", F.avg).alias("m2"),
        arm("view", F.var_samp).alias("v2"),
    )
    se1 = F.col("v1") / F.col("n1")
    se2 = F.col("v2") / F.col("n2")
    return s.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.round(F.col("m1") - F.col("m2"), 4).alias("mean_diff"),
        F.round((F.col("m1") - F.col("m2")) / F.sqrt(se1 + se2), 4).alias("t_stat"),
        F.round(
            (se1 + se2) * (se1 + se2)
            / (se1 * se1 / (F.col("n1") - 1) + se2 * se2 / (F.col("n2") - 1)),
            2,
        ).alias("dof"),
    )


_KS_SQL = """
    WITH s AS (
      SELECT value,
             count(*) FILTER (WHERE event_type = 'click') AS ca,
             count(*) FILTER (WHERE event_type = 'view') AS cb
      FROM events WHERE event_type IN ('click', 'view')
      GROUP BY value
    ), c AS (
      SELECT sum(ca) OVER (ORDER BY value) AS cuma,
             sum(cb) OVER (ORDER BY value) AS cumb,
             sum(ca) OVER () AS ta,
             sum(cb) OVER () AS tb
      FROM s
    )
    SELECT round(max(abs(cuma * 1.0 / ta - cumb * 1.0 / tb)), 4) AS ks,
           CAST(max(ta) AS BIGINT) AS n1, CAST(max(tb) AS BIGINT) AS n2
    FROM c
    """


def _ks_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type").isin("click", "view"))
    return ev.groupBy("value").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("ca"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("cb"),
    )


def _ks_from_cums(c: DataFrame) -> DataFrame:
    gap = F.abs(
        F.col("cuma") * F.lit(1.0) / F.col("ta")
        - F.col("cumb") * F.lit(1.0) / F.col("tb")
    )
    return c.agg(
        F.round(F.max(gap), 4).alias("ks"),
        F.max("ta").cast("long").alias("n1"),
        F.max("tb").cast("long").alias("n2"),
    )


@register("ks_statistic_click_view", _KS_SQL, tags=["stats", "drift", "window"])
def ks_statistic_click_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic (max ECDF gap) between the
    click and view value distributions — the nonparametric drift gate.
    Grouping by value first makes the window frame tie-free, so both
    engines' running sums agree exactly; the cumulative counts are
    integers and the CDF division is IEEE-exact per row. This is the
    global-window oracle twin; ``ks_statistic_click_view_scale`` builds
    the same ECDF with the distributed prefix sum."""
    s = _ks_counts(spark, sf_dir)
    run = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    c = s.select(
        F.sum("ca").over(run).alias("cuma"),
        F.sum("cb").over(run).alias("cumb"),
        F.sum("ca").over(tot).alias("ta"),
        F.sum("cb").over(tot).alias("tb"),
    )
    return _ks_from_cums(c)


@register(
    "ks_statistic_click_view_scale",
    _KS_SQL,
    tags=["stats", "drift", "window", "scale"],
)
def ks_statistic_click_view_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB ECDF: both cumulative counts ride ONE two-phase
    distributed prefix sum over the distinct-value order
    (operators/packing.distributed_prefix_sum — range shuffle +
    bounded collect, no single-partition window), totals arrive as a
    broadcast scalar. Integer counts make the ECDF bit-identical to
    the windowed twin, so the same oracle gates it — strictly better
    than the binned-ECDF approximation the docstring used to defer to."""
    from reddit_tech_jobs_data_pipeline_spark.operators.packing import (
        distributed_prefix_sum,
    )

    s = _ks_counts(spark, sf_dir)
    ps = distributed_prefix_sum(
        s, [F.col("value")], {"ca": "cuma", "cb": "cumb"}
    )
    tot = s.agg(
        F.sum("ca").cast("long").alias("ta"), F.sum("cb").cast("long").alias("tb")
    )
    return _ks_from_cums(ps.crossJoin(F.broadcast(tot)))


@register(
    "time_weighted_value",
    """
    WITH s AS (
      SELECT user_id, value,
             epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
               - epoch_us(ts) AS w
      FROM events
    )
    SELECT user_id,
           round(sum(value * w) / sum(w), 4) AS twap,
           CAST(count(*) AS BIGINT) AS n_intervals
    FROM s WHERE w IS NOT NULL
    GROUP BY user_id ORDER BY user_id
    """,
    tags=["timeseries", "window"],
)
def time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP): each reading is held
    until the next event, weighted by the interval in integer
    microseconds. Spark's ns→µs truncation matches DuckDB's, so
    ``unix_micros`` ≡ ``epoch_us`` and the weights are bit-identical.
    One shuffle on user_id shared by the lead window and the final agg."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    weighted = ev.select(
        "user_id",
        "value",
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias("w"),
    ).filter(F.col("w").isNotNull())
    return (
        weighted.groupBy("user_id")
        .agg(
            F.round(F.sum(F.col("value") * F.col("w")) / F.sum("w"), 4).alias("twap"),
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
        )
        .orderBy("user_id")
    )


@register(
    "event_type_runs",
    """
    WITH s AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rk
      FROM events
    )
    SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS run_len,
           CAST(min(rn) AS BIGINT) AS start_rn
    FROM s GROUP BY user_id, event_type, rn - rk
    HAVING count(*) >= 3
    ORDER BY user_id, start_rn
    """,
    tags=["window", "islands", "sessionize"],
)
def event_type_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of ≥3 consecutive same-type events
    per user. The oracle uses the classic rn−rk difference trick (two
    window partitionings); Spark instead derives the run id with a
    lag-change flag + running sum so ALL windows and the final agg share
    the single user_id partitioning — one shuffle instead of two."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    chg = F.when(
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type")),
        1,
    ).otherwise(0)
    return (
        ev.select(
            "user_id",
            "event_type",
            F.row_number().over(w).alias("rn"),
            F.sum(chg).over(run).alias("run_id"),
        )
        .groupBy("user_id", "event_type", "run_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("run_len"),
            F.min("rn").cast("long").alias("start_rn"),
        )
        .filter(F.col("run_len") >= 3)
        .select("user_id", "event_type", "run_len", "start_rn")
        .orderBy("user_id", "start_rn")
    )


@register(
    "orders_profile",
    """
    SELECT 'o_custkey' AS col, count(*) AS n_rows,
           count(*) - count(o_custkey) AS n_nulls,
           count(DISTINCT o_custkey) AS n_distinct,
           CAST(min(o_custkey) AS DOUBLE) AS min_num,
           CAST(max(o_custkey) AS DOUBLE) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice),
           round(min(o_totalprice), 2), round(max(o_totalprice), 2), NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus), NULL, NULL,
           min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority), NULL, NULL,
           min(o_orderpriority), max(o_orderpriority)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
           count(DISTINCT o_orderdate), NULL, NULL,
           strftime(min(o_orderdate), '%Y-%m-%d'), strftime(max(o_orderdate), '%Y-%m-%d')
    FROM orders
    ORDER BY col
    """,
    tags=["profiling", "quality"],
)
def orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass data-profiling summary of `orders`: per column the row
    count, null count, exact distinct count, and min/max (numerics as
    rounded doubles, strings/dates as strings — never double→string,
    engine formatting differs). Spark computes ALL columns' statistics in
    ONE scan (multi-distinct is planned via Expand) and unpivots the
    1-row aggregate; the oracle's UNION ALL re-scans per column, which is
    exactly the anti-pattern this operator replaces at 100 TB."""
    orders = _t(spark, sf_dir, "orders")
    num_cols = {"o_custkey": 0, "o_totalprice": 2}
    str_cols = ["o_orderstatus", "o_orderpriority"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in list(num_cols) + str_cols + ["o_orderdate"]:
        aggs += [
            F.count(c).alias(f"{c}__cnt"),
            F.count_distinct(c).alias(f"{c}__nd"),
        ]
    for c in num_cols:
        aggs += [
            F.round(F.min(c).cast("double"), 2).alias(f"{c}__min"),
            F.round(F.max(c).cast("double"), 2).alias(f"{c}__max"),
        ]
    for c in str_cols:
        aggs += [F.min(c).alias(f"{c}__min"), F.max(c).alias(f"{c}__max")]
    aggs += [
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("o_orderdate__min"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("o_orderdate__max"),
    ]
    one = orders.agg(*aggs)
    rows = []
    for c in list(num_cols) + str_cols + ["o_orderdate"]:
        is_num = c in num_cols
        rows.append(
            "named_struct("
            f"'col', '{c}', "
            "'n_rows', n_rows, "
            f"'n_nulls', n_rows - `{c}__cnt`, "
            f"'n_distinct', `{c}__nd`, "
            f"'min_num', {f'`{c}__min`' if is_num else 'CAST(NULL AS DOUBLE)'}, "
            f"'max_num', {f'`{c}__max`' if is_num else 'CAST(NULL AS DOUBLE)'}, "
            f"'min_str', {'CAST(NULL AS STRING)' if is_num else f'`{c}__min`'}, "
            f"'max_str', {'CAST(NULL AS STRING)' if is_num else f'`{c}__max`'})"
        )
    return (
        one.select(F.explode(F.expr(f"array({', '.join(rows)})")).alias("p"))
        .select("p.*")
        .orderBy("col")
    )


@register(
    "nation_revenue_share",
    """
    WITH nr AS (
      SELECT r_name AS region, n_name AS nation,
             round(sum(o_totalprice), 2) AS revenue
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1, 2
    )
    SELECT region, nation, revenue,
           round(revenue / sum(revenue) OVER (PARTITION BY region), 4) AS share
    FROM nr ORDER BY region, nation
    """,
    tags=["analytics", "window", "ratio"],
)
def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's share of its region's revenue.
    The dimension joins broadcast (nation/region are tiny); the share
    window runs over the ~|nations| aggregate rows, and dividing the
    ROUNDED revenues keeps the 4-dp share identical across engines."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    nr = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    share = F.col("revenue") / F.sum("revenue").over(Window.partitionBy("region"))
    return nr.select(
        "region", "nation", "revenue", F.round(share, 4).alias("share")
    ).orderBy("region", "nation")


@register(
    "langid_trigram_rank",
    r"""
    WITH s0 AS (
      SELECT doc_id, lang,
             substr(trim(regexp_replace(lower(text), '\W+', ' ', 'g')), 1, 200) AS s
      FROM documents WHERE text IS NOT NULL
    ),
    b AS (SELECT doc_id, lang, s, length(s) AS n FROM s0 WHERE length(s) >= 3),
    g AS (
      SELECT doc_id, lang, substr(s, CAST(p AS INTEGER), 3) AS gram
      FROM b, unnest(range(1, n - 1)) t(p)
    ),
    lc AS (SELECT lang, gram, count(*) AS c FROM g GROUP BY 1, 2),
    lp AS (
      SELECT lang, gram,
             row_number() OVER (PARTITION BY lang ORDER BY c DESC, gram) AS pr
      FROM lc
    ),
    lpk AS (SELECT * FROM lp WHERE pr <= 100),
    dc AS (SELECT doc_id, lang AS true_lang, gram, count(*) AS c
           FROM g GROUP BY 1, 2, 3),
    dr AS (
      SELECT doc_id, true_lang, gram,
             row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram) AS dr
      FROM dc
    ),
    drk AS (SELECT * FROM dr WHERE dr <= 100),
    langs AS (SELECT DISTINCT lang FROM lpk),
    dist AS (
      SELECT d.doc_id, d.true_lang, l.lang AS cand,
             sum(coalesce(abs(d.dr - p.pr), 100)) AS dist
      FROM drk d CROSS JOIN langs l
      LEFT JOIN lpk p ON p.lang = l.lang AND p.gram = d.gram
      GROUP BY 1, 2, 3
    ),
    best AS (
      SELECT doc_id, true_lang, cand, dist,
             row_number() OVER (PARTITION BY doc_id ORDER BY dist, cand) AS rk
      FROM dist
    )
    SELECT doc_id, true_lang AS lang, cand AS pred_lang, CAST(dist AS BIGINT) AS dist
    FROM best WHERE rk = 1
    """,
    tags=["text", "quality", "langid", "scale"],
)
def langid_trigram_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained character-trigram language ID (Cavnar & Trenkle 1994):
    per-language top-100 trigram rank profiles are built from the labeled
    docs themselves, then every doc is classified by out-of-place rank
    distance to each profile over its 200-char normalized prefix (miss
    penalty = profile size; argmin, ties -> lowest code). The data-driven
    upgrade of functions/text.lang_id's fixed marker lists — no word
    list to maintain, works on languages the markers never covered.

    On the synthetic corpus the text is language-independent by
    construction, so predictions land near-uniformly — the point here is
    engine parity of the full train+classify pipeline (all-integer
    distances, total-order tiebreaks); tests/test_langid.py pins real
    discrimination on a controlled bilingual corpus.

    100 TB shape: see operators/langid.py — the model is langs*100 rows
    (broadcast by construction), training is one corpus pass + a window
    over the collapsed count table, classification one corpus pass with
    per-doc-bounded window state; prefix_len caps per-doc cost."""
    from reddit_tech_jobs_data_pipeline_spark.operators import langid

    docs = _t(spark, sf_dir, "documents")
    profiles = langid.ngram_profiles(docs, "lang", "text", 3, 100, 200)
    return langid.langid_classify(
        docs, profiles, "text", "doc_id", 3, 100, 200, carry_cols=("lang",)
    )


@register(
    "k_anonymity_report",
    """
    SELECT c_mktsegment, c_nationkey,
           count(*) AS n_rows,
           count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) AS n_sensitive,
           count(*) >= 5 AS k_anonymous,
           count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) >= 3 AS l_diverse
    FROM customer GROUP BY 1, 2
    """,
    tags=["privacy", "quality"],
)
def k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit over the (segment, nation)
    quasi-identifier with the account-balance thousand-bucket as the
    sensitive attribute — the re-identification check the direct-PII
    scrub cannot do (operators/privacy.py). One groupBy, group count
    bounded by the quasi domain."""
    from reddit_tech_jobs_data_pipeline_spark.operators import privacy

    cust = _t(spark, sf_dir, "customer").withColumn(
        "__sens", F.floor(F.col("c_acctbal") / 1000)
    )
    return privacy.anonymity_report(
        cust, ["c_mktsegment", "c_nationkey"], "__sens", k=5, l=3
    )


@register(
    "quasi_suppression_export",
    """
    WITH rep AS (
      SELECT c_mktsegment, c_nationkey FROM customer
      GROUP BY 1, 2
      HAVING count(*) >= 10
         AND count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) >= 5
    )
    SELECT c.c_mktsegment, count(*) AS n_kept
    FROM customer c JOIN rep USING (c_mktsegment, c_nationkey)
    GROUP BY 1
    """,
    tags=["privacy", "quality"],
)
def quasi_suppression_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The enforcement step: suppress every row whose quasi group fails
    k ≥ 10 or l ≥ 5, then count survivors per segment — what a
    privacy-gated export would actually ship. The keep-list is
    quasi-domain-sized and broadcasts; the corpus streams through once
    (operators/privacy.suppress_small_groups)."""
    from reddit_tech_jobs_data_pipeline_spark.operators import privacy

    cust = _t(spark, sf_dir, "customer").withColumn(
        "__sens", F.floor(F.col("c_acctbal") / 1000)
    )
    kept = privacy.suppress_small_groups(
        cust, ["c_mktsegment", "c_nationkey"], "__sens", k=10, l=5
    )
    return kept.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n_kept"))

# ===========================================================================
# Gopher-style hard rule battery + per-doc lexical diversity — the two
# document-quality gates beyond the weighted score (quality_score_filter)
# and the trained classifier (quality_classifier_*): named pass/fail rules
# with machine-readable reject reasons, and distribution-shape signals
# (entropy / type-token ratio) that catch degenerate generator loops the
# rule battery can't.
# ===========================================================================

_Q_STOP_SQL = "['the','a','an','and','or','of','to','is','in','it']"
_Q_TOKS = r"list_filter(regexp_split_to_array(lower(text), '\W+'), x -> x <> '')"


@register(
    "gopher_rules_filter",
    f"""
    WITH toks AS (SELECT doc_id, {_Q_TOKS} AS ws FROM documents),
    feat AS (
      SELECT doc_id, length(ws) AS n_words,
        CASE WHEN length(ws) > 0
             THEN list_aggregate(list_transform(ws, t -> length(t)), 'sum') * 1.0 / length(ws)
             ELSE 0.0 END AS mean_wl,
        length(list_filter(ws, t -> list_contains({_Q_STOP_SQL}, t))) AS n_stop,
        CASE WHEN length(ws) > 0
             THEN length(list_filter(ws, t -> regexp_matches(t, '^[a-z]+$'))) * 1.0 / length(ws)
             ELSE 0.0 END AS alpha_ratio,
        CASE WHEN length(ws) > 0
             THEN list_max(list_transform(list_distinct(ws),
                    w -> length(list_filter(ws, x -> x = w)))) * 1.0 / length(ws)
             ELSE 0.0 END AS top_freq,
        CASE WHEN length(ws) > 0
             THEN length(list_distinct(ws)) * 1.0 / length(ws)
             ELSE 0.0 END AS uniq_ratio
      FROM toks
    ),
    rules AS (
      SELECT doc_id, n_words,
             n_words BETWEEN 20 AND 90            AS r_word_count,
             mean_wl BETWEEN 3.0 AND 10.0         AS r_mean_word_len,
             n_stop >= 2                          AS r_stopwords,
             alpha_ratio >= 0.8                   AS r_alpha_words,
             top_freq <= 0.125                    AS r_top_word_freq,
             uniq_ratio >= 0.5                    AS r_unique_ratio
      FROM feat
    )
    SELECT doc_id, n_words,
           r_word_count, r_mean_word_len, r_stopwords,
           r_alpha_words, r_top_word_freq, r_unique_ratio,
           (r_word_count AND r_mean_word_len AND r_stopwords
            AND r_alpha_words AND r_top_word_freq AND r_unique_ratio) AS keep,
           coalesce(array_to_string(list_sort(
             list_filter([
               CASE WHEN NOT r_word_count    THEN 'word_count'    END,
               CASE WHEN NOT r_mean_word_len THEN 'mean_word_len' END,
               CASE WHEN NOT r_stopwords     THEN 'stopwords'     END,
               CASE WHEN NOT r_alpha_words   THEN 'alpha_words'   END,
               CASE WHEN NOT r_top_word_freq THEN 'top_word_freq' END,
               CASE WHEN NOT r_unique_ratio  THEN 'unique_ratio'  END
             ], x -> x IS NOT NULL)), ','), '') AS reject_reasons
    FROM rules
    """,
    tags=["text", "quality"],
)
def gopher_rules_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/Dolma-style HARD rule battery (Rae et al. 2021 §A1.1
    adapted to this corpus's parameters): each rule is a named boolean,
    `keep` is their conjunction, and `reject_reasons` is the sorted
    comma-joined list of failed rule names — the machine-readable audit
    trail a corpus-curation run ships alongside the filtered corpus
    (WHY did this doc drop?). Beyond-reference: the reference's only
    quality gate is the keyword validity filter (dags/dag.py keyword
    check); rule batteries are the standard LLM-corpus equivalent.

    All six rules are single-pass HOF expressions over the token array —
    no explode, no shuffle, scan-speed per doc. top-word frequency is
    O(|distinct| x |tokens|) per doc via a nested HOF (bounded by doc
    length; cheaper than an explode+groupBy at every scale because it
    never leaves the row). 100 TB: embarrassingly parallel map."""
    from reddit_tech_jobs_data_pipeline_spark.functions import text as textfn
    from reddit_tech_jobs_data_pipeline_spark.functions.extract import bind1, tokens

    docs = _t(spark, sf_dir, "documents")
    stop_arr = F.array(*[F.lit(s) for s in textfn.DEFAULT_STOPWORDS])

    # bind1: ONE tokenizer run feeds all six features — the token array
    # is mentioned ~10x across them (and top_freq's inner filter mentions
    # it once per DISTINCT word), so unbound it re-tokenized the text
    # O(distinct) times per row
    def _feats(ws):
        n = F.size(ws)
        nf = n.cast("double")
        mean_wl = F.when(
            n > 0,
            F.aggregate(
                F.transform(ws, lambda t: F.length(t)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).cast("double")
            / nf,
        ).otherwise(F.lit(0.0))
        n_stop = F.size(F.filter(ws, lambda t: F.array_contains(stop_arr, t)))
        alpha_ratio = F.when(
            n > 0,
            F.size(F.filter(ws, lambda t: t.rlike("^[a-z]+$"))).cast("double") / nf,
        ).otherwise(F.lit(0.0))
        top_freq = F.when(
            n > 0,
            F.array_max(
                F.transform(
                    F.array_distinct(ws),
                    lambda w: F.size(F.filter(ws, lambda x: x == w)),
                )
            ).cast("double")
            / nf,
        ).otherwise(F.lit(0.0))
        uniq_ratio = F.when(
            n > 0, F.size(F.array_distinct(ws)).cast("double") / nf
        ).otherwise(F.lit(0.0))
        return F.struct(
            n.cast("long").alias("n_words"),
            mean_wl.alias("mean_wl"),
            n_stop.alias("n_stop"),
            alpha_ratio.alias("alpha_ratio"),
            top_freq.alias("top_freq"),
            uniq_ratio.alias("uniq_ratio"),
        )

    feat = docs.select(
        "doc_id", bind1(tokens(F.col("text")), _feats).alias("__q")
    ).select("doc_id", "__q.*")
    rules = feat.select(
        "doc_id",
        "n_words",
        F.col("n_words").between(20, 90).alias("r_word_count"),
        F.col("mean_wl").between(3.0, 10.0).alias("r_mean_word_len"),
        (F.col("n_stop") >= 2).alias("r_stopwords"),
        (F.col("alpha_ratio") >= 0.8).alias("r_alpha_words"),
        (F.col("top_freq") <= 0.125).alias("r_top_word_freq"),
        (F.col("uniq_ratio") >= 0.5).alias("r_unique_ratio"),
    )
    rule_names = [
        ("r_word_count", "word_count"),
        ("r_mean_word_len", "mean_word_len"),
        ("r_stopwords", "stopwords"),
        ("r_alpha_words", "alpha_words"),
        ("r_top_word_freq", "top_word_freq"),
        ("r_unique_ratio", "unique_ratio"),
    ]
    keep = F.lit(True)
    for col, _ in rule_names:
        keep = keep & F.col(col)
    reasons = F.array_join(
        F.array_sort(
            F.filter(
                F.array(
                    *[
                        F.when(~F.col(col), F.lit(name))
                        for col, name in rule_names
                    ]
                ),
                lambda x: x.isNotNull(),
            )
        ),
        ",",
    )
    return rules.select(
        "doc_id",
        "n_words",
        *[F.col(c) for c, _ in rule_names],
        keep.alias("keep"),
        reasons.alias("reject_reasons"),
    )


@register(
    "word_entropy_ttr",
    """
    WITH w AS (
      SELECT doc_id, unnest(list_filter(
               regexp_split_to_array(lower(text), '\\W+'), x -> x <> '')) AS tok
      FROM documents
    ),
    c AS (SELECT doc_id, tok, count(*) AS n FROM w GROUP BY 1, 2),
    d AS (
      SELECT doc_id,
             CAST(sum(n) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             sum(n * ln(n)) AS sum_nlogn
      FROM c GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, n_types,
           round(ln(n_tokens) - sum_nlogn / n_tokens, 4) AS entropy,
           round(n_types * 1.0 / n_tokens, 4) AS ttr,
           (ln(n_tokens) - sum_nlogn / n_tokens) < 3.3 AS low_diversity
    FROM d WHERE n_tokens > 0
    """,
    tags=["text", "quality", "entropy"],
)
def word_entropy_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram entropy + type-token ratio — the lexical-
    diversity gate that catches degenerate/looping generator output the
    hard rules can't (a doc can pass every Gopher rule while cycling a
    tiny vocabulary). Entropy uses the factored identity
    H = ln(N) - (sum n_i ln n_i) / N so both engines sum the SAME
    per-type terms (one float sum over <=|vocab| operands per doc;
    4-dp round per the playbook, precedent: user_event_entropy).

    Scale: one explode + one (doc_id, tok) groupBy + one doc_id groupBy
    — both aggs map-side-combine and share the doc_id partitioning at
    100 TB. The explode is the honest cost (corpus token count); there
    is no per-doc state beyond two longs and a double."""
    from reddit_tech_jobs_data_pipeline_spark.functions.extract import tokens

    docs = _t(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    c = w.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("n"))
    d = c.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.col("n") * F.log(F.col("n"))).alias("sum_nlogn"),
    )
    ent = F.log(F.col("n_tokens")) - F.col("sum_nlogn") / F.col("n_tokens")
    return d.filter(F.col("n_tokens") > 0).select(
        "doc_id",
        "n_tokens",
        "n_types",
        F.round(ent, 4).alias("entropy"),
        F.round(F.col("n_types") * 1.0 / F.col("n_tokens"), 4).alias("ttr"),
        (ent < 3.3).alias("low_diversity"),
    )


@register(
    "dp_noisy_counts",
    """
    WITH c AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS true_count
      FROM events GROUP BY event_type
    ),
    n AS (
      SELECT event_type, true_count,
             (('0x' || substr(md5('dp:' || event_type), 1, 8))::BIGINT + 1)
               / 4294967296.0 AS u
      FROM c
    )
    SELECT event_type, true_count,
           round(true_count + (CASE WHEN u < 0.5 THEN 1.0 ELSE -1.0 END)
                 * ln(1.0 - 2.0 * abs(u - 0.5)) / 1.0, 4) AS noisy_count,
           round(abs((CASE WHEN u < 0.5 THEN 1.0 ELSE -1.0 END)
                 * ln(1.0 - 2.0 * abs(u - 0.5)) / 1.0), 4) AS abs_noise
    FROM n
    """,
    tags=["privacy", "quality"],
)
def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private histogram release: per-type counts plus
    Laplace(1/epsilon) noise at epsilon = 1 (sensitivity 1 for a
    count-per-user-disjoint-partition query). The Laplace draw inverts
    the CDF at a uniform derived from md5('dp:' || key) — the repo's
    seeded-randomness idiom, so the release is reproducible and
    oracle-checkable while still being a genuine Laplace mechanism under
    a per-release salt (rotate the salt string per release in
    production; a FIXED salt would let repeat queries average the noise
    away, which is exactly the DP budget accounting a real deployment
    tracks).

    Scale: one map-side-combined groupBy; noise is O(1) per group."""
    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("true_count")
    )
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("dp:"), F.col("event_type"))), 1, 8),
            16,
            10,
        ).cast("long")
        + 1
    ) / F.lit(4294967296.0)
    noise = F.when(u < 0.5, F.lit(1.0)).otherwise(F.lit(-1.0)) * F.log(
        1.0 - 2.0 * F.abs(u - 0.5)
    )
    return c.select(
        "event_type",
        "true_count",
        F.round(F.col("true_count") + noise, 4).alias("noisy_count"),
        F.round(F.abs(noise), 4).alias("abs_noise"),
    )


@register(
    "benford_digit_audit",
    """
    WITH d AS (
      SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS digit,
             count(*) AS observed
      FROM orders WHERE o_totalprice >= 1
      GROUP BY 1
    ),
    e AS (
      SELECT d.digit, d.observed,
             (SELECT sum(observed) FROM d) AS n,
             ln(1.0 + 1.0 / CAST(d.digit AS BIGINT)) / ln(10.0) AS p
      FROM d
    )
    SELECT digit,
           CAST(observed AS BIGINT) AS observed,
           round(n * p, 2) AS expected,
           round((observed - n * p) * (observed - n * p) / (n * p), 4)
             AS chi2_term
    FROM e ORDER BY digit
    """,
    tags=["quality", "stats"],
)
def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals: observed vs
    expected log10(1 + 1/d) counts with per-digit chi-squared terms —
    the classic fabricated-data / generator-bias detector (synthetic
    uniform prices FAIL it loudly, which is exactly what the audit
    should report; invoices from a real business follow it). One
    9-group aggregation; the scalar total rides as a subquery/broadcast;
    expected counts use identical ln arithmetic on both engines."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = orders.groupBy(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
        ).alias("digit")
    ).agg(F.count(F.lit(1)).alias("observed"))
    tot = d.agg(F.sum("observed").alias("n"))
    p = F.log(1.0 + 1.0 / F.col("digit").cast("bigint")) / F.log(F.lit(10.0))
    dev = F.col("observed") - F.col("n") * p
    return (
        d.join(F.broadcast(tot))
        .select(
            "digit",
            F.col("observed").cast("long").alias("observed"),
            F.round(F.col("n") * p, 2).alias("expected"),
            F.round(dev * dev / (F.col("n") * p), 4).alias("chi2_term"),
        )
        .orderBy("digit")
    )
