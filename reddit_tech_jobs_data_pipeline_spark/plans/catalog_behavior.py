"""User-behavior and robust-statistics query shapes: cohort retention,
event-type transition bigrams, a Pearson correlation matrix, MAD (median
absolute deviation) outliers, blocked fuzzy matching via edit distance,
and a Pareto-frontier (skyline) query.

These extend the reference's analytics surface (reference dashboards slice
job posts by month/technology — dags/dag.py builds the time dimension at
dag.py:430-460) with the behavioral shapes a training-data pipeline needs
over event logs.

Determinism notes:
* cohort offsets use month arithmetic on month-truncated dates — integral
  in both engines (Spark ``months_between`` is exact for month starts,
  DuckDB ``date_diff('month', …)`` counts boundaries);
* MAD thresholds compare doubles produced by IDENTICAL arithmetic on both
  sides (exact median, same constant multipliers) so the inequality cannot
  disagree;
* edit distance is integer-valued — no rounding needed;
* the skyline uses only comparisons on values read from parquet (no
  arithmetic), so dominance is bit-exact across engines.

Scale notes (SCALE.md): cohort/transition/corr are single-shuffle
aggregations; the fuzzy join is blocked on p_brand (quadratic only within
a block — at 100 TB add a length-band second key); the skyline avoids the
quadratic NOT-EXISTS by reducing to per-size minima (|sizes| rows) and a
broadcast join back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.plans.catalog import _t, register


@register(
    "cohort_retention",
    """
    WITH ue AS (
      SELECT user_id, date_trunc('week', ts) AS w
      FROM events GROUP BY 1, 2
    ), c AS (
      SELECT user_id, w, min(w) OVER (PARTITION BY user_id) AS cohort FROM ue
    )
    SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', cohort, w) / 7 AS BIGINT) AS week_offset,
           count(DISTINCT user_id) AS n_users
    FROM c GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["behavior", "retention", "window"],
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention matrix: users grouped by first-active week
    (cohort; the synthetic events span one month, so weekly granularity
    gives a real matrix), counted per weeks-since-cohort offset. Both
    engines truncate weeks to Monday, so day-diff/7 is integral.

    Plan: distinct (user, week) pairs first (collapses the event volume
    by ~|events per user-week|), then a user-partitioned window min for
    the cohort — one shuffle on user_id, reused by the window and the
    final partial-aggregated count-distinct."""
    ev = _t(spark, sf_dir, "events")
    ue = ev.select("user_id", F.date_trunc("week", "ts").alias("w")).distinct()
    cohort = F.min("w").over(Window.partitionBy("user_id"))
    return (
        ue.withColumn("cohort", cohort)
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.col("w"), F.col("cohort")) / 7).cast("long").alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "event_type_transitions",
    """
    WITH s AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS curr_type, count(*) AS n
    FROM s WHERE prev_type IS NOT NULL
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=["behavior", "window", "markov"],
)
def event_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over each user's event stream
    (ties broken by event_id for a total order). One shuffle on user_id
    for the lag window; the bigram count partial-aggregates map-side."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("curr_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("prev_type", "curr_type")
    )


@register(
    "correlation_matrix",
    """
    SELECT 'quantity~extendedprice' AS pair,
           round(corr(l_quantity, l_extendedprice), 4) AS r FROM lineitem
    UNION ALL
    SELECT 'quantity~discount', round(corr(l_quantity, l_discount), 4) FROM lineitem
    UNION ALL
    SELECT 'quantity~tax', round(corr(l_quantity, l_tax), 4) FROM lineitem
    UNION ALL
    SELECT 'extendedprice~discount', round(corr(l_extendedprice, l_discount), 4) FROM lineitem
    UNION ALL
    SELECT 'extendedprice~tax', round(corr(l_extendedprice, l_tax), 4) FROM lineitem
    UNION ALL
    SELECT 'discount~tax', round(corr(l_discount, l_tax), 4) FROM lineitem
    ORDER BY pair
    """,
    tags=["stats", "agg"],
)
def correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations of the lineitem measures.

    Spark computes all six coefficients in ONE aggregation pass (the
    oracle's UNION ALL re-scans per pair — fine for an oracle, wrong at
    100 TB), then unpivots the 1×6 row with ``stack``."""
    li = _t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    short = {"l_quantity": "quantity", "l_extendedprice": "extendedprice",
             "l_discount": "discount", "l_tax": "tax"}
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    agg = li.agg(
        *[
            F.round(F.corr(a, b), 4).alias(f"{short[a]}~{short[b]}")
            for a, b in pairs
        ]
    )
    stack_args = ", ".join(f"'{short[a]}~{short[b]}', `{short[a]}~{short[b]}`" for a, b in pairs)
    return agg.selectExpr(f"stack({len(pairs)}, {stack_args}) AS (pair, r)").orderBy("pair")


@register(
    "mad_outliers",
    """
    WITH med AS (
      SELECT event_type, median(value) AS med FROM events GROUP BY 1
    ), dev AS (
      SELECT e.event_id, e.event_type, e.value, m.med,
             abs(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)
    ), mad AS (
      SELECT event_type, median(adev) AS mad FROM dev GROUP BY 1
    )
    SELECT d.event_id, d.event_type, round(d.value, 2) AS value,
           -- explicit half-up via floor: engine round() implementations
           -- disagree on 1-ulp round-half boundaries (seen at sf0.1)
           floor(CAST(0.6745 AS DOUBLE) * (d.value - d.med) / m.mad * 10000
                 + CAST(0.5 AS DOUBLE)) / 10000 AS robust_z
    FROM dev d JOIN mad m USING (event_type)
    WHERE abs(d.value - d.med)
          > CAST(3.5 AS DOUBLE) / CAST(0.6745 AS DOUBLE) * m.mad
    ORDER BY d.event_id
    """,
    tags=["stats", "quality", "outliers"],
)
def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier gate: |value - median| > 3.5σ̂ where σ̂ = MAD/0.6745
    (Iglewicz-Hosteller modified z-score). Unlike the z-score gate this is
    insensitive to the outliers it is hunting.

    Two exact-median aggregations (each a shuffle on event_type, but the
    per-type stats are tiny) broadcast back onto the stream. Both K-row
    stat tables are localCheckpoint'd: the deviation/filter branches
    otherwise re-derive them from their OWN events scans (plan-audited
    4 scans before, 3 after — median pass, MAD pass, filter pass, the
    inherent minimum for two-level medians). The filter constant
    3.5/0.6745 is the same double on both engines, so the inequality is
    bit-identical."""
    ev = _t(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.median("value").alias("med")
    ).localCheckpoint()
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.median("adev").alias("mad")
    ).localCheckpoint()
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("adev") > F.lit(3.5 / 0.6745) * F.col("mad"))
        .select(
            "event_id",
            "event_type",
            F.round("value", 2).alias("value"),
            (
                F.floor(
                    F.lit(0.6745)
                    * (F.col("value") - F.col("med"))
                    / F.col("mad")
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("robust_z"),
        )
        .orderBy("event_id")
    )


@register(
    "fuzzy_name_pairs",
    """
    SELECT a.p_partkey AS p1, b.p_partkey AS p2,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    ORDER BY p1, p2
    """,
    tags=["dedup", "fuzzy", "join"],
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-match: candidate pairs share a blocking key
    (p_brand) and survive an edit-distance gate — the classic
    entity-resolution shape (reference dedups posts by exact URL only,
    dags/dag.py:383; this is its fuzzy generalization).

    The equi-join on the block key shuffles once; levenshtein runs only
    within blocks (quadratic per block, not global), and only on pairs
    that survive the LENGTH-BAND gate — |len(a)-len(b)| > 2 can never
    pass an edit-distance-2 filter, so the O(|s|·|t|) DP is skipped for
    them (result-identical by the triangle inequality; measured ~2× at
    sf0.1 where it prunes ~70% of in-block pairs). At 100 TB promote the
    band to a second blocking KEY (floor(len/3) with neighbor bands) so
    pruned pairs never materialize, and bound levenshtein's DP with its
    threshold form.

    fan_out on the probe side: ``part`` arrives as ONE parquet split at
    test SFs, and with the build side auto-broadcast the join's
    parallelism equals the probe side's split count — one task was left
    grinding the entire quadratic levenshtein load at sf1.0 (observed
    stuck >10 min; 32-way it finishes in minutes). No-op on many-split
    scans."""
    from reddit_tech_jobs_data_pipeline_spark.operators.parallelism import fan_out

    part = _t(spark, sf_dir, "part")
    a = fan_out(part).select(
        F.col("p_partkey").alias("p1"),
        F.col("p_brand").alias("brand"),
        F.col("p_name").alias("name1"),
        F.length("p_name").alias("len1"),
    )
    b = part.select(
        F.col("p_partkey").alias("p2"),
        F.col("p_brand").alias("brand"),
        F.col("p_name").alias("name2"),
        F.length("p_name").alias("len2"),
    )
    # threshold form: banded DP, O(k·len) per pair instead of O(len²),
    # returning -1 when the distance exceeds the bound — exact for the
    # kept pairs, so results are identical to the unbounded filter
    dist = F.levenshtein("name1", "name2", 2)
    return (
        a.join(b, "brand")
        .filter(F.col("p1") < F.col("p2"))
        .filter(F.abs(F.col("len1") - F.col("len2")) <= 2)
        .filter(dist >= 0)
        .select("p1", "p2", dist.cast("long").alias("dist"))
        .orderBy("p1", "p2")
    )


@register(
    "skyline_parts",
    """
    SELECT a.p_partkey, round(a.p_retailprice, 2) AS price, a.p_size AS size
    FROM part a
    WHERE NOT EXISTS (
      SELECT 1 FROM part b
      WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
        AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
    )
    ORDER BY a.p_partkey
    """,
    tags=["skyline", "analytics"],
)
def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (cheapest price, largest size). The oracle is the
    textbook quadratic NOT EXISTS; Spark reduces it to per-size minima:

      frontier(a) ⇔ a.price = min(price | size = a.size)
                  ∧ a.price < min(price | size > a.size)

    The size-level table is |distinct sizes| rows, so the running min over
    strictly-larger sizes is a window on a tiny frame and the verdict
    joins back via broadcast — O(n) + tiny, vs O(n²) dominance pairs.
    Ties (same size, same minimal price) stay on the frontier in both
    formulations (dominance requires one strict inequality)."""
    part = _t(spark, sf_dir, "part")
    per_size = part.groupBy("p_size").agg(F.min("p_retailprice").alias("min_price"))
    w = Window.orderBy(F.col("p_size").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier_sizes = (
        per_size.withColumn("min_price_larger", F.min("min_price").over(w))
        .filter(
            F.col("min_price_larger").isNull()
            | (F.col("min_price") < F.col("min_price_larger"))
        )
        .select(
            F.col("p_size").alias("fs_size"),
            F.col("min_price").alias("fs_min_price"),
        )
    )
    return (
        part.join(
            F.broadcast(frontier_sizes),
            (part.p_size == F.col("fs_size"))
            & (part.p_retailprice == F.col("fs_min_price")),
        )
        .select(
            "p_partkey",
            F.round("p_retailprice", 2).alias("price"),
            F.col("p_size").alias("size"),
        )
        .orderBy("p_partkey")
    )


@register(
    "record_linkage_scored",
    """
    WITH a AS (
      SELECT p_partkey AS id_a, p_brand, p_size, length(p_name) AS nlen, p_name AS na,
             p_type AS ca, p_retailprice AS ra
      FROM part
    ),
    b AS (
      SELECT p_partkey + 500000 AS id_b, p_brand, p_size, length(p_name) AS nlen,
             substr(p_name, 1, 2) || substr(p_name, 4, 1)
               || substr(p_name, 3, 1) || substr(p_name, 5) AS nb,
             p_type AS cb, p_retailprice + 1.0 AS rb
      FROM part WHERE p_partkey % 3 = 0
    ),
    scored AS (
      SELECT id_a, id_b,
             (CASE WHEN levenshtein(na, nb) <= 2 THEN 8 ELSE -4 END
              + CASE WHEN ca = cb THEN 4 ELSE -2 END
              + CASE WHEN abs(ra - rb) <= 2.0 THEN 3 ELSE -3 END) AS score
      FROM a JOIN b USING (p_brand, p_size, nlen)
    )
    SELECT id_a, id_b, CAST(score AS BIGINT) AS score
    FROM scored WHERE score >= 10
    """,
    tags=["linkage", "fuzzy", "join"],
)
def record_linkage_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter-style scored linkage between two part registries
    (registry B = every third part with name chars 3/4 transposed and
    price shifted +1 — realistic per-field noise): blocked on the two
    STABLE fields (p_brand, p_size) plus the transposition-invariant
    name length — blocking keys must be values the noise model does not
    touch, and each added key divides per-block pair counts (measured:
    brand-only >15 min at sf1.0; +size 10.5 s; +length band 3.9 s) — and
    scored on THREE fields (name edit-gate +8/−4, type equality
    +4/−2, price proximity +3/−3), linked at score ≥ 10. All weights and
    the threshold are integers — the decision is cross-engine exact.
    The step beyond fuzzy_name_pairs' single-field gate: one noisy field
    no longer decides alone (operators/linkage.py)."""
    from reddit_tech_jobs_data_pipeline_spark.operators import linkage

    part = _t(spark, sf_dir, "part")
    a = part.select(
        F.col("p_partkey").alias("id_a"),
        "p_brand",
        "p_size",
        F.length("p_name").alias("nlen"),
        F.col("p_name").alias("na"),
        F.col("p_type").alias("ca"),
        F.col("p_retailprice").alias("ra"),
    )
    b = part.filter(F.col("p_partkey") % 3 == 0).select(
        (F.col("p_partkey") + 500000).alias("id_b"),
        "p_brand",
        "p_size",
        F.length("p_name").alias("nlen"),
        F.concat(
            F.substring("p_name", 1, 2),
            F.substring("p_name", 4, 1),
            F.substring("p_name", 3, 1),
            F.expr("substring(p_name, 5)"),
        ).alias("nb"),
        F.col("p_type").alias("cb"),
        (F.col("p_retailprice") + 1.0).alias("rb"),
    )

    def comparisons(cand):
        return [
            (F.levenshtein("na", "nb") <= 2, 8, -4),
            (F.col("ca") == F.col("cb"), 4, -2),
            (F.abs(F.col("ra") - F.col("rb")) <= 2.0, 3, -3),
        ]

    return linkage.blocked_link(a, b, ["p_brand", "p_size", "nlen"], comparisons, threshold=10)


@register(
    "user_event_sequences",
    """
    WITH ordered AS (
      SELECT user_id,
             row_number() OVER w AS pos,
             event_type AS t0,
             lead(event_type, 1) OVER w AS t1,
             lead(event_type, 2) OVER w AS t2,
             lead(event_type, 3) OVER w AS t3,
             lead(event_type, 4) OVER w AS t4
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(pos AS BIGINT) AS win_start,
           t0 || '>' || t1 || '>' || t2 || '>' || t3 || '>' || t4 AS seq
    FROM ordered
    WHERE t4 IS NOT NULL AND pos % 2 = 1
    """,
    tags=["sequences", "window", "behavior"],
)
def user_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding training sequences from behavioral logs: per user, the
    ordered event-type stream cut into length-5 windows at stride 2 —
    the sequence-model prep step (next-event prediction / session
    embeddings) that doc_chunking_windows performs for text. Pure
    window-lead construction: one shuffle on user_id, no explode, each
    row emits at most one window; the (ts, event_id) tiebreak makes the
    order — and therefore every sequence string — total and
    cross-engine exact."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    leads = [F.col("event_type")] + [
        F.lead("event_type", i).over(w) for i in range(1, 5)
    ]
    out = ev.select(
        "user_id",
        F.row_number().over(w).alias("win_start"),
        *[leads[i].alias(f"t{i}") for i in range(5)],
    )
    return (
        out.filter(F.col("t4").isNotNull() & (F.col("win_start") % 2 == 1))
        .select(
            "user_id",
            F.col("win_start").cast("long").alias("win_start"),
            F.concat_ws(">", *[f"t{i}" for i in range(5)]).alias("seq"),
        )
    )


@register(
    "linear_touch_attribution",
    """
    WITH clicks AS (
      SELECT user_id, event_id AS click_id, ts AS click_ts
      FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT user_id, event_id AS p_id, ts AS p_ts, value
      FROM events WHERE event_type = 'purchase'
    ),
    touched AS (
      SELECT p.p_id, p.value, c.click_id,
             count(*) OVER (PARTITION BY p.p_id) AS n_touch
      FROM purchases p JOIN clicks c
        ON c.user_id = p.user_id
       AND c.click_ts < p.p_ts
       AND c.click_ts >= p.p_ts - INTERVAL 7 DAY
    )
    SELECT click_id,
           round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                          list(value / n_touch ORDER BY p_id)),
                             (acc, x) -> acc + x), 4) AS credit,
           CAST(count(*) AS BIGINT) AS n_purchases
    FROM touched GROUP BY click_id
    """,
    tags=["behavior", "attribution", "range"],
)
def linear_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase's value splits
    equally across the user's clicks in the 7 preceding days; per-click
    credit is the sum over the purchases it touched — the standard
    marketing-attribution shape (first/last-touch are the rank-1
    special cases of the same join). One banded range self-join
    (equi-shuffle on user_id, the band evaluated inside the sort-merge
    join), one window over purchase-sized groups, one groupBy sharing
    the partitioning. Credit terms are value/n_touch doubles summed per
    click — few terms, both engines in agreement far inside the 4-dp
    round (accepted-noise class)."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
        "value",
    )
    touched = purchases.join(
        clicks,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("click_ts") < F.col("p_ts"))
        & (F.col("click_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAY")),
    ).withColumn("n_touch", F.count(F.lit(1)).over(Window.partitionBy("p_id")))
    credits = touched.select(
        "click_id", "p_id", (F.col("value") / F.col("n_touch")).alias("c")
    )
    arr = F.array_sort(F.collect_list(F.struct(F.col("p_id"), F.col("c"))))
    folded = F.aggregate(
        F.transform(arr, lambda s: s["c"]), F.lit(0.0), lambda acc, x: acc + x
    )
    return credits.groupBy("click_id").agg(
        F.round(folded, 4).alias("credit"),
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
    )


def _soundex_sql(col: str) -> str:
    """American Soundex as portable SQL (DuckDB's RE2 has no
    backreferences, so digit runs collapse via generated nested
    replaces — 3 rounds handles runs up to length 8). Verified equal to
    Spark's native soundex() on the full part-name vocabulary AND a
    1587-word fuzz set including h/w-dense 4-grams
    (tests/test_phonetic.py)."""
    tail = (
        f"translate(regexp_replace(substr(lower({col}),2), '[hw]', '', 'g'), "
        "'bfpvcgjkqsxzdtlmnraeiouy', '111122222222334556000000')"
    )
    for _ in range(3):
        for d in "123456":
            tail = f"replace({tail}, '{d}{d}', '{d}')"
    fcode = (
        f"translate(substr(lower({col}),1,1), "
        "'bfpvcgjkqsxzdtlmnr', '111122222222334556')"
    )
    return f"""
      upper(substr({col},1,1)) ||
      substr(replace(
        CASE WHEN length({tail}) > 0 AND substr({tail},1,1) = {fcode}
             THEN substr({tail},2) ELSE {tail} END,
        '0', '') || '000', 1, 3)
    """


@register(
    "phonetic_blocking_pairs",
    f"""
    WITH names AS (SELECT DISTINCT p_name AS name FROM part),
    keyed AS (
      SELECT name, {_soundex_sql("split_part(name, ' ', 2)")} AS blk
      FROM names
    )
    SELECT a.blk AS block_code, a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS BIGINT) AS lev
    FROM keyed a JOIN keyed b ON a.blk = b.blk AND a.name < b.name
    WHERE levenshtein(a.name, b.name) <= 6
    """,
    tags=["linkage", "blocking"],
)
def phonetic_blocking_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic blocking for record linkage: names that SOUND alike land
    in the same Soundex block of their noun; candidate pairs form only
    within a block and are verified by edit distance — the classic
    blocking scheme that catches misspellings a prefix/length block
    misses (complements fuzzy_name_pairs' length-band blocking). Spark
    side uses the native soundex()/levenshtein() expressions; the
    oracle re-implements American Soundex portably (verified
    bit-identical on a fuzz set — see _soundex_sql). The name table is
    DISTINCT names (vocabulary-bounded), so the within-block pair set
    is flat in corpus size; at 100 TB blocking keys are computed at
    scan speed and the block join is an equi-shuffle."""
    part = _t(spark, sf_dir, "part")
    names = part.select(F.col("p_name").alias("name")).distinct()
    keyed = names.select(
        "name", F.soundex(F.split(F.col("name"), " ")[1]).alias("blk")
    )
    a = keyed.select(F.col("blk").alias("block_code"), F.col("name").alias("name_a"))
    b = keyed.select(F.col("blk").alias("blk_b"), F.col("name").alias("name_b"))
    lev = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        a.join(
            b,
            (F.col("blk_b") == F.col("block_code"))
            & (F.col("name_a") < F.col("name_b")),
        )
        .filter(lev <= 6)
        .select(
            "block_code",
            "name_a",
            "name_b",
            lev.cast("long").alias("lev"),
        )
    )
