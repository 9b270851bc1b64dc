"""Higher-order-function query shapes: within-document repetition
quality filtering (Gopher-style), an embedding vector-math battery, and
bulk redaction — all expressed with Spark's array lambdas
(transform/filter/aggregate/zip_with), i.e. JVM codegen with NO Python
UDF and NO explode/re-aggregate round trip.

These extend the reference's row-wise text handling (re.findall
tokenizer at dags/dag.py:132-140, per-row regex ladders at
dag.py:71-130) to array-native bulk forms, and add the per-document
repetition signal the Gopher/C4 cleaning recipes use that the
reference lacks entirely.

Determinism notes (playbook rules):
* every float is cast to DOUBLE before arithmetic (float32 promotion
  differs between engines); both engines' list folds reduce
  left-to-right, so sums agree bit-for-bit before the 4-dp round;
* Spark arrays are 0-based, DuckDB lists 1-based — each side writes its
  own index arithmetic, checked by the value hash;
* ratios divide integers of identical provenance (distinct/total
  trigram counts), exact per IEEE, then round.

Scale notes (SCALE.md): all three are per-row map operations —
embarrassingly parallel, zero shuffle (minus the final presentation
sort, dropped in production). The repetition filter is the canonical
example of work that MUST stay in-row at 100 TB: exploding 3-grams to
rows would multiply the shuffle volume by |doc length|; the array
lambda keeps it inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.plans.catalog import _t, register


@register(
    "doc_trigram_repetition",
    """
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\W+'),
                         x -> x <> '') AS toks
      FROM documents WHERE text IS NOT NULL
    ), g AS (
      SELECT doc_id,
             list_transform(range(1, len(toks) - 1),
                            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
               AS tg
      FROM t WHERE len(toks) >= 3
    )
    SELECT doc_id,
           CAST(len(tg) AS BIGINT) AS n_trigrams,
           CAST(len(list_distinct(tg)) AS BIGINT) AS n_distinct,
           round(1.0 - len(list_distinct(tg)) * 1.0 / len(tg), 4) AS dup_frac
    FROM g ORDER BY doc_id
    """,
    tags=["quality", "hof", "training-data"],
)
def doc_trigram_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document 3-gram repetition fraction — the Gopher-recipe
    quality signal (highly repetitive docs are boilerplate/spam). The
    trigram list is built IN-ROW with transform over an index sequence;
    exploding to one row per trigram would multiply shuffle volume by
    document length, which is exactly what kills this at 100 TB. Zero
    shuffle: tokenize, trigram, distinct-count all inside one codegen
    stage."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = F.expr(r"filter(split(lower(text), '\\W+'), x -> x != '')")
    tg = F.expr(
        "transform(sequence(0, size(toks) - 3),"
        " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"
    )
    return (
        docs.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= 3)
        .select("doc_id", tg.alias("tg"))
        .select(
            "doc_id",
            F.size("tg").cast("long").alias("n_trigrams"),
            F.size(F.array_distinct("tg")).cast("long").alias("n_distinct"),
            F.round(
                1.0 - F.size(F.array_distinct("tg")) * F.lit(1.0) / F.size("tg"), 4
            ).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


@register(
    "embedding_vector_battery",
    """
    SELECT vec_id,
           round(sqrt(list_aggregate(
             list_transform(embedding,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
             'sum')), 4) AS l2_norm,
           round(list_aggregate(
             list_transform(range(1, len(embedding) + 1),
                            i -> CAST(embedding[i] AS DOUBLE)
                                 * CAST(embedding[len(embedding)+1-i] AS DOUBLE)),
             'sum'), 4) AS dot_reversed,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive
    FROM embeddings ORDER BY vec_id
    """,
    tags=["similarity", "hof", "vector"],
)
def embedding_vector_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector math on the embedding column with array lambdas only:
    L2 norm (aggregate fold), dot product against the reversed vector
    (zip_with then fold — the same kernel the ANN operators use), and
    positive-component count (filter). Everything promotes float32 →
    DOUBLE before arithmetic and folds left-to-right, so both engines
    agree bit-for-bit pre-round. Zero shuffle, pure codegen — this is
    the scalar kernel shape that makes brute-force cosine viable as the
    ANN baseline."""
    emb = _t(spark, sf_dir, "embeddings")
    l2 = F.sqrt(
        F.expr(
            "aggregate(embedding, 0.0D,"
            " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
        )
    )
    dot_rev = F.expr(
        "aggregate(zip_with(embedding, reverse(embedding),"
        " (a, b) -> CAST(a AS DOUBLE) * CAST(b AS DOUBLE)),"
        " 0.0D, (acc, x) -> acc + x)"
    )
    n_pos = F.expr("size(filter(embedding, x -> x > 0))")
    return emb.select(
        "vec_id",
        F.round(l2, 4).alias("l2_norm"),
        F.round(dot_rev, 4).alias("dot_reversed"),
        n_pos.cast("long").alias("n_positive"),
    ).orderBy("vec_id")


@register(
    "props_digit_redaction",
    """
    SELECT event_id,
           regexp_replace(props, '[0-9]+', '#', 'g') AS redacted,
           CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_runs
    FROM events ORDER BY event_id
    """,
    tags=["text", "redaction", "training-data"],
)
def props_digit_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk redaction: mask every digit run in the raw props payload
    and count the masked spans — the PII-scrubbing plumbing of a
    training-data pipeline (swap the pattern for email/phone/SSN
    classes in production). Spark's regexp_replace is global by
    default; DuckDB needs the explicit 'g' flag — the oracle encodes
    that dialect difference. Per-row map, zero shuffle, JVM regex (no
    Python)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_replace("props", "[0-9]+", "#").alias("redacted"),
        F.size(F.regexp_extract_all("props", F.lit("[0-9]+"), 0))
        .cast("long")
        .alias("n_runs"),
    ).orderBy("event_id")


@register(
    "map_functions_battery",
    """
    WITH counts AS (
      SELECT user_id, event_type, count(*) AS n FROM events
      GROUP BY user_id, event_type
    ),
    tot AS (SELECT user_id, sum(n) AS total FROM counts GROUP BY user_id),
    kept AS (
      SELECT c.user_id, c.event_type,
             round(c.n * 1.0 / t.total, 4) AS rate
      FROM counts c JOIN tot t USING (user_id)
      WHERE c.n >= 2
    )
    SELECT user_id,
           string_agg(event_type || '=' || CAST(rate AS VARCHAR), '|'
                      ORDER BY event_type) AS rates_s
    FROM kept GROUP BY user_id
    """,
    tags=["hof", "map"],
)
def map_functions_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType pipeline entirely in map-native functions: per-user
    counts → map_from_entries → map_filter (drop singletons) →
    transform_values (count → share of the user's total, via one
    aggregate over map_values) → sorted canonical string. No second
    explode/re-aggregate round trip after the map is built — the map
    column IS the per-user state, transformed in place by JVM-codegen'd
    lambdas. The map is serialized through sorted entries because map
    iteration order is engine-defined (same playbook rule as arrays)."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    m = counts.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "n"))).alias("m")
    )
    # total = the user's FULL event count (including dropped singleton
    # types) — folded from the UNFILTERED map's values, before map_filter
    rates = (
        m.withColumn(
            "total",
            F.aggregate(F.map_values("m"), F.lit(0).cast("long"), lambda a, x: a + x),
        )
        .withColumn("m", F.map_filter("m", lambda _k, v: v >= 2))
        .withColumn(
            "m", F.transform_values("m", lambda _k, v: F.round(v / F.col("total"), 4))
        )
    )
    entries = F.array_sort(
        F.transform(
            F.map_entries("m"),
            lambda e: F.concat(e["key"], F.lit("="), e["value"].cast("string")),
        )
    )
    return rates.filter(F.size("m") > 0).select(
        "user_id", F.array_join(entries, "|").alias("rates_s")
    )
