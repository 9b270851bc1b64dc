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
