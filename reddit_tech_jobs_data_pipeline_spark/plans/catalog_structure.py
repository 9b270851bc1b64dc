"""Structural text hygiene + model-based quality gating query shapes:
C4-style boilerplate-line removal, exact cross-document paragraph dedup,
logistic-regression quality scoring (fixed "pretrained" weights so the
oracle can replay the arithmetic, plus a trained-filter e2e), and
mergeable HLL distinct sketches.

The synthetic documents carry no newlines, so the two structural
queries first SYNTHESIZE a deterministic multi-line "web page" per doc
— a shared nav line, a per-source footer line, then the doc's tokens
chunked 10-per-line — identically on both engines. That is the point,
not a shortcut: the page constructor exercises exactly the shape real
HTML extraction emits (template chrome repeated across a domain's
pages, unique content below), and both engines build it from the same
parquet bytes, so the hygiene operators' full split → frequency/keeper
→ clip → reassemble path is value-checked end to end.

Beyond-reference: the reference has no template scrubbing — its hygiene
surface is keyed dedup + the keyword validity filter (dags/dag.py:294-365).
These queries are the mandated corpus-hygiene family: data-driven template
discovery (boilerplate) and corpus-wide structural dedup (paragraphs).

Determinism notes (playbook rules): line order is pinned by the
explicit 0-based line index on both sides; reassembly sorts on it;
sigmoid scores are rounded to 4 dp with IDENTICAL operand order in z
(the ln/exp + round-4 contract tfidf_top_terms established); the HLL
estimate is implementation-defined, so the catalog emits the exact
count plus a bound-check flag (approx_distinct_accuracy's contract),
never the raw estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators import classifier, structure
from reddit_tech_jobs_data_pipeline_spark.plans.catalog import _t, register
from reddit_tech_jobs_data_pipeline_spark.workdirs import stable_work_key

# ---------------------------------------------------------------------------
# shared page synthesis (Spark side)

_NAV = "nav home nav about nav contact"


def _pages(docs: DataFrame) -> DataFrame:
    """doc → multi-line page: nav line, per-source footer line, then the
    doc's tokens 10-per-line. Mirrors the oracle CTE token for token."""
    ws = F.split("text", " ")
    n_lines = F.ceil(F.size(ws) / F.lit(10.0)).cast("int")
    content = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda i: F.array_join(F.slice(ws, i * 10 + 1, 10), " "),
        ),
        "\n",
    )
    page = F.concat(
        F.lit(_NAV),
        F.lit("\n"),
        F.lit("from source "),
        F.col("source"),
        F.lit("\n"),
        content,
    )
    return docs.select("doc_id", "source", page.alias("text"))


_PAGE_CTE = """
    pages AS (
      SELECT doc_id, source,
             'nav home nav about nav contact' || chr(10) ||
             'from source ' || source || chr(10) ||
             array_to_string(
               [array_to_string(string_split(text, ' ')[i*10+1 : i*10+10], ' ')
                FOR i IN range(0, CAST(ceil(len(string_split(text, ' '))/10.0) AS INT))],
               chr(10)) AS text
      FROM documents
    ),
    lines AS (
      SELECT doc_id, source,
             unnest(range(0, len(string_split(text, chr(10))))) AS li,
             unnest(string_split(text, chr(10))) AS line
      FROM pages
    )
"""


@register(
    "boilerplate_line_removal",
    f"""
    WITH {_PAGE_CTE},
    dom AS (SELECT source, count(*) AS dom_n FROM pages GROUP BY source),
    ldf AS (
      SELECT source, line, count(DISTINCT doc_id) AS df
      FROM lines GROUP BY source, line
    ),
    boiler AS (
      SELECT ldf.source, ldf.line FROM ldf JOIN dom ON dom.source = ldf.source
      WHERE df >= 2 AND df >= 0.5 * dom_n
    ),
    kept AS (
      SELECT l.* FROM lines l
      ANTI JOIN boiler b ON b.source = l.source AND b.line = l.line
    ),
    tot AS (
      SELECT doc_id, source, count(*) AS n_lines FROM lines GROUP BY doc_id, source
    )
    SELECT t.doc_id, t.source, t.n_lines,
           t.n_lines - coalesce(k.n_kept, 0) AS n_removed,
           coalesce(k.clean_text, '') AS clean_text
    FROM tot t LEFT JOIN (
      SELECT doc_id, count(*) AS n_kept,
             string_agg(line, chr(10) ORDER BY li) AS clean_text
      FROM kept GROUP BY doc_id
    ) k USING (doc_id)
    """,
    tags=["corpus", "hygiene", "scale"],
)
def boilerplate_line_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style template-line removal: a line present in >= 50% of a
    domain's docs (and >= 2 docs) is boilerplate; strip it everywhere in
    that domain and reassemble each doc's remaining lines in order. On
    the synthesized pages the nav + footer lines hit every doc of their
    source and vanish; the 10-token content lines stay (any content line
    that DID cross the threshold would be stripped identically by both
    engines — the rule, not the example, is what's value-checked).

    100 TB: one groupBy (domain, line-hash) with map-side combine + one
    anti-join back on the same key; per-domain doc counts are a tiny
    broadcast; reassembly state is each doc's own lines
    (operators/structure.py docstring for the full scaling argument)."""
    out = structure.strip_boilerplate_lines(
        _pages(_t(spark, sf_dir, "documents")),
        domain_col="source",
        min_docs=2,
        df_ratio=0.5,
    )
    return out.select("doc_id", "source", "n_lines", "n_removed", "clean_text")


@register(
    "paragraph_dedup_exact",
    f"""
    WITH {_PAGE_CTE},
    ranked AS (
      SELECT doc_id, li, line,
             row_number() OVER (PARTITION BY line ORDER BY doc_id, li) AS rn
      FROM lines
    ),
    tot AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id)
    SELECT t.doc_id, t.n_lines,
           t.n_lines - coalesce(k.n_kept, 0) AS n_removed,
           coalesce(k.clean_text, '') AS clean_text
    FROM tot t LEFT JOIN (
      SELECT doc_id, count(*) AS n_kept,
             string_agg(line, chr(10) ORDER BY li) AS clean_text
      FROM ranked WHERE rn = 1 GROUP BY doc_id
    ) k USING (doc_id)
    """,
    tags=["corpus", "dedup", "scale"],
)
def paragraph_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cross-document paragraph dedup, keep-first (RefinedWeb
    §3.2): each duplicated line survives only at (min doc_id, min li);
    every other occurrence — other docs and later in-doc repeats — is
    clipped, docs reassembled in order. The oracle's row_number()=1 is
    the same election as the operator's min-of-struct aggregate, which
    needs NO window and no per-key sort at scale.

    100 TB: one groupBy(line-hash) min-struct + one join back; raw line
    text never rides the election, only 16-byte hashes."""
    out = structure.paragraph_dedup_first(_pages(_t(spark, sf_dir, "documents")))
    return out.select("doc_id", "n_lines", "n_removed", "clean_text")


# ---------------------------------------------------------------------------
# logistic-regression quality gate

#: "pretrained" weights for the oracle-checked scoring pass — literals on
#: both sides, in FEATURE_COLS order (f_len, f_stop, f_distinct, f_wlen).
_W = [1.2, -6.0, 2.5, -1.5]
_B = -1.0


@register(
    "quality_classifier_score",
    f"""
    WITH f AS (
      SELECT doc_id,
             len(string_split(text, ' ')) * 1.0 AS n,
             len(list_filter(string_split(text, ' '),
                             t -> t = 'the' OR t = 'a')) * 1.0 AS stop,
             len(list_distinct(string_split(text, ' '))) * 1.0 AS dst,
             length(text) * 1.0 AS chars
      FROM documents
    ),
    z AS (
      SELECT doc_id,
             ({_B} + {_W[0]} * (n / 100.0))
               + ({_W[1]} * (stop / n))
               + ({_W[2]} * (dst / n))
               + ({_W[3]} * (((chars - (n - 1.0)) / n) / 10.0)) AS z
      FROM f
    )
    SELECT doc_id, round(1.0 / (1.0 + exp(-z)), 4) AS score
    FROM z
    """,
    tags=["corpus", "quality", "classifier"],
)
def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring: σ(w·x+b) over the fixed document
    feature vector with literal ("pretrained") weights — the fastText-
    style quality gate of C4/CCNet as a stateless Catalyst projection.
    z is accumulated in FEATURE_COLS order on both engines so the
    doubles agree to ~1 ulp before the 4-dp round (the tfidf ln/round-4
    contract). Training is the separate GD pass below; scoring with a
    frozen model is what runs over the 100 TB corpus — embarrassingly
    parallel, no shuffle, no UDF."""
    feats = classifier.featurize_documents(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )
    scored = classifier.logreg_score(feats, _W, _B)
    return scored.select("doc_id", F.round("score", 4).alias("score"))


def _gd_train_sql(iters: int = 60, lr: float = 5.0) -> str:
    """Unrolled-SQL replay of the full training pipeline (the
    kmeans_lloyd_clusters precedent): teacher labels → z-scored features
    → ``iters`` fixed GD iterations → 3-dp weight rounding → gate. The
    arithmetic mirrors classifier.logreg_train exactly, including
    Python's associativity: the weight update is ``w − lr·(g/n)`` but
    the bias update is ``b − (lr·g_b)/n`` (left-assoc ``lr * g / n``),
    and z accumulates left-to-right in FEATURE_COLS order. Engines'
    sums reassociate (~1e-12 drift); the 3-dp rounding before the final
    scoring absorbs it — the same contract the Spark side documents."""
    w = _W
    parts = [
        """f AS (
      SELECT doc_id, source,
             len(string_split(text, ' ')) * 1.0 AS n,
             len(list_filter(string_split(text, ' '),
                             t -> t = 'the' OR t = 'a')) * 1.0 AS stop,
             len(list_distinct(string_split(text, ' '))) * 1.0 AS dst,
             length(text) * 1.0 AS chars
      FROM documents
    )""",
        """raw AS (
      SELECT doc_id, source,
             n / 100.0 AS f0, stop / n AS f1, dst / n AS f2,
             ((chars - (n - 1.0)) / n) / 10.0 AS f3
      FROM f
    )""",
        # teacher verdict with the pretrained literal weights; CAST of the
        # boolean keeps NULL-text docs NULL (Spark's (t>=0.5).cast contract)
        f"""lab AS (
      SELECT doc_id, source, f0, f1, f2, f3,
             CAST(1.0 / (1.0 + exp(-({_B} + {w[0]} * f0 + {w[1]} * f1
                                     + {w[2]} * f2 + {w[3]} * f3))) >= 0.5
                  AS DOUBLE) AS label
      FROM raw
    )""",
        # z-score model: one agg pass; stddev 0 (or NULL) divides by 1
        """st AS (
      SELECT avg(f0) AS m0, avg(f1) AS m1, avg(f2) AS m2, avg(f3) AS m3,
             stddev_pop(f0) AS s0, stddev_pop(f1) AS s1,
             stddev_pop(f2) AS s2, stddev_pop(f3) AS s3
      FROM lab
    )""",
        # MATERIALIZED: 60 iterations reference z — without it DuckDB
        # inlines the whole scan chain per reference (fd exhaustion)
        """z AS MATERIALIZED (
      SELECT doc_id, source, label,
             (f0 - m0) / (CASE WHEN s0 IS NULL OR s0 = 0 THEN 1.0 ELSE s0 END) AS x0,
             (f1 - m1) / (CASE WHEN s1 IS NULL OR s1 = 0 THEN 1.0 ELSE s1 END) AS x1,
             (f2 - m2) / (CASE WHEN s2 IS NULL OR s2 = 0 THEN 1.0 ELSE s2 END) AS x2,
             (f3 - m3) / (CASE WHEN s3 IS NULL OR s3 = 0 THEN 1.0 ELSE s3 END) AS x3
      FROM lab CROSS JOIN st
    )""",
        # bounded deterministic training sample (doc_id % 5): the model
        # trains on the sample, the gate scores EVERY doc — the
        # train-small/score-everywhere production shape the Spark side
        # implements with a collected-sample GD
        "z_tr AS MATERIALIZED (SELECT * FROM z WHERE doc_id % 5 = 0)",
        "nn AS (SELECT count(*) * 1.0 AS n FROM z_tr)",
        "w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS b)",
    ]
    sig = "1.0 / (1.0 + exp(-(b + w0 * x0 + w1 * x1 + w2 * x2 + w3 * x3)))"
    for i in range(1, iters + 1):
        # each w{i} is referenced twice by round i+1 (the gradient and
        # the update) — MATERIALIZED stops DuckDB's inliner from
        # expanding the chain exponentially (one row each, free)
        parts.append(
            f"""g{i} AS MATERIALIZED (
      SELECT sum(e * x0) AS g0, sum(e * x1) AS g1,
             sum(e * x2) AS g2, sum(e * x3) AS g3, sum(e) AS gb
      FROM (SELECT {sig} - label AS e, x0, x1, x2, x3
            FROM z_tr CROSS JOIN w{i - 1})
    ),
    w{i} AS MATERIALIZED (
      SELECT w0 - {lr} * (g0 / n) AS w0, w1 - {lr} * (g1 / n) AS w1,
             w2 - {lr} * (g2 / n) AS w2, w3 - {lr} * (g3 / n) AS w3,
             b - {lr} * gb / n AS b
      FROM w{i - 1} CROSS JOIN g{i} CROSS JOIN nn
    )"""
        )
    parts.append(
        f"""wr AS (
      SELECT round(w0, 3) AS w0, round(w1, 3) AS w1, round(w2, 3) AS w2,
             round(w3, 3) AS w3, round(b, 3) AS b
      FROM w{iters}
    )"""
    )
    sep = ",\n    "
    return f"""
    WITH {sep.join(parts)}
    SELECT source, count(*) AS n_kept
    FROM z CROSS JOIN wr
    WHERE {sig} >= 0.5
    GROUP BY source
    ORDER BY source
    """


@register(
    "quality_classifier_train_filter",
    _gd_train_sql(iters=60, lr=5.0),
    tags=["corpus", "quality", "classifier", "iterative"],
)
def quality_classifier_train_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-gate e2e, train-small/score-everywhere (the
    FastText/CCNet production shape): labels from a teacher rule (the
    pretrained scorer's verdict), features z-scored in one aggregate
    pass over the FULL corpus (unscaled GD sat at the base-rate
    predictor — see classifier.standardize_features), then 60 GD
    iterations on a BOUNDED deterministic sample (doc_id % 5) collected
    to the driver (classifier.logreg_train_collected — the previous
    one-Spark-job-per-iteration loop cost ~9 s of pure scheduling at any
    data size; the sample is the thing that's supposed to fit one
    machine), and finally the WHOLE corpus is filtered by the trained
    model as literal weights (96.8% train accuracy vs the teacher at
    sf0.01). Weights round to 3 dp before the final scoring so the
    keep-set is stable against float summation-order drift between runs
    AND engines — which is what lets the oracle replay the full
    60-iteration GD unrolled in SQL over the same sample (_gd_train_sql;
    value-hash-checked at sf0.001/0.01/0.1). Convergence vs a
    pure-python GD is additionally pinned in tests/test_classifier.py.
    Returns the kept docs' count per source."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    feats = classifier.featurize_documents(docs)
    teacher = classifier.logreg_score(feats, _W, _B, out_col="__t")
    labeled = teacher.withColumn("label", (F.col("__t") >= 0.5).cast("double")).drop(
        "__t"
    )
    std = classifier.standardize_features(labeled).localCheckpoint()
    sample_rows = [
        tuple(r)
        for r in std.filter(F.col("doc_id") % 5 == 0)
        .select(*classifier.FEATURE_COLS, "label")
        .collect()
    ]
    w, b = classifier.logreg_train_collected(
        sample_rows, label_idx=len(classifier.FEATURE_COLS), lr=5.0, iters=60
    )
    w = [round(x, 3) for x in w]
    b = round(b, 3)
    kept = classifier.logreg_score(std, w, b).filter(F.col("score") >= 0.5)
    return (
        kept.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# HLL distinct sketch (Datasketches, mergeable)


@register(
    "hll_distinct_sketch",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           count(DISTINCT CAST(ts AS DATE)) AS n_daily_sketches,
           true AS hll_within_5pct
    FROM events
    GROUP BY event_type
    """,
    tags=["agg", "sketch", "scale"],
)
def hll_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL distinct counting (Apache DataSketches via Spark's
    hll_sketch_agg): ONE sketch per (event_type, day) — the partial a
    real pipeline persists per ingest day — then hll_union_agg merges
    the days WITHOUT re-reading raw events, and the estimate must land
    within 5% of exact. Like approx_distinct_accuracy, the raw estimate
    is implementation-defined, so the value-checked columns are the
    exact count, the number of merged partials, and the bound flag.

    100 TB: daily partials are a few KB per group however many rows fed
    them; re-aggregation cost is |groups|×|days| sketch rows. This is
    the distinct-count analogue of the CMS/KMV family's store-and-merge
    discipline."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg(F.col("user_id").cast("string")).alias("sk")
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("__est"),
        F.count(F.lit(1)).alias("n_daily_sketches"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    j = merged.join(exact, "event_type")
    return j.select(
        "event_type",
        "exact_users",
        "n_daily_sketches",
        (
            F.abs(F.col("__est") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("hll_within_5pct"),
    )


@register(
    "streaming_hll_ingest",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           count(DISTINCT event_id % 4) AS n_batches_merged,
           true AS hll_within_5pct
    FROM events
    GROUP BY event_type
    """,
    tags=["streaming", "sketch", "scale"],
)
def streaming_hll_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-micro-batch HLL sketches appended idempotently to a persisted
    store (content-derived batch keys; replay-safe; never rewritten),
    unioned only at read time — sketch mergeability makes the unioned
    estimate equal the single-pass estimate, and the bound contract
    (exact + 5% flag) plus the exactly-checked merged-batch count is
    what the oracle replays. See streaming/hll_ingest.py."""
    from reddit_tech_jobs_data_pipeline_spark.streaming.hll_ingest import (
        run_hll_ingest_batchlike,
    )

    return run_hll_ingest_batchlike(spark, sf_dir, n_tags=4)


# ---------------------------------------------------------------------------
# BPE vocabulary induction — the oracle unrolls the 3-round loop with the
# SAME island-parity greedy-merge algebra the operator uses (operators/
# bpe.py module docstring proves the equivalence to sequential greedy).


def _bpe_round_sql(i: int) -> str:
    return f"""
    c{i} AS (
      SELECT tok AS l, nxt AS r, count(*) AS c FROM (
        SELECT tok, lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
        FROM tok{i}) WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    r{i} AS (SELECT l, r, c FROM c{i} ORDER BY c DESC, l, r LIMIT 1),
    a{i} AS (
      SELECT doc_id, pos FROM (
        SELECT doc_id, pos,
               row_number() OVER (PARTITION BY doc_id, streak ORDER BY pos) AS srn
        FROM (
          SELECT doc_id, pos,
                 pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS streak
          FROM (
            SELECT doc_id, pos, tok,
                   lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
            FROM tok{i})
          WHERE tok = (SELECT l FROM r{i}) AND nxt = (SELECT r FROM r{i})))
      WHERE srn % 2 = 1
    ),
    tok{i + 1} AS (
      SELECT doc_id, row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS pos, tok
      FROM (
        SELECT t.doc_id, t.pos,
               CASE WHEN a.pos IS NOT NULL
                    THEN t.tok || '+' || (SELECT r FROM r{i}) ELSE t.tok END AS tok
        FROM tok{i} t
        LEFT JOIN a{i} a ON a.doc_id = t.doc_id AND a.pos = t.pos
        ANTI JOIN a{i} d ON d.doc_id = t.doc_id AND d.pos = t.pos - 1)
    )"""


_BPE_ORACLE = (
    """
    WITH tok1 AS (
      SELECT doc_id,
             unnest(range(0, len(string_split(text, ' ')))) AS pos,
             unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE text IS NOT NULL
    ),"""
    + ",".join(_bpe_round_sql(i) for i in (1, 2, 3))
    + """
    SELECT * FROM (
      SELECT CAST(1 AS BIGINT) AS round, l AS left, r AS right, c AS pair_count FROM r1
      UNION ALL SELECT CAST(2 AS BIGINT), l, r, c FROM r2
      UNION ALL SELECT CAST(3 AS BIGINT), l, r, c FROM r3
    ) ORDER BY round
    """
)


@register("bpe_merge_rules", _BPE_ORACLE, tags=["corpus", "tokenizer", "iterative", "scale"])
def bpe_merge_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer induction, 3 merge rounds (Sennrich et al. 2016):
    per round, count every adjacent symbol pair corpus-wide, elect the
    most frequent (count desc, then lexicographic), apply its greedy
    left-to-right merge everywhere, repeat on the merged stream. The
    greedy merge is window algebra, not a sequential fold — island
    parity (operators/bpe.py) — so the oracle replays the identical
    3-round loop unrolled in SQL and the learned rule table matches
    value-for-value (also pinned against a pure-python sequential BPE
    in tests/test_bpe.py).

    100 TB: 3 doc-keyed window shuffles + one tiny agg per round;
    driver state = the rule table. Production tokenizer training runs
    this on a corpus SAMPLE (compose with deterministic_sample); the
    loop is per-doc parallel at any width."""
    from reddit_tech_jobs_data_pipeline_spark.operators.bpe import bpe_merge_rules_df

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return bpe_merge_rules_df(docs, rounds=3)


@register(
    "length_bucket_batching",
    """
    WITH d AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tok
      FROM documents WHERE text IS NOT NULL
    ),
    b AS (
      SELECT doc_id, n_tok,
             CAST(power(2, ceil(log2(n_tok * 1.0))) AS BIGINT) AS bucket
      FROM d WHERE n_tok > 0
    ),
    batched AS (
      SELECT bucket, n_tok,
             (row_number() OVER (PARTITION BY bucket ORDER BY n_tok, doc_id) - 1)
                  // 16 AS batch
      FROM b
    ),
    per_batch AS (
      SELECT bucket, batch, count(*) AS n, max(n_tok) AS mx, sum(n_tok) AS real
      FROM batched GROUP BY bucket, batch
    ),
    bucketed AS (
      SELECT bucket, CAST(sum(n) AS BIGINT) AS n_docs,
             count(*) AS n_batches,
             CAST(sum(real) AS BIGINT) AS real_tokens,
             CAST(sum(mx * n - real) AS BIGINT) AS pad_tokens
      FROM per_batch GROUP BY bucket
    ),
    naive_batched AS (
      SELECT n_tok,
             (row_number() OVER (ORDER BY doc_id) - 1) // 16 AS batch
      FROM b
    ),
    naive AS (
      SELECT CAST(-1 AS BIGINT) AS bucket,
             CAST(sum(n) AS BIGINT) AS n_docs, count(*) AS n_batches,
             CAST(sum(real) AS BIGINT) AS real_tokens,
             CAST(sum(mx * n - real) AS BIGINT) AS pad_tokens
      FROM (SELECT batch, count(*) AS n, max(n_tok) AS mx, sum(n_tok) AS real
            FROM naive_batched GROUP BY batch)
    )
    SELECT * FROM bucketed UNION ALL SELECT * FROM naive
    """,
    tags=["corpus", "batching", "scale"],
)
def length_bucket_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-efficient training batches: power-of-two length buckets,
    16-doc batches cut in (length, id) order, waste = pad-to-batch-max
    (operators/packing.length_bucket_batches). The bucket = −1 row is
    the measured BASELINE — arrival-order batching with its global
    window — kept only for the comparison (per-bucket padding is
    typically ~10× lower); the bucketed path itself has no global
    order: each of the ~log2(max_len) buckets shuffles independently.
    All outputs are integers — engine-exact."""
    from reddit_tech_jobs_data_pipeline_spark.operators.packing import (
        length_bucket_batches,
    )

    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    d = docs.select("doc_id", F.size(F.split("text", " ")).alias("n_tok")).filter(
        F.col("n_tok") > 0
    )
    per_batch = length_bucket_batches(d, "n_tok", "doc_id", batch_size=16)
    bucketed = per_batch.groupBy("bucket").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.count(F.lit(1)).alias("n_batches"),
        F.sum("real_tokens").cast("long").alias("real_tokens"),
        F.sum("pad_tokens").cast("long").alias("pad_tokens"),
    )
    from pyspark.sql import Window as W

    naive_b = d.withColumn(
        "batch",
        ((F.row_number().over(W.orderBy("doc_id")) - 1) / 16).cast("long"),
    )
    naive_pb = naive_b.groupBy("batch").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("n_tok").alias("mx"),
        F.sum("n_tok").alias("real"),
    )
    naive = naive_pb.agg(
        F.lit(-1).cast("long").alias("bucket"),
        F.sum("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).alias("n_batches"),
        F.sum("real").cast("long").alias("real_tokens"),
        F.sum(F.col("mx") * F.col("n") - F.col("real")).cast("long").alias("pad_tokens"),
    ).select("bucket", "n_docs", "n_batches", "real_tokens", "pad_tokens")
    return bucketed.unionByName(naive)


@register(
    "corpus_hygiene_e2e",
    f"""
    WITH {_PAGE_CTE},
    dom AS (SELECT source, count(*) AS dom_n FROM pages GROUP BY source),
    ldf AS (
      SELECT source, line, count(DISTINCT doc_id) AS df
      FROM lines GROUP BY source, line
    ),
    boiler AS (
      SELECT ldf.source, ldf.line FROM ldf JOIN dom ON dom.source = ldf.source
      WHERE df >= 2 AND df >= 0.5 * dom_n
    ),
    kept1 AS (
      SELECT l.* FROM lines l
      ANTI JOIN boiler b ON b.source = l.source AND b.line = l.line
    ),
    ranked AS (
      SELECT doc_id, source, li, line,
             row_number() OVER (PARTITION BY line ORDER BY doc_id, li) AS rn
      FROM kept1
    ),
    clean AS (
      SELECT doc_id, source,
             string_agg(line, ' ' ORDER BY li) AS text
      FROM ranked WHERE rn = 1 GROUP BY doc_id, source
    ),
    f AS (
      SELECT doc_id, source,
             len(string_split(text, ' ')) * 1.0 AS n,
             len(list_filter(string_split(text, ' '),
                             t -> t = 'the' OR t = 'a')) * 1.0 AS stop,
             len(list_distinct(string_split(text, ' '))) * 1.0 AS dst,
             length(text) * 1.0 AS chars
      FROM clean
    ),
    scored AS (
      SELECT doc_id, source, CAST(n AS BIGINT) AS n_tok,
             round(1.0 / (1.0 + exp(-(
               (-1.0 + 1.2 * (n / 100.0))
               + (-6.0 * (stop / n))
               + (2.5 * (dst / n))
               + (-1.5 * (((chars - (n - 1.0)) / n) / 10.0))))), 4) AS score
      FROM f
    ),
    tot AS (SELECT source, count(*) AS docs_in FROM pages GROUP BY source)
    SELECT t.source, t.docs_in,
           coalesce(k.docs_kept, 0) AS docs_kept,
           coalesce(k.tokens_kept, 0) AS tokens_kept,
           coalesce(k.mean_score, 0.0) AS mean_score
    FROM tot t LEFT JOIN (
      SELECT source, count(*) AS docs_kept,
             CAST(sum(n_tok) AS BIGINT) AS tokens_kept,
             round(avg(score), 4) AS mean_score
      FROM scored WHERE score >= 0.45 GROUP BY source
    ) k USING (source)
    """,
    tags=["corpus", "hygiene", "e2e", "scale"],
)
def corpus_hygiene_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round's hygiene stages chained as ONE pipeline, catching
    interface drift the per-stage oracles cannot (the corpus_export_e2e
    precedent): synthesized pages → boilerplate-line removal → exact
    paragraph dedup (keep-first) on the CLEANED lines → logistic quality
    scoring of the surviving text (newlines re-joined with spaces so the
    feature tokenizer sees one stream) → gate at rounded score >= 0.45 →
    per-source manifest (docs in/kept, tokens kept, mean score). The
    score is rounded to 4 dp BEFORE the threshold on both engines, so
    the keep-set is engine-exact even at the boundary.

    100 TB: the chain reuses each stage's scaling shape (doc-keyed
    shuffles + line-hash groupBys); no stage widens rows beyond the
    doc's own lines, and the gate is stateless."""
    pages = _pages(_t(spark, sf_dir, "documents"))
    stripped = structure.strip_boilerplate_lines(
        pages, domain_col="source", min_docs=2, df_ratio=0.5
    )
    nonempty = stripped.filter(F.col("clean_text") != "").select(
        "doc_id", "source", F.col("clean_text").alias("text")
    )
    deduped = (
        paragraph_dedup_first_with_source(nonempty)
        .filter(F.col("clean_text") != "")
        .select(
            "doc_id",
            "source",
            F.replace(F.col("clean_text"), F.lit("\n"), F.lit(" ")).alias("text"),
        )
    )
    feats = classifier.featurize_documents(deduped)
    scored = classifier.logreg_score(feats, _W, _B).select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
        F.round("score", 4).alias("score"),
    )
    kept = scored.filter(F.col("score") >= 0.45)
    per_source = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs_kept"),
        F.sum("n_tok").cast("long").alias("tokens_kept"),
        F.round(F.avg("score"), 4).alias("mean_score"),
    )
    tot = pages.groupBy("source").agg(F.count(F.lit(1)).alias("docs_in"))
    j = tot.join(per_source, "source", "left")
    return j.select(
        "source",
        "docs_in",
        F.coalesce("docs_kept", F.lit(0)).alias("docs_kept"),
        F.coalesce("tokens_kept", F.lit(0)).alias("tokens_kept"),
        F.coalesce("mean_score", F.lit(0.0)).alias("mean_score"),
    )


def paragraph_dedup_first_with_source(docs: DataFrame) -> DataFrame:
    """paragraph_dedup_first, carrying the source column through the
    reassembly (the operator keys everything on doc_id; source is
    functionally dependent, so a first() in the totals join is exact)."""
    out = structure.paragraph_dedup_first(docs)
    src = docs.select("doc_id", "source")
    return out.join(src, "doc_id")


@register(
    "jsonl_roundtrip_fidelity",
    f"""
    WITH {_PAGE_CTE}
    SELECT source, count(*) AS n_docs,
           CAST(sum(('0x' || substr(md5(text), 1, 8))::BIGINT) AS BIGINT)
             AS text_hash_sum,
           CAST(sum(len(string_split(text, chr(10)))) AS BIGINT) AS n_lines
    FROM pages WHERE text IS NOT NULL
    GROUP BY source
    """,
    tags=["source", "sink", "format"],
)
def jsonl_roundtrip_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL export/import fidelity on HOSTILE text: the synthesized
    multi-line pages (embedded newlines — the characters JSON must
    escape) are written as JSON Lines, read back, and fingerprinted per
    source (md5-prefix hash sum + line counts). The oracle computes the
    same fingerprint from the ORIGINAL text, so any escaping loss,
    truncation, or row splitting in the sink/source pair breaks the
    match. JSONL is the interchange format every training-data consumer
    reads; its newline-delimited framing vs embedded newlines is exactly
    where naive exporters corrupt corpora.

    100 TB: write + read are embarrassingly parallel; the check agg is
    one map-side-combined groupBy."""
    import os
    import tempfile

    pages = _pages(_t(spark, sf_dir, "documents")).filter(F.col("text").isNotNull())
    path = os.path.join(
        tempfile.gettempdir(), f"spark_graft_jsonl_{stable_work_key(sf_dir)}"
    )
    pages.write.mode("overwrite").json(path)
    back = spark.read.json(path).select("doc_id", "source", "text")
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long")
        ).cast("long").alias("text_hash_sum"),
        F.sum(F.size(F.split("text", "\n"))).cast("long").alias("n_lines"),
    )


_BPE_ENCODE_ORACLE = (
    """
    WITH tok1 AS (
      SELECT doc_id,
             unnest(range(0, len(string_split(text, ' ')))) AS pos,
             unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE text IS NOT NULL
    ),"""
    + ",".join(_bpe_round_sql(i) for i in (1, 2, 3))
    + """
    , before_c AS (SELECT doc_id, count(*) AS n_before FROM tok1 GROUP BY doc_id),
    after_c AS (SELECT doc_id, count(*) AS n_after FROM tok4 GROUP BY doc_id)
    SELECT d.source,
           CAST(sum(b.n_before) AS BIGINT) AS tokens_before,
           CAST(sum(a.n_after) AS BIGINT) AS tokens_after,
           round(sum(b.n_before) * 1.0 / sum(a.n_after), 4) AS compression
    FROM before_c b JOIN after_c a USING (doc_id)
    JOIN documents d USING (doc_id)
    GROUP BY d.source
    """
)


@register(
    "bpe_encode_compression",
    _BPE_ENCODE_ORACLE,
    tags=["corpus", "tokenizer", "iterative", "scale"],
)
def bpe_encode_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode the corpus with the 3 learned BPE rules and report the
    per-source compression (tokens before / after) — the fertility
    number tokenizer-vocabulary decisions are made on. Exercises the
    APPLY path at full depth (learning only applies rounds−1 merges);
    the oracle replays the identical unrolled loop through tok4.

    100 TB: encode is the same 3 doc-keyed window passes as learning,
    per-doc parallel; counts are two map-side-combined groupBys."""
    from reddit_tech_jobs_data_pipeline_spark.operators.bpe import bpe_encode_counts

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    counts = bpe_encode_counts(docs, rounds=3)
    j = counts.join(docs.select("doc_id", "source"), "doc_id")
    return j.groupBy("source").agg(
        F.sum("n_before").cast("long").alias("tokens_before"),
        F.sum("n_after").cast("long").alias("tokens_after"),
        F.round(F.sum("n_before") * 1.0 / F.sum("n_after"), 4).alias("compression"),
    )


@register(
    "streaming_boilerplate_ingest",
    f"""
    WITH {_PAGE_CTE},
    dom AS (SELECT source, count(*) AS dom_n FROM pages GROUP BY source),
    ldf AS (
      SELECT source, line, count(DISTINCT doc_id) AS df
      FROM lines GROUP BY source, line
    ),
    boiler AS (
      SELECT ldf.source, ldf.line, dom.dom_n
      FROM ldf JOIN dom ON dom.source = ldf.source
      WHERE df >= 2 AND df >= 0.5 * dom_n
    )
    SELECT source, count(*) AS n_boiler_lines,
           CAST(min(dom_n) AS BIGINT) AS dom_docs
    FROM boiler GROUP BY source
    """,
    tags=["streaming", "hygiene", "scale"],
)
def streaming_boilerplate_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-micro-batch line document-frequency cells appended
    idempotently to a persisted store (content-derived batch keys,
    never rewritten), merged only at read time: because each doc lives
    in exactly one batch, the summed per-batch distinct-doc counts
    EQUAL the single-pass counts — integers, no estimate — so the
    boilerplate decision over the accumulated crawl never re-reads raw
    pages. The oracle recomputes the same thresholds single-pass.
    See streaming/boilerplate_ingest.py for the store layout."""
    from reddit_tech_jobs_data_pipeline_spark.streaming.boilerplate_ingest import (
        run_boilerplate_ingest_batchlike,
    )

    pages = _pages(_t(spark, sf_dir, "documents"))
    return run_boilerplate_ingest_batchlike(spark, pages, n_tags=3, ident=sf_dir)
