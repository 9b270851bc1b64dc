"""Deterministic sampling + time-series gap filling.

Universe sampling (hash the key, keep a hex-prefix band) is the
reproducible sampling method for distributed pipelines: the same rows are
selected on any engine, any run, any partitioning — unlike rand(seed),
which is partitioning-dependent in Spark and engine-specific everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.plans.catalog import _t, register
from reddit_tech_jobs_data_pipeline_spark.workdirs import stable_work_key


@register(
    "deterministic_sample",
    """
    SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS l_extendedprice
    FROM lineitem
    WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)), 1, 1) = '0'
    """,
    tags=["sampling"],
)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~1/16 universe sample keyed on the row identity (md5 hex prefix).
    Engine-independent and stable under repartitioning — the property
    rand(seed) cannot give on a cluster."""
    li = _t(spark, sf_dir, "lineitem")
    key = F.md5(
        F.concat(
            F.col("l_orderkey").cast("string"), F.lit("|"), F.col("l_linenumber").cast("string")
        )
    )
    return li.filter(F.substring(key, 1, 1) == "0").select(
        "l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("l_extendedprice")
    )


@register(
    "per_source_quota_cap",
    """
    SELECT source, doc_id FROM (
      SELECT source, doc_id,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn <= 10
    """,
    tags=["sampling", "corpus", "scale"],
)
def per_source_quota_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain/source quota capping — the anti-monoculture policy every
    web-scale corpus applies (no single domain may dominate the mix):
    keep at most N docs per source, deterministic survivor order. One
    hash shuffle on source + per-group top-N; a hot domain is exactly
    the skew case, so at 100 TB the rank runs per (source, salt) first
    and re-ranks the ≤ salt·N survivors, mirroring the two-phase
    rank/ntile in operators/ranking.py."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("source", "doc_id")
    )


@register(
    "quality_weighted_sample",
    """
    WITH toks AS (SELECT doc_id, text, list_filter(regexp_split_to_array(lower(text), '\\W+'), x -> x <> '') AS ws FROM documents),
    scored AS (
      SELECT doc_id,
        (CASE WHEN length(ws) BETWEEN 5 AND 100000 THEN 0.4 ELSE 0.0 END)
        + (CASE WHEN length(ws) > 0 AND
             length(list_filter(ws, t -> list_contains(['the','a','an','and','or','of','to','is','in','it'], t))) * 1.0 / length(ws) > 0.05
           THEN 0.2 ELSE 0.0 END)
        + (CASE WHEN coalesce(length(text),0) = 0 OR
             length(regexp_replace(text, '[\\w\\s]', '', 'g')) * 1.0 / length(text) < 0.2
           THEN 0.2 ELSE 0.0 END)
        + (CASE WHEN length(ws) > 0 AND
             list_aggregate(list_transform(ws, t -> length(t)), 'sum') * 1.0 / length(ws)
               BETWEEN 2.0 AND 12.0
           THEN 0.2 ELSE 0.0 END) AS q
      FROM toks
    )
    SELECT doc_id, round(q, 2) AS quality FROM scored
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 < q
    """,
    tags=["sampling", "corpus", "scale"],
)
def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-proportional corpus sampling (upsample good text, drop
    junk probabilistically): keep a doc iff its deterministic md5
    uniform u(doc_id) < quality_score. Stable under repartitioning and
    reruns — rand(seed) is neither on a cluster — so a resampled mixture
    is REPRODUCIBLE, which is what makes the training corpus auditable.
    Pure narrow filter: no shuffle at all."""
    from reddit_tech_jobs_data_pipeline_spark.functions import text as textfn

    docs = _t(spark, sf_dir, "documents")
    q = textfn.quality_score(F.col("text"))
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
            "long"
        )
        / F.lit(4294967296.0)
    )
    # filter on the UNROUNDED score (bit-identical across engines);
    # round only for display
    return (
        docs.select("doc_id", q.alias("__q"), u.alias("__u"))
        .filter(F.col("__u") < F.col("__q"))
        .select("doc_id", F.round("__q", 2).alias("quality"))
    )


@register(
    "weighted_systematic_sample",
    """
    WITH toks AS (
      SELECT doc_id,
             length(list_filter(regexp_split_to_array(lower(text), '\\W+'), x -> x <> '')) AS w
      FROM documents
    ),
    c AS (
      SELECT doc_id, w,
             sum(w) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cw
      FROM toks
    )
    SELECT doc_id, CAST(w AS BIGINT) AS w
    FROM c WHERE (cw // 500) > ((cw - w) // 500)
    """,
    tags=["sampling", "corpus", "scale"],
)
def weighted_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional SYSTEMATIC sampling: walk the cumulative
    token-count axis and keep every doc whose weight interval crosses a
    multiple of the step (500 tokens) — each doc selected with
    probability ∝ its weight, expected one pick per step of corpus mass,
    ZERO randomness. Integer arithmetic end-to-end, so unlike
    exponential-key (A-ES) weighted reservoirs there is no float
    ordering to disagree across engines or partitionings. The cumulative
    weight comes from the engine's two-phase distributed prefix sum
    (operators/packing.py — no single-partition sort), which the
    oracle's global window must agree with exactly. The right tool for
    'sample N tokens worth of docs, biased by length' corpus draws."""
    from reddit_tech_jobs_data_pipeline_spark.operators.packing import (
        distributed_prefix_sum,
    )
    from reddit_tech_jobs_data_pipeline_spark.functions import text as textfn

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", textfn.token_count(F.col("text")).cast("long").alias("w")
    )
    cum = distributed_prefix_sum(toks, [F.col("doc_id")], {"w": "cw"})
    step = 500
    return (
        cum.filter(
            F.floor(F.col("cw") / step) > F.floor((F.col("cw") - F.col("w")) / step)
        )
        .select("doc_id", "w")
    )


@register(
    "daily_counts_gapfilled",
    """
    WITH bounds AS (
      SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1 FROM events
    ),
    calendar AS (
      SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day FROM bounds
    ),
    daily AS (
      SELECT CAST(ts AS DATE) AS day, count(*) AS n, round(sum(value), 2) AS v
      FROM events GROUP BY 1
    )
    SELECT strftime(c.day, '%Y-%m-%d') AS day,
           coalesce(n, 0) AS n_events,
           coalesce(v, 0.0) AS total_value
    FROM calendar c LEFT JOIN daily d ON c.day = d.day
    """,
    tags=["time", "gapfill"],
)
def daily_counts_gapfilled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar spine (sequence + explode) left-joined to per-day
    aggregates, zeros for missing days — the standard time-series
    completeness operator; the spine is tiny and broadcasts."""
    ev = _t(spark, sf_dir, "events")
    bounds = ev.agg(
        F.to_date(F.min("ts")).alias("d0"), F.to_date(F.max("ts")).alias("d1")
    )
    calendar = bounds.select(
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day")
    )
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v")
    )
    return (
        calendar.join(daily, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            F.coalesce(F.col("v"), F.lit(0.0)).alias("total_value"),
        )
    )


def _flip_sql(nbits: int) -> str:
    """SQL list of probe buckets: base bucket + each one-bit flip."""
    base = "".join(
        f" || (CASE WHEN embedding[{i + 1}] >= 0 THEN '1' ELSE '0' END)" for i in range(nbits)
    ).lstrip(" |")
    variants = ["b.base"]
    for i in range(nbits):
        variants.append(
            f"substr(b.base, 1, {i}) || (CASE WHEN substr(b.base, {i + 1}, 1) = '1' "
            f"THEN '0' ELSE '1' END) || substr(b.base, {i + 2}, {nbits - i - 1})"
        )
    return base, "[" + ", ".join(variants) + "]"


_BASE6, _VARIANTS6 = _flip_sql(6)

_ANN_MULTIPROBE_ORACLE = f"""
    WITH c AS (SELECT vec_id AS neighbor_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec,
                      {_BASE6} AS bucket
               FROM embeddings),
    qb AS (SELECT vec_id AS query_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qvec,
                  {_BASE6} AS base
           FROM embeddings WHERE vec_id < 20),
    q AS (SELECT query_id, qvec, unnest({_VARIANTS6}) AS bucket
          FROM qb b),
    scored AS (
      SELECT query_id, neighbor_id,
             round(list_dot_product(qvec, cvec) /
                   (sqrt(list_dot_product(qvec, qvec)) * sqrt(list_dot_product(cvec, cvec))), 4)
               AS cosine
      FROM c JOIN q USING (bucket) WHERE neighbor_id <> query_id
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """


@register("ann_multiprobe_topk", _ANN_MULTIPROBE_ORACLE, tags=["similarity", "scale"])
def ann_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe bucketed ANN (Hamming-1 probe fan-out): ~3× the recall
    of single-probe at (nbits+1)× candidate cost; the oracle replicates
    the identical probe-bucket expansion in SQL."""
    from reddit_tech_jobs_data_pipeline_spark.operators.similarity import bucketed_ann_topk

    emb = _t(spark, sf_dir, "embeddings")
    return bucketed_ann_topk(
        emb, emb.filter(F.col("vec_id") < 20), k=5, nbits=6, probe_hamming=1
    )


@register(
    "stratified_sample",
    """
    SELECT event_id, event_type, round(value, 2) AS value
    FROM (
      SELECT event_id, event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
      FROM events
    ) WHERE rn <= 100
    """,
    tags=["sampling"],
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: first 100 rows per stratum in
    md5-of-key order — a reproducible engine-independent shuffle order,
    unlike rand(). One shuffle on the stratum key."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), F.col("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 100)
        .select("event_id", "event_type", F.round("value", 2).alias("value"))
    )


_IVF_COS = (
    "round(list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), {r})"
)


_IVF_ANN_SQL = f"""
    WITH cent AS (
      SELECT vec_id AS cell_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
      FROM embeddings WHERE vec_id < 8
    ),
    c AS (SELECT vec_id AS neighbor_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
    q AS (SELECT vec_id AS query_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings WHERE vec_id < 20),
    c_cells AS (
      SELECT neighbor_id, v, cell_id FROM (
        SELECT neighbor_id, v, cell_id,
               row_number() OVER (PARTITION BY neighbor_id
                 ORDER BY {_IVF_COS.format(a="v", b="cvec", r=6)} DESC, cell_id) AS rn
        FROM c CROSS JOIN cent
      ) WHERE rn = 1
    ),
    q_cells AS (
      SELECT query_id, v, cell_id FROM (
        SELECT query_id, v, cell_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY {_IVF_COS.format(a="v", b="cvec", r=6)} DESC, cell_id) AS rn
        FROM q CROSS JOIN cent
      ) WHERE rn <= 2
    ),
    scored AS (
      SELECT DISTINCT query_id, neighbor_id,
             {_IVF_COS.format(a="q_cells.v", b="c_cells.v", r=4)} AS cosine
      FROM c_cells JOIN q_cells USING (cell_id)
      WHERE neighbor_id <> query_id
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """


@register("ivf_ann_topk", _IVF_ANN_SQL, tags=["similarity", "scale"])
def ivf_ann_topk_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-cell ANN (training-free centroid seeding; see
    operators/similarity.ivf_ann_topk): nprobe=2 of 8 cells."""
    from reddit_tech_jobs_data_pipeline_spark.operators.similarity import ivf_ann_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_ann_topk(
        emb, emb.filter(F.col("vec_id") < 20), k=5, num_cells=8, nprobe=2
    )


@register(
    "ivf_materialized_ann_topk",
    _IVF_ANN_SQL,
    tags=["similarity", "scale"],
)
def ivf_materialized_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The on-disk IVF read path: the corpus is written PARTITIONED BY
    cell_id (write_ivf_index) and the probe reads only the queries'
    nprobe cells via partition pruning — at 100 TB the probe scans
    nprobe/num_cells of the bytes instead of the whole corpus. Scores
    replicate ivf_ann_topk exactly (parquet round-trips doubles
    bit-identically), so the same oracle gates both;
    tests/test_ann_index.py plan-asserts the pruning."""
    import tempfile

    from reddit_tech_jobs_data_pipeline_spark.operators import similarity

    emb = _t(spark, sf_dir, "embeddings")
    cents = similarity.seeded_centroids(emb, 8)
    path = f"{tempfile.gettempdir()}/spark_graft_ivf_index_{stable_work_key(sf_dir)}"
    similarity.write_ivf_index(emb, cents, path)
    return similarity.ivf_index_topk(
        spark, path, emb.filter(F.col("vec_id") < 20), cents, k=5, nprobe=2
    )


@register(
    "ivf_index_append_probe",
    _IVF_ANN_SQL,
    tags=["similarity", "maintenance", "scale"],
)
def ivf_index_append_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF index maintenance — the daily-ingest path: day 1
    (even vec_ids) builds the partitioned index; day 2 (odd vec_ids) is
    assigned with the FROZEN coarse quantizer and parquet-APPENDED into
    the cell_id= directories — touched cells gain a fragment, untouched
    cells aren't rewritten, the quantizer never changes. Cell assignment
    is per-vector deterministic given the centroids, so append ≡ rebuild
    with the same quantizer, and a probe over the appended index matches
    the full-corpus oracle exactly (same _IVF_ANN_SQL that gates the
    one-shot builds). At 100 TB each ingest day costs one broadcast
    assignment over the DELTA + an append; hot-cell fragment buildup is
    maintenance.compact_ivf_index's job."""
    import shutil
    import tempfile

    from reddit_tech_jobs_data_pipeline_spark.operators import similarity

    emb = _t(spark, sf_dir, "embeddings")
    cents = similarity.seeded_centroids(emb, 8)
    path = f"{tempfile.gettempdir()}/spark_graft_ivf_append_{stable_work_key(sf_dir)}"
    shutil.rmtree(path, ignore_errors=True)
    similarity.write_ivf_index(emb.filter(F.col("vec_id") % 2 == 0), cents, path)
    similarity.append_ivf_index(
        emb.filter(F.col("vec_id") % 2 == 1), cents, path
    )
    return similarity.ivf_index_topk(
        spark, path, emb.filter(F.col("vec_id") < 20), cents, k=5, nprobe=2
    )


# ===========================================================================
# Mixture-weighted corpus composition (operators/mixture.py): exact
# water-filling of a global token budget across sources by target
# weight, capped by per-source inventory — the domain-mixing stage of a
# training corpus. Weights derive deterministically from the source id;
# budget = 50% of total inventory, so some sources cap (their whole
# inventory fits under w·t) and others are weight-limited at every SF.
# ===========================================================================

_MIXTURE_SQL = r"""
    WITH toks AS (
      SELECT source, doc_id,
             length(list_filter(regexp_split_to_array(lower(text), '\W+'),
                                x -> x <> '')) AS n_tok
      FROM documents WHERE text IS NOT NULL
    ),
    totals AS (
      SELECT source, CAST(sum(n_tok) AS BIGINT) AS avail,
             (CAST(regexp_extract(source, '([0-9]+)', 1) AS BIGINT) % 4) + 1 AS w
      FROM toks GROUP BY source
    ),
    b AS (SELECT CAST(floor(sum(avail) * 0.5) AS BIGINT) AS budget FROM totals),
    cum AS (
      SELECT t.*, b.budget,
        CAST(avail AS DOUBLE) / w AS r,
        coalesce(sum(avail) OVER (ORDER BY CAST(avail AS DOUBLE) / w, source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS a_before,
        sum(w) OVER (ORDER BY CAST(avail AS DOUBLE) / w, source
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS w_from,
        lag(CAST(avail AS DOUBLE) / w) OVER (ORDER BY CAST(avail AS DOUBLE) / w,
                                             source) AS r_prev
      FROM totals t CROSS JOIN b
    ),
    tv AS (
      SELECT max(CASE WHEN (budget - a_before) / w_from <= r
                       AND (r_prev IS NULL OR (budget - a_before) / w_from >= r_prev)
                 THEN (budget - a_before) / w_from END) AS t
      FROM cum
    ),
    alloc AS (
      SELECT c.source, c.avail, c.w,
             CASE WHEN tv.t IS NULL THEN c.avail
                  ELSE least(c.avail, CAST(floor(c.w * tv.t) AS BIGINT)) END AS alloc
      FROM cum c CROSS JOIN tv
    ),
    cumdoc AS (
      SELECT source, doc_id, n_tok,
             sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS cm
      FROM toks
    ),
    sel AS (
      SELECT c.source, count(*) AS n_docs_sel, CAST(sum(c.n_tok) AS BIGINT) AS tokens_sel
      FROM cumdoc c JOIN alloc a ON a.source = c.source
      WHERE c.cm <= a.alloc
      GROUP BY c.source
    )
    SELECT a.source, a.w, a.avail, a.alloc,
           CAST(coalesce(s.n_docs_sel, 0) AS BIGINT) AS n_docs_sel,
           coalesce(s.tokens_sel, 0) AS tokens_sel
    FROM alloc a LEFT JOIN sel s ON s.source = a.source
"""


@register(
    "corpus_mixture_waterfill",
    _MIXTURE_SQL,
    tags=["sampling", "corpus", "mixture", "scale"],
)
def corpus_mixture_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing allocation + greedy per-source realization (see
    operators/mixture.py for the water-filling math and the K-row
    boundedness license). Weights (source-id % 4) + 1; budget = 50% of
    total inventory. The oracle solves the identical closed form in
    SQL; allocations are integer-exact (floor of an identically-derived
    double), so the whole result hash-matches."""
    from reddit_tech_jobs_data_pipeline_spark.functions import text as textfn
    from reddit_tech_jobs_data_pipeline_spark.operators import mixture

    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = docs.select(
        "source", "doc_id", textfn.token_count(F.col("text")).alias("n_tok")
    )
    totals = (
        toks.groupBy("source")
        .agg(F.sum("n_tok").cast("long").alias("avail"))
        .withColumn(
            "w",
            (F.regexp_extract(F.col("source"), "([0-9]+)", 1).cast("long") % 4)
            + 1,
        )
        # K rows; materialized so the budget agg below and the solve's
        # branches read these rows instead of re-scanning the corpus
        .localCheckpoint()
    )
    budget = totals.agg(
        F.floor(F.sum("avail") * 0.5).cast("long").alias("budget")
    )
    allocs = mixture.waterfill_threshold(
        totals.crossJoin(F.broadcast(budget)), "budget"
    )
    return mixture.mixture_select(toks, allocs)


@register(
    "epoch_shuffle_shards",
    """
    WITH keyed AS (
      SELECT doc_id, source,
             md5('s0:1:' || CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ),
    sharded AS (
      SELECT doc_id, source, h,
             ('0x' || substr(h, 1, 2))::BIGINT % 8 AS shard
      FROM keyed
    )
    SELECT doc_id, source, CAST(shard AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)
                AS BIGINT) AS pos_in_shard
    FROM sharded
    """,
    tags=["sampling", "corpus", "scale"],
)
def epoch_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle for training export: every doc gets a
    (shard, pos_in_shard) from the md5 of (seed, epoch, id) — the same
    uniform pseudorandom order on any cluster size, any partitioning,
    any retry, where rand(seed) is none of those. A new epoch is a new
    seed string: fresh permutation, zero state. Production writes via
    operators/shuffling.write_epoch_shards (one repartition + in-
    partition sort, one file per shard); the rank here is the manifest
    surface. See operators/shuffling.py for the 100 TB analysis."""
    from reddit_tech_jobs_data_pipeline_spark.operators import shuffling

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return shuffling.epoch_shuffle(docs, "doc_id", seed="s0", epoch=1, num_shards=8)


@register(
    "group_kfold_assignment",
    """
    SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))::BIGINT % 5
             AS fold,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events
    FROM events GROUP BY 1
    """,
    tags=["sampling", "split"],
)
def group_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware k-fold assignment (sklearn's GroupKFold contract,
    hash-deterministic): fold = md5(user_id) mod k, so EVERY event of a
    user lands in one fold — the per-event random fold would leak a
    user's behavior across train/eval exactly like a per-doc dedup split
    leaks near-dups (see leakage_safe_split). Deterministic hash ⇒
    stable across reruns and engines, no stored fold table needed; one
    map-side expression, fold summary is a single groupBy."""
    ev = _t(spark, sf_dir, "events")
    fold = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 5
    )
    return ev.withColumn("fold", fold).groupBy("fold").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "weighted_reservoir_sample",
    """
    WITH toks AS (
      SELECT doc_id, source,
             length(list_filter(regexp_split_to_array(lower(text), '\\W+'),
                                x -> x <> '')) + 1 AS w
      FROM documents
    ),
    keyed AS (
      SELECT doc_id, source, CAST(w AS BIGINT) AS w,
             round(ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                        + 1) / 4294967297.0) / w, 6) AS es_key
      FROM toks
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY es_key DESC, doc_id) AS rnk
      FROM keyed
    )
    SELECT source, doc_id, w, es_key, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 4
    """,
    tags=["sampling", "scale", "float-tol"],
)
def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group weighted reservoir (Efraimidis–Spirakis A-ES): keep the
    k=4 docs per source with the largest key u^(1/w) — equivalently
    ln(u)/w, monotone — giving each doc inclusion probability ∝ weight
    (token count) WITHOUT a global pass over the group: at scale the
    top-k-by-key is a map-side heap per partition + one k-row-per-group
    merge, the streaming-friendly shape the systematic sampler
    (weighted_systematic_sample, which needs the cumulative-weight axis)
    can't give you. Randomness is the md5 hash of the doc id — the
    repo's derandomization: identical across engines, runs, and
    partitionings. Float discipline per the systematic sampler's
    caveat: the exponential key is ROUNDED to 6 dp with a doc_id
    tie-break before ranking, so a 1-ulp ln() divergence between
    engines can't flip an order (float-tol tag covers the emitted key;
    the rank itself is integer)."""
    from pyspark.sql import Window

    from reddit_tech_jobs_data_pipeline_spark.functions import text as textfn

    docs = _t(spark, sf_dir, "documents")
    w = (textfn.token_count(F.col("text")) + 1).cast("long")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        + 1.0
    ) / 4294967297.0
    keyed = docs.select(
        "source",
        "doc_id",
        w.alias("w"),
        F.round(F.log(u) / w, 6).alias("es_key"),
    )
    win = Window.partitionBy("source").orderBy(
        F.col("es_key").desc(), F.col("doc_id")
    )
    return (
        keyed.withColumn("rnk", F.row_number().over(win))
        .filter(F.col("rnk") <= 4)
        .select("source", "doc_id", "w", "es_key", F.col("rnk").cast("long").alias("rnk"))
    )
