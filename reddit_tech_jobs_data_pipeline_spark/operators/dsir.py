"""DSIR importance weighting for data selection (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
arXiv:2302.03169).

Given a small high-quality TARGET corpus and a huge RAW pool, score every
raw document by the log-likelihood ratio of its hashed-bigram features
under the target vs raw bag-of-features models; resampling the raw pool
proportional to exp(weight) yields target-distributed training data.

100 TB shape: exactly TWO passes over the corpus and zero corpus-size
shuffles-by-key beyond them — pass 1 folds BOTH bucket histograms in one
map-side-combined groupBy (a conditional sum per side) that collapses to
``n_buckets`` rows, so the log-ratio model is broadcastable BY
CONSTRUCTION regardless of corpus size (the point of hashed features:
fixed model size, growing corpus); pass 2 re-derives the features and
scores them against the broadcast model with one groupBy(doc) whose
state is doc-length-bounded. Re-deriving beats materializing: the
exploded feature table is ~corpus-sized, so caching it would cost more
I/O than the second tokenize. The target flag rides the explode (carried
column), never a join back on doc id.

Determinism (DuckDB-oracle parity): buckets come from md5 hex prefixes
(engine-agnostic); counts/totals are exact integers; the per-doc sum is
an ORDERED fold over feature positions so both engines add identical
doubles in the same sequence; the rounded mean is normalized with
``+ 0.0`` to collapse IEEE negative zero (a doc whose features are
exactly target-neutral can fold to -0.0 on one engine and 0.0 on the
other — stringified comparison would flag it).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.functions.extract import tokens


def hashed_bigram_features(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = 256,
    carry_cols: Sequence[str] = (),
) -> DataFrame:
    """Explode each doc into (id, *carry_cols, pos, bk): the md5-bucketed
    bigram at every token position. Docs with < 2 tokens produce no
    features. ``carry_cols`` ride along so callers never need a
    corpus-size join to recover per-doc attributes."""
    carry = list(carry_cols)
    base = docs.filter(F.col(text_col).isNotNull()).select(
        id_col, *carry, tokens(text_col).alias("__ws")
    )
    # short docs are dropped by exploding an empty position list instead
    # of a filter(size >= 2): the pushed-down filter re-ran the tokenizer
    # per row (alias substitution), and sequence(0, size-2) alone would
    # go DESCENDING for size < 2
    positions = F.when(
        F.size("__ws") >= 2, F.sequence(F.lit(0), F.size("__ws") - 2)
    ).otherwise(F.array().cast("array<int>"))
    return (
        base.select(
            id_col,
            *carry,
            "__ws",
            F.explode(positions).alias("pos"),
        )
        .select(
            id_col,
            *carry,
            F.col("pos").cast("long").alias("pos"),
            (
                F.conv(
                    F.substring(
                        F.md5(F.array_join(F.slice("__ws", F.col("pos") + 1, 2), " ")),
                        1,
                        4,
                    ),
                    16,
                    10,
                ).cast("long")
                % n_buckets
            ).alias("bk"),
        )
    )


def dsir_histogram(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """One corpus pass -> (bk, cp, cq): per hashed-bigram bucket, the
    feature count from target docs (cp) and raw-pool docs (cq). Buckets
    with zero counts on both sides are absent (sparse form). ADDITIVE:
    the histogram of a disjoint batch union is the bucket-wise sum of
    per-batch histograms — the property the incremental model-update
    path (``merge_dsir_histograms``) relies on. A persisted histogram is
    <= n_buckets rows of three integers: the entire model state a daily
    ingest keeps on disk, independent of corpus size."""
    feats = hashed_bigram_features(
        docs.withColumn("__t", is_target), text_col, id_col, n_buckets,
        carry_cols=["__t"],
    )
    return feats.groupBy("bk").agg(
        F.sum(F.when(F.col("__t"), 1).otherwise(0)).alias("cp"),
        F.sum(F.when(~F.col("__t"), 1).otherwise(0)).alias("cq"),
    )


def merge_dsir_histograms(*hists: DataFrame) -> DataFrame:
    """Bucket-wise sum of sparse histograms from DISJOINT doc batches.
    The merge input is K * n_buckets rows regardless of corpus size, so
    incremental model maintenance never re-reads old batches — exactly
    counts, never approximations, because the features are exact sums."""
    out = hists[0]
    for h in hists[1:]:
        out = out.unionByName(h)
    return out.groupBy("bk").agg(
        F.sum("cp").alias("cp"), F.sum("cq").alias("cq")
    )


def dsir_model(hist: DataFrame, n_buckets: int = 256) -> DataFrame:
    """(bk, lv) log-likelihood-ratio model from a (bk, cp, cq) histogram:
    lv = ln p_target(bk) - ln q_raw(bk), add-1 smoothed over the fixed
    bucket domain. Only raw-side buckets (cq > 0) get a row — any doc
    drawn from the histogram's own raw pool touches only those. The
    result is <= n_buckets rows: broadcast by construction."""
    totals = hist.agg(
        F.coalesce(F.sum("cp"), F.lit(0)).alias("np"),
        F.coalesce(F.sum("cq"), F.lit(0)).alias("nq"),
    )
    return (
        hist.filter(F.col("cq") > 0)
        .crossJoin(F.broadcast(totals))
        .select(
            "bk",
            (
                F.log((F.col("cp") + 1) * 1.0 / (F.col("np") + n_buckets))
                - F.log((F.col("cq") + 1) * 1.0 / (F.col("nq") + n_buckets))
            ).alias("lv"),
        )
    )


def dsir_score(
    docs_raw: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """Score raw-pool docs against a pre-built (bk, lv) model: one
    explode + one broadcast join + one groupBy(id) with doc-length-
    bounded state. Features hashing to buckets absent from the model
    (cq was 0 when the model was built — impossible when scoring the
    model's own raw pool, possible for later out-of-corpus docs) are
    DROPPED from both the sum and n_feat; re-derive the model with the
    new batch merged in (``merge_dsir_histograms``) when that matters.
    The per-doc sum is an ORDERED fold over feature positions so the
    DuckDB oracle adds identical doubles in the same sequence."""
    feats = hashed_bigram_features(docs_raw, text_col, id_col, n_buckets)
    per = (
        feats.join(F.broadcast(model), "bk")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feat"),
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("pos", "lv"))),
                F.lit(0.0),
                lambda acc, x: acc + x["lv"],
            ).alias("s"),
        )
    )
    return per.select(
        id_col,
        F.col("n_feat").cast("long").alias("n_feat"),
        (F.round(F.col("s") / F.col("n_feat"), 4) + 0.0).alias("logw_per_feat"),
    )


def dsir_weights(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """Per raw-pool doc: (id_col, n_feat, logw_per_feat) where
    logw_per_feat is the mean over the doc's hashed-bigram features of
    ln p_target(b) - ln q_raw(b), add-1 smoothed over the fixed bucket
    domain, rounded to 4 dp. ``is_target`` is a boolean Column over
    ``docs`` splitting target corpus from raw pool; only raw docs (with
    >= 2 tokens) are returned. Higher = more target-like.

    Composition of histogram -> model -> score; the histogram is <=
    n_buckets rows but DERIVING it is a corpus pass, and it feeds both
    totals and the log-ratio — materialize once (semantic_dedup
    playbook) so the whole operator reads the corpus exactly twice."""
    hist = dsir_histogram(
        docs, is_target, text_col, id_col, n_buckets
    ).localCheckpoint()
    model = dsir_model(hist, n_buckets)
    return dsir_score(
        docs.filter(~is_target), model, text_col, id_col, n_buckets
    )
