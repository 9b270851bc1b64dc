"""Corpus distribution-drift metrics — snapshot PSI and per-source
token-distribution divergence (KL / Jensen-Shannon).

A training-data pipeline re-ingests continuously; the curation
questions "did today's crawl shift against yesterday's?" and "which
source diverges from the corpus-wide mix?" are *distribution*
comparisons, not row checks — the monitoring layer the reference's
per-row validity gating (dags/dag.py:132-137) stops short of. Both
operators are one-corpus-pass shapes: the only full-data work is a
single groupBy with map-side partial aggregation; every divergence
formula then runs over the small resulting model table (bins or
vocabulary), never over the corpus again.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.functions.extract import tokens

__all__ = ["psi", "psi_from_counts", "source_token_divergence", "centroid_drift"]


def psi_from_counts(
    binned: DataFrame,
    group_cols: Sequence[str] = (),
    eps: float = 0.5,
) -> DataFrame:
    """PSI from an already-binned counts table — one row per
    (*group_cols, bin) with ``ca`` (baseline) and ``cb`` (current)
    columns. This is the model-table form: callers that keep a persisted
    baseline histogram (e.g. the streaming monitor) join their batch's
    bin counts against it and never re-scan the baseline corpus. Rows
    with ``ca = cb = 0`` are ignored; see :func:`psi` for the smoothing
    contract and the returned schema."""
    g = list(group_cols)
    binned = binned.filter((F.col("ca") > 0) | (F.col("cb") > 0))
    w = Window.partitionBy(*g) if g else Window.partitionBy(F.lit(1))
    ta = F.sum("ca").over(w)
    tb = F.sum("cb").over(w)
    nb = F.count(F.lit(1)).over(w)
    pa = (F.col("ca") + F.lit(eps)) / (ta + F.lit(eps) * nb)
    pb = (F.col("cb") + F.lit(eps)) / (tb + F.lit(eps) * nb)
    termed = binned.select(
        *g,
        F.col("ca"),
        F.col("cb"),
        ((pa - pb) * F.log(pa / pb)).alias("__term"),
    )
    return termed.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
        F.round(F.sum("__term"), 6).alias("psi"),
    )


def psi(
    df: DataFrame,
    bin_col: Column | str,
    side_col: Column | str,
    group_cols: Sequence[str] = (),
    eps: float = 0.5,
) -> DataFrame:
    """Population Stability Index per group between side ``'a'``
    (baseline snapshot) and side ``'b'`` (current snapshot).

    ``PSI = Σ_bins (p_a - p_b) · ln(p_a / p_b)`` with additive
    smoothing ``p = (c + eps) / (total + eps · n_bins)`` over the union
    of bins observed on either side, so a bin empty on one side
    contributes a finite, eps-controlled penalty instead of ±inf.
    PSI ≥ 0, 0 iff identical smoothed distributions; the classic
    monitoring rule of thumb reads < 0.1 stable / > 0.25 shifted.

    100 TB shape: one corpus-wide ``groupBy(group, bin)`` with
    conditional counts (map-side combine collapses each task to
    ≤ groups × bins rows before the shuffle); totals and the PSI sum
    run over that model table. No second corpus pass, no side split —
    both snapshots stream through the same aggregation.

    Returns one row per group: ``(*group_cols, n_bins, n_a, n_b, psi)``
    with ``psi`` rounded to 6 dp (float-sum reassociation across
    engines is ~1e-12 relative — accepted-noise class).
    """
    g = list(group_cols)
    bin_c = F.col(bin_col) if isinstance(bin_col, str) else bin_col
    side_c = F.col(side_col) if isinstance(side_col, str) else side_col
    binned = df.groupBy(*g, bin_c.alias("__bin")).agg(
        # rows with a side value outside {a, b} count toward neither side;
        # a bin they alone created is dropped by psi_from_counts
        F.count_if(side_c == "a").alias("ca"),
        F.count_if(side_c == "b").alias("cb"),
    )
    return psi_from_counts(binned, group_cols=g, eps=eps)


def source_token_divergence(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """KL and Jensen-Shannon divergence of each source's token unigram
    distribution ``p_s`` against the corpus-wide distribution ``q``.

    ``KL(p_s ‖ q) = Σ_{t∈S} p ln(p/q)`` needs only the source's own
    vocabulary S (p = 0 terms vanish, and q > 0 wherever p > 0 because
    the global count includes the source). JS would naively need every
    global token per source; instead we use the closed form

        JS = ½ Σ_{t∈S} [ p·ln(2p/(p+q)) + q·ln(2q/(p+q)) ]
             + ½·ln2 · (1 − Q_S)

    where ``Q_S = Σ_{t∈S} q`` is the global mass of the source's
    vocabulary — tokens absent from S contribute exactly ``½·q·ln2``
    each (their mixture is q/2), so their total folds into one scalar.
    Only source-present (source, token) rows are ever materialized;
    the per-source × global-vocab blowup never happens.

    100 TB shape: ONE corpus pass — explode + ``groupBy(source,
    token)`` with map-side combine; the global model q is re-aggregated
    from that model table (vocab-sized), never from the corpus. All
    divergence arithmetic runs on model-table rows.

    Returns ``(source, n_tokens, n_vocab, kl, js)`` — token count,
    distinct-vocabulary size, both divergences in nats rounded to 6 dp
    (reassociation-noise class, cf. :func:`psi`).
    """
    tok = df.select(
        F.col(source_col).alias("source"),
        F.explode(tokens(text_col)).alias("token"),
    )
    st = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("c_st"))
    # model table from here on: |sources| × |vocab| rows at most
    st = st.withColumn("c_t", F.sum("c_st").over(Window.partitionBy("token")))
    g_tot = Window.partitionBy(F.lit(1))
    s_tot = Window.partitionBy("source")
    # the global total counts every (source, token) cell exactly once
    st = st.withColumn("g_total", F.sum("c_st").over(g_tot)).withColumn(
        "s_total", F.sum("c_st").over(s_tot)
    )
    p = F.col("c_st") / F.col("s_total")
    q = F.col("c_t") / F.col("g_total")
    ln2 = float(0.6931471805599453)
    scored = st.select(
        "source",
        "c_st",
        (p * F.log(p / q)).alias("__kl_term"),
        (
            F.lit(0.5)
            * (p * F.log(F.lit(2) * p / (p + q)) + q * F.log(F.lit(2) * q / (p + q)))
        ).alias("__js_term"),
        q.alias("__q"),
    )
    return scored.groupBy("source").agg(
        F.sum("c_st").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_vocab"),
        F.round(F.sum("__kl_term"), 6).alias("kl"),
        F.round(
            F.sum("__js_term") + F.lit(0.5 * ln2) * (F.lit(1.0) - F.sum("__q")), 6
        ).alias("js"),
    )


def centroid_drift(
    df: DataFrame,
    vec_col: str,
    side_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Embedding-space drift between two snapshots: per group, the
    cosine between side-'a' and side-'b' mean vectors (1.0 = the
    embedding distribution's first moment hasn't moved; a drop says the
    upstream encoder or the data changed). Completes the drift family
    across modalities: :func:`psi` watches scalar shapes,
    :func:`source_token_divergence` token mixes, this the vector space.

    One posexplode pass with conditional averages (map-side combine to
    ≤ groups×D rows); the cosine arithmetic runs on that model table.
    A group missing one side yields a null cosine (nothing to compare).

    Returns ``(*group_cols, n_a, n_b, centroid_cos)`` with the cosine
    4-dp rounded (per-dim averages carry ~1e-12 reassociation noise —
    accepted-noise class).
    """
    g = list(group_cols)
    side = F.col(side_col)
    e = df.select(
        *g, side.alias("__side"), F.posexplode(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("pos", "v")
    )
    cen = e.groupBy(*g, "pos").agg(
        F.avg(F.when(F.col("__side") == "a", F.col("v"))).alias("ma"),
        F.avg(F.when(F.col("__side") == "b", F.col("v"))).alias("mb"),
    )
    per = cen.groupBy(*g).agg(
        F.round(
            F.sum(F.col("ma") * F.col("mb"))
            / (
                F.sqrt(F.sum(F.col("ma") * F.col("ma")))
                * F.sqrt(F.sum(F.col("mb") * F.col("mb")))
            ),
            4,
        ).alias("centroid_cos")
    )
    counts = df.groupBy(*g).agg(
        F.count_if(side == "a").alias("n_a"),
        F.count_if(side == "b").alias("n_b"),
    )
    if g:
        return counts.join(per, g).select(*g, "n_a", "n_b", "centroid_cos")
    return counts.crossJoin(per).select("n_a", "n_b", "centroid_cos")
