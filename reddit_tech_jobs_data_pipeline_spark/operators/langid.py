"""Character-n-gram language identification (Cavnar & Trenkle 1994,
"N-Gram-Based Text Categorization").

The data-driven complement to functions/text.lang_id's fixed marker
lists: per-language rank profiles of the top-K character n-grams are
TRAINED from labeled docs, and a doc is classified by the out-of-place
distance between its own n-gram rank list and each language profile
(sum over the doc's grams of |doc_rank - profile_rank|, with a miss
penalty of K for grams absent from the profile; lowest distance wins).

100 TB shape: the model is langs * K rows of (lang, gram, rank) —
broadcast BY CONSTRUCTION regardless of training-corpus size (the DSIR
playbook: fixed model, growing corpus). Training is one corpus pass
(explode prefix grams -> map-side-combined groupBy(lang, gram)) plus a
window over the model-sized count table. Classification is one corpus
pass: explode -> groupBy(doc, gram) -> per-doc window (state bounded by
prefix_len) -> broadcast join against the profile -> groupBy(doc, lang)
over <= K * n_langs rows/doc. Docs are read through a normalized
``prefix_len``-char prefix — the standard C&T trick that bounds per-doc
cost no matter how long documents get.

Determinism (DuckDB-oracle parity): every quantity is an integer; every
ordering carries a total-order tiebreaker (gram string for ranks,
candidate language code for the argmin), so both engines agree exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _norm_prefix(text_col: Column, prefix_len: int) -> Column:
    """Lowercase, collapse non-word runs to single spaces, trim, and take
    the leading ``prefix_len`` chars — the classification window."""
    return F.substring(
        F.trim(F.regexp_replace(F.lower(text_col), r"\W+", " ")), 1, prefix_len
    )


def char_ngrams(
    docs: DataFrame,
    text_col: str,
    n: int = 3,
    prefix_len: int = 200,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Explode each doc's normalized prefix into (``*carry_cols``, gram):
    one row per character n-gram occurrence. Docs whose normalized prefix
    is shorter than ``n`` produce no rows."""
    base = (
        docs.filter(F.col(text_col).isNotNull())
        .select(*carry_cols, _norm_prefix(F.col(text_col), prefix_len).alias("__s"))
        .filter(F.length("__s") >= n)
    )
    return base.select(
        *carry_cols,
        F.explode(F.sequence(F.lit(1), F.length("__s") - (n - 1))).alias("__p"),
        "__s",
    ).select(
        *carry_cols,
        F.substring(F.col("__s"), F.col("__p"), n).alias("gram"),
    )


def ngram_profiles(
    docs: DataFrame,
    lang_col: str,
    text_col: str,
    n: int = 3,
    top_k: int = 100,
    prefix_len: int = 200,
) -> DataFrame:
    """(lang, gram, rank): per language, the top-``top_k`` character
    n-grams by count (rank 1 = most frequent; count ties break on the
    gram string). The corpus-scale work is the map-side-combined
    groupBy(lang, gram); the rank window runs over the collapsed count
    table (langs * |gram vocabulary| rows), not the corpus."""
    counts = (
        char_ngrams(docs, text_col, n, prefix_len, carry_cols=(lang_col,))
        .groupBy(lang_col, "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy(lang_col).orderBy(F.col("c").desc(), "gram")
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(F.col(lang_col).alias("lang"), "gram", "rank")
    )


def langid_classify(
    docs: DataFrame,
    profiles: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    top_k: int = 100,
    prefix_len: int = 200,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id_col, *carry_cols, pred_lang, dist): each doc's out-of-place
    distance to every trained profile, argmin'd (ties -> lowest language
    code). ``profiles`` must come from ``ngram_profiles`` with the SAME
    n / top_k / prefix_len. Docs with no grams are absent from the
    output (no text to judge)."""
    doc_counts = (
        char_ngrams(docs, text_col, n, prefix_len, carry_cols=(id_col, *carry_cols))
        .groupBy(id_col, *carry_cols, "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wd = Window.partitionBy(id_col).orderBy(F.col("c").desc(), "gram")
    doc_ranks = (
        doc_counts.withColumn("dr", F.row_number().over(wd))
        .filter(F.col("dr") <= top_k)
        .drop("c")
    )
    # candidate-language columns renamed so a carried true-label column
    # (commonly also "lang") can ride along without ambiguity
    prof = profiles.select(
        F.col("lang").alias("__cand"), "gram", "rank"
    )
    langs = prof.select("__cand").distinct()
    dist = (
        doc_ranks.crossJoin(F.broadcast(langs))
        .join(F.broadcast(prof), ["__cand", "gram"], "left")
        .groupBy(id_col, *carry_cols, "__cand")
        .agg(
            F.sum(
                F.coalesce(F.abs(F.col("dr") - F.col("rank")), F.lit(top_k))
            ).alias("dist")
        )
    )
    wb = Window.partitionBy(id_col).orderBy("dist", "__cand")
    return (
        dist.withColumn("__rk", F.row_number().over(wb))
        .filter(F.col("__rk") == 1)
        .select(
            id_col,
            *carry_cols,
            F.col("__cand").alias("pred_lang"),
            F.col("dist").cast("long").alias("dist"),
        )
    )
