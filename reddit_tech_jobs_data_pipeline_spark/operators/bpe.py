"""Distributed BPE-style vocabulary induction (merge-rule learning).

Byte-pair encoding's training loop — repeat k times: count all adjacent
symbol pairs corpus-wide, pick the most frequent, merge its greedy
left-to-right non-overlapping occurrences everywhere — is the canonical
tokenizer-induction algorithm (Sennrich et al. 2016). This implements
the loop Spark-natively over a whitespace-symbol corpus:

* pair counting is ONE lead()-window + ONE groupBy per round (overlap
  pairs counted, the standard convention: "a a a" contributes 2 to
  (a,a));
* the winning rule is a 1-row collect per round (driver state: k rules);
* greedy merge application needs NO sequential fold: for a pair (x, y)
  with x != y, matched positions are never adjacent, so every match
  applies; for x == y, matches overlap exactly within runs of x, and
  greedy-left-to-right == "apply the odd-ranked positions of each
  consecutive-match streak". Both cases reduce to the same island-
  parity rule — pos − row_number() island grouping + odd rank — which
  is pure window algebra, identically expressible in the DuckDB oracle
  (no list_reduce / UDF on either engine).

Merged symbols are joined with '+' (absent from the corpus alphabet),
so rule identity stays unambiguous across rounds.

100 TB: every round is 3 doc-keyed shuffles (pair window, island
window, renumber window) + one tiny global agg; nothing is ever
all-pairs and driver state is k rules. k rounds = k passes over the
(shrinking) token stream — which is why production tokenizer training
samples the corpus first (compose with deterministic_sample /
stratified_sample upstream); the loop itself is per-doc-parallel at any
width. Token rows are localCheckpoint'd each round to cut the k-deep
lineage (the star-contraction precedent, operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return docs.filter(F.col(text_col).isNotNull()).select(
        id_col, F.posexplode(F.split(text_col, " ")).alias("pos", "tok")
    )


def _apply_rule(toks: DataFrame, id_col: str, left: str, right: str, sep: str) -> DataFrame:
    """Greedy left-to-right merge of (left, right) via island parity."""
    w = Window.partitionBy(id_col).orderBy("pos")
    cand = (
        toks.withColumn("__nxt", F.lead("tok").over(w))
        .filter((F.col("tok") == left) & (F.col("__nxt") == right))
        .select(id_col, "pos")
    )
    # consecutive matched positions form streaks; odd rank within a
    # streak == greedy application (x != y streaks are all length 1)
    applied = (
        cand.withColumn("__streak", F.col("pos") - F.row_number().over(w))
        .withColumn(
            "__srn",
            F.row_number().over(Window.partitionBy(id_col, "__streak").orderBy("pos")),
        )
        .filter(F.col("__srn") % 2 == 1)
        .select(id_col, "pos")
    )
    consumed = applied.select(id_col, (F.col("pos") + 1).alias("pos"))
    merged = (
        toks.join(applied.withColumn("__app", F.lit(1)), [id_col, "pos"], "left")
        .join(consumed, [id_col, "pos"], "left_anti")
        .select(
            id_col,
            "pos",
            F.when(
                F.col("__app").isNotNull(), F.concat(F.col("tok"), F.lit(sep), F.lit(right))
            )
            .otherwise(F.col("tok"))
            .alias("tok"),
        )
    )
    return merged.select(
        id_col, (F.row_number().over(w) - 1).alias("pos"), "tok"
    ).localCheckpoint()


def bpe_learn(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rounds: int = 3,
    sep: str = "+",
    return_tokens: bool = False,
) -> list[tuple[int, str, str, int]]:
    """Learn ``rounds`` merge rules; returns [(round, left, right,
    pair_count)] with the standard tiebreak (count desc, left asc,
    right asc). pair_count is the ALL-adjacent-occurrences count the
    rule was selected by (overlaps included). With ``return_tokens``,
    also applies the LAST rule and returns (rules, encoded_tokens) —
    the fully-encoded stream for free, instead of a fresh re-apply of
    every rule (the encode path's shape)."""
    toks = _tokens(docs, text_col, id_col)
    rules: list[tuple[int, str, str, int]] = []
    for r in range(1, rounds + 1):
        w = Window.partitionBy(id_col).orderBy("pos")
        pairs = toks.withColumn("__nxt", F.lead("tok").over(w)).filter(
            F.col("__nxt").isNotNull()
        )
        top = (
            pairs.groupBy("tok", "__nxt")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.col("c").desc(), F.col("tok"), F.col("__nxt"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, cnt = top[0][0], top[0][1], int(top[0][2])
        rules.append((r, left, right, cnt))
        if r < rounds or return_tokens:
            toks = _apply_rule(toks, id_col, left, right, sep)
    return (rules, toks) if return_tokens else rules


def bpe_merge_rules_df(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rounds: int = 3,
) -> DataFrame:
    """The learned merge table as a DataFrame (round, left, right,
    pair_count) — the catalog/oracle surface."""
    spark = docs.sparkSession
    rules = bpe_learn(docs, text_col, id_col, rounds)
    return spark.createDataFrame(
        rules, "round long, left string, right string, pair_count long"
    )


def bpe_encode_counts(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rounds: int = 3,
    sep: str = "+",
) -> DataFrame:
    """Learn ``rounds`` merge rules, then ENCODE the corpus with them:
    returns (id_col, n_before, n_after) token counts per doc — the
    compression the learned vocabulary buys (tokens-per-doc is the
    fertility metric training-cost estimates run on). The encode is the
    same island-parity application as learning, run once per rule in
    rule order."""
    toks = _tokens(docs, text_col, id_col)
    before = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_before"))
    _rules, encoded = bpe_learn(
        docs, text_col, id_col, rounds, sep, return_tokens=True
    )
    after = encoded.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_after"))
    return before.join(after, id_col)
