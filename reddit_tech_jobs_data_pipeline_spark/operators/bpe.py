"""Distributed BPE-style vocabulary induction (merge-rule learning).

Byte-pair encoding's training loop — repeat k times: count all adjacent
symbol pairs corpus-wide, pick the most frequent, merge its greedy
left-to-right non-overlapping occurrences everywhere — is the canonical
tokenizer-induction algorithm (Sennrich et al. 2016). This implements
the loop over a whitespace-symbol corpus kept as ONE TOKEN ARRAY PER
DOC (r14 restructure; the original exploded to (id, pos, tok) rows and
paid 3 doc-keyed shuffles per round — pair window, island-parity
window, renumber window — plus two joins, i.e. the whole corpus
crossed the network ~4x per rule):

* pair counting is one in-row adjacent-pair expansion + one groupBy —
  the corpus itself never shuffles, only (pair, count) partial
  aggregates do (map-side combined; overlap pairs counted, the
  standard convention: "a a a" contributes 2 to (a,a));
* the winning rule is a 1-row collect per round (driver state: k rules);
* greedy merge application is a map-only Arrow kernel
  (guide §4.2 shape): one O(len) sequential scan per doc — the loop
  textbook BPE specifies — constructed once per task, zero shuffle.
  The per-doc scan has no efficient Catalyst form: a fold that appends
  to an accumulator array copies the accumulator per element (O(len²)
  per doc), and the old window/island-parity algebra needed the corpus
  exploded and shuffled. Equivalence with sequential greedy (including
  overlap runs: "x x x" merges positions 1 and 3) is pinned against a
  pure-Python reference in tests/test_bpe.py.

Merged symbols are joined with '+' (absent from the corpus alphabet),
so rule identity stays unambiguous across rounds.

100 TB: every round is one map pass over the (shrinking) token arrays
plus one tiny pair-count aggregation; nothing is ever all-pairs and
driver state is k rules. k rounds = k passes over the corpus — which
is why production tokenizer training samples the corpus first (compose
with deterministic_sample / stratified_sample upstream); the loop
itself is per-doc-parallel at any width. Token arrays are
localCheckpoint'd each round to cut the k-deep lineage (the
star-contraction precedent, operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _token_arrays(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, toks) — split(text, ' ') kept in-row; same element sequence
    the old posexplode produced (empty strings included)."""
    return docs.filter(F.col(text_col).isNotNull()).select(
        id_col, F.split(text_col, " ").alias("toks")
    )


def _top_pair(toks_df: DataFrame, id_col: str):
    """The (left, right, count) of the most frequent adjacent pair, with
    the standard tiebreak (count desc, left asc, right asc); None when
    the corpus has no adjacent pairs at all."""
    pairs = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.struct(
                F.element_at("toks", i).alias("tok"),
                F.element_at("toks", i + 1).alias("nxt"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<tok:string,nxt:string>>"))
    top = (
        toks_df.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.tok").alias("tok"), F.col("p.nxt").alias("nxt"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("tok"), F.col("nxt"))
        .limit(1)
        .collect()
    )
    if not top:
        return None
    return top[0][0], top[0][1], int(top[0][2])


def _apply_rule(toks_df: DataFrame, id_col: str, left: str, right: str, sep: str) -> DataFrame:
    """Greedy left-to-right merge of (left, right): map-only Arrow pass,
    one O(len) scan per doc (see module docstring)."""
    id_type = {f.name: f.dataType.simpleString() for f in toks_df.schema.fields}[id_col]
    out_schema = f"{id_col} {id_type}, toks array<string>"

    def run(batches):
        import pyarrow as pa

        merged_tok = left + sep + right
        for b in batches:
            ids = b.column(0)
            out = []
            for d in b.column(1).to_pylist():
                if d is None:
                    out.append(None)
                    continue
                o, i, n = [], 0, len(d)
                while i < n:
                    if i + 1 < n and d[i] == left and d[i + 1] == right:
                        o.append(merged_tok)
                        i += 2
                    else:
                        o.append(d[i])
                        i += 1
                out.append(o)
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(out, type=pa.list_(pa.string()))],
                names=[id_col, "toks"],
            )

    return toks_df.select(id_col, "toks").mapInArrow(run, out_schema).localCheckpoint()


def bpe_learn(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rounds: int = 3,
    sep: str = "+",
    return_tokens: bool = False,
):
    """Learn ``rounds`` merge rules; returns [(round, left, right,
    pair_count)] with the standard tiebreak (count desc, left asc,
    right asc). pair_count is the ALL-adjacent-occurrences count the
    rule was selected by (overlaps included). With ``return_tokens``,
    also applies the LAST rule and returns (rules, toks_df) with the
    fully-encoded per-doc token arrays — the encode path's shape —
    instead of a fresh re-apply of every rule."""
    toks = _token_arrays(docs, text_col, id_col).localCheckpoint()
    rules: list[tuple[int, str, str, int]] = []
    for r in range(1, rounds + 1):
        top = _top_pair(toks, id_col)
        if top is None:
            break
        left, right, cnt = top
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
    fertility metric training-cost estimates run on). Counts are array
    sizes — no explode, no shuffle beyond the learn loop's aggregates."""
    before = _token_arrays(docs, text_col, id_col).select(
        id_col, F.size("toks").cast("long").alias("n_before")
    )
    _rules, encoded = bpe_learn(
        docs, text_col, id_col, rounds, sep, return_tokens=True
    )
    after = encoded.select(id_col, F.size("toks").cast("long").alias("n_after"))
    return before.join(after, id_col)
