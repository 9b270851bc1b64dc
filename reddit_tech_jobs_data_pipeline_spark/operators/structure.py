"""Structural (line / paragraph level) text hygiene.

Two curation passes every web-scale corpus pipeline runs between HTML
extraction and token-level dedup, complementing the existing family:

* ``strip_boilerplate_lines`` — C4/RefinedWeb-style boilerplate removal:
  a LINE that appears in a large fraction of a domain's documents (nav
  bars, cookie banners, footers) is template chrome, not content; strip
  it from every document of that domain and reassemble the remainder in
  original order. This is frequency-threshold removal (the line vanishes
  everywhere), distinct from dedup (which keeps one copy).
* ``paragraph_dedup_first`` — exact cross-document paragraph dedup
  (RefinedWeb §3.2 keeps one occurrence of each duplicated paragraph):
  the corpus-wide KEEPER of a paragraph is its occurrence in the lowest
  doc id (earliest position within that doc); every other occurrence is
  clipped. Structural-unit counterpart of the token-n-gram
  ``duplicate_span_clip`` (operators/dedup.py) — paragraphs align with
  author intent, n-grams catch partial overlap; real pipelines run both.

Beyond-reference: the reference pipeline has no template scrubbing —
its hygiene surface is keyed dedup plus the keyword validity filter
(dags/dag.py:294-365). These operators are part of the mandated
training-data corpus-hygiene family; the data-driven template
discovery here is what a web-scale crawl needs where the reference's
single scraped source did not.

100 TB shape (both operators):
* one ``posexplode(split(text, sep))`` — linewise rows are a constant
  factor of the corpus, no blow-up;
* boilerplate: ONE groupBy (domain, line-hash) with map-side combine,
  then ONE broadcast-or-shuffle join back on the same key; per-domain
  doc counts ride a window over the same partitioning;
* paragraph dedup: ONE groupBy (line-hash) to elect the keeper (min
  struct — no window, no sort), ONE join back;
* reassembly is a per-doc groupBy with a bounded state (the doc's own
  surviving lines) — the packing/logprob precedent;
* lines are carried as md5 HASHES through the frequency/keeper joins
  (16 bytes however long the line), the raw line only rides the
  doc-keyed rows that reassemble.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_lines(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", sep: str = "\n"
) -> DataFrame:
    """Explode documents into (id_col, li, line) rows, li = 0-based
    position — the shared front half of both hygiene passes. Empty
    documents produce one empty line (split never returns an empty
    array), which downstream thresholds treat like any other line."""
    return docs.select(
        id_col,
        *[c for c in docs.columns if c not in (id_col, text_col)],
        F.posexplode(F.split(F.col(text_col), sep)).alias("li", "line"),
    )


def _reassemble(lines: DataFrame, id_col: str, sep: str) -> DataFrame:
    """(id, li, line) → one row per doc with lines re-joined in li order.
    array_sort on (li, line) structs = deterministic, partition-layout
    independent; state per group is the doc's own lines."""
    return lines.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("li", "line"))),
                lambda s: s.line,
            ),
            sep,
        ).alias("clean_text"),
    )


def strip_boilerplate_lines(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    domain_col: str = "source",
    min_docs: int = 2,
    df_ratio: float = 0.5,
    sep: str = "\n",
) -> DataFrame:
    """Remove template lines: a line is boilerplate within a domain iff
    it appears in >= ``min_docs`` distinct documents AND in >=
    ``df_ratio`` of the domain's documents. Returns one row per input
    doc: (id_col, domain_col, n_lines, n_removed, clean_text) —
    fully-boilerplate docs survive with clean_text = '' so callers see
    what the filter did (drop them downstream).

    Duplicate lines WITHIN one doc count once toward document frequency
    (countDistinct doc) but are all removed together if the line is
    template — matching C4's behavior.
    """
    lines = split_lines(docs, text_col, id_col, sep).withColumn(
        "__lh", F.md5(F.col("line"))
    )
    # per-domain doc counts: tiny keyed agg, broadcast back
    dom_docs = docs.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__dom_n"))
    # line document-frequency per domain, on hashes only
    line_df = (
        lines.groupBy(domain_col, "__lh")
        .agg(F.countDistinct(id_col).alias("__df"))
        .join(F.broadcast(dom_docs), domain_col)
        .filter(
            (F.col("__df") >= min_docs)
            & (F.col("__df") >= F.lit(df_ratio) * F.col("__dom_n"))
        )
        .select(domain_col, "__lh")
    )
    kept = lines.join(line_df, [domain_col, "__lh"], "left_anti")
    totals = lines.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"), F.first(domain_col).alias(domain_col)
    )
    out = totals.join(
        _reassemble(kept, id_col, sep), id_col, "left"
    )  # left: fully-stripped docs keep their row
    return out.select(
        id_col,
        domain_col,
        "n_lines",
        (F.col("n_lines") - F.coalesce(F.col("n_lines_kept"), F.lit(0))).alias(
            "n_removed"
        ),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
    )


def paragraph_dedup_first(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Exact cross-document paragraph dedup, keep-first: for every
    paragraph (line) occurring in >= 2 places corpus-wide, the single
    keeper occurrence is (min doc id, then min position within that
    doc); all other occurrences — in other docs AND later repeats inside
    the keeper doc — are clipped. Returns (id_col, n_lines, n_removed,
    clean_text) per doc.

    Keeper election is ONE min-of-struct aggregate on the line hash (no
    window, no sort); clipping is one join back on the hash.
    """
    lines = split_lines(docs, text_col, id_col, sep).withColumn(
        "__lh", F.md5(F.col("line"))
    )
    keeper = lines.groupBy("__lh").agg(
        F.min(F.struct(F.col(id_col).alias("kid"), F.col("li").alias("kli"))).alias(
            "__k"
        ),
        F.count(F.lit(1)).alias("__occ"),
    )
    dup = keeper.filter(F.col("__occ") >= 2).select(
        "__lh", F.col("__k.kid").alias("__kid"), F.col("__k.kli").alias("__kli")
    )
    marked = lines.join(dup, "__lh", "left")
    kept = marked.filter(
        F.col("__kid").isNull()  # unique paragraph
        | ((F.col(id_col) == F.col("__kid")) & (F.col("li") == F.col("__kli")))
    )
    totals = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_lines"))
    out = totals.join(_reassemble(kept, id_col, sep), id_col, "left")
    return out.select(
        id_col,
        "n_lines",
        (F.col("n_lines") - F.coalesce(F.col("n_lines_kept"), F.lit(0))).alias(
            "n_removed"
        ),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
    )
