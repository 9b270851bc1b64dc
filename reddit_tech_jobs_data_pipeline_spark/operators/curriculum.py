"""Quality-curriculum ordering at cluster scale.

``curriculum_quality_order`` (plans/catalog_corpus.py) is the
oracle-parity mode: an exact global ``ntile(10)`` — a single-partition
sort over one row per doc, fine for a correctness gate, wrong as the
production plan at 100 TB. This module is the production mode, the same
swap the revenue_decile_share / RFM playbook documents for every global
quantile in this repo:

* decile CUT POINTS come from ``approxQuantile`` (Greenwald-Khanna
  sketch: one distributed pass, driver holds k-1 doubles — a bounded
  collect, never the data);
* decile ASSIGNMENT is a stateless broadcast when-chain (zero shuffles);
* within-decile order is the same seeded-md5 permutation key
  ``epoch_shuffle_shards`` uses — a pure function of row identity, so
  any cluster size / retry / partitioning produces the SAME order;
* the physical export is ONE ``repartitionByRange`` on
  (decile, permutation key) + ``sortWithinPartitions`` — shard files in
  filename order ARE the global curriculum order, no window anywhere.

Boundary semantics vs the exact mode: docs whose score falls exactly on
a sketch cut point can land one decile off (and decile populations are
approximately-equal rather than exactly-equal) — the documented,
bounded divergence of every approxQuantile swap in this repo;
tests/test_curriculum.py measures the agreement against the exact ntile.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators.shuffling import permutation_key


def approx_decile_cuts(
    df: DataFrame,
    score_col: str,
    k: int = 10,
    relative_error: float = 0.001,
) -> list[float]:
    """The k-1 interior quantile cut points of ``score_col`` via Spark's
    Greenwald-Khanna sketch. Driver-side result is k-1 doubles — bounded
    at any corpus size. NULL scores are ignored (approxQuantile skips
    them) and NaN scores are filtered here (Spark orders NaN above every
    numeric, so a handful of NaNs would drag every upper cut to NaN) —
    both match "no valid score → does not shape the curriculum"."""
    probs = [i / k for i in range(1, k)]
    clean = df.filter(~F.isnan(F.col(score_col).cast("double")))
    return clean.approxQuantile(score_col, probs, relative_error)


def assign_curriculum_decile(
    score: Column, cuts: list[float], descending: bool = True
) -> Column:
    """Stateless decile assignment from broadcast cut points. With
    ``descending`` (curriculum convention) decile 1 is the HIGHEST-score
    band: score > cuts[-1] → 1, ... score <= cuts[0] → k. A plain
    when-chain — whole-stage-codegen'd, no shuffle, no UDF. Cuts are
    sorted here, so callers may pass them in any order. Spark orders NaN
    GREATER than every numeric (so ``NaN > cut`` is true and the plain
    chain would put NaN in the BEST band); an explicit isnan guard pins
    NaN to the worst band instead — a doc with no valid score must never
    train first in a quality curriculum."""
    cuts = sorted(cuts)
    k = len(cuts) + 1
    worst = k if descending else 1
    expr = F.lit(worst)
    # build from the lowest cut upward; later (higher) cuts override
    for i, c in enumerate(cuts):
        decile = (k - 1 - i) if descending else (i + 2)
        expr = F.when(score > F.lit(float(c)), F.lit(decile)).otherwise(expr)
    # NaN compares greater than any numeric in Spark — guard it into the
    # worst band before the when-chain can see it
    expr = F.when(F.isnan(score.cast("double")), F.lit(worst)).otherwise(expr)
    return expr.cast("long")


def curriculum_order_scale(
    docs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    k: int = 10,
    seed: str = "cur",
    epoch: int = 1,
    relative_error: float = 0.001,
) -> DataFrame:
    """Production curriculum ordering: (decile, order key) per doc with
    NO global window — approx cut points + stateless assignment + the
    seeded permutation hash. Rows with NULL score are dropped (same
    contract as the exact mode); NaN-scored rows are kept but pinned to
    the worst decile (and excluded from the cut-point sketch). Returns ``id_col``, ``score_col``,
    ``decile`` (1 = best), ``h`` (the within-decile order key; global
    training order = ORDER BY decile, h, id)."""
    scored = docs.filter(F.col(score_col).isNotNull())
    cuts = approx_decile_cuts(scored, score_col, k, relative_error)
    return scored.select(
        id_col,
        score_col,
        assign_curriculum_decile(F.col(score_col), cuts).alias("decile"),
        permutation_key(id_col, seed, epoch).alias("h"),
    )


def write_curriculum_shards(
    ordered: DataFrame,
    path: str,
    id_col: str = "doc_id",
    num_shards: int = 8,
) -> None:
    """Physically materialize the curriculum: range-partition on
    (decile, h) so shard file i holds keys strictly before shard i+1,
    then sort within each shard. Reading part files in filename order
    streams the corpus best-quality-first with the seeded shuffle inside
    each decile. One shuffle (the range exchange), no windows; the range
    partitioner's boundary sampling only chooses FILE BOUNDARIES — the
    row order it realizes is the same deterministic (decile, h, id) key
    on every run."""
    (
        ordered.repartitionByRange(num_shards, "decile", "h", id_col)
        .sortWithinPartitions("decile", "h", id_col)
        .write.mode("overwrite")
        .parquet(path)
    )
