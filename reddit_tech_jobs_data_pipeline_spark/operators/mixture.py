"""Mixture-weighted corpus composition: allocate a global token budget
across sources by target weights — the domain-mixing stage of a
training-data pipeline (Pile/Dolma-style "X% web, Y% code, Z% papers"),
bounded by what each source actually has.

The allocation is EXACT WATER-FILLING: find the single threshold ``t``
such that ``Σ_i min(avail_i, w_i·t) = budget``. Sources whose whole
inventory fits under ``w_i·t`` are capped (they contribute everything);
the rest get tokens proportional to their weight. Closed form via
sorting — no iteration: with sources sorted ascending by
``r_i = avail_i / w_i``, hypothesize that the first ``j−1`` are capped;
then ``t_j = (budget − Σ_{i<j} avail_i) / Σ_{i≥j} w_i``, and exactly one
``j`` satisfies ``r_{j−1} ≤ t_j ≤ r_j`` (the water level is monotone).
If the budget exceeds total inventory, every source is capped.

Scale note: the threshold solve runs on the PER-SOURCE totals table —
one row per source (tens, not billions) — so its global-order window is
a bounded K-row computation, the same license as the k-means K-row
centroid fold (documented, deliberate). Everything per-document (token
counts, per-source running prefixes, the final selection) shuffles only
on the source key with map-side combines. Allocations floor ``w·t`` to
whole tokens; both engines compute the identical double ``t`` from the
identical integer operands, so the floor is cross-engine deterministic
(integer-exact-operand class, see catalog playbook).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def waterfill_threshold(totals: DataFrame, budget_col: str = "budget") -> DataFrame:
    """Input: one row per source with ``source``, ``avail`` (long,
    ≥ 0), ``w`` (long), and a constant ``budget`` column. Output: the
    input plus ``alloc`` (long) — min(avail, floor(w·t)) at the solved
    threshold, or ``avail`` for every source when budget ≥ Σ avail.

    Degenerate inputs are handled, not assumed away: sources with
    ``w ≤ 0`` take no part in the solve and get ``alloc = 0`` (a
    zero-weight source is "don't sample this"); a ``budget ≤ 0`` yields
    ``alloc = 0`` everywhere (the floor can go negative there, so the
    result is clamped).

    The input is materialized once (localCheckpoint): the solve branches
    it four ways (nonpos split, ordered cumulatives, the t_j scalar agg,
    the final cross join), and without the checkpoint EACH branch
    re-derives the totals from their upstream corpus scan — measured 13
    full scans on corpus_mixture_waterfill before this. K rows, so the
    materialization is free; the corpus is scanned exactly once to
    produce it."""
    totals = totals.localCheckpoint()
    nonpos = totals.filter(
        (F.col("w") <= 0) | F.col("w").isNull()
    ).select("source", "avail", "w", F.lit(0).cast("long").alias("alloc"))
    totals = totals.filter(F.col("w") > 0)
    k_win = Window.orderBy((F.col("avail") / F.col("w")), F.col("source"))
    ordered = totals.select(
        "source",
        "avail",
        "w",
        F.col(budget_col).alias("__b"),
        (F.col("avail") / F.col("w")).alias("__r"),
    )
    cum = ordered.select(
        "*",
        F.coalesce(
            F.sum("avail").over(k_win.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0).cast("long"),
        ).alias("__a_before"),
        F.sum("w")
        .over(k_win.rowsBetween(Window.currentRow, Window.unboundedFollowing))
        .alias("__w_from"),
        F.lag("__r").over(k_win).alias("__r_prev"),
    )
    t_j = (F.col("__b") - F.col("__a_before")) / F.col("__w_from")
    valid = (
        (t_j <= F.col("__r"))
        & (F.col("__r_prev").isNull() | (t_j >= F.col("__r_prev")))
    )
    t_row = cum.agg(F.max(F.when(valid, t_j)).alias("__t"))
    out = cum.crossJoin(F.broadcast(t_row))
    alloc = F.when(
        F.col("__t").isNull(), F.col("avail")  # budget ≥ total inventory
    ).otherwise(
        F.greatest(  # clamp: budget ≤ 0 makes floor(w·t) negative
            F.lit(0).cast("long"),
            F.least(
                F.col("avail"), F.floor(F.col("w") * F.col("__t")).cast("long")
            ),
        )
    )
    solved = out.select("source", "avail", "w", alloc.alias("alloc"))
    return solved.unionByName(nonpos)


def temperature_weights(
    per_source: DataFrame,
    mass_col: str = "total_tokens",
    alpha: float = 0.3,
) -> DataFrame:
    """Temperature-scaled multinomial mixture (mT5 §3.1 / XLM-R):
    sampling probability ``p_i ∝ mass_i^alpha``, renormalized. ``alpha=1``
    reproduces the natural distribution; ``alpha=0`` is uniform;
    ``0<alpha<1`` flattens — low-resource sources are upsampled, heads
    are downsampled, without the hard cliff of a fixed cap.

    Input: one row per source with ``source`` and ``mass_col`` (long ≥ 0).
    Output: input + ``natural_share`` (mass_i/Σmass), ``p_temperature``
    (the α-scaled probability), ``upsample_factor``
    (p_temperature/natural_share — the effective-epochs multiplier when
    the total token draw equals the corpus size). Unrounded doubles; the
    caller rounds for cross-engine presentation.

    Scale note: runs entirely on the per-source totals table (one row
    per source — tens, not billions). The normalizers are K-row
    unpartitioned windows rather than an agg-and-join-back: a separate
    `.agg()` branch makes Spark RE-SCAN whatever produced ``per_source``
    (a second full corpus pass when it comes straight off a groupBy) —
    the window keeps the plan one linear subtree, one upstream scan, at
    the cost of a single-partition window over K rows (the documented
    K-row license). Zero-mass sources get p = 0 and a null
    upsample_factor (no tokens to draw from), never a division error."""
    powed = per_source.select(
        "*", F.pow(F.col(mass_col).cast("double"), F.lit(alpha)).alias("__m_a")
    )
    # pow(0, 0) = 1: a zero-mass source must not receive probability mass
    powed = powed.withColumn(
        "__m_a", F.when(F.col(mass_col) <= 0, F.lit(0.0)).otherwise(F.col("__m_a"))
    )
    w = Window.partitionBy()
    natural = F.col(mass_col) / F.sum(F.col(mass_col).cast("double")).over(w)
    p_temp = F.col("__m_a") / F.sum("__m_a").over(w)
    return powed.select(
        *per_source.columns,
        natural.alias("natural_share"),
        p_temp.alias("p_temperature"),
        F.when(F.col(mass_col) > 0, p_temp / natural).alias("upsample_factor"),
    )


def realize_repeats(
    docs: DataFrame,
    factor_col: str,
    id_col: str = "doc_id",
    seed: str = "up",
    epoch: int = 1,
) -> DataFrame:
    """Deterministic sampling-with-replacement REALIZATION: turn a
    per-row real-valued sampling factor (from temperature_weights,
    source_mixture_weights, or soft-dedup weights) into actual row
    copies — ``floor(f)`` guaranteed copies plus one more iff the row's
    seeded hash fraction falls below ``frac(f)`` (stochastic rounding by
    row identity, so E[copies] = f exactly). Factors < 1 downsample
    (Bernoulli keep), factors > 1 upsample; a new epoch reseeds which
    rows get the extra copy.

    Output: the input columns plus ``n_copies`` (long) and ``copy_idx``
    (long, 1..n_copies) — one row per realized copy; rows with 0 copies
    disappear. Downstream epoch shuffling keys on (id, copy_idx).

    Determinism contract: the Bernoulli draw compares the integer value
    of the first 8 md5 hex chars against ``frac(f)·2^32`` — the hash is
    a pure function of row identity (cluster-size/retry/partitioning
    invariant, same as epoch_shuffle), and the threshold is one IEEE
    multiply of the same double on any engine. 100 TB shape: stateless
    map + explode, zero shuffles; fan-out is bounded by the factor."""
    f = F.col(factor_col)
    base = F.floor(f).cast("long")
    hv = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{seed}:{epoch}:"), F.col(id_col).cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .cast("double")
    )
    extra = F.when(
        hv < (f - base.cast("double")) * F.lit(float(2**32)), F.lit(1)
    ).otherwise(F.lit(0))
    keyed = docs.withColumn("n_copies", (base + extra).cast("long"))
    seq = F.when(
        F.col("n_copies") >= 1,
        F.sequence(F.lit(1).cast("long"), F.col("n_copies")),
    ).otherwise(F.array().cast("array<long>"))
    return keyed.select(
        *docs.columns, "n_copies", F.explode(seq).alias("copy_idx")
    )


def mixture_select(
    docs: DataFrame,
    allocations: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    tok_col: str = "n_tok",
) -> DataFrame:
    """Greedy per-source prefix selection under each source's
    allocation: documents in deterministic ``id_col`` order are taken
    while the source's running token total stays ≤ its ``alloc``.
    Returns the per-source realization: (source, w, avail, alloc,
    n_docs_sel, tokens_sel). The running prefix is a window partitioned
    by source — distributed, never global."""
    s_win = (
        Window.partitionBy(source_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = docs.select(
        source_col, id_col, tok_col, F.sum(tok_col).over(s_win).alias("__cum")
    )
    sel = (
        cum.join(allocations.select(source_col, "alloc"), source_col)
        .filter(F.col("__cum") <= F.col("alloc"))
        .groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs_sel"),
            F.sum(tok_col).cast("long").alias("tokens_sel"),
        )
    )
    return (
        allocations.join(sel, source_col, "left")
        .select(
            source_col,
            "w",
            "avail",
            "alloc",
            F.coalesce("n_docs_sel", F.lit(0)).cast("long").alias("n_docs_sel"),
            F.coalesce("tokens_sel", F.lit(0).cast("long")).alias("tokens_sel"),
        )
    )
