"""Probabilistic record linkage — Fellegi-Sunter-style multi-field
match scoring (Fellegi & Sunter, JASA 1969 — public model; the shape
Splink implements on Spark).

One field's fuzzy gate (fuzzy_name_pairs) calls two records the same
entity on a single signal; real registries disagree per field — the
linkage decision is the SUM of per-field log-likelihood weights
(agreement adds log(m/u) > 0, disagreement adds log((1−m)/(1−u)) < 0),
thresholded. Weights here are supplied by the caller as INTEGER
constants (doubled-log2-ish calibration output) so the score and the
threshold test are integer-exact on every engine; estimating m/u via EM
is a calibration job outside this operator's scope.

Scale contract: candidates come from blocking (equi-join on block
keys — one shuffle, quadratic only within blocks); scoring is a
stateless map over candidates. NULL in any field comparison counts as
DISAGREEMENT (conservative: an unknown field never supports a link).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["linkage_score", "blocked_link"]


def linkage_score(comparisons: Sequence[tuple]) -> Column:
    """Sum of per-field weights: each comparison is (bool Column,
    w_agree, w_disagree). A NULL comparison result falls to w_disagree
    via the ``otherwise`` branch — unknown never supports a link."""
    total = None
    for cond, w_agree, w_disagree in comparisons:
        term = F.when(cond, F.lit(int(w_agree))).otherwise(F.lit(int(w_disagree)))
        total = term if total is None else total + term
    return total.cast("long")


def blocked_link(
    a: DataFrame,
    b: DataFrame,
    block_cols: Sequence[str],
    comparisons,
    threshold: int,
    id_cols: tuple = ("id_a", "id_b"),
) -> DataFrame:
    """Blocked candidate generation + scored decision: equi-join on the
    block keys, score with :func:`linkage_score`, keep pairs with
    ``score ≥ threshold`` (integer-exact). ``comparisons`` is a callable
    receiving the joined frame and returning the (cond, w⁺, w⁻) list, so
    field expressions can reference both sides' columns."""
    cand = a.join(b, list(block_cols))
    score = linkage_score(comparisons(cand))
    return (
        cand.select(*id_cols, score.alias("score"))
        .filter(F.col("score") >= threshold)
    )
