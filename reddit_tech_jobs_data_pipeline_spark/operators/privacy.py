"""Privacy audit for training-data export — k-anonymity and
l-diversity over quasi-identifier groups (Sweeney 2002; Machanavajjhala
et al. 2007 — public definitions).

The PII scrub (functions/text.py) removes DIRECT identifiers; what it
cannot see is re-identification by COMBINATION — a (segment, nation,
age-bucket) tuple shared by only two rows points at two people even
with every name redacted. The audit is pure relational work: one
groupBy over the quasi-identifier columns with a count and a
distinct-count of the sensitive attribute, so it scales exactly like
any other aggregation (map-side combine; group count bounded by the
quasi-identifier domain, not the corpus).

k-anonymity: every quasi group has ≥ k rows. l-diversity: every quasi
group carries ≥ l distinct sensitive values (a k-anonymous group whose
members all share one diagnosis still leaks it).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["anonymity_report", "suppress_small_groups"]


def anonymity_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    k: int = 5,
    l: int = 2,
) -> DataFrame:
    """One row per quasi-identifier group: size, sensitive diversity,
    and the two audit verdicts. ``count_distinct`` is exact — for a
    privacy gate an approximation is the wrong tool (an overestimate
    hides a violation)."""
    g = list(quasi_cols)
    return df.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col(sensitive_col)).alias("n_sensitive"),
        (F.count(F.lit(1)) >= k).alias("k_anonymous"),
        (F.count_distinct(F.col(sensitive_col)) >= l).alias("l_diverse"),
    )


def suppress_small_groups(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    k: int = 5,
    l: int = 2,
) -> DataFrame:
    """The enforcement step: drop every row whose quasi group fails
    either test (suppression — the conservative fix when generalization
    hierarchies are out of scope). Implemented as the report joined back
    semi-style on the quasi key, so the input streams through once plus
    one small-table hash join (the report is quasi-domain-sized and
    broadcasts)."""
    g = list(quasi_cols)
    keep = (
        anonymity_report(df, g, sensitive_col, k, l)
        .filter(F.col("k_anonymous") & F.col("l_diverse"))
        .select(*g)
    )
    return df.join(F.broadcast(keep), g, "left_semi")
