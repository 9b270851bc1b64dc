"""Data-quality validation checks as composable one-row DataFrames.

The reference pipeline's only quality mechanisms are per-row try/except
skips and a validity filter (SURVEY.md §2.3 F5/F3). This module is the
engine-level generalization: declarative constraint checks (uniqueness,
referential integrity, null rate, accepted values, ranges) that each
produce a ``(check_name, violations)`` row, unioned into one report.

Scale notes: predicate checks compile to a single conditional aggregate
→ one pass over the table, map-side partial aggregation, no shuffle of
data rows (only of per-partition partial counts). Uniqueness is
count-vs-distinct (one hash aggregate on the key). Referential
integrity is a LEFT ANTI join — broadcast when the parent's key set
fits (dimension tables), shuffle-hash otherwise; at 100 TB prefer
storing parents bucketed by key so the anti join co-locates.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _report(name: str, violations: Column) -> list[Column]:
    return [
        F.lit(name).alias("check_name"),
        F.coalesce(violations, F.lit(0)).cast("long").alias("violations"),
    ]


def predicate_check(df: DataFrame, name: str, bad: Column) -> DataFrame:
    """Count rows where ``bad`` holds (nulls in ``bad`` count as OK)."""
    return df.agg(*_report(name, F.sum(F.when(bad, 1).otherwise(0))))


def unique_check(df: DataFrame, name: str, *cols: str) -> DataFrame:
    """Violations = rows in excess of one per distinct key tuple."""
    return df.agg(
        *_report(name, F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols]))
    )


def fused_checks(
    df: DataFrame,
    predicate_bad: dict[str, Column],
    unique_keys: dict[str, list[str]] | None = None,
) -> DataFrame:
    """All of a table's predicate + uniqueness checks in ONE pass: a
    single conditional aggregate computes every violation count, then a
    ``stack`` unpivots the one result row into (check_name, violations)
    rows. This is the 100 TB shape for a multi-check table — N
    predicate_check calls cost N full scans (each `.agg()` is its own
    job branch; plan-audited 10 scans on dq_validation_suite before
    this, 5 after — the remainder are the FK anti joins, which need
    their own passes); fusing makes the table pay one. A uniqueness
    check adds a count_distinct to the same aggregate (Spark plans an
    Expand, still one scan)."""
    unique_keys = unique_keys or {}
    aggs, names = [], []
    for n, bad in predicate_bad.items():
        aggs.append(
            F.coalesce(F.sum(F.when(bad, 1).otherwise(0)), F.lit(0))
            .cast("long")
            .alias(n)
        )
        names.append(n)
    for n, cols in unique_keys.items():
        aggs.append(
            (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols]))
            .cast("long")
            .alias(n)
        )
        names.append(n)
    row = df.agg(*aggs)
    pairs = ", ".join(f"'{n}', `{n}`" for n in names)
    return row.selectExpr(
        f"stack({len(names)}, {pairs}) AS (check_name, violations)"
    )


def fk_check(
    child: DataFrame, parent: DataFrame, name: str, child_key: str, parent_key: str
) -> DataFrame:
    """Violations = child rows whose key has no match in parent (orphans).

    NULL child keys count as orphans (the anti join matches nothing for
    them) — the same semantics as a correlated ``NOT EXISTS``; oracle SQL
    must use NOT EXISTS, not ``NOT IN`` (whose three-valued logic skips
    NULL child keys and yields zero violations if the parent set has a
    NULL)."""
    orphans = child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        on=child_key,
        how="left_anti",
    )
    return orphans.agg(*_report(name, F.count(F.lit(1))))


def suite(checks: list[DataFrame]) -> DataFrame:
    """Union per-check reports into one (check_name, violations) table."""
    return reduce(lambda a, b: a.unionByName(b), checks)


def observe_quality(
    df: DataFrame, name: str, metrics: dict[str, Column]
) -> tuple[DataFrame, "object"]:
    """Attach FREE in-flight quality metrics to a DataFrame via
    ``df.observe``: the named aggregates are computed by the SAME job
    that materializes ``df`` — zero extra passes, zero extra shuffles —
    and read back from the Observation after any action. This is how a
    100 TB pipeline stage reports row counts / null rates / domain
    violations without re-scanning its input (the dq.suite checks above
    each cost a pass; observation piggy-backs on work already done).
    Returns (observed_df, observation); call ``observation.get`` after
    an action on the returned DataFrame.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *[c.alias(k) for k, c in metrics.items()]), obs
