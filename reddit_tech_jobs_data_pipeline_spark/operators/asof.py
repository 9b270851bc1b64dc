"""As-of join: for each left row, the most recent right row with
right.ts <= left.ts within the same key group.

Spark has no native ASOF JOIN (DuckDB/Pandas do). The scalable plan is
NOT a range join (quadratic blowup per key) but the union trick:

    union(left-tagged, right-tagged)
    → window last_value(right payload) over (partition by key
        order by ts, tag rows unbounded preceding..current)
    → keep left rows

One shuffle on the key, linear state, no per-key quadratic pair
generation — survives keys with millions of rows on both sides.
Right rows sort before left rows at equal ts, so equality matches
(right.ts == left.ts) are included, matching ASOF semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    suffix: str = "_asof",
    tiebreaker: str | None = None,
) -> DataFrame:
    """Left as-of join. Output = left columns + ``payload_cols`` from the
    latest right row at-or-before each left row's ``ts_col`` (NULL when no
    prior right row exists). ``tiebreaker`` orders right rows that share a
    timestamp (latest wins) — required for determinism if duplicates exist.
    When ``tiebreaker`` is a column of ``right`` it is carried with its real
    value, so the merge order is exactly (ts, tiebreaker, tag) on BOTH sides
    — the same total order an engine-side ``ORDER BY ts, tiebreaker, tag``
    oracle uses. (Right rows must not be null-filled here: a nulled
    tiebreaker would sort every right row before every left row at equal
    ts, silently widening the at-boundary match set.)"""
    lt = left.withColumn("__tag", F.lit(1))
    rt_cols = [*by, ts_col, *payload_cols]
    if tiebreaker is not None and tiebreaker in right.columns and tiebreaker not in rt_cols:
        rt_cols.append(tiebreaker)
    rt = right.select(*rt_cols).withColumn("__tag", F.lit(0))
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for c in payload_cols:
        lt = lt.withColumn(c, F.lit(None).cast(dict(rt.dtypes)[c]))
    unioned = lt.unionByName(rt.select(*lt.columns))

    order = [F.col(ts_col).asc(), F.col("__tag").asc()]
    if tiebreaker is not None:
        order.insert(1, F.col(tiebreaker).asc_nulls_first())
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = unioned
    for c in payload_cols:
        out = out.withColumn(
            f"{c}{suffix}",
            F.last(F.when(F.col("__tag") == 0, F.col(c)), ignorenulls=True).over(w),
        )
    return (
        out.filter(F.col("__tag") == 1)
        .drop("__tag", *payload_cols)
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    suffix: str = "_asof",
    tiebreaker: str | None = None,
) -> DataFrame:
    """Forward as-of join: for each left row, the EARLIEST right row at
    or after its ``ts_col`` (NULL when none follows) — the mirror of
    asof_join, same union+window plan (one shuffle, linear state).
    Right rows sort after left rows at equal (ts, tiebreaker), so an
    exactly-simultaneous right row matches; with a tiebreaker the
    contract sharpens to "first right row with (ts, tiebreaker)
    >= the left row's" — totally ordered, engine-independent. As in
    ``asof_join``, a tiebreaker that exists on ``right`` is carried with
    its real value (NOT null-filled), so right rows merge at their true
    (ts, tiebreaker) position exactly as in an ``ORDER BY ts, tiebreaker,
    tag`` oracle."""
    lt = left.withColumn("__tag", F.lit(0))
    rt_cols = [*by, ts_col, *payload_cols]
    if tiebreaker is not None and tiebreaker in right.columns and tiebreaker not in rt_cols:
        rt_cols.append(tiebreaker)
    rt = right.select(*rt_cols).withColumn("__tag", F.lit(1))
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for c in payload_cols:
        lt = lt.withColumn(c, F.lit(None).cast(dict(rt.dtypes)[c]))
    unioned = lt.unionByName(rt.select(*lt.columns))

    order = [F.col(ts_col).asc(), F.col("__tag").asc()]
    if tiebreaker is not None:
        order.insert(1, F.col(tiebreaker).asc_nulls_first())
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    out = unioned
    for c in payload_cols:
        out = out.withColumn(
            f"{c}{suffix}",
            F.first(F.when(F.col("__tag") == 1, F.col(c)), ignorenulls=True).over(w),
        )
    return out.filter(F.col("__tag") == 0).drop("__tag", *payload_cols)
