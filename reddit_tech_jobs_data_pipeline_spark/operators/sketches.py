"""Count-Min sketch — mergeable frequency estimation for token streams
(Cormode & Muthukrishnan, J.Alg. 2005 — public algorithm).

The scale rationale: exact per-token counts need a vocabulary-sized
shuffle every time; a CMS is a FIXED d×w grid of counters that (a) any
partition / day / source can build independently over its own rows and
(b) merges by cell-wise ADDITION — so corpus-wide token frequencies at
100 TB become one small-table union + re-sum instead of a repeated
full-vocabulary aggregation, at the cost of a one-sided error
(estimates never undercount; they overcount by ≤ εN with probability
1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉).

Hash family: the same md5 double-hashing used by the MinHash store
(one digest per token, row_i's bucket = (w1 + i·w2) mod p mod w) —
engine-portable (md5 is everywhere), so the sketch a Spark job builds
is bit-identical to the one the DuckDB oracle rebuilds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_P = 4294967291  # largest 32-bit prime (shared with operators/dedup.py)

__all__ = ["cms_build", "cms_merge", "cms_estimate"]


def _bucket_array(token: Column, width: int, depth: int) -> Column:
    digest = F.md5(token)
    w1 = F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")
    w2 = F.conv(F.substring(digest, 9, 8), 16, 10).cast("long")
    return F.array(
        *[((w1 + F.lit(i) * w2) % _P % width).cast("int") for i in range(depth)]
    )


def cms_build(
    df: DataFrame,
    token_col: str = "token",
    weight_col: str | None = None,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Build the sketch over a token table (one row per occurrence, or
    per token with ``weight_col`` carrying its count): (row_i, bucket,
    cnt) cells, at most d×w rows whatever the corpus size. One explode
    (×depth) + one groupBy with map-side combine."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    rows = df.select(
        F.posexplode(_bucket_array(F.col(token_col), width, depth)).alias(
            "row_i", "bucket"
        ),
        w.cast("long").alias("__w"),
    )
    return rows.groupBy("row_i", "bucket").agg(F.sum("__w").alias("cnt"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise addition — the property that makes the sketch
    distributable: per-partition / per-day sketches union and re-sum
    into the corpus sketch with no token ever reshuffled."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row_i", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    queries: DataFrame,
    sketch: DataFrame,
    token_col: str = "token",
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point estimates for a set of query tokens: min over the d cells
    each token hashes to (a bucket the sketch never saw estimates 0).
    The join is queries×depth rows against a ≤ d×w-row sketch — the
    sketch side always broadcasts."""
    q = queries.select(
        F.col(token_col).alias("token"),
        F.posexplode(_bucket_array(F.col(token_col), width, depth)).alias(
            "row_i", "bucket"
        ),
    )
    return (
        q.join(F.broadcast(sketch), ["row_i", "bucket"], "left")
        .groupBy("token")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_n"))
    )
