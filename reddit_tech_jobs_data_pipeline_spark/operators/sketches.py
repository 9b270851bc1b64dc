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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_P = 4294967291  # largest 32-bit prime (shared with operators/dedup.py)

__all__ = [
    "cms_build",
    "cms_merge",
    "cms_estimate",
    "histogram_sketch",
    "histogram_quantiles",
    "bloom_build",
    "bloom_probe",
]


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


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    bin_width: float,
    group_cols: tuple = (),
) -> DataFrame:
    """Fixed-width histogram sketch — the mergeable quantile companion
    to the CMS: (group..., bin, cnt) cells, additive across partitions /
    days / sources exactly like :func:`cms_merge` (union + re-sum).
    Deterministic by construction (no sampling, no data-dependent bin
    edges), so any engine rebuilds identical cells; quantile error is
    bounded by one bin width. NULLs carry no quantile information and
    are excluded."""
    g = list(group_cols)
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            *g,
            F.floor(F.col(value_col) / F.lit(float(bin_width))).alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_quantiles(
    sketch: DataFrame,
    qs: tuple,
    bin_width: float,
    group_cols: tuple = (),
) -> DataFrame:
    """Quantile estimates from the histogram cells: for each q, the
    upper edge of the first bin whose cumulative count reaches
    ``ceil(q·N)`` (a conservative, integer-exact rank rule — no
    interpolation, so the estimate is cross-engine bit-identical and
    within one bin width of the true quantile). Runs entirely on the
    cells table (window cumsum over bins per group)."""
    g = list(group_cols)
    w = (
        Window.partitionBy(*g).orderBy("bin")
        if g
        else Window.partitionBy(F.lit(1)).orderBy("bin")
    )
    tot = (
        Window.partitionBy(*g)
        if g
        else Window.partitionBy(F.lit(1))
    )
    cum = sketch.select(
        *g,
        "bin",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(tot).alias("n"),
    )
    outs = []
    for q in qs:
        # integer-exact rank: ceil(q·N) via (N·qn + 999) div 1000 —
        # round() (not int()) because 0.99·1000 is 989.999… in binary
        qn = round(q * 1000)
        rank = F.floor((F.col("n") * qn + 999) / 1000)
        est = (
            cum.filter(F.col("cum") >= rank)
            .groupBy(*g, "n")
            .agg(F.min("bin").alias("qbin"))
            .select(
                *g,
                F.lit(q).alias("q"),
                F.col("n"),
                ((F.col("qbin") + 1) * F.lit(float(bin_width))).alias("q_upper"),
            )
        )
        outs.append(est)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def bloom_build(df: DataFrame, key_col: str, m_bits: int = 65536, k: int = 3) -> DataFrame:
    """Bloom-filter set-bit table over a key column: each key sets k
    md5-double-hashed positions in an m-position space; the filter is
    the DISTINCT set of positions (≤ m rows whatever the key count —
    at 100 TB the benchmark/eval-set filter is a broadcastable table
    however many eval rows exist). Merge = union + distinct. No false
    negatives by construction; false-positive rate ≈ (1−e^{−kn/m})^k."""
    return (
        df.select(F.posexplode(_bucket_array(F.col(key_col), m_bits, k)).alias("i", "bit"))
        .select("bit")
        .distinct()
    )


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int = 65536,
    k: int = 3,
    carry_cols: tuple = (),
) -> DataFrame:
    """Membership probe: a key is a (possible) member iff ALL k of its
    positions are set. One explode (×k) + broadcast join against the
    bit table + per-key count — the corpus never shuffles. Returns only
    the maybe-member rows (``carry_cols`` are carried through), one
    output row per input row (duplicate (carry_cols, key) rows survive
    with their multiplicity — no false negatives even when the probe
    side repeats a row: the all-positions-hit test compares hits to the
    GROUP's total exploded positions, never to the constant k, and the
    collapsed duplicates are re-expanded from the group size)."""
    g = list(carry_cols)
    q = df.select(
        *g,
        F.col(key_col).alias("__key"),
        F.posexplode(_bucket_array(F.col(key_col), m_bits, k)).alias("__i", "bit"),
    )
    j = q.join(
        F.broadcast(bloom.withColumn("__hit", F.lit(1))), "bit", "left"
    )
    return (
        j.groupBy(*g, "__key")
        .agg(
            F.count_if(F.col("__hit").isNotNull()).alias("__n_hit"),
            F.count(F.lit(1)).alias("__n_pos"),
        )
        .filter(F.col("__n_hit") == F.col("__n_pos"))
        # re-expand collapsed duplicates: the group held __n_pos / k
        # identical input rows; emit that many output rows
        .withColumn(
            "__copy",
            F.explode(F.sequence(F.lit(1), (F.col("__n_pos") / k).cast("int"))),
        )
        .select(*g)
    )
