"""Grid-blocked spatial radius join.

The reference has no spatial operators; this is the 2-D analog of its
key-equality joins (SURVEY.md §2.4), added for the scale surface: "all
point pairs within distance r" is a cross join naively, but blocking the
plane into r×r grid cells makes it an equi-join — a pair within r must
fall in the same or adjacent cells, so joining each point's cell against
the 3×3 neighborhood of the other side enumerates a superset of true
pairs, verified exactly afterwards. Lossless by construction (any pair
with |dx|<=r and |dy|<=r is in adjacent cells), identical to the
exhaustive O(n²) join the catalog oracle runs.

Scale notes (100 TB): cost ∝ points per cell² summed over cells, not n².
Cell size = r is the standard balance (9 candidate cells, minimal
false-positive area). Dense hot cells (urban clusters) are the skew risk
— AQE skew-join splits them, or sub-tile hot cells recursively. Distance
math is pure arithmetic (no trig), so whole-stage codegen keeps it
JVM-side and results are bit-deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_grid_cell(df: DataFrame, x: str, y: str, radius: float) -> DataFrame:
    """Attach integer grid-cell coordinates (cell edge = radius)."""
    return df.withColumn("cell_x", F.floor(F.col(x) / radius)).withColumn(
        "cell_y", F.floor(F.col(y) / radius)
    )


def _dist2(xa: Column, ya: Column, xb: Column, yb: Column) -> Column:
    dx = xa - xb
    dy = ya - yb
    return dx * dx + dy * dy


def grid_radius_join(
    df: DataFrame, id_col: str, x: str, y: str, radius: float
) -> DataFrame:
    """All pairs (id_a < id_b) with Euclidean distance <= radius.

    Returns (id_a, id_b, dist) with dist rounded to 4 dp. Each true pair
    is produced exactly once: the left side explodes to its 3×3 cell
    neighborhood and joins the right side's single home cell, so a given
    (a, b) meets on exactly one join key — b's home cell.
    """
    pts = with_grid_cell(
        df.select(
            F.col(id_col).alias("id"), F.col(x).alias("x"), F.col(y).alias("y")
        ),
        "x",
        "y",
        radius,
    )
    offsets = F.explode(
        F.expr(
            "flatten(transform(sequence(-1,1), dx ->"
            " transform(sequence(-1,1), dy -> struct(dx, dy))))"
        )
    )
    probe = pts.select(
        F.col("id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        "cell_x",
        "cell_y",
        offsets.alias("off"),
    ).select(
        "id_a",
        "xa",
        "ya",
        (F.col("cell_x") + F.col("off.dx")).alias("cell_x"),
        (F.col("cell_y") + F.col("off.dy")).alias("cell_y"),
    )
    build = pts.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        "cell_x",
        "cell_y",
    )
    d2 = _dist2(F.col("xa"), F.col("ya"), F.col("xb"), F.col("yb"))
    return (
        probe.join(build, ["cell_x", "cell_y"])
        .filter((F.col("id_a") < F.col("id_b")) & (d2 <= radius * radius))
        .select("id_a", "id_b", F.round(F.sqrt(d2), 4).alias("dist"))
    )
