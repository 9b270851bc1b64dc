"""Top principal component via distributed power iteration.

Embedding preprocessing at corpus scale — whitening decisions, ANN
index rotation, drift axes — starts with the dominant eigenvector of
the (centered) covariance, and the power method computes it without
ever materializing the dim×dim covariance matrix: iterate
``w ← Σ_i ((x_i−μ)·v)(x_i−μ);  v ← w/‖w‖``. Each iteration is ONE
aggregate pass whose shuffle payload is dim doubles per partition
(map-side combine), and driver state is the dim-vector v — bounded at
any corpus size. Convergence is geometric in λ2/λ1; a FIXED iteration
count keeps the computation deterministic, and the oracle replays the
identical fixed loop, so cross-engine parity does not depend on
convergence at all.

Numerics follow the kmeans_lloyd_clusters_scale contract: the Spark
side uses commutative per-dimension sums (the 100 TB shape), the DuckDB
oracle an ordered sequential fold — equal up to float reassociation
noise (~1e-15 relative), far inside the 4-dp output rounding, and
gated float-tol by the local checker. Mean-centering uses the same
split (commutative avg vs ordered fold ÷ n).

Output of ``top_component``: (v, explained) — the unit component as a
python list and the explained-variance ratio ‖Xc·v‖²/Σ‖xc‖².
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dvec(col):
    return F.transform(col, lambda x: x.cast("double"))


def _lit_arr(vals: list[float]):
    return F.array(*[F.lit(float(x)) for x in vals])


def top_component(
    emb: DataFrame,
    dim: int,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[float], float]:
    """Power iteration from the deterministic init e₁. Returns
    (component, explained_variance_ratio). ``iters`` fixed → the loop is
    replayable arithmetic, not a convergence race."""
    vecs = emb.select(F.col(id_col).alias("vec_id"), _dvec(F.col(vec_col)).alias("v"))
    vecs = vecs.cache()
    try:
        # mean vector: dim scalar averages in ONE agg — no exploded-row
        # shuffle, the partials are dim doubles per partition (an early
        # posexplode+groupBy form shuffled dim×N rows and measured 7.4×
        # across the sf0.1→sf1.0 decade; this form is pure map-side)
        mu_row = vecs.agg(
            *[F.avg(F.element_at("v", j + 1)).alias(f"m{j}") for j in range(dim)]
        ).first()
        mu = [float(mu_row[f"m{j}"]) for j in range(dim)]
        mu_arr = _lit_arr(mu)

        v = [1.0] + [0.0] * (dim - 1)
        for _ in range(iters):
            v_arr = _lit_arr(v)
            xc = F.zip_with("v", mu_arr, lambda a, b: a - b)
            dot = F.aggregate(
                F.zip_with(xc, v_arr, lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x
            )
            # materialize (xc, dot) per row once, then dim scalar sums
            proj = vecs.select(xc.alias("xc"), dot.alias("dt"))
            w_row = proj.agg(
                *[
                    F.sum(F.col("dt") * F.element_at("xc", j + 1)).alias(f"w{j}")
                    for j in range(dim)
                ]
            ).first()
            w = [float(w_row[f"w{j}"]) for j in range(dim)]
            nrm = math.sqrt(sum(x * x for x in w))
            if nrm == 0.0:
                # degenerate corpus (all vectors identical, or the current
                # direction is exactly annihilated): keep the previous
                # iterate rather than dividing into NaN — the explained
                # ratio below then reports 0 via the row.den guard
                break
            v = [x / nrm for x in w]

        # explained variance ratio of the final direction
        v_arr = _lit_arr(v)
        xc = F.zip_with("v", mu_arr, lambda a, b: a - b)
        dot = F.aggregate(
            F.zip_with(xc, v_arr, lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x
        )
        tot = F.aggregate(
            F.transform(xc, lambda c: c * c), F.lit(0.0), lambda s, x: s + x
        )
        row = vecs.agg(
            F.sum(dot * dot).alias("num"), F.sum(tot).alias("den")
        ).first()
        explained = float(row.num) / float(row.den) if row.den else 0.0
        return v, explained
    finally:
        vecs.unpersist()
