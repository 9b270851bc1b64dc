"""Rounding-boundary margin assertion for the float-tol queries.

The driver's correctness gate hashes stringified ROUNDED values, and the
commutative scale modes (pagerank / personalized pagerank / HITS /
k-means) produce float sums that differ from the ordered-fold oracle by
reassociation noise (~1e-13). The local gate compares them under numeric
tolerance (tools/check_oracle.py ``float-tol``), but the driver's hash
gate cannot be changed — so this script proves the hash gate is safe
anyway: for every value those queries emit, the UNROUNDED float must sit
at least MIN_MARGIN away from the nearest round-half boundary at the
query's advertised decimal count. If every margin clears MIN_MARGIN
(ten-thousand-fold wider than the observed noise), no reassociation
reordering can flip a rounded digit between runs or engines.

Checks BOTH numeric modes (ordered fold and commutative) at each SF dir
given (default: all three committed SFs).

Usage: python tools/boundary_margin.py [sf_dir ...]
Exit 1 if any margin is below MIN_MARGIN.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators.graph import (
    cooccurrence_edges,
    hits,
    pagerank,
)
from reddit_tech_jobs_data_pipeline_spark.operators.kmeans import lloyd_kmeans
from reddit_tech_jobs_data_pipeline_spark.session import get_spark
from reddit_tech_jobs_data_pipeline_spark.sources.testdata import load_table

MIN_MARGIN = 1e-10  # in value units; observed reassociation noise ~1e-13


def margin(value: float, digits: int) -> float:
    """Distance from ``value`` to the nearest .5-at-digit rounding
    boundary, in value units."""
    scaled = value * (10**digits)
    frac = scaled - math.floor(scaled)
    return abs(frac - 0.5) / (10**digits)


def _pagerank_vals(spark, sf_dir, commutative, seeds):
    lineitem = load_table(spark, sf_dir, "lineitem")
    edges = cooccurrence_edges(lineitem, "l_partkey", "l_suppkey")
    seed_ids = None
    if seeds:
        seed_ids = [
            r.node
            for r in edges.select(F.col("src").alias("node"))
            .distinct()
            .orderBy("node")
            .limit(2)
            .collect()
        ]
    pr = pagerank(
        edges, damping=0.85, iterations=3, symmetric=True,
        commutative=commutative, seeds=seed_ids,
    )
    return [(r.pr, 6) for r in pr.select("pr").collect()]


def _hits_vals(spark, sf_dir, commutative):
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    ks = part.select(F.col("p_partkey").alias("k"))
    chain = ks.filter(F.col("k") + 1 < 300).select(
        F.col("k").alias("src"), (F.col("k") + 1).alias("dst")
    )
    skip = ks.filter((F.col("k") % 3 != 0) & (F.col("k") + 2 < 300)).select(
        F.col("k").alias("src"), (F.col("k") + 2).alias("dst")
    )
    out = hits(chain.unionByName(skip), iterations=3, commutative=commutative)
    return [(v, 6) for r in out.select("hub", "auth").collect() for v in (r.hub, r.auth)]


def _kmeans_vals(spark, sf_dir, commutative):
    emb = load_table(spark, sf_dir, "embeddings")
    out = lloyd_kmeans(emb, k=8, dim=64, iterations=2, commutative=commutative)
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col("cvec"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return [(r.n, 4) for r in out.select(norm.alias("n")).collect()]


CHECKS = {
    "pagerank_suppliers_scale": lambda sp, sf, c: _pagerank_vals(sp, sf, c, seeds=False),
    "personalized_pagerank_suppliers_scale": lambda sp, sf, c: _pagerank_vals(
        sp, sf, c, seeds=True
    ),
    "hits_part_chain_scale": _hits_vals,
    "kmeans_lloyd_clusters_scale": _kmeans_vals,
}


def main() -> int:
    sf_dirs = sys.argv[1:] or [
        f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")
    ]
    spark = get_spark("boundary_margin")
    bad = []
    for sf_dir in sf_dirs:
        for name, fn in CHECKS.items():
            for commutative in (False, True):
                vals = fn(spark, sf_dir, commutative)
                worst = min(margin(v, d) for v, d in vals)
                mode = "commutative" if commutative else "ordered"
                status = "OK " if worst >= MIN_MARGIN else "BAD"
                print(
                    f"{status} {os.path.basename(sf_dir)} {name} [{mode}]: "
                    f"n={len(vals)} min_margin={worst:.3e}"
                )
                if worst < MIN_MARGIN:
                    bad.append((sf_dir, name, mode, worst))
    if bad:
        print(f"\n{len(bad)} margin violations (< {MIN_MARGIN})")
        return 1
    print(f"\nall margins >= {MIN_MARGIN}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
