"""Grid-blocked radius join: lossless vs brute force, boundary-exact."""

from __future__ import annotations

import itertools
import math

from reddit_tech_jobs_data_pipeline_spark.operators.spatial import grid_radius_join

PTS = [
    (1, 0.0, 0.0),
    (2, 1.5, 0.0),     # exactly at radius (<= keeps it)
    (3, 1.6, 0.0),     # just outside
    (4, 0.1, 0.1),     # same cell as 1
    (5, -1.0, -1.0),   # adjacent (negative) cell, within r of 1
    (6, 50.0, 50.0),   # far away
    (7, 50.5, 50.5),   # pairs only with 6
]


def _brute(r):
    out = {}
    for (ia, xa, ya), (ib, xb, yb) in itertools.combinations(PTS, 2):
        d = math.hypot(xa - xb, ya - yb)
        if d <= r:
            out[(ia, ib)] = round(d, 4)
    return out


class TestGridRadiusJoin:
    def test_equals_brute_force(self, spark):
        df = spark.createDataFrame(PTS, "id long, x double, y double")
        got = {
            (r.id_a, r.id_b): r.dist
            for r in grid_radius_join(df, "id", "x", "y", radius=1.5).collect()
        }
        assert got == _brute(1.5)
        assert (1, 2) in got and (1, 3) not in got  # boundary inclusive/exclusive
        assert (1, 5) in got  # crosses a negative-cell boundary
        assert (6, 7) in got

    def test_each_pair_once(self, spark):
        df = spark.createDataFrame(PTS, "id long, x double, y double")
        rows = grid_radius_join(df, "id", "x", "y", radius=1.5).collect()
        pairs = [(r.id_a, r.id_b) for r in rows]
        assert len(pairs) == len(set(pairs))
