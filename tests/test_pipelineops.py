"""Unit tests for the pipeline-engineering operators: graph BFS,
DQ validation checks, CDC diff semantics (catalog_pipelineops)."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators import dq
from reddit_tech_jobs_data_pipeline_spark.operators.graph import (
    bfs_min_hops,
    cooccurrence_edges,
    pagerank,
    triangle_counts,
)


def _rows(df):
    return {tuple(r) for r in df.collect()}


class TestBfs:
    def test_chain_min_hops(self, spark):
        # 1 -> 2 -> 3 -> 4 plus a shortcut 1 -> 3: min-hop must win
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (1, 3)], "src long, dst long"
        )
        got = _rows(bfs_min_hops(edges, seed=1, max_hops=3))
        assert got == {(1, 0), (2, 1), (3, 1), (4, 2)}

    def test_hop_bound_truncates(self, spark):
        edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
        got = _rows(bfs_min_hops(edges, seed=1, max_hops=1))
        assert got == {(1, 0), (2, 1)}

    def test_cycle_terminates(self, spark):
        edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
        got = _rows(bfs_min_hops(edges, seed=1, max_hops=4))
        assert got == {(1, 0), (2, 1)}

    def test_cooccurrence_undirected_no_selfloop(self, spark):
        df = spark.createDataFrame(
            [(10, 1), (10, 2), (20, 2), (20, 3), (30, 9)], "g long, n long"
        )
        got = _rows(cooccurrence_edges(df, "g", "n"))
        assert got == {(1, 2), (2, 1), (2, 3), (3, 2)}

    def test_cooccurrence_string_nodes_and_dup_rows(self, spark):
        # string keys exercise the src<dst ordering on a non-numeric type;
        # duplicated input rows must not produce duplicate edges
        df = spark.createDataFrame(
            [(1, "b"), (1, "a"), (1, "a"), (2, "c"), (2, "a"), (3, "z")],
            "g long, n string",
        )
        got = _rows(cooccurrence_edges(df, "g", "n"))
        assert got == {("a", "b"), ("b", "a"), ("a", "c"), ("c", "a")}


class TestPagerank:
    def test_regular_graph_uniform(self, spark):
        # 3-cycle in both directions: every node symmetric -> pr = 1/3
        edges = spark.createDataFrame(
            [(1, 2), (2, 1), (2, 3), (3, 2), (3, 1), (1, 3)], "src long, dst long"
        )
        got = {r.node: r.pr for r in pagerank(edges, iterations=3).collect()}
        assert all(abs(v - 1 / 3) < 1e-12 for v in got.values())
        assert set(got) == {1, 2, 3}

    def test_hub_outranks_leaves(self, spark):
        # star: leaves all point at the hub (and hub back, so no dangling)
        edges = spark.createDataFrame(
            [(2, 1), (3, 1), (4, 1), (1, 2), (1, 3), (1, 4)], "src long, dst long"
        )
        got = {r.node: r.pr for r in pagerank(edges, iterations=3).collect()}
        assert got[1] > got[2] == got[3] == got[4]
        assert abs(sum(got.values()) - 1.0) < 1e-9  # conserved (no dangling)

    def test_commutative_scale_path_matches_ordered_fold(self, spark):
        """The scale-mode path (map-side-combined F.sum, hash-joined rank
        table) must agree with the oracle-parity ordered fold up to float
        reassociation noise on an irregular multi-hub graph."""
        raw = [
            (s, d)
            for s in range(1, 13)
            for d in {(s * 7) % 12 + 1, (s * 5) % 12 + 1, s % 12 + 1}
            if s != d
        ]
        edges = spark.createDataFrame(raw, "src long, dst long")
        ordered = {r.node: r.pr for r in pagerank(edges, iterations=5).collect()}
        scale = {
            r.node: r.pr
            for r in pagerank(edges, iterations=5, commutative=True).collect()
        }
        assert set(ordered) == set(scale)
        for node, v in ordered.items():
            assert abs(scale[node] - v) <= 1e-12 * max(1.0, abs(v)), node
        assert abs(sum(scale.values()) - 1.0) < 1e-9


class TestTriangles:
    def test_k4_counts(self, spark):
        # complete graph on 4 nodes: C(4,3)=4 triangles, each node in 3
        edges = spark.createDataFrame(
            [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)], "src long, dst long"
        )
        got = {r.node: r.n_tri for r in triangle_counts(edges).collect()}
        assert got == {1: 3, 2: 3, 3: 3, 4: 3}

    def test_triangle_free_graph_empty(self, spark):
        edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
        assert triangle_counts(edges).count() == 0


class TestCappedRunningBalance:
    def test_clamps_both_ends(self, spark):
        import datetime as dt

        from reddit_tech_jobs_data_pipeline_spark.operators.sequential import (
            capped_running_balance,
        )

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, t0, 7, 130.0),                          # 0+130-50=80
            (2, t0 + dt.timedelta(minutes=1), 7, 120.0),  # 80+70=150 -> cap 100
            (3, t0 + dt.timedelta(minutes=2), 7, 10.0),   # 100-40=60
            (4, t0 + dt.timedelta(minutes=3), 7, 0.0),    # 60-50=10
            (5, t0 + dt.timedelta(minutes=4), 7, 0.0),    # 10-50 -> floor 0
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, value double"
        )
        got = {
            r.event_id: r.balance
            for r in capped_running_balance(ev, cap=100.0, drift=-50.0).collect()
        }
        assert got == {1: 80.0, 2: 100.0, 3: 60.0, 4: 10.0, 5: 0.0}


class TestDq:
    def test_predicate_and_unique(self, spark):
        df = spark.createDataFrame(
            [(1, 5.0), (1, -2.0), (2, None)], "k long, v double"
        )
        report = dq.suite(
            [
                dq.unique_check(df, "k_unique", "k"),
                dq.predicate_check(df, "v_nonneg", F.col("v") < 0),
                dq.predicate_check(df, "v_not_null", F.col("v").isNull()),
            ]
        )
        assert _rows(report) == {("k_unique", 1), ("v_nonneg", 1), ("v_not_null", 1)}

    def test_fk_orphans(self, spark):
        child = spark.createDataFrame([(1,), (2,), (9,), (9,)], "fk long")
        parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
        got = _rows(dq.fk_check(child, parent, "fk_ok", "fk", "pk"))
        assert got == {("fk_ok", 2)}

    def test_clean_table_reports_zero(self, spark):
        df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double")
        got = _rows(dq.predicate_check(df, "v_pos", F.col("v") <= 0))
        assert got == {("v_pos", 0)}


class TestObserveQuality:
    def test_metrics_ride_the_materializing_job(self, spark):
        from reddit_tech_jobs_data_pipeline_spark.operators.dq import observe_quality
        from reddit_tech_jobs_data_pipeline_spark.sources.testdata import load_table
        import pyspark.sql.functions as F

        ev = load_table(spark, "/root/testdata/sf0.001", "events")
        observed, obs = observe_quality(
            ev,
            "ingest_dq",
            {
                "n_rows": F.count(F.lit(1)),
                "null_users": F.sum(F.when(F.col("user_id").isNull(), 1).otherwise(0)),
                "max_value": F.max("value"),
            },
        )
        n = observed.count()  # one action; metrics piggy-back on it
        got = obs.get
        assert got["n_rows"] == n == 1000
        assert got["null_users"] == 0
        assert got["max_value"] == ev.agg(F.max("value")).first()[0]


def test_fused_checks_match_individual(spark):
    from reddit_tech_jobs_data_pipeline_spark.operators import dq

    df = spark.createDataFrame(
        [(1, "a", 5), (2, None, -1), (2, "c", 3), (3, "x", 0)],
        "k long, s string, v long",
    )
    preds = {
        "s_not_null": F.col("s").isNull(),
        "v_positive": F.col("v") <= 0,
        "s_accepted": ~F.col("s").isin("a", "c"),
    }
    fused = {
        r.check_name: r.violations
        for r in dq.fused_checks(
            df, preds, unique_keys={"k_unique": ["k"]}
        ).collect()
    }
    individual = {}
    for n, bad in preds.items():
        individual[n] = dq.predicate_check(df, n, bad).collect()[0].violations
    individual["k_unique"] = dq.unique_check(df, "k_unique", "k").collect()[0].violations
    assert fused == individual
    assert fused == {
        "s_not_null": 1,
        "v_positive": 2,
        # NULL s: isin is null → when() counts it as OK, same as individual
        "s_accepted": 1,
        "k_unique": 1,
    }


def test_fused_checks_single_scan_plan(spark):
    from reddit_tech_jobs_data_pipeline_spark.operators import dq

    df = spark.range(100).select(F.col("id").alias("k"))
    out = dq.fused_checks(
        df, {"k_small": F.col("k") >= 1000}, unique_keys={"k_unique": ["k"]}
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") <= 1  # one pass over the table


def test_zorder_morton_interleave_known_values(spark):
    """morton(qx, qy) interleaves bits x0 y0 x1 y1 ...: (3, 0) -> 0b0101 = 5,
    (0, 3) -> 0b1010 = 10, (15, 15) -> 255."""
    from reddit_tech_jobs_data_pipeline_spark.plans.catalog import get_registry

    df = spark.createDataFrame(
        [(3, 0, 5), (0, 3, 10), (15, 15, 255), (1, 1, 3), (2, 1, 6)],
        "qx long, qy long, want long",
    )
    morton = None
    for i in range(4):
        for col, off in (("qx", 0), ("qy", 1)):
            term = F.shiftleft(
                F.shiftright(F.col(col), i).bitwiseAND(F.lit(1)), 2 * i + off
            )
            morton = term if morton is None else morton + term
    bad = df.filter(morton != F.col("want")).count()
    assert bad == 0


def test_zorder_layout_prunes_second_dimension(spark):
    from reddit_tech_jobs_data_pipeline_spark.plans.catalog import get_registry

    spec = get_registry()["zorder_layout_audit"]
    rows = {r.layout: r for r in spec.spark(spark, "/root/testdata/sf0.001").collect()}
    z, rm = rows["zorder"], rows["rowmajor"]
    # the point of z-order: the second dimension prunes files at all
    assert z.files_hit_y5 < rm.files_hit_y5
    assert z.avg_y_span < rm.avg_y_span
    # and the first dimension stays bounded (not a y-major sort in disguise)
    assert z.max_x_span <= 15 and z.avg_x_span < 16
