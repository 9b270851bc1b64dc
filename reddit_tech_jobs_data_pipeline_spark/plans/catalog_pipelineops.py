"""Pipeline-engineering catalog: data-quality validation, snapshot CDC
diff, incremental aggregate maintenance, heavy hitters, iterative graph
BFS (recursive-CTE oracle), RFM segmentation, and sequence-pattern
matching over event streams.

These generalize the reference's ETL surface (SURVEY.md §2.3 F5 error
tolerance → DQ suite; §2.4 D2 keyed merge → CDC diff; §2.5 A1
incremental watermark → incremental aggregate maintenance) into the
operators a production lakehouse pipeline runs around every load.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators import dq
from reddit_tech_jobs_data_pipeline_spark.operators.graph import (
    bfs_min_hops,
    cooccurrence_edges,
)
from reddit_tech_jobs_data_pipeline_spark.operators.spatial import grid_radius_join
from reddit_tech_jobs_data_pipeline_spark.plans.catalog import register, _t


# ===========================================================================
# Data-quality validation suite (generalizes F5 per-row tolerance)
# ===========================================================================
@register(
    "dq_validation_suite",
    """
    SELECT 'orders_pk_unique' AS check_name,
           count(*) - count(DISTINCT o_orderkey) AS violations FROM orders
    UNION ALL
    SELECT 'orders_custkey_not_null', count(*) FILTER (o_custkey IS NULL) FROM orders
    UNION ALL
    SELECT 'orders_status_accepted',
           count(*) FILTER (o_orderstatus NOT IN ('P','O','F')) FROM orders
    UNION ALL
    SELECT 'orders_date_in_range',
           count(*) FILTER (o_orderdate < TIMESTAMP '1992-01-01'
                            OR o_orderdate > TIMESTAMP '2005-01-01') FROM orders
    UNION ALL
    SELECT 'lineitem_discount_in_range',
           count(*) FILTER (l_discount < 0 OR l_discount > 1) FROM lineitem
    UNION ALL
    SELECT 'lineitem_quantity_positive',
           count(*) FILTER (l_quantity <= 0) FROM lineitem
    UNION ALL
    SELECT 'lineitem_orderkey_fk', count(*) FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'orders_custkey_fk', count(*) FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    """,
    tags=["dq", "etl"],
)
def dq_validation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    customer = _t(spark, sf_dir, "customer")
    # one fused pass per table (dq.fused_checks) + the two FK anti joins:
    # 5 scans total vs 10 when every check aggregated separately
    return dq.suite(
        [
            dq.fused_checks(
                orders,
                {
                    "orders_custkey_not_null": F.col("o_custkey").isNull(),
                    "orders_status_accepted": ~F.col("o_orderstatus").isin(
                        "P", "O", "F"
                    ),
                    "orders_date_in_range": (
                        F.col("o_orderdate")
                        < F.lit("1992-01-01").cast("timestamp")
                    )
                    | (
                        F.col("o_orderdate")
                        > F.lit("2005-01-01").cast("timestamp")
                    ),
                },
                unique_keys={"orders_pk_unique": ["o_orderkey"]},
            ),
            dq.fused_checks(
                lineitem,
                {
                    "lineitem_discount_in_range": (F.col("l_discount") < 0)
                    | (F.col("l_discount") > 1),
                    "lineitem_quantity_positive": F.col("l_quantity") <= 0,
                },
            ),
            dq.fk_check(lineitem, orders, "lineitem_orderkey_fk", "l_orderkey", "o_orderkey"),
            dq.fk_check(orders, customer, "orders_custkey_fk", "o_custkey", "c_custkey"),
        ]
    )


# ===========================================================================
# Snapshot CDC diff (generalizes D2 keyed merge: what changed between runs)
# ===========================================================================
_CDC_SQL = """
    old AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 7 <> 0),
    new AS (SELECT o_orderkey,
                   o_totalprice + CASE WHEN o_orderkey % 3 = 0 THEN 100 ELSE 0 END
                     AS o_totalprice
            FROM orders WHERE o_orderkey % 5 <> 0)
"""


@register(
    "snapshot_cdc_diff",
    f"""
    WITH {_CDC_SQL}
    SELECT CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           count(*) AS cnt
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.o_totalprice <> n.o_totalprice
    GROUP BY 1
    """,
    tags=["cdc", "etl"],
)
def snapshot_cdc_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", "o_totalprice"
    )
    new = orders.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey",
        (
            F.col("o_totalprice")
            + F.when(F.col("o_orderkey") % 3 == 0, 100).otherwise(0)
        ).alias("o_totalprice"),
    )
    j = old.alias("o").join(
        new.alias("n"), F.col("o.o_orderkey") == F.col("n.o_orderkey"), "full_outer"
    )
    return (
        j.withColumn(
            "change_type",
            F.when(F.col("o.o_orderkey").isNull(), "insert")
            .when(F.col("n.o_orderkey").isNull(), "delete")
            .otherwise("update"),
        )
        .filter(
            F.col("o.o_orderkey").isNull()
            | F.col("n.o_orderkey").isNull()
            | (F.col("o.o_totalprice") != F.col("n.o_totalprice"))
        )
        .groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# ===========================================================================
# Incremental aggregate maintenance (generalizes A1 watermark increments):
# base aggregate + delta batch merged == full recompute (the oracle)
# ===========================================================================
@register(
    "incremental_agg_monthly_revenue",
    """
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS revenue,
           count(*) AS n_orders
    FROM orders GROUP BY 1
    """,
    tags=["incremental", "etl"],
)
def incremental_agg_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: base + delta partials merged
    must equal the oracle's full recompute (DECIMAL sums are exactly
    mergeable — the contract of incremental rollup)."""
    # Spark side computes the answer INCREMENTALLY — a pre-cutoff base
    # aggregate merged with a post-cutoff delta aggregate (decimal sums →
    # exact, associative, so the merge is bit-identical to recompute);
    # the oracle recomputes directly. Matching proves the maintenance
    # algebra: sum/count are mergeable partials.
    orders = _t(spark, sf_dir, "orders")
    cutoff = F.lit("1999-01-01").cast("timestamp")

    def monthly(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("month")
        ).agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
            F.count(F.lit(1)).alias("n_orders"),
        )

    base = monthly(orders.filter(F.col("o_orderdate") < cutoff))
    delta = monthly(orders.filter(F.col("o_orderdate") >= cutoff))
    return (
        base.unionByName(delta)
        .groupBy("month")
        .agg(F.sum("rev").alias("rev"), F.sum("n_orders").alias("n_orders"))
        .select(
            "month",
            F.round(F.col("rev").cast("double"), 2).alias("revenue"),
            "n_orders",
        )
    )


# ===========================================================================
# Heavy hitters: tokens with frequency > total/200 (exact, two aggregates)
# ===========================================================================
_TOKS = r"list_filter(regexp_split_to_array(lower(text), '\W+'), x -> x <> '')"


@register(
    "heavy_hitter_tokens",
    f"""
    WITH tok AS (SELECT unnest({_TOKS}) AS token FROM documents)
    SELECT token, count(*) AS cnt FROM tok GROUP BY token
    HAVING count(*) > (SELECT count(*) FROM tok) / 200.0
    """,
    tags=["text", "scale"],
)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = (
        _t(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col("text")), r"\W+"), lambda x: x != ""
                )
            ).alias("token")
        )
    )
    total = tok.agg(F.count(F.lit(1)).alias("total"))
    return (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(F.broadcast(total))
        .filter(F.col("cnt") > F.col("total") / 200.0)
        .select("token", "cnt")
    )


# ===========================================================================
# Schema evolution: old snapshot lacks a column added later; unionByName
# with allowMissingColumns back-fills NULL (parquet mergeSchema semantics)
# ===========================================================================
@register(
    "schema_evolution_union",
    """
    WITH unioned AS (
      SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority
      FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01'
      UNION ALL
      SELECT o_orderkey, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
    )
    SELECT coalesce(o_orderpriority, '<missing>') AS priority,
           count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS revenue
    FROM unioned GROUP BY 1
    """,
    tags=["schema", "etl"],
)
def schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Old-schema and new-schema batches unioned by name with NULL
    back-fill for the added column (parquet mergeSchema semantics)."""
    orders = _t(spark, sf_dir, "orders")
    cutoff = F.lit("1999-01-01").cast("timestamp")
    old = orders.filter(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_totalprice"
    )
    new = orders.filter(F.col("o_orderdate") >= cutoff).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    evolved = old.unionByName(new, allowMissingColumns=True)
    return (
        evolved.groupBy(
            F.coalesce("o_orderpriority", F.lit("<missing>")).alias("priority")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2
            ).alias("revenue"),
        )
    )


# ===========================================================================
# Iterative BFS over the supplier co-supply graph; recursive-CTE oracle
# ===========================================================================
_BFS_SQL = """
    WITH RECURSIVE
    edges AS (
      SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) a
      JOIN (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) b
        ON a.l_partkey = b.l_partkey AND a.l_suppkey <> b.l_suppkey
    ),
    reach(node, depth) AS (
      SELECT CAST(1 AS BIGINT) AS node, 0 AS depth
      UNION ALL
      SELECT e.dst, r.depth + 1
      FROM reach r JOIN edges e ON e.src = r.node
      WHERE r.depth < 2
    )
    SELECT node, CAST(min(depth) AS INTEGER) AS hops FROM reach GROUP BY node
    """


@register("bfs_supplier_reachability", _BFS_SQL, tags=["graph", "iterative"])
def bfs_supplier_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    edges = cooccurrence_edges(lineitem, "l_partkey", "l_suppkey")
    # cooccurrence_edges output is distinct by construction -> skip
    # the operator's defensive edge dedup (one 999k-row exchange at sf0.1)
    return bfs_min_hops(edges, seed=1, max_hops=2, assume_distinct=True)


@register(
    "bfs_supplier_reachability_scale",
    _BFS_SQL,
    tags=["graph", "iterative", "scale"],
)
def bfs_supplier_reachability_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The billion-node BFS plan: ``broadcast=False`` drops the frontier
    and visited-set broadcast hints so every level's expand and
    anti-join hash-partition on the node key — no per-executor copy of
    the visited set is ever required. Same frontier recurrence, same
    recursive-CTE oracle; the set-level result is identical because
    broadcasting is a physical hint, not a semantic one."""
    lineitem = _t(spark, sf_dir, "lineitem")
    edges = cooccurrence_edges(lineitem, "l_partkey", "l_suppkey")
    return bfs_min_hops(
        edges, seed=1, max_hops=2, broadcast=False, assume_distinct=True
    )


# ===========================================================================
# Grid-blocked spatial radius join: all customer-point pairs within r,
# cell blocking (equi-join) vs the oracle's exhaustive O(n²) — lossless.
# Points are synthesized deterministically from c_custkey (pure modular
# arithmetic, no trig → bit-identical doubles on both engines).
# ===========================================================================
@register(
    "spatial_radius_join",
    """
    WITH pts AS (
      SELECT c_custkey AS id,
             ((c_custkey * 37) % 400) / 10.0 AS x,
             ((c_custkey * 91) % 400) / 10.0 AS y
      FROM customer
    )
    SELECT a.id AS id_a, b.id AS id_b,
           round(sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)), 4) AS dist
    FROM pts a JOIN pts b
      ON a.id < b.id
     AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 2.25
    """,
    tags=["spatial", "scale"],
)
def spatial_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") * 37) % 400 / 10.0).alias("x"),
        ((F.col("c_custkey") * 91) % 400 / 10.0).alias("y"),
    )
    return grid_radius_join(pts, "id", "x", "y", radius=1.5)


# ===========================================================================
# RFM customer segmentation (ntile quartiles, deterministic tiebreaks)
# ===========================================================================
_RFM_SQL = """
    WITH rfm AS (
      SELECT o_custkey,
             CAST(date_diff('day', max(o_orderdate),
                  (SELECT max(o_orderdate) FROM orders)) AS INTEGER) AS recency_days,
             count(*) AS frequency,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS monetary
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT *,
             ntile(4) OVER (ORDER BY recency_days ASC, o_custkey) AS r_score,
             ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
             ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
      FROM rfm
    )
    SELECT o_custkey, recency_days, frequency, monetary,
           CAST(r_score AS INTEGER) AS r_score,
           CAST(f_score AS INTEGER) AS f_score,
           CAST(m_score AS INTEGER) AS m_score,
           CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
             || CAST(m_score AS VARCHAR) AS segment
    FROM scored
    """


def _rfm_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    anchor = orders.agg(F.max("o_orderdate").alias("anchor"))
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2
            ).alias("monetary"),
        )
        .join(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff("anchor", "last_order").cast("int").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )


def _rfm_segment(scored: DataFrame) -> DataFrame:
    return scored.withColumn(
        "segment",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


@register("rfm_segmentation", _RFM_SQL, tags=["analytics", "segmentation"])
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    rfm = _rfm_base(spark, sf_dir)
    scored = rfm.select(
        "*",
        F.ntile(4)
        .over(Window.orderBy(F.asc("recency_days"), F.asc("o_custkey")))
        .alias("r_score"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("frequency"), F.asc("o_custkey")))
        .alias("f_score"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("monetary"), F.asc("o_custkey")))
        .alias("m_score"),
    )
    return _rfm_segment(scored)


@register(
    "rfm_segmentation_scale",
    _RFM_SQL,
    tags=["analytics", "segmentation", "scale"],
)
def rfm_segmentation_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM without global-sort windows: each of the three quartile
    scores is an exact distributed rank (operators/ranking.py, the
    two-phase prefix-sum shape) fed through the arithmetic ntile —
    three range shuffles instead of three single-partition sorts, and
    the per-customer table never has to fit one task. Integer-exact,
    same oracle as the windowed twin."""
    from reddit_tech_jobs_data_pipeline_spark.operators import ranking

    rfm = _rfm_base(spark, sf_dir)
    n = rfm.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    scored = rfm
    for rank_col, score_col, order in (
        ("_ri", "r_score", [F.asc("recency_days"), F.asc("o_custkey")]),
        ("_fi", "f_score", [F.desc("frequency"), F.asc("o_custkey")]),
        ("_mi", "m_score", [F.desc("monetary"), F.asc("o_custkey")]),
    ):
        scored = ranking.global_row_number(scored, order, rank_col, scale=True)
    scored = scored.crossJoin(F.broadcast(n))
    for rank_col, score_col in (("_ri", "r_score"), ("_fi", "f_score"), ("_mi", "m_score")):
        scored = scored.withColumn(
            score_col,
            ranking.ntile_from_rank(F.col(rank_col), F.col("_n"), 4).cast("int"),
        )
    scored = scored.drop("_ri", "_fi", "_mi", "_n")
    return _rfm_segment(scored)


# ===========================================================================
# Sequence-pattern match (MATCH_RECOGNIZE-lite): per-user event-initial
# string, regex funnel view→click→purchase in order
# ===========================================================================
@register(
    "funnel_sequence_match",
    """
    WITH seqs AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
      FROM events GROUP BY user_id
    )
    SELECT user_id, CAST(length(seq) AS BIGINT) AS seq_len,
           regexp_matches(seq, 'v.*c.*p') AS matched
    FROM seqs
    """,
    tags=["sequence", "behavior"],
)
def funnel_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    seqs = (
        events.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("ts"),
                        F.col("event_id"),
                        F.substring("event_type", 1, 1).alias("i"),
                    )
                )
            ).alias("arr")
        )
        .select(
            "user_id",
            F.concat_ws("", F.transform(F.col("arr"), lambda x: x["i"])).alias("seq"),
        )
    )
    return seqs.select(
        "user_id",
        F.length("seq").cast("long").alias("seq_len"),
        F.col("seq").rlike("v.*c.*p").alias("matched"),
    )


# ===========================================================================
# PageRank (3 unrolled iterations) on the supplier co-supply graph —
# bit-exact oracle via sequential src-ordered contribution folds and
# explicit DOUBLE literals (DuckDB parses bare 0.85 as DECIMAL).
# ===========================================================================

_PR_EDGES_SQL = """
    edges AS (
      SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) a
      JOIN (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) b
        ON a.l_partkey = b.l_partkey AND a.l_suppkey <> b.l_suppkey
    ),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    nn AS (SELECT count(*) AS n_nodes FROM nodes),
    outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)
"""


def _pagerank_sql(iterations: int) -> str:
    d = "CAST(0.85 AS DOUBLE)"
    one = "CAST(1.0 AS DOUBLE)"
    parts = [
        f"p0 AS (SELECT node, {one} / n_nodes AS pr FROM nodes CROSS JOIN nn)"
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""c{i} AS (
      SELECT e.src, e.dst, p.pr / o.outdeg AS contrib
      FROM edges e JOIN p{i - 1} p ON p.node = e.src
      JOIN outdeg o ON o.src = e.src
    ),
    s{i} AS (
      SELECT dst AS node,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                      list(contrib ORDER BY src)),
                         (a, b) -> a + b) AS in_sum
      FROM c{i} GROUP BY dst
    ),
    p{i} AS (
      SELECT n.node,
             ({one} - {d}) / nn.n_nodes
               + {d} * coalesce(s.in_sum, CAST(0.0 AS DOUBLE)) AS pr
      FROM nodes n LEFT JOIN s{i} s ON s.node = n.node CROSS JOIN nn
    )"""
        )
    body = ",\n    ".join(parts)
    return f"""
    WITH {_PR_EDGES_SQL},
    {body}
    SELECT node, round(pr, 6) AS pagerank FROM p{iterations}
    """


@register(
    "pagerank_suppliers",
    _pagerank_sql(iterations=3),
    tags=["graph", "iterative"],
)
def pagerank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three PageRank iterations over the supplier co-supply graph; the
    oracle unrolls the identical recurrence (sequential src-ordered
    folds — see operators/graph.pagerank for the at-scale variant)."""
    from reddit_tech_jobs_data_pipeline_spark.operators.graph import pagerank

    lineitem = _t(spark, sf_dir, "lineitem")
    edges = cooccurrence_edges(lineitem, "l_partkey", "l_suppkey")
    pr = pagerank(edges, damping=0.85, iterations=3, symmetric=True)
    return pr.select("node", F.round("pr", 6).alias("pagerank"))


@register(
    "pagerank_suppliers_scale",
    _pagerank_sql(iterations=3),
    tags=["graph", "iterative", "scale", "float-tol"],
)
def pagerank_suppliers_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB pagerank plan: ``commutative=True`` sums contributions
    with map-side partial aggregation (no per-node collect_list array, no
    skew amplification) and hash-joins the rank table instead of
    broadcasting it, so nothing requires the node table to fit on one
    machine. Ranks differ from the ordered fold only by float
    reassociation noise (~1e-13 absolute), far inside the 6-decimal
    rounding both engines apply — so the bit-exact ordered-fold SQL
    oracle still hash-matches. The local gate (tools/check_oracle.py)
    compares this query's float columns under numeric tolerance (the
    ``float-tol`` tag) so a rank landing within noise of a 6-dp rounding
    boundary can never flake the suite; tools/boundary_margin.py
    additionally asserts the unrounded values sit well clear of their
    boundaries at every SF, which keeps the driver's stringified-hash
    gate (which we cannot change) safe too."""
    from reddit_tech_jobs_data_pipeline_spark.operators.graph import pagerank

    lineitem = _t(spark, sf_dir, "lineitem")
    edges = cooccurrence_edges(lineitem, "l_partkey", "l_suppkey")
    pr = pagerank(edges, damping=0.85, iterations=3, commutative=True, symmetric=True)
    return pr.select("node", F.round("pr", 6).alias("pagerank"))


# ===========================================================================
# Triangle counting on a deterministic sparse graph over part keys
# (chain + skip edges: (k, k+1) always, (k, k+2) when k % 3 <> 0 —
# sparse at every SF, unlike the near-complete co-supply graph).
# ===========================================================================

_TRI_EDGES_SQL = """
    ks AS (SELECT p_partkey AS k, (SELECT max(p_partkey) FROM part) AS mx FROM part),
    edges AS (
      SELECT k AS src, k + 1 AS dst FROM ks WHERE k + 1 <= mx
      UNION ALL
      SELECT k AS src, k + 2 AS dst FROM ks WHERE k % 3 <> 0 AND k + 2 <= mx
    )
"""


@register(
    "triangle_counts_parts",
    f"""
    WITH {_TRI_EDGES_SQL},
    tri AS (
      SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      FROM edges e1
      JOIN edges e2 ON e2.src = e1.dst
      JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
    ),
    corners AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    SELECT node, count(*) AS n_tri FROM corners GROUP BY node
    """,
    tags=["graph"],
)
def triangle_counts_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once triangle enumeration (ordered edges, wedge + probe)
    vs the identical three-way join in SQL."""
    from reddit_tech_jobs_data_pipeline_spark.operators.graph import triangle_counts

    part = _t(spark, sf_dir, "part")
    mx = part.agg(F.max("p_partkey").alias("mx"))
    ks = part.select(F.col("p_partkey").alias("k")).join(F.broadcast(mx))
    chain = ks.filter(F.col("k") + 1 <= F.col("mx")).select(
        F.col("k").alias("src"), (F.col("k") + 1).alias("dst")
    )
    skip = ks.filter((F.col("k") % 3 != 0) & (F.col("k") + 2 <= F.col("mx"))).select(
        F.col("k").alias("src"), (F.col("k") + 2).alias("dst")
    )
    return triangle_counts(chain.unionByName(skip))


# ===========================================================================
# Clamped running balance — NOT window-expressible (state is clamped at
# every step): sequential partition scan vs recursive-CTE oracle.
# ===========================================================================
@register(
    "capped_running_balance",
    """
    WITH RECURSIVE
    ev AS (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    bal(user_id, event_id, rn, b) AS (
      SELECT user_id, event_id, rn,
             greatest(CAST(0.0 AS DOUBLE),
                      least(CAST(100.0 AS DOUBLE), value - CAST(50.0 AS DOUBLE)))
      FROM ev WHERE rn = 1
      UNION ALL
      SELECT e.user_id, e.event_id, e.rn,
             greatest(CAST(0.0 AS DOUBLE),
                      least(CAST(100.0 AS DOUBLE),
                            b.b + e.value - CAST(50.0 AS DOUBLE)))
      FROM bal b JOIN ev e ON e.user_id = b.user_id AND e.rn = b.rn + 1
    )
    SELECT event_id, user_id, round(b, 4) AS balance FROM bal
    """,
    tags=["sequential", "escape-hatch"],
)
def capped_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamped recurrence bal_t = clamp(bal_{t-1} + value_t - 50) per
    user: the sequential-scan escape hatch (mapInPandas over user-sorted
    partitions, operators/sequential.py) doing genuinely
    sequential per-key work, bit-identical to the recursive CTE."""
    from reddit_tech_jobs_data_pipeline_spark.operators.sequential import (
        capped_running_balance as _crb,
    )

    events = _t(spark, sf_dir, "events")
    out = _crb(events, cap=100.0, drift=-50.0, floor=0.0)
    return out.select("event_id", "user_id", F.round("balance", 4).alias("balance"))


# ===========================================================================
# Weighted single-source shortest paths on the directed chain+skip DAG
# (chain k->k+1 costs 2; skip k->k+2 costs 1 when k % 3 <> 0 — skips are
# the fast lane but are periodically unavailable, so optimal paths mix).
# Restricted to k < 300: the recursive oracle enumerates distinct
# (node, dist) states, O(n * distinct-dists) of them.
# ===========================================================================


@register(
    "sssp_part_chain",
    """
    WITH RECURSIVE ks AS (SELECT p_partkey AS k FROM part WHERE p_partkey < 300),
    edges AS (
      SELECT k AS src, k + 1 AS dst, 2 AS w FROM ks WHERE k + 1 < 300
      UNION ALL
      SELECT k AS src, k + 2 AS dst, 1 AS w FROM ks WHERE k % 3 <> 0 AND k + 2 < 300
    ),
    walk(node, d) AS (
      SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      UNION
      SELECT e.dst, w.d + e.w FROM edges e JOIN walk w ON e.src = w.node
    )
    SELECT node, min(d) AS dist FROM walk GROUP BY node
    """,
    tags=["graph", "iterative"],
)
def sssp_part_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed Gauss-Seidel SSSP (operators/graph.sssp_min_dist) vs the
    recursive-CTE min-distance oracle — integer weights, bit-exact. The
    oracle explores every distinct (node, dist) state of the DAG; the
    Spark side range-buckets the chain by src id and relaxes each bucket
    to local fixpoint per round (vectorized pandas sweeps inside the
    task), so this 300-hop-diameter graph converges in ~n_buckets global
    rounds instead of ~300 — one-hop-per-job Bellman-Ford measured 46 s
    at sf0.1, this form ~7 s at n_buckets=4 (rounds × ~1.3 s/round of
    cogroup+fold+checksum jobs)."""
    from reddit_tech_jobs_data_pipeline_spark.operators.graph import sssp_min_dist

    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    ks = part.select(F.col("p_partkey").alias("k"))
    chain = ks.filter(F.col("k") + 1 < 300).select(
        F.col("k").alias("src"), (F.col("k") + 1).alias("dst"), F.lit(2).alias("w")
    )
    skip = ks.filter((F.col("k") % 3 != 0) & (F.col("k") + 2 < 300)).select(
        F.col("k").alias("src"), (F.col("k") + 2).alias("dst"), F.lit(1).alias("w")
    )
    return sssp_min_dist(
        chain.unionByName(skip), seed=0, max_iters=310, n_buckets=4
    )


def _ppr_sql(iterations: int, n_seeds: int) -> str:
    d = "CAST(0.85 AS DOUBLE)"
    one = "CAST(1.0 AS DOUBLE)"
    tele = f"(({one} - {d}) / {n_seeds})"
    seed_case = "CASE WHEN {col} IN (SELECT node FROM sd) THEN {val} ELSE CAST(0.0 AS DOUBLE) END"
    parts = [
        f"sd AS (SELECT node FROM nodes ORDER BY node LIMIT {n_seeds})",
        "p0 AS (SELECT node, "
        + seed_case.format(col="node", val=f"{one} / {n_seeds}")
        + " AS pr FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""c{i} AS (
      SELECT e.src, e.dst, p.pr / o.outdeg AS contrib
      FROM edges e JOIN p{i - 1} p ON p.node = e.src
      JOIN outdeg o ON o.src = e.src
    ),
    s{i} AS (
      SELECT dst AS node,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                      list(contrib ORDER BY src)),
                         (a, b) -> a + b) AS in_sum
      FROM c{i} GROUP BY dst
    ),
    p{i} AS (
      SELECT n.node,
             {seed_case.format(col="n.node", val=tele)}
               + {d} * coalesce(s.in_sum, CAST(0.0 AS DOUBLE)) AS pr
      FROM nodes n LEFT JOIN s{i} s ON s.node = n.node
    )"""
        )
    body = ",\n    ".join(parts)
    return f"""
    WITH {_PR_EDGES_SQL},
    {body}
    SELECT node, round(pr, 6) AS ppr FROM p{iterations}
    """


@register(
    "personalized_pagerank_suppliers",
    _ppr_sql(iterations=3, n_seeds=2),
    tags=["graph", "iterative"],
)
def personalized_pagerank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (teleport restarts at the two smallest
    supplier nodes): scores every supplier by co-supply proximity to the
    seeds — the similar-items/trust-propagation variant of
    pagerank_suppliers, same ordered-fold bit-parity recipe, seeded
    teleport per operators/graph.pagerank(seeds=...). The seed pick (two
    smallest node ids) is derived identically on both engines; on Spark
    it is one bounded 2-row collect."""
    from reddit_tech_jobs_data_pipeline_spark.operators.graph import pagerank

    lineitem = _t(spark, sf_dir, "lineitem")
    # cache BEFORE the seeds collect: the collect otherwise executes the
    # full co-supply self-join once just to read 2 node ids, and
    # pagerank() then re-derives it from scratch (r15 — one derivation,
    # two consumers; pagerank's own cache() is idempotent on this plan
    # and its unpersist drops the entry when done)
    edges = cooccurrence_edges(lineitem, "l_partkey", "l_suppkey").cache()
    seeds = [
        r.node
        for r in edges.select(F.col("src").alias("node"))
        .distinct()
        .orderBy("node")
        .limit(2)
        .collect()
    ]
    pr = pagerank(edges, damping=0.85, iterations=3, symmetric=True, seeds=seeds)
    return pr.select("node", F.round("pr", 6).alias("ppr"))


@register(
    "personalized_pagerank_suppliers_scale",
    _ppr_sql(iterations=3, n_seeds=2),
    tags=["graph", "iterative", "scale", "float-tol"],
)
def personalized_pagerank_suppliers_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank in the 100 TB mode: seeded teleport +
    ``commutative=True`` (map-side-summed contributions, hash-joined
    rank table — see pagerank_suppliers_scale for the plan shape). Same
    unrolled-SQL oracle as the ordered-fold twin; reassociation noise
    sits far inside the 6-dp rounding, and the float-tol gate compares
    the ppr column under numeric tolerance so a rounding-boundary float
    can never flake the suite (tools/boundary_margin.py asserts the
    margins anyway)."""
    from reddit_tech_jobs_data_pipeline_spark.operators.graph import pagerank

    lineitem = _t(spark, sf_dir, "lineitem")
    # cache before the seeds collect — one derivation, two consumers
    # (see personalized_pagerank_suppliers)
    edges = cooccurrence_edges(lineitem, "l_partkey", "l_suppkey").cache()
    seeds = [
        r.node
        for r in edges.select(F.col("src").alias("node"))
        .distinct()
        .orderBy("node")
        .limit(2)
        .collect()
    ]
    pr = pagerank(
        edges, damping=0.85, iterations=3, symmetric=True, seeds=seeds, commutative=True
    )
    return pr.select("node", F.round("pr", 6).alias("ppr"))


def _hits_sql(iterations: int) -> str:
    z = "CAST(0.0 AS DOUBLE)"
    fold = "list_reduce(list_prepend({z}, list({val} ORDER BY {ord})), (x, y) -> x + y)"
    parts = [
        """hedges AS (
      SELECT k AS src, k + 1 AS dst FROM hks WHERE k + 1 < 300
      UNION ALL
      SELECT k AS src, k + 2 AS dst FROM hks WHERE k % 3 <> 0 AND k + 2 < 300
    ),
    hnodes AS (SELECT src AS node FROM hedges UNION SELECT dst FROM hedges),
    st0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS hub, CAST(1.0 AS DOUBLE) AS auth FROM hnodes)"""
    ]
    for i in range(1, iterations + 1):
        araw = fold.format(z=z, val="s.hub", ord="e.src")
        hraw = fold.format(z=z, val="b.auth", ord="e.dst")
        anrm = fold.format(z=z, val="auth", ord="node")
        hnrm = fold.format(z=z, val="hub", ord="node")
        parts.append(
            f"""ar{i} AS MATERIALIZED (
      SELECT e.dst AS node, {araw} AS a_raw
      FROM hedges e JOIN st{i - 1} s ON s.node = e.src GROUP BY e.dst
    ),
    sa{i} AS MATERIALIZED (
      SELECT s.node, s.hub, coalesce(r.a_raw, {z}) AS auth
      FROM st{i - 1} s LEFT JOIN ar{i} r ON r.node = s.node
    ),
    an{i} AS (SELECT {anrm} AS nrm FROM sa{i}),
    sb{i} AS MATERIALIZED (SELECT node, hub, auth / n.nrm AS auth FROM sa{i} CROSS JOIN an{i} n),
    hr{i} AS MATERIALIZED (
      SELECT e.src AS node, {hraw} AS h_raw
      FROM hedges e JOIN sb{i} b ON b.node = e.dst GROUP BY e.src
    ),
    sc{i} AS MATERIALIZED (
      SELECT s.node, coalesce(r.h_raw, {z}) AS hub, s.auth
      FROM sb{i} s LEFT JOIN hr{i} r ON r.node = s.node
    ),
    hn{i} AS (SELECT {hnrm} AS nrm FROM sc{i}),
    st{i} AS MATERIALIZED (SELECT node, hub / n.nrm AS hub, auth FROM sc{i} CROSS JOIN hn{i} n)"""
        )
    body = ",\n    ".join(parts)
    return f"""
    WITH hks AS (SELECT p_partkey AS k FROM part WHERE p_partkey < 300),
    {body}
    SELECT node, round(hub, 6) AS hub, round(auth, 6) AS auth FROM st{iterations}
    """


@register(
    "hits_part_chain",
    _hits_sql(iterations=3),
    tags=["graph", "iterative"],
)
def hits_part_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities on the directed chain+skip DAG (skip
    edges make some nodes strong hubs, convergence asymmetric) — the
    third member of the link-analysis family beside pagerank and
    personalized pagerank, same ordered-fold bit-parity recipe for
    per-node sums AND the global L1 normalizers
    (operators/graph.hits)."""
    from reddit_tech_jobs_data_pipeline_spark.operators.graph import hits

    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    ks = part.select(F.col("p_partkey").alias("k"))
    chain = ks.filter(F.col("k") + 1 < 300).select(
        F.col("k").alias("src"), (F.col("k") + 1).alias("dst")
    )
    skip = ks.filter((F.col("k") % 3 != 0) & (F.col("k") + 2 < 300)).select(
        F.col("k").alias("src"), (F.col("k") + 2).alias("dst")
    )
    out = hits(chain.unionByName(skip), iterations=3)
    return out.select(
        "node", F.round("hub", 6).alias("hub"), F.round("auth", 6).alias("auth")
    )


@register(
    "hits_part_chain_scale",
    _hits_sql(iterations=3),
    tags=["graph", "iterative", "scale", "float-tol"],
)
def hits_part_chain_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS scale mode: every fold (per-node sums and the global L1
    normalizers) is a commutative map-side-combined F.sum — no per-node
    arrays, no collected global list. Same oracle as hits_part_chain:
    reassociation noise (~1e-15 relative) sits far inside the 6-dp
    rounding; gated under numeric tolerance (``float-tol``) with
    boundary margins asserted by tools/boundary_margin.py — see
    pagerank_suppliers_scale."""
    from reddit_tech_jobs_data_pipeline_spark.operators.graph import hits

    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    ks = part.select(F.col("p_partkey").alias("k"))
    chain = ks.filter(F.col("k") + 1 < 300).select(
        F.col("k").alias("src"), (F.col("k") + 1).alias("dst")
    )
    skip = ks.filter((F.col("k") % 3 != 0) & (F.col("k") + 2 < 300)).select(
        F.col("k").alias("src"), (F.col("k") + 2).alias("dst")
    )
    out = hits(chain.unionByName(skip), iterations=3, commutative=True)
    return out.select(
        "node", F.round("hub", 6).alias("hub"), F.round("auth", 6).alias("auth")
    )


# ===========================================================================
# k-core decomposition — iterative peeling to a fixpoint on a block-local
# clique+tail graph over part keys. The graph is CONSTRUCTED for bounded
# peeling depth: each 12-node block carries a leading clique of size
# 4 + (block % 3) and a chain tail; tails peel in <=2 rounds and cliques
# of size >=5 survive k=4 (size-4 cliques have internal degree 3 and
# dissolve), so the fixpoint is a constant 3 rounds at EVERY SF —
# unlike the chain+skip graph, whose k-core would peel O(n) rounds.
# ===========================================================================

_KCORE_EDGES_SQL = """
    cs AS (
      SELECT p_partkey AS m,
             p_partkey // 12      AS blk,
             p_partkey % 12       AS pos,
             4 + (p_partkey // 12) % 3 AS c
      FROM part
    ),
    clique AS (
      SELECT a.m AS src, b.m AS dst
      FROM cs a JOIN cs b
        ON a.blk = b.blk AND a.pos < b.pos
       AND a.pos <= a.c - 1 AND b.pos <= a.c - 1
    ),
    chain AS (
      SELECT a.m AS src, b.m AS dst
      FROM cs a JOIN cs b ON b.m = a.m + 1 AND b.blk = a.blk
      WHERE a.pos >= a.c - 1
    ),
    raw AS (SELECT src, dst FROM clique UNION ALL SELECT src, dst FROM chain),
    sym AS (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM raw UNION ALL SELECT dst AS src, src AS dst FROM raw
      ) WHERE src <> dst
    )
"""


def _kcore_sql(k: int, rounds: int) -> str:
    parts = ["a0 AS (SELECT DISTINCT src AS node FROM sym)"]
    for i in range(1, rounds + 1):
        parts.append(
            f"""a{i} AS (
      SELECT e.src AS node, count(*) AS deg
      FROM sym e
      JOIN a{i - 1} u ON u.node = e.src
      JOIN a{i - 1} v ON v.node = e.dst
      GROUP BY e.src HAVING count(*) >= {k}
    )"""
        )
    body = ",\n    ".join(parts)
    return f"""
    WITH {_KCORE_EDGES_SQL},
    {body}
    SELECT node, CAST(deg AS BIGINT) AS deg FROM a{rounds}
    """


@register(
    "kcore_parts",
    _kcore_sql(k=4, rounds=6),
    tags=["graph", "iterative"],
)
def kcore_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-core of the block-local clique+tail part graph: surviving nodes
    with their in-core degree. Spark peels to the true fixpoint
    (operators/graph.kcore); the oracle unrolls 6 peel rounds — the
    fixture reaches its fixpoint in 3 at every SF (simulated to 200k
    nodes; extra rounds are no-ops once stable), and
    tests/test_graph_properties.py pins fixpoint-before-cap."""
    from reddit_tech_jobs_data_pipeline_spark.operators.graph import kcore

    part = _t(spark, sf_dir, "part")
    m = F.col("p_partkey")
    blk = F.floor(m / 12)
    pos = m % 12
    cs = part.select(
        m.alias("m"),
        blk.alias("blk"),
        pos.alias("pos"),
        (F.lit(4) + blk % 3).alias("c"),
    )
    a = cs.select(
        F.col("m").alias("m_a"),
        F.col("blk").alias("blk_a"),
        F.col("pos").alias("pos_a"),
        F.col("c").alias("c_a"),
    )
    clique = a.join(
        cs,
        (F.col("blk") == F.col("blk_a"))
        & (F.col("pos_a") < F.col("pos"))
        & (F.col("pos_a") <= F.col("c_a") - 1)
        & (F.col("pos") <= F.col("c_a") - 1),
    ).select(F.col("m_a").alias("src"), F.col("m").alias("dst"))
    chain = a.filter(F.col("pos_a") >= F.col("c_a") - 1).join(
        cs,
        (F.col("m") == F.col("m_a") + 1) & (F.col("blk") == F.col("blk_a")),
    ).select(F.col("m_a").alias("src"), F.col("m").alias("dst"))
    return kcore(clique.unionByName(chain), k=4)


# ===========================================================================
# Deterministic synchronous label propagation — community detection on a
# bridged-block graph (dense 10-node blocks chained by single bridge
# edges). Fixed-round semantics on BOTH engines (like pagerank's 3
# unrolled iterations): no fixpoint test, no randomized tie-breaks.
# ===========================================================================

_LPA_EDGES_SQL = """
    ks AS (SELECT p_partkey AS m, (SELECT max(p_partkey) FROM part) AS mx FROM part),
    raw AS (
      SELECT m AS src, m + 1 AS dst FROM ks WHERE m + 1 <= mx
      UNION ALL
      SELECT m AS src, m + 2 AS dst FROM ks WHERE m % 10 < 8 AND m + 2 <= mx
    ),
    sym AS (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM raw UNION ALL SELECT dst AS src, src AS dst FROM raw
      ) WHERE src <> dst
    )
"""


def _lpa_sql(rounds: int) -> str:
    parts = ["l0 AS (SELECT DISTINCT src AS node, src AS community FROM sym)"]
    for i in range(1, rounds + 1):
        parts.append(
            f"""l{i} AS (
      SELECT node, community FROM (
        SELECT e.dst AS node, s.community, count(*) AS n,
               row_number() OVER (PARTITION BY e.dst
                                  ORDER BY count(*) DESC, s.community ASC) AS rn
        FROM sym e JOIN l{i - 1} s ON s.node = e.src
        GROUP BY e.dst, s.community
      ) WHERE rn = 1
    )"""
        )
    body = ",\n    ".join(parts)
    return f"""
    WITH {_LPA_EDGES_SQL},
    {body}
    SELECT node, community FROM l{rounds}
    """


@register(
    "label_propagation_communities",
    _lpa_sql(rounds=4),
    tags=["graph", "iterative"],
)
def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4 rounds of deterministic synchronous LPA (most-frequent neighbor
    label, min-label tie-break) over a bridged-block part graph: chain
    edges everywhere plus within-block +2 skips, so blocks are denser
    than the single bridges joining them. Unlike connected components
    (near_dup_clusters), LPA segments a CONNECTED graph by local edge
    density; rounds is the resolution knob and both engines run exactly
    4 (operators/graph.label_propagation; the oracle unrolls the same
    recurrence). Deliberately partially-converged interiors are part of
    the contract — fixed rounds, not fixpoint."""
    from reddit_tech_jobs_data_pipeline_spark.operators.graph import label_propagation

    part = _t(spark, sf_dir, "part")
    mx = part.agg(F.max("p_partkey").alias("mx"))
    ks = part.select(F.col("p_partkey").alias("m")).join(F.broadcast(mx))
    chain = ks.filter(F.col("m") + 1 <= F.col("mx")).select(
        F.col("m").alias("src"), (F.col("m") + 1).alias("dst")
    )
    skip = ks.filter((F.col("m") % 10 < 8) & (F.col("m") + 2 <= F.col("mx"))).select(
        F.col("m").alias("src"), (F.col("m") + 2).alias("dst")
    )
    return label_propagation(chain.unionByName(skip), rounds=4)


@register(
    "partition_skew_report",
    """
    WITH c AS (
      SELECT l_suppkey AS k, count(*) AS n FROM lineitem GROUP BY 1
    ),
    r AS (
      SELECT k, n,
             row_number() OVER (ORDER BY n DESC, k) AS rnk_desc,
             row_number() OVER (ORDER BY n ASC, k)  AS rnk_asc,
             count(*) OVER ()                        AS n_keys,
             sum(n) OVER ()                          AS total_rows
      FROM c
    )
    SELECT CAST(max(n_keys) AS BIGINT)     AS n_keys,
           CAST(max(total_rows) AS BIGINT) AS total_rows,
           round(max(CASE WHEN rnk_desc = 1 THEN n END) * 1.0
                 / max(total_rows), 6) AS top1_share,
           round(sum(CASE WHEN rnk_desc <= 10 THEN n ELSE 0 END) * 1.0
                 / max(total_rows), 6) AS top10_share,
           round(2.0 * sum(rnk_asc * n) / (max(n_keys) * max(total_rows))
                 - (max(n_keys) + 1.0) / max(n_keys), 6) AS gini,
           max(CASE WHEN rnk_desc = 1 THEN n END) * 1.0 / max(total_rows)
             > 2.0 / max(n_keys) AS skewed
    FROM r
    """,
    tags=["ops", "skew", "quality"],
)
def partition_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/shuffle-key skew diagnosis — the report you run BEFORE
    choosing a salting factor or enabling AQE skew-join for a key
    (operators/dedup's max_df guards and salted_join_equivalence are
    the cures; this is the diagnostic): key count, top-1/top-10 key
    shares of all rows, the Gini coefficient of the per-key
    distribution (exact integer rank sums — engine-order-independent),
    and a skew flag (hottest key > 2x the uniform share). One
    map-side-combined groupBy over the key + windows over the
    keys-sized table; the fact table is read once."""
    li = _t(spark, sf_dir, "lineitem")
    c = li.groupBy(F.col("l_suppkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n")
    )
    r = c.select(
        "k",
        "n",
        F.row_number()
        .over(Window.orderBy(F.col("n").desc(), F.col("k")))
        .alias("rnk_desc"),
        F.row_number()
        .over(Window.orderBy(F.col("n").asc(), F.col("k")))
        .alias("rnk_asc"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n_keys"),
        F.sum("n").over(Window.partitionBy()).alias("total_rows"),
    )
    top1 = F.max(F.when(F.col("rnk_desc") == 1, F.col("n")))
    return r.agg(
        F.max("n_keys").cast("long").alias("n_keys"),
        F.max("total_rows").cast("long").alias("total_rows"),
        F.round(top1 * 1.0 / F.max("total_rows"), 6).alias("top1_share"),
        F.round(
            F.sum(F.when(F.col("rnk_desc") <= 10, F.col("n")).otherwise(0))
            * 1.0
            / F.max("total_rows"),
            6,
        ).alias("top10_share"),
        F.round(
            2.0 * F.sum(F.col("rnk_asc") * F.col("n"))
            / (F.max("n_keys") * F.max("total_rows"))
            - (F.max("n_keys") + 1.0) / F.max("n_keys"),
            6,
        ).alias("gini"),
        (top1 * 1.0 / F.max("total_rows") > 2.0 / F.max("n_keys")).alias(
            "skewed"
        ),
    )
