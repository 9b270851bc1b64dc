"""Materialized IVF index: the partitioned-by-cell_id layout must
physically prune unprobed cells (directory-level partition pruning),
and the probed read path must score identically to the in-memory
ivf_ann_topk plan."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators import similarity
from reddit_tech_jobs_data_pipeline_spark.sources import testdata

SF = "/root/testdata/sf0.001"


def _index(spark, tmp_path):
    emb = testdata.load_table(spark, SF, "embeddings")
    cents = similarity.seeded_centroids(emb, 8)
    path = str(tmp_path / "ivf_index")
    similarity.write_ivf_index(emb, cents, path)
    return emb, cents, path


def test_probe_reads_only_probed_cell_partitions(spark, tmp_path):
    emb, cents, path = _index(spark, tmp_path)
    queries = emb.filter(F.col("vec_id") < 4)
    q_cells = similarity.ivf_assign_cells(
        queries.select(
            F.col("vec_id").alias("query_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        ),
        cents,
        nprobe=2,
        id_col="query_id",
    )
    probed = {r["cell_id"] for r in q_cells.select("cell_id").distinct().collect()}
    all_cells = {
        int(d.split("=")[1])
        for d in os.listdir(path)
        if d.startswith("cell_id=")
    }
    assert probed < all_cells, "fixture must leave some cells unprobed"

    pruned = spark.read.parquet(path).filter(
        F.col("cell_id").isin([int(c) for c in probed])
    )
    pruned.collect()
    # physical proof: the scan's numFiles metric counts only files under
    # probed cell_id= directories (inputFiles() can't show this — it
    # reflects the unpruned relation)
    scan = pruned._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    files_scanned = scan.metrics().apply("numFiles").value()
    expect_files = sum(
        len([f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")])
        for d in os.listdir(path)
        if d.startswith("cell_id=") and int(d.split("=")[1]) in probed
    )
    total_files = sum(
        len([f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")])
        for d in os.listdir(path)
        if d.startswith("cell_id=")
    )
    assert files_scanned == expect_files < total_files
    # and the scan node itself carries the partition filter
    plan = scan.toString()
    assert "PartitionFilters" in plan and "cell_id" in plan, plan


def test_index_topk_matches_in_memory_ivf(spark, tmp_path):
    emb, cents, path = _index(spark, tmp_path)
    queries = emb.filter(F.col("vec_id") < 20)
    expect = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in similarity.ivf_ann_topk(
            emb, queries, k=5, num_cells=8, nprobe=2
        ).collect()
    }
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in similarity.ivf_index_topk(
            spark, path, queries, cents, k=5, nprobe=2
        ).collect()
    }
    assert got == expect


def test_append_equals_rebuild(spark, tmp_path):
    # day-1 build + day-2 frozen-quantizer append must probe identically
    # to a one-shot build of the union with the same centroids
    emb = testdata.load_table(spark, SF, "embeddings")
    cents = similarity.seeded_centroids(emb, 8)
    queries = emb.filter(F.col("vec_id") < 20)

    full = str(tmp_path / "ivf_full")
    similarity.write_ivf_index(emb, cents, full)
    inc = str(tmp_path / "ivf_inc")
    similarity.write_ivf_index(emb.filter(F.col("vec_id") % 2 == 0), cents, inc)
    similarity.append_ivf_index(emb.filter(F.col("vec_id") % 2 == 1), cents, inc)

    a = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in similarity.ivf_index_topk(spark, full, queries, cents, k=5, nprobe=2).collect()
    }
    b = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in similarity.ivf_index_topk(spark, inc, queries, cents, k=5, nprobe=2).collect()
    }
    assert a == b


def test_append_does_not_rewrite_existing_fragments(spark, tmp_path):
    import os

    emb = testdata.load_table(spark, SF, "embeddings")
    cents = similarity.seeded_centroids(emb, 8)
    path = str(tmp_path / "ivf_inc")
    similarity.write_ivf_index(emb.filter(F.col("vec_id") % 2 == 0), cents, path)
    before = {}
    for root, _dirs, files in os.walk(path):
        for fn in files:
            if fn.endswith(".parquet"):
                p = os.path.join(root, fn)
                before[p] = os.stat(p).st_mtime_ns
    similarity.append_ivf_index(emb.filter(F.col("vec_id") % 2 == 1), cents, path)
    # every day-1 fragment survives byte-untouched; day-2 adds new ones
    for p, m in before.items():
        assert os.path.exists(p) and os.stat(p).st_mtime_ns == m
    after = sum(
        1 for root, _d, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    )
    assert after > len(before)
