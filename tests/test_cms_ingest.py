"""Streaming CMS ingest (streaming/cms_ingest.py): replay idempotence,
merged-store ≡ single-pass identity, and the corrupt-store fail-fast
contract (mirrors tests/test_streaming_incremental_dedup.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators import sketches
from reddit_tech_jobs_data_pipeline_spark.streaming import cms_ingest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_replayed_batch_key_is_skipped(spark, tmp_path):
    store = str(tmp_path / "store")
    batch = _docs(spark, [(0, "a b c a"), (2, "b c d")])  # key 0 (doc_id % 2)
    for _ in range(3):  # replay the same batch three times
        cms_ingest.ingest_batch_sketch(
            batch, store, batch_key_expr=F.col("doc_id") % 2, width=64, depth=3
        )
    merged = cms_ingest.merged_sketch(spark, store)
    single = sketches.cms_build(
        batch.select(F.explode(F.split("text", " ")).alias("token")),
        width=64,
        depth=3,
    )
    m = {(r.row_i, r.bucket): r.cnt for r in merged.collect()}
    s = {(r.row_i, r.bucket): r.cnt for r in single.collect()}
    assert m == s  # three ingests, counted once


def test_two_batches_merge_to_single_pass(spark, tmp_path):
    store = str(tmp_path / "store")
    b0 = _docs(spark, [(0, "x y z"), (2, "x x")])
    b1 = _docs(spark, [(1, "y z w"), (3, "w")])
    for b in (b0, b1):
        cms_ingest.ingest_batch_sketch(
            b, store, batch_key_expr=F.col("doc_id") % 2, width=64, depth=3
        )
    merged = cms_ingest.merged_sketch(spark, store)
    allrows = b0.unionByName(b1)
    single = sketches.cms_build(
        allrows.select(F.explode(F.split("text", " ")).alias("token")),
        width=64,
        depth=3,
    )
    m = {(r.row_i, r.bucket): r.cnt for r in merged.collect()}
    s = {(r.row_i, r.bucket): r.cnt for r in single.collect()}
    assert m == s


def test_corrupt_store_fails_batch(spark, tmp_path):
    store = str(tmp_path / "store")
    os.makedirs(store)
    with open(os.path.join(store, "part-00000.parquet"), "wb") as f:
        f.write(b"this is not a parquet footer")
    batch = _docs(spark, [(0, "a b c")])
    with pytest.raises(Exception):
        cms_ingest.ingest_batch_sketch(
            batch, store, batch_key_expr=F.col("doc_id") % 2, width=64, depth=3
        )
    # and nothing was appended on the failed path
    import glob as _g

    appended = [
        p
        for p in _g.glob(os.path.join(store, "*.parquet"))
        if os.path.getsize(p) > 100
    ]
    assert appended == []


def test_end_to_end_matches_vocab_estimates(spark):
    out = cms_ingest.run_cms_ingest_batchlike(
        spark, "/root/testdata/sf0.001", n_tags=2, top_k=10
    )
    rows = out.collect()
    assert len(rows) == 10
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == list(range(1, 11))
    assert all(r.est_n > 0 for r in rows)
