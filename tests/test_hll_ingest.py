"""Streaming HLL ingest (streaming/hll_ingest.py): replay idempotence,
union-of-partials ≡ single-pass estimate, the corrupt-store fail-fast
contract, and the e2e bound flag (mirrors tests/test_cms_ingest.py)."""

from __future__ import annotations

import glob as _g
import os

import pytest
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.streaming import hll_ingest


def _ev(spark, rows):
    return spark.createDataFrame(rows, "event_id long, user_id long, event_type string")


def test_replayed_batch_appends_once(spark, tmp_path):
    store = str(tmp_path / "store")
    batch = _ev(spark, [(0, 10, "click"), (2, 11, "click"), (4, 10, "view")])
    for _ in range(3):
        hll_ingest.ingest_batch_hll(batch, store, batch_key_expr=F.col("event_id") % 2)
    rows = spark.read.parquet(store).collect()
    # one (batch_key=0, grp) row per touched group, despite three ingests
    assert sorted((r.batch_key, r.grp) for r in rows) == [(0, "click"), (0, "view")]


def test_union_of_partials_equals_single_pass_estimate(spark, tmp_path):
    store = str(tmp_path / "store")
    b0 = _ev(spark, [(0, i, "click") for i in range(40)])
    b1 = _ev(spark, [(1, i + 20, "click") for i in range(40)])  # overlaps 20..39
    for b in (b0, b1):
        hll_ingest.ingest_batch_hll(b, store, batch_key_expr=F.col("event_id") % 2)
    merged = hll_ingest.merged_hll(spark, store).collect()[0]
    single = (
        b0.unionByName(b1)
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg(F.col("user_id").cast("string"))))
        .first()[0]
    )
    assert merged.n_batches_merged == 2
    # mergeability: union of the two partial sketches = sketch of the union
    assert abs(merged.est - single) < 1e-9
    assert abs(merged.est - 60) <= 3  # 60 true distinct users


def test_corrupt_store_fails_batch(spark, tmp_path):
    store = str(tmp_path / "store")
    os.makedirs(store)
    with open(os.path.join(store, "part-00000.parquet"), "wb") as f:
        f.write(b"this is not a parquet footer")
    with pytest.raises(Exception):
        hll_ingest.ingest_batch_hll(
            _ev(spark, [(0, 1, "click")]), store, batch_key_expr=F.col("event_id") % 2
        )
    appended = [
        p for p in _g.glob(os.path.join(store, "*.parquet")) if os.path.getsize(p) > 100
    ]
    assert appended == []


def test_end_to_end_bound_flag_holds(spark):
    out = hll_ingest.run_hll_ingest_batchlike(
        spark, "/root/testdata/sf0.001", n_tags=3
    ).collect()
    assert len(out) > 0
    assert all(r.hll_within_5pct for r in out)
    assert all(1 <= r.n_batches_merged <= 3 for r in out)
