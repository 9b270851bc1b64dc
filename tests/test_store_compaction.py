"""Streaming-store compaction (operators/maintenance.compact_append_store):
the append-only stores grow one parquet fragment per micro-batch; the
compaction rewrite must preserve (1) the merged read exactly, (2) the
replay-skip contract (batch_key values survive), for the CMS, HLL and
boilerplate stores alike."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators.maintenance import (
    compact_append_store,
)
from reddit_tech_jobs_data_pipeline_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


def _n_files(path: str) -> int:
    return len(glob.glob(os.path.join(path, "*.parquet")))


def _docs(spark):
    return load_table(spark, SF, "documents").select("doc_id", "text").filter(
        F.col("text").isNotNull()
    )


def test_cms_store_compaction_preserves_merge_and_replay_skip(spark, tmp_path):
    from reddit_tech_jobs_data_pipeline_spark.streaming.cms_ingest import (
        ingest_batch_sketch,
        merged_sketch,
    )

    store = str(tmp_path / "cms_store")
    docs = _docs(spark)
    for tag in range(3):
        ingest_batch_sketch(
            docs.filter(F.col("doc_id") % 3 == tag),
            store,
            batch_key_expr=F.col("doc_id") % 3,
            width=64,
            depth=2,
        )
    n_before = _n_files(store)
    assert n_before >= 3  # one fragment (or more) per micro-batch
    before = {
        (r.row_i, r.bucket): r.cnt for r in merged_sketch(spark, store).collect()
    }

    n_after = compact_append_store(spark, store)
    assert n_after == _n_files(store) == 1 < n_before  # tiny store → 1 file

    after = {
        (r.row_i, r.bucket): r.cnt for r in merged_sketch(spark, store).collect()
    }
    assert after == before  # merged read identical

    # replay of an already-ingested batch key must still be skipped
    rows_before = spark.read.parquet(store).count()
    ingest_batch_sketch(
        docs.filter(F.col("doc_id") % 3 == 1),
        store,
        batch_key_expr=F.col("doc_id") % 3,
        width=64,
        depth=2,
    )
    assert spark.read.parquet(store).count() == rows_before


def test_hll_store_compaction_preserves_union(spark, tmp_path):
    from reddit_tech_jobs_data_pipeline_spark.streaming.hll_ingest import (
        ingest_batch_hll,
        merged_hll,
    )

    store = str(tmp_path / "hll_store")
    ev = load_table(spark, SF, "events")
    for tag in range(3):
        ingest_batch_hll(
            ev.filter(F.col("event_id") % 3 == tag),
            store,
            batch_key_expr=F.col("event_id") % 3,
        )
    before = {
        r.grp: (r.est, r.n_batches_merged)
        for r in merged_hll(spark, store).collect()
    }
    assert compact_append_store(spark, store) == 1
    after = {
        r.grp: (r.est, r.n_batches_merged)
        for r in merged_hll(spark, store).collect()
    }
    # binary sketches round-trip the rewrite: unions estimate identically
    assert after == before

    rows_before = spark.read.parquet(store).count()
    ingest_batch_hll(
        ev.filter(F.col("event_id") % 3 == 0),
        store,
        batch_key_expr=F.col("event_id") % 3,
    )
    assert spark.read.parquet(store).count() == rows_before


def test_boilerplate_store_compaction_preserves_decision(spark, tmp_path):
    from reddit_tech_jobs_data_pipeline_spark.streaming.boilerplate_ingest import (
        ingest_batch_line_df,
        merged_boilerplate,
    )

    store = str(tmp_path / "boiler_store")
    pages = _docs(spark).withColumn(
        "source", F.concat(F.lit("src"), (F.col("doc_id") % 4).cast("string"))
    )
    for tag in range(3):
        ingest_batch_line_df(
            pages.filter(F.col("doc_id") % 3 == tag),
            store,
            batch_key_expr=F.col("doc_id") % 3,
        )
    before = sorted(
        tuple(r) for r in merged_boilerplate(spark, store).collect()
    )
    assert compact_append_store(spark, store) == 1
    after = sorted(
        tuple(r) for r in merged_boilerplate(spark, store).collect()
    )
    assert after == before
