"""Streaming boilerplate-DF ingest (streaming/boilerplate_ingest.py):
replay idempotence, merged-store == single-pass counts, corrupt-store
fail-fast, and threshold behavior across batches."""

from __future__ import annotations

import glob as _g
import os

import pytest
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.streaming import boilerplate_ingest as bi


def _pages(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_replayed_batch_appends_once(spark, tmp_path):
    store = str(tmp_path / "store")
    batch = _pages(spark, [(0, "a", "footer\nx"), (2, "a", "footer\ny")])
    for _ in range(3):
        bi.ingest_batch_line_df(batch, store, batch_key_expr=F.col("doc_id") % 2)
    rows = spark.read.parquet(store)
    assert rows.filter(F.col("lh") == bi._DOCS_ROW).count() == 1
    docs = rows.filter(F.col("lh") == bi._DOCS_ROW).first()
    assert (docs.batch_key, docs.source, docs.df) == (0, "a", 2)


def test_merged_counts_equal_single_pass_and_cross_batch_threshold(spark, tmp_path):
    store = str(tmp_path / "store")
    # "footer" appears once per batch — only the MERGED store sees it
    # cross min_docs=2; per-batch views alone would miss it
    b0 = _pages(spark, [(0, "a", "footer\nbody zero")])
    b1 = _pages(spark, [(1, "a", "footer\nbody one")])
    for b in (b0, b1):
        bi.ingest_batch_line_df(b, store, batch_key_expr=F.col("doc_id") % 2)
    out = bi.merged_boilerplate(spark, store).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.source, r.df, r.dom_n) == ("a", 2, 2)


def test_corrupt_store_fails_batch(spark, tmp_path):
    store = str(tmp_path / "store")
    os.makedirs(store)
    with open(os.path.join(store, "part-00000.parquet"), "wb") as f:
        f.write(b"not parquet")
    with pytest.raises(Exception):
        bi.ingest_batch_line_df(
            _pages(spark, [(0, "a", "x")]), store, batch_key_expr=F.col("doc_id") % 2
        )
    appended = [
        p for p in _g.glob(os.path.join(store, "*.parquet")) if os.path.getsize(p) > 100
    ]
    assert appended == []


def test_below_ratio_lines_not_flagged(spark, tmp_path):
    store = str(tmp_path / "store")
    rows = [(i, "a", ("footer\n" if i < 2 else "") + f"unique {i}") for i in range(6)]
    bi.ingest_batch_line_df(_pages(spark, rows), store, batch_key_expr=F.lit(0))
    # footer df=2 but 2/6 < 0.5 → not boilerplate at the default ratio
    assert bi.merged_boilerplate(spark, store).collect() == []
    # at a 1/3 ratio it flags
    out = bi.merged_boilerplate(spark, store, df_ratio=0.33).collect()
    assert len(out) == 1 and out[0].df == 2
