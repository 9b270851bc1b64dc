"""Timestamp-encoding matrix: the driver's testdata generator has shipped
events.ts as parquet TIMESTAMP(NANOS) and as TIMESTAMP(MICROS,
isAdjustedToUTC=false) across generations, and a regeneration between
rounds silently broke 8 tests. These fixtures pin every encoding the
loaders must normalize: whatever the footer says, ``load_table`` and
``read_events_stream`` must surface ``ts`` as TIMESTAMP (LTZ) carrying
the same instants, so ``unix_millis``/``withWatermark`` (both of which
reject NTZ) always work downstream.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.sources.testdata import load_table
from reddit_tech_jobs_data_pipeline_spark.streaming.events import read_events_stream

# naive UTC instants; micros precision so every encoding represents exactly
INSTANTS = [
    dt.datetime(2024, 3, 1, 12, 0, 0, 123456),
    dt.datetime(2024, 3, 1, 13, 30, 5, 654321),
    dt.datetime(2024, 6, 15, 23, 59, 59, 999999),
]
EXPECT_MICROS = sorted(int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000) for t in INSTANTS)

ENCODINGS = {
    # physical int64 nanos — Spark 4 can't read natively, nanosAsLong path
    "nanos": pa.timestamp("ns"),
    # micros, isAdjustedToUTC=false — reads back as TIMESTAMP_NTZ
    "micros_ntz": pa.timestamp("us"),
    # micros, isAdjustedToUTC=true — reads back as TIMESTAMP (LTZ)
    "micros_utc": pa.timestamp("us", tz="UTC"),
}


def _write_events(dirpath, ts_type) -> str:
    """Write a minimal events.parquet with ts in the given arrow type."""
    ts_vals = [t.replace(tzinfo=dt.timezone.utc) for t in INSTANTS] if ts_type.tz else INSTANTS
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(ts_vals, ts_type),
            "user_id": pa.array([10, 20, 30], pa.int64()),
            "event_type": pa.array(["click", "purchase", "click"]),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    dirpath.mkdir(parents=True, exist_ok=True)
    pq.write_table(table, str(dirpath / "events.parquet"))
    return str(dirpath)


@pytest.mark.parametrize("enc", list(ENCODINGS))
def test_load_table_normalizes_every_encoding(spark, tmp_path, enc):
    sf_dir = _write_events(tmp_path / enc, ENCODINGS[enc])
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp", f"{enc}: ts must be LTZ"
    # unix_micros hard-requires LTZ — this is exactly the call that broke
    # p6_ts_millis_roundtrip when the generator switched nanos -> micros
    got = sorted(r[0] for r in df.select(F.unix_micros("ts")).collect())
    assert got == EXPECT_MICROS, f"{enc}: instants must be preserved"


@pytest.mark.parametrize("enc", list(ENCODINGS))
def test_stream_reader_normalizes_every_encoding(spark, tmp_path, enc):
    sf_dir = _write_events(tmp_path / enc, ENCODINGS[enc])
    stream = read_events_stream(spark, sf_dir)
    assert dict(stream.dtypes)["ts"] == "timestamp", f"{enc}: ts must be LTZ"
    # withWatermark rejects NTZ outright (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"t_enc_{enc}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name).localCheckpoint()
    q.stop()
    # 3 instants in 3 distinct hours -> 3 windows of 1 event each; a
    # mis-scaled time axis (the div-1000-on-micros bug) would collapse
    # them toward the epoch into a single window
    assert sorted(r["n"] for r in out.collect()) == [1, 1, 1], enc


def test_stream_runner_restores_shuffle_partitions(spark, tmp_path):
    """The batchlike runners pin spark.sql.shuffle.partitions for the
    stream's lifetime (state-partition sizing) and must restore the
    session value afterward — a leaked override would silently resize
    every later batch shuffle."""
    sf_dir = _write_events(tmp_path / "restore", ENCODINGS["micros_ntz"])
    from reddit_tech_jobs_data_pipeline_spark.streaming.events import (
        run_windowed_counts_batchlike,
    )

    before = spark.conf.get("spark.sql.shuffle.partitions")
    out = run_windowed_counts_batchlike(spark, sf_dir, name="t_restore_wc")
    assert out.count() == 3
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_graph_operators_leave_no_cached_plans(spark, tmp_path):
    """bfs_min_hops/pagerank/cluster_near_dups persist internally; after
    the call returns, no InMemoryRelation may survive in the CacheManager
    (the round-2 ADVICE leak)."""
    from reddit_tech_jobs_data_pipeline_spark.operators.dedup import cluster_near_dups
    from reddit_tech_jobs_data_pipeline_spark.operators.graph import bfs_min_hops, pagerank

    spark.catalog.clearCache()
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 5)], "src long, dst long"
    )
    assert bfs_min_hops(edges, seed=1, max_hops=4).count() == 3
    assert pagerank(edges, iterations=3).count() == 5
    pairs = edges.select(F.col("src").alias("id_a"), F.col("dst").alias("id_b"))
    assert cluster_near_dups(pairs).count() == 5
    jvm_cache = spark._jsparkSession.sharedState().cacheManager()
    assert jvm_cache.isEmpty(), "operator leaked a CacheManager entry"
