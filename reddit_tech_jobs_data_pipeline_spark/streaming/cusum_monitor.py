"""Streaming CUSUM changepoint monitor: per-user control-chart state
carried EXACTLY across micro-batches through a persisted state store.

The production shape for "alarm when a user's metric drifts, without
ever rescanning history": each micro-batch loads the bounded per-user
state table (one row per user: the running CUSUM statistic), extends
every user's scan with only the batch's events, appends per-event
(cusum, alarm) rows to the output, and writes the updated state. The
recurrence is associative under splitting — state carried exactly at
the boundary makes chunked processing bit-identical to the one-shot
batch scan — which is what the catalog oracle exploits: the streaming
replay's output must hash-match the SAME recursive-CTE oracle as the
batch ``cusum_changepoint`` query.

Batch determinism for the oracle: the input is split into one parquet
file per time span (all events of a day land in exactly one chunk) and
the chunk files get strictly increasing mtimes, so Spark's file stream
under ``maxFilesPerTrigger=1`` replays them chronologically — the
order the recurrence requires, unlike the drift monitor's
order-independent tag slices.

State size is |users| rows (bounded), per-batch cost is
O(batch + users) — the monitor runs forever at 100 TB; parallelism is
the user key, the same shard as the batch scan.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from reddit_tech_jobs_data_pipeline_spark.sources.testdata import load_table
from reddit_tech_jobs_data_pipeline_spark.streaming.events import (
    _stream_shuffle_partitions,
)
from reddit_tech_jobs_data_pipeline_spark.workdirs import stable_work_key

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("cusum", T.DoubleType(), True),
        T.StructField("alarm", T.BooleanType(), False),
    ]
)

_STATE_SCHEMA = "user_id long, s double"


def cusum_scan_seeded(
    events: DataFrame,
    state: DataFrame,
    target: float,
    threshold: float,
) -> DataFrame:
    """Per-user CUSUM scan seeded from a state table (user_id, s) —
    users absent from the state start at 0, matching a fresh scan.
    Identical recurrence to operators/sequential.cusum_scan; the seed
    rides into the grouped-map UDF as a per-row column (constant within
    each group), so the escape hatch keeps its one-shuffle shape."""
    seeded = events.join(state, "user_id", "left").withColumn(
        "s0", F.coalesce(F.col("s"), F.lit(0.0))
    )

    def _scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        s = float(pdf["s0"].iloc[0])
        vals, alarms = [], []
        for v in pdf["value"]:
            s = max(0.0, s + v - target)
            fired = s > threshold
            vals.append(s)
            alarms.append(fired)
            if fired:
                s = 0.0
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"].to_numpy(),
                "user_id": pdf["user_id"].to_numpy(),
                "ts": pdf["ts"].to_numpy(),
                "cusum": vals,
                "alarm": alarms,
            }
        )

    return (
        seeded.select("user_id", "event_id", "ts", "value", "s0")
        .groupBy("user_id")
        .applyInPandas(_scan, schema=_OUT_SCHEMA)
    )


def _write_time_chunks(
    spark: SparkSession, sf_dir: str, src_dir: str, n_chunks: int
) -> None:
    """One flat parquet file per equal time span (whole days only) with
    strictly increasing mtimes, so maxFilesPerTrigger=1 replays
    chronologically."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    ).collect()[0]
    lo, hi = bounds["lo"], bounds["hi"]
    span_days = max(1, ((hi - lo).days + 1 + n_chunks - 1) // n_chunks)
    os.makedirs(src_dir, exist_ok=True)
    chunk = F.floor(F.datediff(F.to_date("ts"), F.lit(lo)) / span_days)
    for i in range(n_chunks):
        tmp = os.path.join(src_dir, f"_tmp{i}")
        (
            ev.filter(chunk == i)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dest = os.path.join(src_dir, f"chunk{i}.parquet")
        os.replace(part, dest)
        shutil.rmtree(tmp)
        os.utime(dest, (1_000_000 + i, 1_000_000 + i))


def run_cusum_monitor_batchlike(
    spark: SparkSession,
    sf_dir: str,
    n_chunks: int = 5,
    target: float = 55.0,
    threshold: float = 150.0,
    name: str = "stream_cusum",
) -> DataFrame:
    """Run the CUSUM monitor to completion over the chronological chunk
    replay and return every per-event (event_id, user_id, cusum, alarm)
    row — bit-identical to the one-shot batch scan because the state
    store carries the exact boundary statistic (post-reset when the
    user's last chunk event alarmed)."""
    work = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_cusum_{stable_work_key(sf_dir, n_chunks, target, threshold)}",
    )
    src_dir = os.path.join(work, "src")
    out_dir = os.path.join(work, "out")
    state_root = os.path.join(work, "state")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(state_root, exist_ok=True)
    _write_time_chunks(spark, sf_dir, src_dir, n_chunks)

    def _latest_state() -> DataFrame:
        versions = sorted(glob.glob(os.path.join(state_root, "v*")))
        if not versions:
            return spark.createDataFrame([], _STATE_SCHEMA)
        return spark.read.parquet(versions[-1])

    def _monitor(batch: DataFrame, batch_id: int) -> None:
        state = _latest_state()
        scored = cusum_scan_seeded(batch, state, target, threshold).localCheckpoint()
        scored.drop("ts").write.mode("append").parquet(out_dir)
        # final post-reset statistic per user seen in this batch: the
        # last event's cusum, zeroed if that event alarmed
        last = scored.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.col("ts").desc(), F.col("event_id").desc()
                )
            ),
        ).filter(F.col("__rn") == 1)
        new_rows = last.select(
            "user_id",
            F.when(F.col("alarm"), F.lit(0.0)).otherwise(F.col("cusum")).alias("s"),
        )
        merged = (
            state.join(new_rows.select("user_id"), "user_id", "left_anti")
            .unionByName(new_rows)
        )
        merged.write.mode("overwrite").parquet(
            os.path.join(state_root, f"v{batch_id:06d}")
        )

    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src_dir)
    )
    with _stream_shuffle_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(_monitor)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .queryName(name)
            .start()
        )
        q.awaitTermination()
        q.stop()
    return spark.read.parquet(out_dir).localCheckpoint()
