"""Deterministic epoch shuffle: permutation properties + writer path."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators import shuffling


def _docs(spark, n=64):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_assignment_is_partitioning_invariant(spark):
    base = _docs(spark)
    a = shuffling.epoch_shuffle(base, seed="s0", epoch=1)
    b = shuffling.epoch_shuffle(base.repartition(7), seed="s0", epoch=1)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_epochs_produce_different_permutations(spark):
    base = _docs(spark)
    e1 = {r.doc_id: (r.shard, r.pos_in_shard) for r in shuffling.epoch_shuffle(base, epoch=1).collect()}
    e2 = {r.doc_id: (r.shard, r.pos_in_shard) for r in shuffling.epoch_shuffle(base, epoch=2).collect()}
    assert e1 != e2  # a re-keyed permutation, not the same order again
    # both are complete: every shard's positions are 1..count contiguously
    for e in (e1, e2):
        by_shard: dict = {}
        for shard, pos in e.values():
            by_shard.setdefault(shard, []).append(pos)
        for positions in by_shard.values():
            assert sorted(positions) == list(range(1, len(positions) + 1))


def test_write_epoch_shards_realizes_order(spark, tmp_path):
    base = _docs(spark, 100)
    path = str(tmp_path / "epoch1")
    shuffling.write_epoch_shards(base, path, seed="s0", epoch=1, num_shards=4)
    dirs = sorted(glob.glob(os.path.join(path, "shard=*")))
    assert len(dirs) == 4
    # stored order within each shard == the epoch_shuffle rank order
    want = {
        r.doc_id: (r.shard, r.pos_in_shard)
        for r in shuffling.epoch_shuffle(base, seed="s0", epoch=1, num_shards=4).collect()
    }
    got = spark.read.parquet(path)
    for d in dirs:
        shard = int(d.rsplit("=", 1)[1])
        stored = [r.doc_id for r in spark.read.parquet(d).collect()]
        expect = [
            doc
            for doc, (s, _) in sorted(want.items(), key=lambda kv: kv[1][1])
            if s == shard
        ]
        assert stored == expect
    assert got.count() == 100
