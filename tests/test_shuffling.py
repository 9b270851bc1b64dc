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


def test_write_epoch_shards_on_realized_copy_stream(spark, tmp_path):
    """The mixture_epoch_export_e2e handoff, physically: a realized
    stream with repeated doc_ids keyed by copy_id goes through the
    writer; copies of the same doc must spread across the epoch rather
    than train back-to-back."""
    from reddit_tech_jobs_data_pipeline_spark.operators import mixture

    docs = spark.range(120).select(
        F.col("id").alias("doc_id"), F.lit(2.5).alias("factor")
    )
    stream = mixture.realize_repeats(docs, "factor", "doc_id").withColumn(
        "copy_id",
        F.concat(
            F.col("doc_id").cast("string"),
            F.lit(":"),
            F.col("copy_idx").cast("string"),
        ),
    )
    n = stream.count()
    assert 240 <= n <= 360  # 2 guaranteed copies + Bernoulli(0.5) third

    path = str(tmp_path / "epoch_copies")
    shuffling.write_epoch_shards(
        stream, path, id_col="copy_id", seed="mx", epoch=1, num_shards=4
    )
    back = spark.read.parquet(path)
    assert back.count() == n
    assert back.select("copy_id").distinct().count() == n

    # copies of one doc almost never share a shard-adjacent position:
    # measure how many docs have all copies in the same shard — with 4
    # shards and ≥2 copies that's ≤ (1/4)^(c-1) per doc in expectation
    per_doc_shards = {
        r.doc_id: r.n
        for r in back.groupBy("doc_id")
        .agg(F.countDistinct("shard").alias("n"))
        .collect()
    }
    same_shard = sum(1 for v in per_doc_shards.values() if v == 1)
    assert same_shard < 120 * 0.5  # uniform spread, not clumped
