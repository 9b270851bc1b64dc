"""Cross-run incremental near-dup ingest (dedup.incremental_lsh_ingest).

The operator dedups a new batch against a persisted MinHash signature
store WITHOUT corpus text or shingles — band join + signature-agreement
verification only. These tests pin the decision semantics on small
corpora with known duplicate structure; the hash-exact equivalence with
DuckDB is gated by the `incremental_minhash_ingest` catalog oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators.dedup import (
    banded_keys,
    incremental_lsh_ingest,
    lsh_candidate_pairs,
    minhash_signatures,
)


def _sig(spark, rows):
    df = spark.createDataFrame(rows, "id long, text string")
    return minhash_signatures(df, "text", "id", num_hashes=16, n=3)


STORE_ROWS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "completely different content about spark shuffle partitions and joins"),
]


def test_exact_copy_in_batch_is_flagged_against_store(spark):
    store = _sig(spark, STORE_ROWS)
    batch = _sig(spark, [(10, STORE_ROWS[0][1])])  # verbatim copy of doc 1
    out = incremental_lsh_ingest(store, batch).collect()
    assert len(out) == 1
    r = out[0]
    # identical text → identical signature → agreement 16/16 in every band
    assert r.n_store_dups == 1
    assert r.first_store_dup == 1
    assert r.n_batch_dups == 0
    assert not r.is_new


def test_novel_doc_survives(spark):
    store = _sig(spark, STORE_ROWS)
    batch = _sig(
        spark, [(10, "entirely novel words about kubernetes operators and cron jobs")]
    )
    r = incremental_lsh_ingest(store, batch).collect()[0]
    assert r.is_new
    assert r.n_store_dups == 0 and r.n_batch_dups == 0
    assert r.first_store_dup is None


def test_batch_internal_dup_keeps_earlier_id(spark):
    store = _sig(spark, STORE_ROWS)
    txt = "one more document with enough tokens to shingle reliably today"
    batch = _sig(spark, [(10, txt), (11, txt)])
    rows = {r.id: r for r in incremental_lsh_ingest(store, batch).collect()}
    assert rows[10].is_new  # earlier id is the survivor
    assert not rows[11].is_new
    assert rows[11].n_batch_dups == 1


def test_survivor_only_store_growth_is_idempotent(spark):
    """Appending survivors' signatures to the store and replaying the
    same batch flags EVERY doc as a store dup — the idempotence the
    reference's ON CONFLICT upsert had (dags/dag.py:389-403), lifted to
    near-dup semantics."""
    store = _sig(spark, STORE_ROWS)
    batch = _sig(
        spark,
        [
            (10, STORE_ROWS[0][1]),
            (11, "fresh unseen sentence mentioning airflow scheduler backfills"),
        ],
    )
    first = incremental_lsh_ingest(store, batch)
    survivors = first.filter("is_new").select("id")
    grown = store.unionByName(batch.join(survivors, "id"))
    replay = incremental_lsh_ingest(grown, batch)
    assert replay.filter("is_new").count() == 0


def test_persisted_band_index_joins_without_store_side_exchange(spark):
    """The 100 TB claim behind incremental ingest: the corpus band index
    is PERSISTED bucketed by bkey, so each day's batch joins it with no
    shuffle of the (huge) store side — only the (small) batch side may
    exchange. Plan-asserted like tests/test_bucketed.py."""
    from reddit_tech_jobs_data_pipeline_spark.sources.bucketed import write_bucketed

    store = _sig(
        spark, [(i, f"stored document number {i} with shared suffix tokens") for i in range(40)]
    )
    write_bucketed(banded_keys(store), "band_index_b", "bkey", 8)
    try:
        # materialize the probe first: its own signature aggregation
        # shuffle is not the claim under test
        batch_keys = banded_keys(
            _sig(spark, [(100, "stored document number 7 with shared suffix tokens")])
        ).localCheckpoint()
        # repartition the probe side to the same hash layout; the bucketed
        # store side must plan with NO Exchange of its own
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            idx = spark.table("band_index_b").withColumnRenamed("id", "store_id")
            joined = batch_keys.repartition(8, "bkey").join(idx, "bkey")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            # exactly one Exchange (the batch side); the bucketed store
            # scan feeds the join with none
            assert plan.count("Exchange") == 1, plan
            assert "SelectedBucketsCount" in plan, plan
            assert joined.filter("store_id = 7").count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS band_index_b")


def test_banded_keys_refactor_matches_candidate_pairs(spark):
    """lsh_candidate_pairs now routes through banded_keys; its candidate
    set over a mixed corpus must still pair the near-identical docs."""
    sig = _sig(
        spark,
        STORE_ROWS
        + [(3, STORE_ROWS[0][1] + " extra"), (4, "unrelated filler tokens entirely")],
    )
    cands = {(r.id_a, r.id_b) for r in lsh_candidate_pairs(sig).collect()}
    assert (1, 3) in cands
    keys = banded_keys(sig)
    assert keys.groupBy("id").count().filter("count <> 4").count() == 0
