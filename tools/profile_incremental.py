"""Decompose incremental_minhash_ingest's wall time per stage and per
candidate-mass driver, at any SF dir.

SCALE.md's flagged row (sf0.1 2.6 s -> sf1.0 29.1 s, 11.2x at 10x docs)
attributed the superlinearity to "candidate-verify joins grow with
true-dup mass" without numbers. This tool produces the numbers: doc
counts, band-bucket occupancy, raw (pre-distinct) and distinct candidate
pair counts for both the store join and the batch self-join, verify-join
input sizes, and a per-stage wall-time split (signatures / store write /
candidates / full query).

Usage: python tools/profile_incremental.py <sf_dir> [more_sf_dirs...]
Findings recorded in SCALE.md.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators import dedup
from reddit_tech_jobs_data_pipeline_spark.plans.catalog_scale import _corpus_df
from reddit_tech_jobs_data_pipeline_spark.session import get_spark

NUM_HASHES, BANDS, MIN_AGREE = 16, 4, 12


def profile(spark, sf_dir: str) -> dict:
    out: dict = {"sf_dir": sf_dir}
    corpus = _corpus_df(spark, sf_dir)

    t0 = time.monotonic()
    store_sig = dedup.minhash_signatures(
        corpus.filter(F.col("id") < 100000), "text", "id", num_hashes=NUM_HASHES, n=3
    )
    path = f"{tempfile.gettempdir()}/profile_incr_sig_store_{abs(hash(sf_dir))}"
    store_sig.write.mode("overwrite").parquet(path)
    out["t_store_sig_write"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    batch_sig = dedup.minhash_signatures(
        corpus.filter(F.col("id") >= 100000), "text", "id", num_hashes=NUM_HASHES, n=3
    ).localCheckpoint()
    out["t_batch_sig"] = round(time.monotonic() - t0, 2)

    store_sig = spark.read.parquet(path)
    out["n_store"] = store_sig.count()
    out["n_batch"] = batch_sig.count()

    store_keys = dedup.banded_keys(store_sig, NUM_HASHES, BANDS).localCheckpoint()
    batch_keys = dedup.banded_keys(batch_sig, NUM_HASHES, BANDS).localCheckpoint()

    # bucket occupancy: how many ids share each band key, per side
    s_occ = store_keys.groupBy("bkey").agg(F.count("*").alias("ns"))
    b_occ = batch_keys.groupBy("bkey").agg(F.count("*").alias("nb"))
    stats = s_occ.agg(
        F.max("ns").alias("max"), F.sum(F.col("ns") * F.col("ns")).alias("sq")
    ).first()
    out["store_max_bucket"], out["store_selfpairs_raw"] = stats["max"], stats["sq"]
    joined = s_occ.join(b_occ, "bkey")
    cross = joined.agg(F.sum(F.col("ns") * F.col("nb")).alias("x")).first()["x"]
    out["cand_store_raw"] = int(cross or 0)  # pre-distinct join output rows
    bstats = b_occ.agg(
        F.max("nb").alias("max"),
        F.sum(F.col("nb") * (F.col("nb") - 1) / 2).alias("pairs"),
    ).first()
    out["batch_max_bucket"] = bstats["max"]
    out["cand_batch_raw"] = int(bstats["pairs"] or 0)

    t0 = time.monotonic()
    cand_store = (
        batch_keys.join(store_keys.withColumnRenamed("id", "store_id"), "bkey")
        .select(F.col("id").alias("id_a"), F.col("store_id").alias("id_b"))
        .distinct()
        .localCheckpoint()
    )
    out["cand_store_distinct"] = cand_store.count()
    out["t_cand_store"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    cand_batch = dedup.lsh_candidate_pairs(batch_sig, NUM_HASHES, BANDS).localCheckpoint()
    out["cand_batch_distinct"] = cand_batch.count()
    out["t_cand_batch"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    n = dedup.incremental_lsh_ingest(
        spark.read.parquet(path), batch_sig, NUM_HASHES, BANDS, MIN_AGREE
    ).count()
    out["t_full_query_given_sigs"] = round(time.monotonic() - t0, 2)
    out["result_rows"] = n
    return out


def main() -> None:
    spark = get_spark("profile_incremental")
    for sf_dir in sys.argv[1:] or ["/root/testdata/sf0.1"]:
        r = profile(spark, sf_dir)
        width = max(len(k) for k in r)
        print(f"--- {sf_dir}")
        for k, v in r.items():
            if k != "sf_dir":
                print(f"  {k:<{width}} {v}")


if __name__ == "__main__":
    main()
