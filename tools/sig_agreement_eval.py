"""Measure the signature-agreement estimator against exact Jaccard.

incremental_lsh_ingest decides duplicate/new from ``n_agree/k`` (the
k-sample MinHash Jaccard estimator) because the signature store keeps no
shingles. This tool quantifies that decision against the exact-Jaccard
ground truth on the same candidate pairs, at several agreement
thresholds:

  precision = P(jaccard >= t | flagged dup)
  recall    = P(flagged dup | jaccard >= t)

Usage: python tools/sig_agreement_eval.py [sf_dir] — results recorded in
SCALE.md ("Incremental near-dup ingest" row).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators import dedup
from reddit_tech_jobs_data_pipeline_spark.plans.catalog_scale import _corpus_df
from reddit_tech_jobs_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("sig_agreement_eval")
    corpus = _corpus_df(spark, sf_dir)

    sh = dedup._shingle_table(corpus, "text", "id", 3).localCheckpoint()
    sig = dedup.minhash_signatures_from_shingles(sh, 16).localCheckpoint()
    cand = dedup.lsh_candidate_pairs(sig, 16, 4).localCheckpoint()

    agree = dedup.signature_agreement(cand, sig, sig, 16)

    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    common = (
        cand.join(sh.withColumnsRenamed({"id": "id_a"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b"}), ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    exact = (
        cand.join(common, ["id_a", "id_b"], "left")
        .join(sizes.withColumnsRenamed({"id": "id_a", "n_sh": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_sh": "n_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.coalesce("n_common", F.lit(0))
            / (F.col("n_a") + F.col("n_b") - F.coalesce("n_common", F.lit(0))),
        )
        .select("id_a", "id_b", "jaccard")
    )

    joined = agree.join(exact, ["id_a", "id_b"]).localCheckpoint()
    t = 0.7
    print(f"candidate pairs: {joined.count()}, ground-truth threshold J >= {t}")
    print("min_agree  flagged  precision  recall")
    for min_agree in (10, 11, 12, 13, 14):
        flagged = joined.filter(F.col("n_agree") >= min_agree)
        n_flag = flagged.count()
        tp = flagged.filter(F.col("jaccard") >= t).count()
        pos = joined.filter(F.col("jaccard") >= t).count()
        prec = tp / n_flag if n_flag else float("nan")
        rec = tp / pos if pos else float("nan")
        print(f"{min_agree:9d}  {n_flag:7d}  {prec:9.3f}  {rec:6.3f}")


if __name__ == "__main__":
    main()
