"""Measure bucketed-ANN recall against the exact brute-force top-k.

Recall@k for the sign-LSH bucketed path at several nbits values — the
quantitative view of the speed/recall trade described in
operators/similarity.py. Usage: python tools/ann_recall.py [sf_dir] [k]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators import similarity
from reddit_tech_jobs_data_pipeline_spark.session import get_spark
from reddit_tech_jobs_data_pipeline_spark.sources.testdata import load_table


def recall_at_k(spark, sf_dir: str, k: int, nbits: int, n_queries: int = 50, probe: int = 0) -> float:
    emb = load_table(spark, sf_dir, "embeddings").cache()
    queries = emb.filter(F.col("vec_id") < n_queries)
    exact = similarity.brute_force_topk(emb, queries, k=k)
    approx = similarity.bucketed_ann_topk(emb, queries, k=k, nbits=nbits, probe_hamming=probe)
    hits = exact.join(approx, ["query_id", "neighbor_id"], "left_semi").count()
    total = exact.count()
    return hits / total if total else 0.0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ann_recall")
    for nbits in (2, 4, 6, 8):
        r0 = recall_at_k(spark, sf_dir, k, nbits, probe=0)
        r1 = recall_at_k(spark, sf_dir, k, nbits, probe=1)
        print(f"nbits={nbits}  selectivity~1/{2**nbits}  recall@{k}: single={r0:.3f}  multiprobe={r1:.3f}")


if __name__ == "__main__":
    main()
