"""Hand-computable coverage semantics for contamination_coverage."""

from __future__ import annotations

from reddit_tech_jobs_data_pipeline_spark.operators.dedup import (
    _shingle_table,
    contamination_coverage,
)


def test_coverage_counts_covered_positions_once(spark):
    bench_docs = spark.createDataFrame(
        [(1, "a b c d e f")], "id long, text string"
    )
    bench = _shingle_table(bench_docs, "text", "id", 5).select("shingle")
    corpus = spark.createDataFrame(
        [
            # matches "a b c d e" at pos 4 (covers 4-8) and "b c d e f"
            # at pos 5 (covers 5-9) → 6 distinct covered of 12 tokens
            (10, "x1 x2 x3 a b c d e f y1 y2 y3"),
            # clean doc: no row in the result
            (11, "p q r s t u v w"),
            # full quote: every position covered
            (12, "a b c d e f"),
        ],
        "id long, text string",
    )
    got = {
        r["id"]: (r["n_tok"], r["n_covered"], r["coverage"])
        for r in contamination_coverage(corpus, bench, "text", "id", 5).collect()
    }
    assert got == {10: (12, 6, 0.5), 12: (6, 6, 1.0)}
