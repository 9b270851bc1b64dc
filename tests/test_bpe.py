"""BPE merge-rule learning (operators/bpe.py): agreement with a pure
sequential-greedy python BPE, overlap/run semantics, and invariances."""

from __future__ import annotations

from reddit_tech_jobs_data_pipeline_spark.operators import bpe


def _py_bpe(texts, rounds, sep="+"):
    """Reference: textbook sequential greedy BPE (count all adjacent
    pairs incl. overlaps; merge left-to-right non-overlapping)."""
    docs = [t.split(" ") for t in texts if t is not None]
    rules = []
    for r in range(1, rounds + 1):
        cnt: dict = {}
        for d in docs:
            for a, b in zip(d, d[1:]):
                cnt[(a, b)] = cnt.get((a, b), 0) + 1
        if not cnt:
            break
        (l, rr), c = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        rules.append((r, l, rr, c))
        if r < rounds:
            nd = []
            for d in docs:
                out, i = [], 0
                while i < len(d):
                    if i + 1 < len(d) and d[i] == l and d[i + 1] == rr:
                        out.append(l + sep + rr)
                        i += 2
                    else:
                        out.append(d[i])
                        i += 1
                nd.append(out)
            docs = nd
    return rules


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_matches_sequential_greedy_including_run_overlaps(spark):
    # runs of identical tokens are where window-parity vs sequential
    # greedy could diverge — they must not
    texts = ["a a a a b c", "a a b c a a", "b c b c x", "x a a a", None, "a a a a a"]
    got = bpe.bpe_learn(_df(spark, texts), rounds=4)
    assert got == _py_bpe(texts, 4)
    # (a,a) count includes overlaps: doc0 3 + doc1 2 + doc3 2 + doc5 4
    assert got[0] == (1, "a", "a", 11)


def test_matches_reference_on_real_corpus(spark):
    from reddit_tech_jobs_data_pipeline_spark.sources.testdata import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    texts = [r.text for r in docs.orderBy("doc_id").collect()]
    assert bpe.bpe_learn(docs, rounds=3) == _py_bpe(texts, 3)


def test_merged_symbols_participate_in_later_rounds(spark):
    texts = ["x y z w"] * 5
    got = bpe.bpe_learn(_df(spark, texts), rounds=3)
    # round 1 merges (x,y); round 2 the merged symbol pairs with z
    assert got[0][1:3] == ("x", "y")
    assert got[1][1:3] == ("x+y", "z")
    assert got[2][1:3] == ("x+y+z", "w")


def test_partitioning_invariance(spark):
    texts = [f"t{i % 7} t{(i + 1) % 7} t{i % 7} filler" for i in range(50)]
    a = bpe.bpe_learn(_df(spark, texts), rounds=3)
    b = bpe.bpe_learn(_df(spark, texts).repartition(9), rounds=3)
    assert a == b == _py_bpe(texts, 3)


def test_fewer_pairs_than_rounds_stops_early(spark):
    got = bpe.bpe_learn(_df(spark, ["solo"]), rounds=3)
    assert got == []  # single-token docs have no pairs
