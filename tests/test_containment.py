"""Asymmetric shingle-containment pairs (operators/dedup.py:
containment_prefix_pairs) — hand fixtures, losslessness vs a brute-force
pure-Python oracle, and the Jaccard-blind-spot motivation case."""

from __future__ import annotations

import itertools
import random

from reddit_tech_jobs_data_pipeline_spark.operators import dedup


def _shingles(text: str, n: int = 3) -> set:
    toks = text.lower().split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _brute(docs, n=3, num=9, den=10):
    out = set()
    for (ia, ta), (ib, tb) in itertools.permutations(docs, 2):
        sa, sb = _shingles(ta, n), _shingles(tb, n)
        if not sa or not sb:
            continue
        if len(sa & sb) * den >= num * len(sa):
            out.add((ia, ib))
    return out


def _run(spark, docs, n=3, num=9, den=10):
    df = spark.createDataFrame(docs, "id long, text string")
    rows = dedup.containment_prefix_pairs(
        df, "text", "id", n=n, threshold_num=num, threshold_den=den
    ).collect()
    return {(r.contained_id, r.container_id): r for r in rows}


def test_full_containment(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [(1, base), (2, base + " iota kappa lambda mu nu xi")]
    got = _run(spark, docs)
    r = got[(1, 2)]
    assert r.containment == 1.0
    assert r.n_common == r.n_contained == len(_shingles(base))
    # container is NOT contained: 6 extra tokens → containment well below 0.9
    assert (2, 1) not in got


def test_jaccard_blind_spot(spark):
    # small doc fully inside a much larger one: Jaccard far below any
    # near-dup threshold, containment exactly 1.0 — the motivating case
    small = "one two three four five"
    big = small + " " + " ".join(f"w{i}" for i in range(40))
    docs = [(1, small), (2, big)]
    jacc = dedup.ngram_jaccard_pairs(
        spark.createDataFrame(docs, "id long, text string"),
        "text",
        "id",
        n=3,
        threshold=0.5,
    ).collect()
    assert jacc == []
    got = _run(spark, docs)
    assert got[(1, 2)].containment == 1.0


def test_mutual_containment_emits_both_directions(spark):
    a = "p q r s t u v w x y"
    b = a + " zz"  # one extra token → one extra shingle on b's side
    got = _run(spark, [(1, a), (2, b)], num=8, den=10)
    assert got[(1, 2)].containment == 1.0
    assert (2, 1) in got  # 8/9 ≥ 0.8 the other way


def test_threshold_boundary_integer_exact(spark):
    # n_a = 10 shingles, exactly 9 common: 9·10 ≥ 9·10 passes at exactly
    # 9/10; 19/20 (0.95) excludes it — integer arithmetic, no float eps
    base_toks = [f"t{i}" for i in range(12)]  # 10 3-gram shingles
    a = " ".join(base_toks)
    # replace the last token: kills exactly the one shingle touching it
    b9 = " ".join(base_toks[:-1] + ["CHANGED"]) + " pad1 pad2 pad3"
    got = _run(spark, [(1, a), (2, b9)], num=9, den=10)
    r = got[(1, 2)]
    assert r.n_contained == 10
    assert r.n_common == 9  # one trailing shingle broken
    assert r.containment == 0.9
    got_strict = _run(spark, [(1, a), (2, b9)], num=19, den=20)
    assert (1, 2) not in got_strict


def test_lossless_vs_brute_force(spark):
    rng = random.Random(7)
    vocab = [f"v{i}" for i in range(30)]
    docs = []
    for i in range(40):
        docs.append((i, " ".join(rng.choices(vocab, k=rng.randint(5, 25)))))
    # plant containments: doc+suffix and doc embedded mid-page
    for i in range(40, 48):
        src = docs[i - 40][1]
        docs.append((i, src + " zz yy"))
    docs.append((100, docs[0][1]))  # exact dup
    for num, den in ((9, 10), (7, 10), (1, 1)):
        got = set(_run(spark, docs, num=num, den=den))
        want = _brute(docs, num=num, den=den)
        assert got == want, f"threshold {num}/{den}: {got ^ want}"


def test_short_docs_excluded(spark):
    # fewer tokens than the shingle width → no shingles → never emitted
    got = _run(spark, [(1, "a b"), (2, "a b"), (3, "a b c d e"), (4, "a b c d e")])
    assert set(got) == {(3, 4), (4, 3)}


def test_max_df_guard_drops_hot_shingles(spark):
    # every doc shares the same hot prefix; with max_df the hot shingles
    # drop and containment is computed over the remaining (rare) sets
    hot = "the quick brown fox"
    docs = [
        (1, hot + " alpha beta gamma delta"),
        (2, hot + " alpha beta gamma delta epsilon zeta"),
        (3, hot + " unrelated words entirely different here"),
    ]
    df = spark.createDataFrame(docs, "id long, text string")
    got = dedup.containment_prefix_pairs(
        df, "text", "id", n=3, threshold_num=9, threshold_den=10, max_df=2
    ).collect()
    by_pair = {(r.contained_id, r.container_id): r for r in got}
    # after dropping df=3 shingles, doc1's surviving shingles are those
    # touching its unique suffix — all present in doc2's suffix superset
    assert (1, 2) in by_pair and by_pair[(1, 2)].containment == 1.0
    assert all(p[0] != 3 and p[1] != 3 for p in by_pair)
    # per-pair counts must reflect the FILTERED sets, not the raw ones
    import itertools as _it

    def filtered_shingles(text, keep_df=2):
        from collections import Counter

        all_sh = {i: _shingles(t) for i, t in docs}
        dfc = Counter(s for sh in all_sh.values() for s in sh)
        return {s for s in _shingles(text) if dfc[s] <= keep_df}

    fa = filtered_shingles(docs[0][1])
    fb = filtered_shingles(docs[1][1])
    assert by_pair[(1, 2)].n_contained == len(fa)
    assert by_pair[(1, 2)].n_common == len(fa & fb)
