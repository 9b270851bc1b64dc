"""The 100 TB skew guards, exercised on purpose-built skewed fixtures.

Two load-bearing claims get measured here instead of just documented:

* ``dedup.ngram_jaccard_pairs(max_df=...)`` — a stop-shingle present in
  EVERY document makes the inverted-index self-join quadratic (every
  doc meets every doc). The guard drops shingles with document
  frequency > max_df before the join, bounding candidates.

* ``graph.cooccurrence_edges(max_group_size=...)`` — one hot group with
  m members contributes m·(m-1)/2 pairs from a single task. The guard
  drops groups larger than the cap before the explode.

Measured candidate counts are recorded in SCALE.md.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators.dedup import (
    edit_distance_near_dup_pairs,
    ngram_jaccard_pairs,
)
from reddit_tech_jobs_data_pipeline_spark.operators.graph import cooccurrence_edges

N_DOCS = 60


def _skewed_corpus(spark):
    # every doc: 3 unique tokens then one shared trigram → each doc has
    # 4 distinct 3-shingles, exactly one ("common shingle here") shared
    # by ALL docs; no other cross-doc shingle exists
    rows = [(i, f"u{i} v{i} w{i} common shingle here") for i in range(N_DOCS)]
    return spark.createDataFrame(rows, "id long, text string")


def test_stop_shingle_guard_bounds_jaccard_candidates(spark):
    docs = _skewed_corpus(spark)
    # threshold=0 keeps every candidate pair → the output IS the
    # candidate set, so its count measures join blow-up directly
    unguarded = ngram_jaccard_pairs(docs, "text", "id", n=3, threshold=0.0)
    assert unguarded.count() == N_DOCS * (N_DOCS - 1) // 2  # all-pairs: 1770
    guarded = ngram_jaccard_pairs(
        docs, "text", "id", n=3, threshold=0.0, max_df=10
    )
    # the universal shingle (df=60 > 10) is dropped; no other shingle is
    # shared, so zero candidates remain
    assert guarded.count() == 0


def test_stop_shingle_guard_keeps_true_positives(spark):
    # two genuinely near-duplicate docs + the universal stop-shingle:
    # the guard must drop the stop-shingle without losing the real pair
    rows = [(i, f"u{i} v{i} w{i} common shingle here") for i in range(N_DOCS)]
    rows.append((1000, "alpha beta gamma delta epsilon zeta"))
    rows.append((1001, "alpha beta gamma delta epsilon eta"))
    docs = spark.createDataFrame(rows, "id long, text string")
    guarded = ngram_jaccard_pairs(
        docs, "text", "id", n=3, threshold=0.5, max_df=10
    )
    got = {(r["id_a"], r["id_b"]) for r in guarded.collect()}
    assert got == {(1000, 1001)}


def _brute_edit_pairs(rows, max_dist):
    # pure-Python exhaustive oracle: all pairs within levenshtein max_dist
    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    out = set()
    for i, (ia, sa) in enumerate(rows):
        for ib, sb in rows[i + 1 :]:
            lo, hi = min(ia, ib), max(ia, ib)
            if lev(sa, sb) <= max_dist:
                out.add((lo, hi))
    return out


def test_edit_distance_short_strings_not_missed(spark):
    # strings where the q-gram count-filter bound is vacuous (≤ 0):
    # 'ab' vs 'cd' share ZERO 2-grams yet levenshtein('ab','cd') = 2 —
    # the short-string path must emit them (and single-char / sub-q
    # strings, which have no grams at all)
    rows = [
        (1, "ab"), (2, "cd"), (3, "x"), (4, "y"), (5, "abc"),
        (6, "abd"), (7, "hello"), (8, "help"), (9, ""),
        (10, "a completely different long string far away"),
    ]
    docs = spark.createDataFrame(rows, "id long, text string")
    got = {
        (r.id_a, r.id_b)
        for r in edit_distance_near_dup_pairs(
            docs, "text", "id", max_dist=2, q=2
        ).collect()
    }
    assert got == _brute_edit_pairs(rows, 2)


def test_edit_distance_gram_guard_keeps_true_pairs_via_adjusted_bound(spark):
    # degenerate gram distribution: every doc is 'qq' * 20 + a tail, so
    # the gram 'qq' (df = all docs) makes the unguarded inverted-index
    # join quadratic. The guard drops df>max_gram_df grams AND lowers the
    # count bound by min(pruned_a, pruned_b) — without that slack the
    # true pair below (39 of whose 44 shared grams are the hot 'qq')
    # could never clear the unadjusted bound of 41.
    rows = [(i, "qq" * 20 + chr(97 + i) * 3 + "xyz") for i in range(26)]
    rows += [(1000, "qq" * 20 + "zzqrst"), (1001, "qq" * 20 + "zzqrsu")]
    docs = spark.createDataFrame(rows, "id long, text string")
    expected = _brute_edit_pairs(rows, 2)
    assert expected == {(1000, 1001)}  # background tails are ≥3 apart
    unguarded = {
        (r.id_a, r.id_b)
        for r in edit_distance_near_dup_pairs(docs, "text", "id", max_dist=2, q=2).collect()
    }
    assert unguarded == expected
    guarded = {
        (r.id_a, r.id_b)
        for r in edit_distance_near_dup_pairs(
            docs, "text", "id", max_dist=2, q=2, max_gram_df=10
        ).collect()
    }
    assert guarded == expected


def test_edit_distance_gram_guard_recall_cost_is_all_hot_pairs(spark):
    # the documented recall cost: pairs whose shared grams are ALL hot
    # (zero surviving overlap) are invisible to the guarded index — 12
    # identical all-'qq' docs give C(12,2)=66 pairs unguarded, 0 guarded
    allhot = spark.createDataFrame(
        [(i, "qq" * 20) for i in range(12)], "id long, text string"
    )
    unguarded = edit_distance_near_dup_pairs(allhot, "text", "id", max_dist=2, q=2)
    assert unguarded.count() == 66
    guarded = edit_distance_near_dup_pairs(
        allhot, "text", "id", max_dist=2, q=2, max_gram_df=5
    )
    assert guarded.count() == 0  # recall cost, documented in SCALE.md


def test_hot_group_guard_bounds_cooccurrence_edges(spark):
    # part 1: 100 suppliers (hot); parts 2..41: 2 suppliers each (cold)
    rows = [(1, s) for s in range(1000, 1100)]
    rows += [(p, p * 10) for p in range(2, 42)]
    rows += [(p, p * 10 + 1) for p in range(2, 42)]
    df = spark.createDataFrame(rows, "part long, supp long")
    unguarded = cooccurrence_edges(df, "part", "supp")
    # hot group: C(100,2)=4950 half-edges; cold: 40 pairs — both mirrored
    assert unguarded.count() == 2 * (4950 + 40)
    guarded = cooccurrence_edges(df, "part", "supp", max_group_size=20)
    assert guarded.count() == 2 * 40
    # the cold edges themselves are unchanged by the guard
    cold = {
        (r["src"], r["dst"])
        for r in guarded.filter(F.col("src") < F.col("dst")).collect()
    }
    assert cold == {(p * 10, p * 10 + 1) for p in range(2, 42)}
