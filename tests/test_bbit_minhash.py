"""1-bit MinHash (operators/dedup.py: bbit_pack / bbit_agreement /
bbit_minhash_estimate_pairs): pack correctness against recomputed
minhashes, the identity case, and estimator accuracy vs exact Jaccard
on planted near-dups."""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators import dedup

P = 4294967291


def _py_minhash_bits(text: str, num_hashes: int, n: int = 3) -> int:
    toks = text.lower().split()
    shingles = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    bsig = 0
    for i in range(num_hashes):
        mh = min(
            (
                int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
                + i * int(hashlib.md5(s.encode()).hexdigest()[8:16], 16)
            )
            % P
            for s in shingles
        )
        bsig |= (mh % 2) << i
    return bsig


def _jaccard(a: str, b: str, n: int = 3) -> float:
    ta, tb = a.lower().split(), b.lower().split()
    sa = {" ".join(ta[i : i + n]) for i in range(len(ta) - n + 1)}
    sb = {" ".join(tb[i : i + n]) for i in range(len(tb) - n + 1)}
    return len(sa & sb) / len(sa | sb)


def test_pack_matches_pure_python(spark):
    docs = [
        (1, "alpha beta gamma delta epsilon zeta eta"),
        (2, "one two three four five six seven eight"),
    ]
    df = spark.createDataFrame(docs, "id long, text string")
    sh = dedup._shingle_table(df, "text", "id", 3)
    packed = {
        r.id: r.bsig
        for r in dedup.bbit_pack(
            dedup.minhash_signatures_from_shingles(sh, 48), 48
        ).collect()
    }
    for i, text in docs:
        assert packed[i] == _py_minhash_bits(text, 48), i


def test_identical_docs_full_agreement(spark):
    text = "the quick brown fox jumps over the lazy dog today"
    df = spark.createDataFrame([(1, text), (2, text)], "id long, text string")
    got = dedup.bbit_minhash_estimate_pairs(df, "text", "id").collect()
    assert len(got) == 1
    r = got[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.n_agree == 48 and r.j_est == 1.0


def test_estimator_tracks_exact_jaccard(spark):
    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(400)]  # large vocab: no accidental overlap
    docs, planted = [], []
    for i in range(30):
        base = rng.choices(vocab, k=30)
        docs.append((i, " ".join(base)))
        # copy with a tail perturbation — high but sub-1.0 jaccard
        mutated = base[: 30 - rng.randint(1, 4)] + ["zz", "yy"]
        docs.append((i + 1000, " ".join(mutated)))
        planted.append((i, i + 1000))
    df = spark.createDataFrame(docs, "id long, text string")
    got = {
        (r.id_a, r.id_b): r
        for r in dedup.bbit_minhash_estimate_pairs(
            df, "text", "id", min_agree=30
        ).collect()
    }
    texts = dict(docs)
    errs = []
    found = 0
    for a, b in planted:
        j = _jaccard(texts[a], texts[b])
        if (a, b) in got:
            found += 1
            errs.append(abs(got[(a, b)].j_est - j))
    # LSH banding at 16/4 keeps high-jaccard pairs with high probability
    assert found >= len(planted) * 0.7, found
    assert sum(errs) / len(errs) < 0.15, errs  # σ(ĵ) ≈ (1+j)/√48 ≈ 0.25
    # no wildly-wrong estimate on any surviving planted pair
    assert max(errs) < 0.45, max(errs)


def test_min_agree_is_integer_exact_filter(spark):
    text = "the quick brown fox jumps over the lazy dog today"
    df = spark.createDataFrame([(1, text), (2, text)], "id long, text string")
    assert (
        dedup.bbit_minhash_estimate_pairs(df, "text", "id", min_agree=49).count()
        == 0
    )
    assert (
        dedup.bbit_minhash_estimate_pairs(df, "text", "id", min_agree=48).count()
        == 1
    )
