"""Distribution-drift operators (operators/drift.py) against
hand-computed fixtures and pure-Python recomputation."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators import drift


def _psi_py(ca: dict, cb: dict, eps: float = 0.5) -> float:
    bins = sorted(set(ca) | set(cb))
    ta, tb, nb = sum(ca.values()), sum(cb.values()), len(bins)
    out = 0.0
    for b in bins:
        pa = (ca.get(b, 0) + eps) / (ta + eps * nb)
        pb = (cb.get(b, 0) + eps) / (tb + eps * nb)
        out += (pa - pb) * math.log(pa / pb)
    return out


def _psi_rows(spark, rows):
    df = spark.createDataFrame(rows, "g string, bin long, side string")
    return {r.g: r for r in drift.psi(df, "bin", "side", group_cols=["g"]).collect()}


def test_psi_identical_sides_is_zero(spark):
    rows = [("g", b, s) for b in (1, 2, 3) for s in ("a", "b") for _ in range(4)]
    got = _psi_rows(spark, rows)["g"]
    assert got.psi == 0.0
    assert got.n_bins == 3 and got.n_a == 12 and got.n_b == 12


def test_psi_matches_pure_python(spark):
    ca = {1: 5, 2: 1, 3: 0}
    cb = {1: 1, 2: 6, 4: 2}
    rows = [("g", b, "a") for b, c in ca.items() for _ in range(c)]
    rows += [("g", b, "b") for b, c in cb.items() for _ in range(c)]
    got = _psi_rows(spark, rows)["g"]
    # bin 3 has zero rows on both sides after the dict — it never appears
    want = _psi_py({1: 5, 2: 1}, cb)
    assert got.n_bins == 3  # union of observed bins: {1, 2} ∪ {1, 2, 4}
    assert abs(got.psi - want) < 1e-6
    assert got.psi > 0  # shifted distributions


def test_psi_one_sided_bin_is_finite(spark):
    rows = [("g", 1, "a")] * 3 + [("g", 2, "b")] * 3
    got = _psi_rows(spark, rows)["g"]
    want = _psi_py({1: 3}, {2: 3})
    assert abs(got.psi - want) < 1e-6
    assert math.isfinite(got.psi)


def test_psi_groups_independent_and_other_sides_ignored(spark):
    rows = (
        [("g1", 1, "a"), ("g1", 1, "b"), ("g1", 1, "x")]  # x counts nowhere
        + [("g2", 1, "a")] * 4
        + [("g2", 2, "b")] * 4
    )
    got = _psi_rows(spark, rows)
    assert got["g1"].psi == 0.0 and got["g1"].n_a == 1 and got["g1"].n_b == 1
    assert abs(got["g2"].psi - _psi_py({1: 4}, {2: 4})) < 1e-6


def _divergence_py(docs):
    # docs: list[(source, text)] → {source: (n_tokens, n_vocab, kl, js)}
    from collections import Counter

    st: Counter = Counter()
    for src, text in docs:
        for t in text.split():
            st[(src, t)] += 1
    ct: Counter = Counter()
    for (src, t), c in st.items():
        ct[t] += c
    g_total = sum(ct.values())
    out = {}
    for src in {s for s, _ in st}:
        mine = {t: c for (s, t), c in st.items() if s == src}
        s_total = sum(mine.values())
        kl = js = qs = 0.0
        for t, c in mine.items():
            p, q = c / s_total, ct[t] / g_total
            kl += p * math.log(p / q)
            m = (p + q) / 2
            js += 0.5 * (p * math.log(p / m) + q * math.log(q / m))
            qs += q
        js += 0.5 * math.log(2) * (1 - qs)  # tokens absent from this source
        out[src] = (s_total, len(mine), kl, js)
    return out


def test_divergence_matches_pure_python(spark):
    docs = [
        ("s1", "join merge sort join join"),
        ("s1", "slow join"),
        ("s2", "merge merge window window window"),
        ("s3", "join merge sort slow window"),
    ]
    df = spark.createDataFrame(docs, "source string, text string")
    got = {r.source: r for r in drift.source_token_divergence(df).collect()}
    want = _divergence_py(docs)
    assert set(got) == set(want)
    for src, (n_tok, n_voc, kl, js) in want.items():
        r = got[src]
        assert (r.n_tokens, r.n_vocab) == (n_tok, n_voc)
        assert abs(r.kl - kl) < 1e-6
        assert abs(r.js - js) < 1e-6
        assert r.kl >= 0 and 0 <= r.js <= math.log(2) + 1e-12


def test_divergence_single_source_is_zero(spark):
    df = spark.createDataFrame(
        [("only", "a b c a")], "source string, text string"
    )
    r = drift.source_token_divergence(df).collect()[0]
    assert r.kl == 0.0 and r.js == 0.0
    assert r.n_tokens == 4 and r.n_vocab == 3


def test_divergence_disjoint_vocab(spark):
    # two sources with disjoint vocabularies of equal mass: p_s puts all
    # mass where the 50/50 global mix puts half → KL = ln(1/0.5) = ln2;
    # JS = ½KL(p‖m) + ½KL(q‖m) with m = {mine: ¾, other: ¼}
    docs = [("s1", "x x x x"), ("s2", "y y y y")]
    df = spark.createDataFrame(docs, "source string, text string")
    got = {r.source: r for r in drift.source_token_divergence(df).collect()}
    js_want = 0.5 * math.log(4 / 3) + 0.5 * (
        0.5 * math.log(2 / 3) + 0.5 * math.log(2)
    )
    for r in got.values():
        assert abs(r.kl - math.log(2)) < 1e-6
        assert abs(r.js - js_want) < 1e-6
    want = _divergence_py(docs)
    for src, (_, _, kl, js) in want.items():
        assert abs(got[src].kl - kl) < 1e-6 and abs(got[src].js - js) < 1e-6


def test_psi_from_counts_novel_bin(spark):
    # a batch bin absent from the baseline: ca = 0 row must contribute a
    # finite eps-smoothed penalty (the full-outer-join path in the monitor)
    binned = spark.createDataFrame(
        [("g", 10, 0, 1), ("g", 5, 2, 0)], "g string, bin long, ca long, cb long"
    )
    r = drift.psi_from_counts(binned.select("g", "ca", "cb"), ["g"]).collect()[0]
    assert math.isfinite(r.psi) and r.psi > 0
    assert abs(r.psi - _psi_py({5: 2}, {10: 1})) < 1e-6


def test_streaming_monitor_matches_batch_psi(spark):
    from reddit_tech_jobs_data_pipeline_spark.sources.testdata import load_table
    from reddit_tech_jobs_data_pipeline_spark.streaming.drift_monitor import (
        run_drift_psi_batchlike,
    )

    sf_dir = "/root/testdata/sf0.001"
    got = {
        r.tag: r for r in run_drift_psi_batchlike(spark, sf_dir, n_tags=4).collect()
    }
    assert sorted(got) == [0, 1, 2, 3]

    # batch recomputation: union(full table side a, slice side b) per tag
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    for tag in range(4):
        u = ev.select(
            F.floor(F.col("value") / 5.0).alias("bin"), F.lit("a").alias("side")
        ).unionByName(
            ev.filter(F.col("user_id") % 4 == tag).select(
                F.floor(F.col("value") / 5.0).alias("bin"),
                F.lit("b").alias("side"),
            )
        )
        want = drift.psi(u, "bin", "side").collect()[0]
        assert got[tag].psi == want.psi, tag
        assert (got[tag].n_a, got[tag].n_b) == (want.n_a, want.n_b)
        # each slice is a quarter-ish of the corpus, same shape — PSI is
        # smoothing-dominated at this tiny SF (~250 rows/slice), so bound
        # it loosely; exact parity with batch PSI is asserted above
        assert 0 <= got[tag].psi < 0.3


def test_centroid_drift_identical_sides(spark):
    vecs = [[1.0, 2.0, 3.0], [0.5, -1.0, 2.0], [2.0, 0.0, 1.0]]
    rows = [("g", "a", v) for v in vecs] + [("g", "b", v) for v in vecs]
    df = spark.createDataFrame(
        [(g, s, [float(x) for x in v]) for g, s, v in rows],
        "g string, side string, embedding array<float>",
    )
    r = drift.centroid_drift(df, "embedding", "side", ["g"]).collect()[0]
    assert r.centroid_cos == 1.0 and r.n_a == 3 and r.n_b == 3


def test_centroid_drift_orthogonal_sides(spark):
    rows = [("g", "a", [1.0, 0.0])] * 4 + [("g", "b", [0.0, 1.0])] * 2
    df = spark.createDataFrame(rows, "g string, side string, embedding array<float>")
    r = drift.centroid_drift(df, "embedding", "side", ["g"]).collect()[0]
    assert r.centroid_cos == 0.0 and (r.n_a, r.n_b) == (4, 2)


def test_centroid_drift_matches_numpy(spark):
    import random

    import numpy as np

    rng = random.Random(13)
    rows = []
    for lab in ("x", "y"):
        for i in range(25):
            side = "a" if i % 2 == 0 else "b"
            rows.append((lab, side, [rng.gauss(0, 1) for _ in range(6)]))
    df = spark.createDataFrame(
        [(g, s, [float(x) for x in v]) for g, s, v in rows],
        "g string, side string, embedding array<float>",
    )
    got = {r.g: r for r in drift.centroid_drift(df, "embedding", "side", ["g"]).collect()}
    for lab in ("x", "y"):
        a = np.mean([v for g, s, v in rows if g == lab and s == "a"], axis=0)
        b = np.mean([v for g, s, v in rows if g == lab and s == "b"], axis=0)
        want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(got[lab].centroid_cos - want) < 2e-4, lab


def test_centroid_drift_missing_side_is_null(spark):
    rows = [("g", "a", [1.0, 0.0])] * 3
    df = spark.createDataFrame(rows, "g string, side string, embedding array<float>")
    r = drift.centroid_drift(df, "embedding", "side", ["g"]).collect()[0]
    assert r.centroid_cos is None and r.n_b == 0
