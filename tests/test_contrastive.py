"""Contrastive mining (operators/contrastive.py) against a pure-Python
brute force and its invariants."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators import contrastive


def _mk(spark, vecs_labels):
    return spark.createDataFrame(
        [
            (i, [float(x) for x in v], int(lab))
            for i, (v, lab) in enumerate(vecs_labels)
        ],
        "vec_id long, embedding array<float>, label int",
    )


def _cos(a, b):
    dp = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return round(dp / (na * nb), 4)


def _brute_triplets(vecs_labels, query_ids):
    out = {}
    for qi in query_ids:
        qv, ql = vecs_labels[qi]
        pos = [
            (_cos(qv, v), i)
            for i, (v, lab) in enumerate(vecs_labels)
            if i != qi and lab == ql
        ]
        neg = [
            (_cos(qv, v), i)
            for i, (v, lab) in enumerate(vecs_labels)
            if i != qi and lab != ql
        ]
        if not pos or not neg:
            continue
        pc, pid = min(pos, key=lambda t: (t[0], t[1]))
        nc, nid = max(neg, key=lambda t: (t[0], -t[1]))
        # tiebreak: highest cosine, then LOWEST neighbor id
        nc, nid = max(neg, key=lambda t: (t[0], -t[1]))
        out[qi] = (pid, pc, nid, nc, round(pc - nc, 4))
    return out


def test_hard_negatives_never_same_label(spark):
    rng = random.Random(3)
    data = [([rng.gauss(0, 1) for _ in range(8)], i % 3) for i in range(30)]
    df = _mk(spark, data)
    got = contrastive.hard_negative_topk(
        df, df.filter(F.col("vec_id") < 6), k=4
    ).collect()
    labels = {i: lab for i, (_, lab) in enumerate(data)}
    by_q = {}
    for r in got:
        assert labels[r.neighbor_id] != labels[r.query_id]
        assert r.neighbor_id != r.query_id
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        assert sorted(r.rank for r in rs) == [1, 2, 3, 4]
        ordered = sorted(rs, key=lambda r: (-r.cosine, r.neighbor_id))
        assert [r.rank for r in ordered] == [1, 2, 3, 4]
        # rank-1 really is the global hard negative
        want = max(
            (
                (_cos(data[q][0], v), -i)
                for i, (v, lab) in enumerate(data)
                if i != q and lab != data[q][1]
            ),
        )
        assert ordered[0].neighbor_id == -want[1]
        assert abs(ordered[0].cosine - want[0]) < 2e-4


def test_triplets_match_brute_force(spark):
    rng = random.Random(11)
    data = [([rng.gauss(0, 1) for _ in range(6)], i % 4) for i in range(24)]
    df = _mk(spark, data)
    got = {
        r.query_id: r
        for r in contrastive.triplet_mining(
            df, df.filter(F.col("vec_id") < 8)
        ).collect()
    }
    want = _brute_triplets(data, range(8))
    assert set(got) == set(want)
    for q, (pid, pc, nid, nc, margin) in want.items():
        r = got[q]
        assert (r.pos_id, r.neg_id) == (pid, nid), q
        assert abs(r.pos_cos - pc) < 2e-4 and abs(r.neg_cos - nc) < 2e-4
        assert abs(r.margin - margin) < 4e-4
        assert abs(r.margin - round(r.pos_cos - r.neg_cos, 4)) < 1e-12


def test_triplet_requires_both_legs(spark):
    # anchor 0 is the only member of its label: no positive → no row
    data = [([1.0, 0.0], 0), ([0.9, 0.1], 1), ([0.0, 1.0], 1)]
    df = _mk(spark, data)
    got = contrastive.triplet_mining(df, df).collect()
    qids = {r.query_id for r in got}
    assert 0 not in qids and qids == {1, 2}


def test_misembedded_anchor_has_negative_margin(spark):
    # anchor 0's same-label partner points away; a wrong-label vector is
    # nearly identical → margin < 0
    data = [
        ([1.0, 0.0], 0),
        ([0.0, 1.0], 0),  # positive, orthogonal
        ([0.99, 0.01], 1),  # hard negative, almost the anchor
    ]
    df = _mk(spark, data)
    r = [
        x
        for x in contrastive.triplet_mining(df, df).collect()
        if x.query_id == 0
    ][0]
    assert r.pos_id == 1 and r.neg_id == 2
    assert r.margin < 0
