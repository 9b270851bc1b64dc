"""Property-based differential tests for the mixture/ordering operators:
Hypothesis generates masses/factors/scores, a pure-Python reimplementation
computes the expected result, and the Spark column expressions must match —
exactly for the hash/integer paths, to 1e-9 for the float paths.

Vectorized — one DataFrame per Hypothesis example (tests/test_properties.py
convention)."""

from __future__ import annotations

import hashlib
import math

from hypothesis import example, given, settings, strategies as st
from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators import curriculum, mixture

SETTINGS = settings(max_examples=8, deadline=None)

masses_st = st.lists(
    st.integers(min_value=0, max_value=10**12), min_size=1, max_size=12
).filter(lambda m: sum(m) > 0)


@given(masses=masses_st, alpha=st.floats(min_value=0.0, max_value=1.0))
# Regression: Hypothesis-found falsifying example from round 11. The
# upsample_factor here is ~5.2e6, so an ABSOLUTE 1e-9 bound demanded
# ~3.6e-16 relative precision — 1-2 ulps, tighter than double arithmetic
# with a different operation order can guarantee. Ratios are unbounded;
# they must be compared with RELATIVE tolerance.
@example(masses=[16, 191_332_781_732], alpha=1 / 3)
@SETTINGS
def test_temperature_weights_match_python(spark, masses, alpha):
    per = spark.createDataFrame(
        [(f"s{i}", m) for i, m in enumerate(masses)],
        "source string, total_tokens long",
    )
    got = {
        r.source: r
        for r in mixture.temperature_weights(per, "total_tokens", alpha).collect()
    }
    pows = [float(m) ** alpha if m > 0 else 0.0 for m in masses]
    z, tot = sum(pows), float(sum(masses))
    assert abs(sum(r.p_temperature for r in got.values()) - 1.0) < 1e-9
    for i, m in enumerate(masses):
        r = got[f"s{i}"]
        # p_temperature / natural_share are probabilities in [0, 1]:
        # absolute 1e-9 is meaningful there. upsample_factor is an
        # UNBOUNDED ratio (reaches ~5e6 on skewed masses), so it gets a
        # relative bound — absolute bounds on ratios are a test bug.
        assert abs(r.p_temperature - pows[i] / z) < 1e-9
        if m > 0:
            assert abs(r.natural_share - m / tot) < 1e-9
            assert math.isclose(
                r.upsample_factor, (pows[i] / z) / (m / tot), rel_tol=1e-9
            )
        else:
            assert r.p_temperature == 0.0 and r.upsample_factor is None


def py_copies(doc_id, factor, seed="up", epoch=1):
    base = math.floor(factor)
    hv = int(
        hashlib.md5(f"{seed}:{epoch}:{doc_id}".encode()).hexdigest()[:8], 16
    )
    return base + (1 if hv < (factor - base) * 2**32 else 0)


@given(
    factors=st.lists(
        st.floats(min_value=0.0, max_value=5.0, allow_nan=False),
        min_size=1,
        max_size=4,
    ),
    ids=st.lists(
        st.integers(min_value=0, max_value=10**9),
        min_size=1,
        max_size=30,
        unique=True,
    ),
)
@SETTINGS
def test_realize_repeats_matches_python_md5(spark, factors, ids):
    rows = [(d, float(factors[i % len(factors)])) for i, d in enumerate(ids)]
    docs = spark.createDataFrame(rows, "doc_id long, factor double")
    out = mixture.realize_repeats(docs, "factor", "doc_id").collect()
    got = {}
    for r in out:
        got.setdefault(r.doc_id, []).append(r.copy_idx)
    for d, f in rows:
        exp = py_copies(d, f)
        assert sorted(got.get(d, [])) == list(range(1, exp + 1))


@given(
    scores=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=40,
    ),
    cuts=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=9,
        unique=True,
    ),
)
@SETTINGS
def test_decile_assignment_matches_python(spark, scores, cuts):
    cuts = sorted(cuts)
    k = len(cuts) + 1
    df = spark.createDataFrame(
        [(i, float(s)) for i, s in enumerate(scores)], "i long, score double"
    )
    out = {
        r.i: r.d
        for r in df.select(
            "i",
            curriculum.assign_curriculum_decile(F.col("score"), cuts).alias("d"),
        ).collect()
    }
    for i, s in enumerate(scores):
        # descending convention: band 1 is above the top cut
        exp = k - sum(1 for c in cuts if s > c)
        assert out[i] == exp
