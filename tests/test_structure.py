"""Structural text hygiene: boilerplate-line removal + paragraph dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_tech_jobs_data_pipeline_spark.operators import structure


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_boilerplate_stripped_per_domain_only(spark):
    # "footer" appears in 2/2 docs of src_a (>=50%) but only 1/3 of src_b
    rows = [
        (1, "a", "footer\nalpha one"),
        (2, "a", "footer\nbeta two"),
        (3, "b", "footer\ngamma"),
        (4, "b", "delta"),
        (5, "b", "epsilon"),
    ]
    out = {
        r.doc_id: r
        for r in structure.strip_boilerplate_lines(_docs(spark, rows)).collect()
    }
    assert out[1].clean_text == "alpha one" and out[1].n_removed == 1
    assert out[2].clean_text == "beta two"
    # src_b keeps its footer: 1/3 of the domain's docs is below threshold
    assert out[3].clean_text == "footer\ngamma" and out[3].n_removed == 0
    assert out[4].clean_text == "delta"


def test_fully_boilerplate_doc_survives_empty(spark):
    rows = [(1, "a", "footer"), (2, "a", "footer"), (3, "a", "footer\nreal text")]
    out = {
        r.doc_id: r
        for r in structure.strip_boilerplate_lines(_docs(spark, rows)).collect()
    }
    assert out[1].clean_text == "" and out[1].n_removed == 1 and out[1].n_lines == 1
    assert out[3].clean_text == "real text"


def test_boilerplate_line_order_preserved(spark):
    rows = [
        (1, "a", "x\nkeep1\nx\nkeep2\nkeep3"),
        (2, "a", "x\nother"),
    ]
    out = {
        r.doc_id: r
        for r in structure.strip_boilerplate_lines(_docs(spark, rows)).collect()
    }
    # both x occurrences in doc 1 removed together; order of the rest intact
    assert out[1].clean_text == "keep1\nkeep2\nkeep3" and out[1].n_removed == 2


def test_paragraph_dedup_keeps_first_occurrence_only(spark):
    rows = [
        (1, "a", "shared para\nunique one"),
        (2, "a", "unique two\nshared para"),
        (3, "b", "shared para"),
    ]
    out = {
        r.doc_id: r
        for r in structure.paragraph_dedup_first(_docs(spark, rows)).collect()
    }
    assert out[1].clean_text == "shared para\nunique one"  # keeper: min doc
    assert out[2].clean_text == "unique two" and out[2].n_removed == 1
    assert out[3].clean_text == "" and out[3].n_removed == 1


def test_paragraph_dedup_clips_in_doc_repeats_after_keeper(spark):
    rows = [(1, "a", "p\nq\np\np")]
    out = structure.paragraph_dedup_first(_docs(spark, rows)).collect()[0]
    # keeper is (doc 1, li 0); the two later in-doc repeats are clipped
    assert out.clean_text == "p\nq" and out.n_removed == 2


def test_partitioning_invariance(spark):
    rows = [(i, f"s{i % 3}", f"common line\nbody {i} tok") for i in range(60)]
    d = _docs(spark, rows)
    a = structure.strip_boilerplate_lines(d).collect()
    b = structure.strip_boilerplate_lines(d.repartition(7)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    pa = structure.paragraph_dedup_first(d).collect()
    pb = structure.paragraph_dedup_first(d.repartition(5)).collect()
    assert sorted(map(tuple, pa)) == sorted(map(tuple, pb))
