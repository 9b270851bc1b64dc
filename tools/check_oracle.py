"""Local stand-in for the driver's t2 correctness gate.

Runs every catalog query on Spark and its oracle on DuckDB at the given
SF dir, then compares row count, sorted-column schema shape, and an
order-insensitive value comparison (sorted rows, stringified values).

Queries tagged ``float-tol`` in the registry (the commutative scale
modes, whose float sums differ from the ordered-fold oracle by
reassociation noise) compare their float columns under a 1e-9 relative
tolerance instead of stringified equality, so a value within noise of a
rounding boundary can never flake the gate. Rows are aligned on the
non-float columns (a unique key for every tagged query); non-float
columns still compare exactly. tools/boundary_margin.py separately
asserts the unrounded values sit clear of their rounding boundaries,
which keeps the driver's stringified-hash gate safe as well.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entry_mod
from reddit_tech_jobs_data_pipeline_spark.plans.catalog import get_registry
from reddit_tech_jobs_data_pipeline_spark.schemas import TESTDATA_TABLES
from reddit_tech_jobs_data_pipeline_spark.session import get_spark

FLOAT_RTOL = 1e-9
FLOAT_ATOL = 1e-12


def compare_float_tol(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    """Tolerance comparison for float-tol-tagged queries: align rows on
    the (exactly-compared) non-float columns, then require every float
    column to agree within FLOAT_RTOL/FLOAT_ATOL. Returns an error
    message or None."""
    import numpy as np

    float_cols = sorted(c for c in a.columns if str(a[c].dtype).startswith("float"))
    key_cols = sorted(c for c in a.columns if c not in float_cols)
    if not key_cols:
        return "float-tol compare needs at least one non-float key column"
    a = a.sort_values(key_cols).reset_index(drop=True)
    b = b.sort_values(key_cols).reset_index(drop=True)
    for c in key_cols:
        if not a[c].map(repr).equals(b[c].map(repr)):
            return f"key column {c} differs"
    for c in float_cols:
        av, bv = a[c].to_numpy(dtype=float), b[c].to_numpy(dtype=float)
        if not np.allclose(av, bv, rtol=FLOAT_RTOL, atol=FLOAT_ATOL, equal_nan=True):
            worst = int(np.nanargmax(np.abs(av - bv)))
            return (
                f"float column {c} beyond tolerance at row {worst}: "
                f"spark={av[worst]!r} duck={bv[worst]!r}"
            )
    return None


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify everything (the driver hashes values; string form surfaces
    # representation drift like 1.0-vs-1 or datetime-vs-date early)
    out = df.copy()
    for c in out.columns:
        out[c] = out[c].map(lambda v: repr(v))
    return out.sort_values(list(out.columns)).reset_index(drop=True)


def _fresh_con(sf_dir: str):
    """A fresh in-memory DuckDB with the testdata views registered.

    One connection PER QUERY, not per run: DuckDB's buffer pool
    accumulates across a ~190-query session and the heavy unrolled
    graph oracles (personalized pagerank / HITS at sf0.1) then die with
    Out of Memory late in the run, even though each passes alone.
    Views are lazy over parquet, so reconnecting costs nothing.

    The explicit memory cap + spill dir keep the heavy oracles from
    racing the (large) Spark JVM for the last of the host's RAM —
    DuckDB's default limit is 80% of physical memory, which the JVM is
    already holding part of."""
    con = duckdb.connect()
    # 64 GB: enough that the heaviest oracle (unrolled personalized
    # pagerank at sf0.1, ~50 GB peak) runs in memory — a tighter cap
    # forces >40 GB of spill, which outgrows the disk; the temp dir is
    # the overflow valve, not the plan
    con.sql("SET memory_limit='64GB'")
    # per-process spill dir: concurrent check_oracle runs must never
    # share (or delete) each other's temp storage
    con.sql(f"SET temp_directory='/tmp/duckdb_oracle_spill_{os.getpid()}'")
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t + '.parquet')}'"
        )
    return con


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check_oracle")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"unknown queries: {sorted(unknown)}")
            return 1
        qs = {n: qs[n] for n in qs if n in only}
    failures = []
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir)
            spark_pd = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(spark_pd)} rows")
            continue
        try:
            con = _fresh_con(sf_dir)
            duck_pd = con.sql(oracles[name]).df()
            con.close()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        a, b = normalize(spark_pd), normalize(duck_pd)
        if len(a) != len(b):
            print(f"FAIL {name}: rowcount spark={len(a)} duck={len(b)}")
            failures.append(name)
            continue
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            failures.append(name)
            continue
        dt_a = {c: str(spark_pd[c].dtype) for c in spark_pd.columns}
        dt_b = {c: str(duck_pd[c].dtype) for c in duck_pd.columns}
        dt_diff = {c: (dt_a[c], dt_b.get(c)) for c in dt_a if dt_a[c] != dt_b.get(c)}
        if dt_diff:
            print(f"FAIL {name}: dtype mismatch {dt_diff}")
            failures.append(name)
            continue
        spec = get_registry().get(name)
        if spec is not None and "float-tol" in spec.tags:
            err = compare_float_tol(spark_pd, duck_pd)
            if err:
                print(f"FAIL {name}: {err}")
                failures.append(name)
            else:
                print(f"OK   {name}: {len(a)} rows (float-tol)")
            continue
        if not a.equals(b):
            neq = (a != b).any(axis=1)
            print(f"FAIL {name}: {int(neq.sum())}/{len(a)} rows differ; first diffs:")
            merged = pd.concat(
                [a[neq].head(3).add_suffix("_spark"), b[neq].head(3).add_suffix("_duck")], axis=1
            )
            print(merged.to_string())
            failures.append(name)
            continue
        print(f"OK   {name}: {len(a)} rows")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
