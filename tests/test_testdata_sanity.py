"""The drift detector itself: missing dirs/tables must be drift, not a
silent pass (they were, before round 4)."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from testdata_sanity import compare  # noqa: E402

T = {"rows": 10, "columns": {"a": "int64"}}


def test_identical_is_clean():
    snap = {"sf1": {"t": T}}
    assert compare(snap, snap) == []


def test_missing_sf_dir_is_drift():
    assert any(
        "MISSING" in d for d in compare({"sf1": {"t": T}}, {})
    )


def test_missing_table_is_drift():
    got = compare({"sf1": {"t": T, "u": T}}, {"sf1": {"t": T}})
    assert any("u" in d and "missing" in d for d in got)


def test_schema_and_rowcount_drift():
    cur = {"sf1": {"t": {"rows": 10, "columns": {"a": "int32"}}}}
    assert any("SCHEMA DRIFT" in d for d in compare({"sf1": {"t": T}}, cur))
    cur2 = {"sf1": {"t": {"rows": 11, "columns": {"a": "int64"}}}}
    assert any("row count" in d for d in compare({"sf1": {"t": T}}, cur2))


def test_new_table_is_drift():
    got = compare({"sf1": {"t": T}}, {"sf1": {"t": T, "new": T}})
    assert any("not in snapshot" in d for d in got)
