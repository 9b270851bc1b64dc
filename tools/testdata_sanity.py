"""Round-start sanity check: detect driver-side testdata drift.

The driver may regenerate /root/testdata between rounds, and an encoding
change can silently break loaders written against the previous dump
(round 2→3 switched events.ts from TIMESTAMP(NANOS) to TIMESTAMP(MICROS,
NTZ) and broke 8 tests). This tool snapshots every table's arrow schema
(from the parquet footer — no data read) and row count, and compares
against the committed snapshot.

Usage:
    python tools/testdata_sanity.py            # compare all SF dirs, exit 1 on drift
    python tools/testdata_sanity.py --update   # rewrite tools/testdata_schema.json

Run the compare FIRST THING each round; on drift, re-run the full suite
before building anything new.
"""

from __future__ import annotations

import json
import os
import sys

import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
SNAPSHOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "testdata_schema.json")


def describe(sf_dir: str) -> dict:
    out = {}
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(path):
            out[t] = {"missing": True}
            continue
        f = pq.ParquetFile(path)
        out[t] = {
            "rows": f.metadata.num_rows,
            "columns": {
                field.name: str(field.type) for field in f.schema_arrow
            },
        }
    return out


def compare(expected: dict, current: dict) -> list[str]:
    drift = []
    # a snapshot dir/table missing from the current scan is drift too —
    # a deleted /root/testdata/sfX must not report "matches snapshot"
    for d, tables in expected.items():
        if d not in current:
            drift.append(f"{d}: SF dir in snapshot but MISSING on disk")
            continue
        for t in tables:
            if t not in current[d]:
                drift.append(f"{d}/{t}: table in snapshot but missing on disk")
    for d, tables in current.items():
        for t, desc in tables.items():
            exp = expected.get(d, {}).get(t)
            if exp is None:
                drift.append(f"{d}/{t}: not in snapshot (new table?)")
                continue
            if exp.get("columns") != desc.get("columns"):
                drift.append(
                    f"{d}/{t}: SCHEMA DRIFT\n  expected: {exp.get('columns')}\n  actual:   {desc.get('columns')}"
                )
            elif exp.get("rows") != desc.get("rows"):
                drift.append(f"{d}/{t}: row count {exp.get('rows')} -> {desc.get('rows')}")
    return drift


def main() -> int:
    current = {d: describe(d) for d in SF_DIRS if os.path.isdir(d)}
    if "--update" in sys.argv:
        with open(SNAPSHOT, "w") as fh:
            json.dump(current, fh, indent=1, sort_keys=True)
        print(f"snapshot written: {SNAPSHOT}")
        return 0
    if not os.path.exists(SNAPSHOT):
        print(f"no snapshot at {SNAPSHOT}; run with --update first")
        return 1
    with open(SNAPSHOT) as fh:
        expected = json.load(fh)
    drift = compare(expected, current)
    if drift:
        print("TESTDATA DRIFT DETECTED — re-run the full suite before building:")
        print("\n".join(drift))
        return 1
    print(f"testdata matches snapshot ({sum(len(t) for t in current.values())} tables across {len(current)} SF dirs)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
