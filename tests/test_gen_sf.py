"""tools/gen_sf.py must emit tables whose SCHEMA exactly matches the
committed testdata snapshot — perf numbers measured on generated data
are only comparable if every query compiles to the same plan shapes
(same column types ⇒ same casts, pushdowns, codegen)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_generated_tables_match_committed_schema(tmp_path):
    out = str(tmp_path / "gen")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gen_sf.py"), out, "0.001"],
        check=True,
        capture_output=True,
    )
    snap = json.load(open(os.path.join(REPO, "tools", "testdata_schema.json")))
    committed = snap["/root/testdata/sf0.1"]
    for table, spec in committed.items():
        md = pq.read_schema(os.path.join(out, f"{table}.parquet"))
        got = {name: str(md.field(name).type) for name in md.names}
        want = dict(spec["columns"])
        # the snapshot records events.ts encoding variants; normalize
        got = {k: v.replace(", tz=UTC", "") for k, v in got.items()}
        want = {k: v.replace("[ns]", "[us]") for k, v in want.items()}
        assert got == want, f"{table}: {got} != {want}"
