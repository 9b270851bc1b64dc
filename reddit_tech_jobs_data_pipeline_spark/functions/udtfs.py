"""Python UDTFs — the engine's table-function escape hatch (SURVEY.md
§2.6).

Policy: everything the reference computes is expressible as native
Column expressions (functions/extract.py), and the hot path stays there
— JVM-side, whole-stage-codegen'd. These UDTFs exist for the cases a
future extractor exceeds regex power (a real NLP model, an external
parser): they reproduce the same semantics through Spark 4's Python UDTF
API so the swap-in point is already wired, and the differential tests
(tests/test_udtfs.py) prove the two paths agree row-for-row.

``extract_job_details`` mirrors the reference's one-row-in → 4-column
struct-out shape (reference dags/dag.py:71-142, applied at :341);
``tokenize`` is the generic one-row-in → N-rows-out shape (posexplode
twin). Both are batch-size-agnostic and stateless, so Spark can
parallelize them arbitrarily; at 100 TB the same logic should move to a
vectorized pandas_udf / mapInPandas if it ever enters a hot path
(row-at-a-time Python is the slow path by design).
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

from reddit_tech_jobs_data_pipeline_spark.functions import vocab

_WORD = re.compile(r"\w+")
_POSITION = [re.compile(p, re.IGNORECASE) for p in vocab.JOB_POSITION_PATTERNS]
_LOCATION = [re.compile(p, re.IGNORECASE) for p in vocab.LOCATION_PATTERNS]
_FIELD = [re.compile(vocab.FIELD_PATTERN, re.IGNORECASE)]


def _first_match(title: str, patterns: list[re.Pattern]) -> str | None:
    for pat in patterns:
        m = pat.search(title)
        if m:
            return m.group(0)
    return None


@udtf(returnType="pos: int, token: string")
class tokenize:
    """One row per ``\\w+`` token of the lowercased text, with position —
    the UDTF twin of ``posexplode(tokens(text))``."""

    def eval(self, text: str | None):
        if not text:
            return
        for pos, tok in enumerate(_WORD.findall(text.lower())):
            yield pos, tok


@udtf(
    returnType="job_position: string, location: string, field: string,"
    " technologies: array<string>"
)
class extract_job_details:
    """Row-wise twin of the native P2-P5 expressions: ordered
    first-match ladders + sorted dictionary-∩-token technologies.
    NULL/empty title yields the reference's defaults (all-NULL details,
    empty tech list — dag.py:80-92)."""

    def eval(self, title: str | None):
        if not title:
            yield None, None, None, []
            return
        toks = set(_WORD.findall(title.lower()))
        yield (
            _first_match(title, _POSITION),
            _first_match(title, _LOCATION),
            _first_match(title, _FIELD),
            sorted(k for k in vocab.TECH_KEYWORDS if k in toks),
        )


@udtf(returnType="event_type string, n bigint, first_id bigint, last_id bigint")
class partition_stats:
    """TABLE-argument UDTF (Spark 4): consumes
    ``TABLE(...) PARTITION BY event_type ORDER BY event_id`` — the
    accumulate-then-terminate shape for per-partition custom logic the
    built-in aggregates can't express (arbitrary Python state walked in
    partition order, rows emitted at partition end). The engine's third
    stateful escape hatch alongside applyInPandas (vectorized) and
    applyInPandasWithState (streaming); this one is row-at-a-time by
    design, for logic that needs it."""

    def __init__(self) -> None:
        self.key = None
        self.n = 0
        self.first = None
        self.last = None

    def eval(self, row):
        self.key = row["event_type"]
        self.n += 1
        if self.first is None:
            self.first = row["event_id"]
        self.last = row["event_id"]

    def terminate(self):
        if self.key is not None:
            yield (self.key, self.n, self.first, self.last)
