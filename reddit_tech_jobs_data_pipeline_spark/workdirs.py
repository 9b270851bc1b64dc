"""Deterministic scratch-directory keys.

Several catalog queries and streaming harnesses key a /tmp work dir on
their inputs so concurrent runs over different inputs don't rmtree each
other's store/checkpoint. Keying on ``abs(hash(...))`` is wrong for that
job: Python salts ``str.__hash__`` per process (PYTHONHASHSEED), so every
run minted a FRESH directory and stale stores/checkpoints accumulated
unboundedly under /tmp. A content digest is stable across processes —
the same inputs always map to the same dir, so the run's own
``rmtree``/overwrite cleanup actually reclaims the previous run's space.
"""

from __future__ import annotations

import hashlib


def stable_work_key(*parts: object) -> str:
    """12-hex-char digest of the argument tuple, stable across processes
    and Python versions (md5 of ``repr``; ints, strs, floats and tuples
    thereof all repr deterministically). Used to key per-input scratch
    dirs: ``/tmp/spark_graft_<name>_{stable_work_key(sf_dir, ...)}``."""
    return hashlib.md5(repr(parts).encode("utf-8")).hexdigest()[:12]
