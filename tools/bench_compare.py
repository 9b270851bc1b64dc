"""Compare two BENCH_r{N}.json files per query, annotated with the
±30% shared-host noise band (SCALE.md / memory: single samples off the
band have twice been host contention, not regressions — A/B interleaved
runs are the arbiter, see tools/scale_bench.py).

Usage: python tools/bench_compare.py BENCH_r06.json BENCH_r07.json
Exits 0 always — this is a report, not a gate.
"""

from __future__ import annotations

import json
import sys

NOISE_BAND = 0.30


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    def load(path):
        d = json.load(open(path))
        # driver BENCH_r{N}.json wraps bench.py's line under "parsed"
        return d.get("parsed", d)

    a, b = load(sys.argv[1]), load(sys.argv[2])
    qa, qb = a["queries"], b["queries"]
    shared = sorted(set(qa) & set(qb))
    only_b = sorted(set(qb) - set(qa))
    rows = []
    for name in shared:
        old, new = qa[name], qb[name]
        delta = (new - old) / old if old else float("inf")
        flag = "" if abs(delta) <= NOISE_BAND else ("SLOWER?" if delta > 0 else "faster?")
        rows.append((delta, name, old, new, flag))
    rows.sort(reverse=True)
    print(f"{'query':42s} {'old':>8s} {'new':>8s} {'delta':>8s}")
    for delta, name, old, new, flag in rows:
        print(f"{name:42s} {old:8.3f} {new:8.3f} {delta:+8.1%} {flag}")
    tot_a = sum(qa[n] for n in shared)
    tot_b = sum(qb[n] for n in shared)
    print(f"\nshared-{len(shared)}-query total: {tot_a:.3f} -> {tot_b:.3f} "
          f"({(tot_b - tot_a) / tot_a:+.1%}); outside-band movers need an "
          f"interleaved A/B before being called regressions")
    if "value_legacy28" in b:
        print(f"legacy28 bridge total in new file: {b['value_legacy28']}")
    if only_b:
        print(f"new queries (no old sample): {only_b}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
