"""Compare two bench JSON records (BENCH_r{N}.json or bench.py output):
per-query delta vs the baseline run, flagging any query slower than
FLAG_RATIO x its baseline time (VERDICT r1 asks each round to publish
this side-by-side).

Usage: python tools/bench_compare.py BASE.json NEW.json
"""

from __future__ import annotations

import json
import sys

# bench.py reports per-query medians (of 3), so round-over-round noise
# is small enough to flag at 1.25x — single-shot timings needed 2.0x
# to stay quiet through local-mode jitter.
FLAG_RATIO = 1.25


def _queries(path: str) -> dict[str, float]:
    with open(path) as f:
        doc = json.load(f)
    if "parsed" in doc:  # driver-recorded BENCH_r{N}.json wraps the bench line
        doc = doc["parsed"]
    return doc["queries"]


def main() -> int:
    base, new = _queries(sys.argv[1]), _queries(sys.argv[2])
    flagged = []
    print(f"{'query':<32} {'base_s':>8} {'new_s':>8} {'ratio':>6}")
    for q in sorted(set(base) | set(new)):
        b, n = base.get(q), new.get(q)
        if b is None or n is None:
            print(f"{q:<32} {b or '-':>8} {n or '-':>8}   (only one side)")
            continue
        ratio = n / b if b else float("inf")
        mark = "  <-- SLOWER" if ratio > FLAG_RATIO else ""
        if ratio > FLAG_RATIO:
            flagged.append(q)
        print(f"{q:<32} {b:>8.3f} {n:>8.3f} {ratio:>6.2f}{mark}")
    print(f"total: base={sum(base.values()):.2f}s new={sum(new.values()):.2f}s; "
          f"{len(flagged)} flagged" + (f": {flagged}" if flagged else ""))
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
