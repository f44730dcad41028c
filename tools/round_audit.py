"""Mechanized native-round() site audit (VERDICT r10 task 5).

The below-ULP / half-tie float class bit in rounds 8, 9, and 10; the
engine's posture (COVERAGE.md 'Audit position') is: iterative chains use
``portable_round``, terminal single-shot rounds may keep native
``round()`` because the fixed-tier exact sweeps certify them. This
module makes that posture mechanical instead of memorial: it inventories
every native round site in the engine package — both Spark-side
``F.round(`` and oracle-SQL ``ROUND(`` — and pins the per-file counts in
``round_audit_baseline.json``. ``tests/test_round_audit.py`` fails on
ANY drift, so a NEW unguarded site cannot land silently: the author must
either convert it (portable_round / decimal domain), guard it
(``functions.assert_quantum_above_ulp``), or consciously re-pin the
baseline — which puts the site in front of the reviewer.

Lines mentioning ``portable_round`` are excluded (they are the
conversion, not the risk); lines carrying a ``round-ok:`` marker comment
are counted separately so deliberate, justified additions don't force a
full re-pin.

Usage:
    python tools/round_audit.py            # print inventory + drift
    python tools/round_audit.py --regen    # rewrite the baseline pin
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "nyc_taxi_data_engineering_spark")
BASELINE_PATH = os.path.join(REPO, "tools", "round_audit_baseline.json")

# F.round( on the Spark side; bare ROUND( in oracle SQL strings. The
# lookbehind keeps portable_round( / _round( helpers out of the SQL hit.
_SITE = re.compile(r"F\.round\(|(?<![_A-Za-z])ROUND\s*\(", re.IGNORECASE)


def inventory() -> dict[str, dict[str, int]]:
    """Per-file counts: {"native": n, "marked_ok": m} — ``native`` are
    unmarked single-shot round sites (the pinned class), ``marked_ok``
    carry an explicit ``round-ok:`` justification comment."""
    out: dict[str, dict[str, int]] = {}
    for root, _, files in sorted(os.walk(PKG)):
        for fname in sorted(files):
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            rel = os.path.relpath(path, REPO)
            native = marked = 0
            prev = ""
            with open(path) as fh:
                for line in fh:
                    if "portable_round" not in line:
                        hits = len(_SITE.findall(line))
                        if hits:
                            if "round-ok:" in line or "round-ok:" in prev:
                                marked += hits
                            else:
                                native += hits
                    prev = line
            if native or marked:
                out[rel] = {"native": native, "marked_ok": marked}
    return out


def load_baseline() -> dict[str, dict[str, int]]:
    with open(BASELINE_PATH) as fh:
        return json.load(fh)


def drift(
    current: dict[str, dict[str, int]], baseline: dict[str, dict[str, int]]
) -> list[str]:
    msgs = []
    for rel in sorted(set(current) | set(baseline)):
        cur = current.get(rel, {}).get("native", 0)
        base = baseline.get(rel, {}).get("native", 0)
        if cur > base:
            msgs.append(
                f"{rel}: {cur - base} NEW unmarked native round() site(s) "
                f"({base} pinned, {cur} found) — convert to portable_round / "
                "decimal domain, guard with assert_quantum_above_ulp, add a "
                "'# round-ok: <why>' comment, or consciously re-pin via "
                "'python tools/round_audit.py --regen'"
            )
        elif cur < base:
            msgs.append(
                f"{rel}: {base - cur} site(s) converted since the pin "
                f"({base} pinned, {cur} found) — re-pin via "
                "'python tools/round_audit.py --regen' so the allowance "
                "doesn't silently cover future additions"
            )
    return msgs


def main() -> int:
    cur = inventory()
    if "--regen" in sys.argv:
        with open(BASELINE_PATH, "w") as fh:
            json.dump(cur, fh, indent=1, sort_keys=True)
            fh.write("\n")
        total = sum(v["native"] for v in cur.values())
        print(f"pinned {total} native sites across {len(cur)} files")
        return 0
    base = load_baseline()
    msgs = drift(cur, base)
    total = sum(v["native"] for v in cur.values())
    print(f"{total} native round() sites across {len(cur)} files")
    for m in msgs:
        print("DRIFT:", m)
    return 1 if msgs else 0


if __name__ == "__main__":
    raise SystemExit(main())
