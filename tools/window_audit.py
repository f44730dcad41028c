"""Mechanized global-window site audit (round 12).

VERDICT r11's one scale-shape defect class was `Window.orderBy(...)`
with no partition clause — the plan Spark warns about ("Moving all data
to a single partition") — over grains that grow with data. Round 12
converted every such site to `operators/distrank`'s two-phase bucketed
prefix (or `orderBy().limit(K)` top-K). The sites that REMAIN are
windows over BOUNDED grains: calendar days/hours, bootstrap-B rows,
sketch registers, decile/bin grids, collected k-row frames — each
bounded by a constant or the calendar, never by row count.

This module makes that posture mechanical: every no-partition window
construction in the engine package — `Window.orderBy(`,
`Window.partitionBy()` (empty), or a bare `Window.rowsBetween(` — must
carry a `# global-window-ok: <bounded-grain reason>` marker on the same
or previous line. Unmarked sites fail `tests/test_window_audit.py`, so
a NEW single-partition window over an unbounded grain cannot land
silently: the author must either convert it (distrank / top-K) or
justify the bound in front of the reviewer.

Usage:
    python tools/window_audit.py        # print inventory + violations
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "nyc_taxi_data_engineering_spark")

# A window spec STARTED without a partition clause. Chained
# `Window.partitionBy(...).orderBy(...)` does not match: the partition
# is non-empty. `Window.partitionBy()` with only whitespace inside IS
# a global window (empty clustering).
_SITE = re.compile(
    r"Window\.orderBy\(|Window\.partitionBy\(\s*\)|Window\.rowsBetween\("
)
_MARK = "global-window-ok:"

# distrank's own internals are the sanctioned implementation layer.
_EXEMPT_FILES = {os.path.join("nyc_taxi_data_engineering_spark", "operators", "distrank.py")}


def violations() -> list[str]:
    out: list[str] = []
    for root, _, files in sorted(os.walk(PKG)):
        for fname in sorted(files):
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            rel = os.path.relpath(path, REPO)
            if rel in _EXEMPT_FILES:
                continue
            prev = ""
            with open(path) as fh:
                for i, line in enumerate(fh, 1):
                    if _SITE.search(line) and _MARK not in line and _MARK not in prev:
                        out.append(f"{rel}:{i}: {line.strip()[:100]}")
                    prev = line
    return out


def markers() -> list[tuple[str, str]]:
    """(site, reason) for every marked line — reasons must be non-empty."""
    out: list[tuple[str, str]] = []
    for root, _, files in sorted(os.walk(PKG)):
        for fname in sorted(files):
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            rel = os.path.relpath(path, REPO)
            with open(path) as fh:
                for i, line in enumerate(fh, 1):
                    if _MARK in line:
                        reason = line.split(_MARK, 1)[1].strip()
                        out.append((f"{rel}:{i}", reason))
    return out


def main() -> int:
    v = violations()
    m = markers()
    print(f"{len(m)} justified global-window sites, {len(v)} UNMARKED")
    for s, r in m:
        print(f"  ok  {s}  — {r}")
    for s in v:
        print(f"  BAD {s}")
    return 1 if v else 0


if __name__ == "__main__":
    sys.exit(main())
