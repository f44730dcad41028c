"""Pin the no-partition-window site inventory (round 12).

VERDICT r11's remaining scale defect was global-order windows over
grows-with-data grains. Round 12 converted all of them to
operators/distrank (or orderBy().limit(K) top-K); the survivors are
windows over constant- or calendar-bounded grains, each carrying a
`# global-window-ok: <reason>` justification. This test fails on ANY
new unmarked site, so a single-partition window over an unbounded
grain cannot land silently — the author must convert it or justify
the bound in front of the reviewer.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import window_audit  # noqa: E402


def test_no_unmarked_global_window_sites():
    v = window_audit.violations()
    assert not v, (
        "unmarked no-partition window site(s) — convert to "
        "operators/distrank or mark `# global-window-ok: <bounded-grain "
        "reason>`:\n" + "\n".join(v)
    )


def test_markers_are_justified():
    for site, reason in window_audit.markers():
        assert reason, f"{site}: global-window-ok marker without a reason"
