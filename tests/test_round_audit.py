"""Pin the native-round() site inventory (VERDICT r10 task 5).

The below-ULP / half-tie float class caused driver reds or latents in
rounds 8, 9, and 10. The engine's documented posture (COVERAGE.md
'Audit position') allows terminal single-shot native round() under the
fixed-tier exact sweeps but requires iterative chains to use
``portable_round``. This test mechanizes the posture: any NEW native
round site — Spark ``F.round(`` or oracle-SQL ``ROUND(`` — fails CI
until the author converts it, guards it, marks it ``# round-ok: <why>``,
or consciously re-pins ``tools/round_audit_baseline.json`` via
``python tools/round_audit.py --regen``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import round_audit  # noqa: E402


def test_no_new_native_round_sites():
    msgs = round_audit.drift(round_audit.inventory(), round_audit.load_baseline())
    assert not msgs, "native round() inventory drifted:\n" + "\n".join(msgs)


def test_marker_lines_are_justified():
    """Every round-ok marker must carry a reason, not just the tag."""
    import re

    bad = []
    for root, _, files in os.walk(round_audit.PKG):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            for i, line in enumerate(open(path), 1):
                if "round-ok:" in line:
                    reason = line.split("round-ok:", 1)[1].strip()
                    if len(re.sub(r"\W", "", reason)) < 8:
                        bad.append(f"{path}:{i}: empty round-ok justification")
    assert not bad, "\n".join(bad)
