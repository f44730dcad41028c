"""Regenerate the driver-sampling-status section of COVERAGE.md.

The driver samples ~50 of the registered queries per round; queries it
has never sampled are verified only by the local parity suite — that
blind spot hid two broken queries through round 3. This keeps the
sampled-vs-local-only split visible (and the registry count honest) by
rewriting the block between the markers from the registry and every
CORRECTNESS_r*.json present.

Usage: python tools/coverage_status.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BEGIN = "<!-- driver-status:begin -->"
END = "<!-- driver-status:end -->"


def main() -> None:
    from nyc_taxi_data_engineering_spark.queries import registry

    reg = registry()
    sampled: dict[str, str] = {}  # name -> latest round with all-green entry
    paths = glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    # sort numerically by round — lexicographic order would put an
    # unpadded r10 before r2 and mislabel the latest green round
    for path in sorted(paths, key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1))):
        rnd = re.search(r"r(\d+)", os.path.basename(path)).group(1)
        with open(path) as f:
            data = json.load(f)
        for name, res in data.items():
            if not isinstance(res, dict) or res.get("err") is not None:
                continue
            # Green requires EVERY recorded check: rows, and — when the
            # driver recorded them — schema and the exact value hash
            # (r9's two failures passed rows+schema and failed the hash;
            # counting those green overstated coverage by 2).
            checks = [res.get("rows_match"), res.get("schema_match"), res.get("hash_match")]
            if all(c is not False for c in checks) and res.get("rows_match"):
                sampled[name] = f"r{int(rnd)}"

    never = sorted(n for n in reg if n not in sampled)
    seen = sorted(n for n in reg if n in sampled)
    lines = [
        BEGIN,
        "## Driver sampling status (generated — `python tools/coverage_status.py`)",
        "",
        f"**{len(reg)} registered queries** ({sum(1 for s in reg.values() if s.oracle)} "
        f"with DuckDB oracles, {sum(1 for s in reg.values() if s.oracle is None)} rows-only). "
        f"Driver-green at least once: **{len(seen)}**; local-parity-only (never sampled "
        f"by the driver): **{len(never)}** — these rely on `tests/test_oracle_parity.py`.",
        "",
        "| Status | Queries |",
        "|---|---|",
        "| driver-green (latest round) | "
        + " · ".join(f"{n} ({sampled[n]})" for n in seen)
        + " |",
        "| local-parity-only | " + " · ".join(never) + " |",
        END,
    ]
    block = "\n".join(lines)

    cov_path = os.path.join(REPO, "COVERAGE.md")
    with open(cov_path) as f:
        text = f.read()
    if BEGIN in text:
        text = re.sub(re.escape(BEGIN) + ".*?" + re.escape(END), block, text, flags=re.S)
    else:
        text = text.rstrip() + "\n\n" + block + "\n"
    with open(cov_path, "w") as f:
        f.write(text)
    print(f"driver-green: {len(seen)}, local-only: {len(never)}, total: {len(reg)}")


if __name__ == "__main__":
    main()
