"""Per-query profiler for the optimization rounds (guide §1: measure
first).

For each bench-board query (13 headline + board2), on a warm session:
  - time query CONSTRUCTION (plan analysis + eager pins) and the noop
    write separately, over N reps;
  - count the Spark jobs and tasks each rep schedules (AppStatusStore);
  - capture ``explain('formatted')`` to ``plans/<tag>/<name>_<suffix>.txt``
    and summarize plan-shape features (Exchange / join strategy /
    BatchEvalPython / global Sort counts).

Wall numbers here are DIAGNOSTIC (which phase, how many jobs), not the
bench record — bench.py stays the only source of headline seconds.

Usage:
    python tools/profile_bench.py [--tag r12 --suffix before] [names...]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")

PLAN_FEATURES = {
    "exchanges": re.compile(r"^\s*[+:*-]*\s*\(?\d+\)?\s*Exchange", re.M),
    "broadcast_exch": re.compile(r"BroadcastExchange", re.M),
    "smj": re.compile(r"SortMergeJoin", re.M),
    "bhj": re.compile(r"BroadcastHashJoin", re.M),
    "shj": re.compile(r"ShuffledHashJoin", re.M),
    "bnlj": re.compile(r"BroadcastNestedLoopJoin", re.M),
    "cartesian": re.compile(r"CartesianProduct", re.M),
    "py_eval": re.compile(r"BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsIn", re.M),
    "sorts": re.compile(r"^\s*[+:*-]*\s*\(?\d+\)?\s*Sort\b", re.M),
    "windows": re.compile(r"\bWindow\b", re.M),
    "scan_rdd": re.compile(r"Scan ExistingRDD", re.M),
}


def plan_summary(text: str) -> dict[str, int]:
    return {k: len(rx.findall(text)) for k, rx in PLAN_FEATURES.items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r12")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    def _positive_int(v: str) -> int:
        n = int(v)
        if n < 1:  # ADVICE r12: --reps 0 left keep_df unbound (NameError)
            raise argparse.ArgumentTypeError("--reps must be >= 1")
        return n

    ap.add_argument("--reps", type=_positive_int, default=3)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from nyc_taxi_data_engineering_spark.queries import all_queries, bench_queries
    from nyc_taxi_data_engineering_spark.session import get_spark
    import bench as bench_mod

    reg = all_queries()
    names = args.names or (list(bench_queries()) + bench_mod.BOARD2)
    spark = get_spark("profile")
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()

    plan_dir = os.path.join(REPO, "plans", args.tag)
    os.makedirs(plan_dir, exist_ok=True)

    def jobs_snapshot():
        jl = store.jobsList(None)
        njobs = jl.size()
        ntasks = sum(jl.apply(i).numTasks() for i in range(njobs))
        return njobs, ntasks

    # Warm-up (JVM/codegen/footer caches) like bench.py
    warm = reg["daily_vendor_revenue"]
    warm(spark, args.sf_dir).write.format("noop").mode("overwrite").save()

    rows = []
    for name in names:
        fn = reg[name]
        spark.catalog.clearCache()
        best = None
        for rep in range(args.reps):
            # r13: clear between REPS too — persist()-based operators
            # otherwise hand reps 2..N a warm cache and best-of-reps
            # reports a build-skipping wall (VERDICT r12 "What's wrong" #1).
            if rep:
                spark.catalog.clearCache()
            sc.setJobDescription(f"profile:{name}")
            j0, t0 = jobs_snapshot()
            w0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            w1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            w2 = time.perf_counter()
            j1, t1 = jobs_snapshot()
            rec = dict(
                name=name, build_s=round(w1 - w0, 3), exec_s=round(w2 - w1, 3),
                total_s=round(w2 - w0, 3), jobs=j1 - j0, tasks=t1 - t0,
            )
            if best is None or rec["total_s"] < best["total_s"]:
                best = rec
                keep_df = df
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            keep_df.explain("formatted")
        text = buf.getvalue()
        with open(os.path.join(plan_dir, f"{name}_{args.suffix}.txt"), "w") as fh:
            fh.write(text)
        best.update(plan_summary(text))
        rows.append(best)
        print(json.dumps(best), flush=True)

    out = os.path.join(REPO, "plans", args.tag, f"profile_{args.suffix}.json")
    with open(out, "w") as fh:
        json.dump(rows, fh, indent=1)
    print(f"# wrote {out}")


if __name__ == "__main__":
    main()
