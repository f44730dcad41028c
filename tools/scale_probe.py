"""Scale probe: measure how the headline bench queries scale from
sf0.1 to a synthetic sf1 (10x rows), confirming the slopes the plan
assertions promise.

The driver provides parquet only up to sf0.1 (TESTDATA.md, read-only),
so sf1 is synthesized here by unioning 10 key-offset replicas of
sf0.1 — every key column gets ``replica * 100_000_000`` so joins stay
referentially intact and key cardinality grows 10x like a real scale-up.
Two tables need more than an offset to keep their *similarity
structure* scaling linearly instead of picking up artifacts:

- ``documents``: a verbatim copy would give every doc 9 exact twins,
  exploding near-dup pair counts ~45x (10 choose 2 per doc) and
  poisoning the ngram_jaccard_pairs slope. Each replica i>0 instead
  suffixes every word with ``~i`` — an isomorphic vocabulary rename,
  so intra-replica dup/near-dup structure is preserved EXACTLY (pair
  volume scales 10x linear) while cross-replica shingle spaces are
  disjoint (no artificial twins). Reordering words was tried first
  and is a trap: sorting by any global word order canonicalizes
  docs, turning shared-vocabulary docs into near-dups and blowing
  the candidate count quadratic.
- ``embeddings``: replica i>0 vectors get a deterministic per-element
  perturbation of at most ~1e-3 so replicas aren't bit-identical
  (top-k ties would otherwise depend on row order).

``region``/``nation`` stay at their fixed dimension sizes, exactly as
TPC-H scale factors do.

Usage: python tools/scale_probe.py  (writes BENCH_sf1.json + SCALE.md)
Env: SPARK_GRAFT_SCALE_REPS (default 3), SPARK_GRAFT_SCALE_REPLICAS (10),
SPARK_GRAFT_SCALE_EXTRA (comma-separated non-headline registry queries
to probe alongside the bench set).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from nyc_taxi_data_engineering_spark import catalog  # noqa: E402
from nyc_taxi_data_engineering_spark.queries import all_queries, bench_queries  # noqa: E402
from nyc_taxi_data_engineering_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
OUT = os.path.join(REPO, ".scale_data", "sf1")
OFFSET = 100_000_000

# Key columns to offset per table (dims region/nation excluded: fixed size).
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# Output file-split targets so the sf1 scan parallelizes like real data.
N_FILES = {"lineitem": 16, "orders": 8, "events": 8, "documents": 8, "embeddings": 8}


def _replica(df, table: str, i: int):
    out = df
    for c in KEY_COLS.get(table, []):
        out = out.withColumn(c, F.col(c) + F.lit(i * OFFSET))
    if i == 0:
        return out
    if table == "documents":
        renamed = F.expr(
            f"array_join(transform(split(text, ' '), w -> concat(w, '~{i}')), ' ')"
        )
        out = out.withColumn("text", renamed).withColumn("n_chars", F.length("text"))
    elif table == "embeddings":
        noise = (
            f"cast(pmod(xxhash64(vec_id, {i}, j), 2000) - 1000 as double) / 1000000.0"
        )
        out = out.withColumn(
            "embedding",
            F.expr(f"transform(embedding, (x, j) -> cast(x + {noise} as float))"),
        )
    return out


def build(spark, replicas: int) -> None:
    if os.path.isdir(OUT):
        shutil.rmtree(OUT)
    for table in catalog.TABLES:
        src = catalog.load_table(spark, SRC, table)
        if table in ("region", "nation"):
            out = src
        else:
            out = _replica(src, table, 0)
            for i in range(1, replicas):
                out = out.unionByName(_replica(src, table, i))
        if table in N_FILES:
            out = out.repartition(N_FILES[table])
        out.write.mode("overwrite").parquet(os.path.join(OUT, f"{table}.parquet"))
        print(f"built {table}", file=sys.stderr)


def _run(fn, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    reps = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "3"))
    replicas = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "10"))
    spark = get_spark("scale_probe")
    build(spark, replicas)

    qs = bench_queries()
    extra = [n for n in os.environ.get("SPARK_GRAFT_SCALE_EXTRA", "").split(",") if n]
    if extra:
        reg = all_queries()
        qs.update({n: reg[n] for n in extra})
    warm = qs.get("daily_vendor_revenue") or next(iter(qs.values()))
    _run(warm, spark, SRC)
    _run(warm, spark, OUT)

    small, big = {}, {}
    for name in sorted(qs):
        small[name] = round(statistics.median(_run(qs[name], spark, SRC) for _ in range(reps)), 3)
        big[name] = round(statistics.median(_run(qs[name], spark, OUT) for _ in range(reps)), 3)
        print(f"{name}: sf0.1={small[name]}s sf1={big[name]}s", file=sys.stderr)

    slopes = {n: round(big[n] / small[n], 2) for n in small}
    result = {
        "metric": "sf1_bench_seconds",
        "value": round(sum(big.values()), 3),
        "unit": "sec",
        "queries": big,
        "sf": 1.0,
        "replicas": replicas,
        "reps": reps,
        "sf0.1_queries": small,
        "slopes_x10_data": slopes,
    }
    with open(os.path.join(REPO, "BENCH_sf1.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
