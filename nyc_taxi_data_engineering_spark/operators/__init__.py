"""Dataflow operators — pure DataFrame -> DataFrame functions.

Each module hosts one operator family from SURVEY.md §2; composition
happens in plans/ (pipelines) and queries/ (the correctness surface).
"""

from pyspark.sql import DataFrame


def pin(df: DataFrame) -> DataFrame:
    """Eagerly materialize ``df`` and TRUNCATE its lineage
    (``localCheckpoint(eager=True)``) — the shared lever for the
    fixed-point operators (graph analytics, Lloyd k-means, GD probe
    training, BPE, pointer-doubling CC).

    Iterative loops re-reference loop-invariant inputs and per-round
    state 2-3x per round; lazily the logical plan grows by a full round
    every iteration (branching where state has multiple consumers), so
    round r re-executes the whole chain back to round 0 once per
    consumer — and per-round ``.cache()`` does NOT stop it (the cache
    manager's plan-matching itself walks the exponentially-growing
    tree; measured on the sf0.1 co-purchase graph it made HITS >10x
    slower while the uncached k-core peel spent 207 s re-deriving its
    kNN edge build 3^rounds times). An eager local checkpoint computes
    the state once, keeps the partitions, and hands every consumer a
    flat scan (k-core 207 -> ~8 s, HITS 43 -> ~9 s at sf0.1).

    Cluster note: ``localCheckpoint`` stores partitions on executors —
    the right single-job trade. On a long-lived 1000-executor pipeline
    where executor loss mid-query must be survivable, swap for
    ``sparkContext.setCheckpointDir(...)`` + ``df.checkpoint()`` (same
    semantics, HDFS-backed). Values are unchanged either way, so the
    decimal-grid determinism contracts are untouched."""
    return df.localCheckpoint(eager=True)


# ---------------------------------------------------------------------------
# Session cache registry (optimization r13 — VERDICT r12 "What's wrong" #2):
# operators that persist() a reusable layout (ALS ratings, CC edge lists,
# simhash proxies, probe/PCA corpora) register it here so callers can
# RELEASE executor storage when the query is done. persist() alone leaks
# for the life of the session — local benches hide it behind
# catalog.clearCache(), but a long-lived multi-tenant job at 100 TB holds
# storage memory forever (guide §5 "unpersist when done").
#
# Contract: an operator calls ``session_cache(df)`` instead of
# ``df.persist()``; the application calls ``release_session_caches()``
# after the terminal action of the queries that used those operators
# (bench.py does so between reps and between board2 queries). Releasing
# is always SAFE — a released DataFrame recomputes from lineage — so the
# registry can be drained at any query boundary.
# ---------------------------------------------------------------------------

_SESSION_CACHES: list[DataFrame] = []


def session_cache(df: DataFrame) -> DataFrame:
    """``df.persist()`` + registration for :func:`release_session_caches`.
    Returns the persisted DataFrame (MEMORY_AND_DESERIALIZED default —
    the InMemoryRelation keeps size stats and outputPartitioning, the
    planner levers the r12 optimizations rely on)."""
    df = df.persist()
    _SESSION_CACHES.append(df)
    return df


def release_session_caches() -> int:
    """Unpersist every registered cache (LIFO); returns how many were
    released. Idempotent — an already-unpersisted DataFrame is a no-op."""
    n = 0
    while _SESSION_CACHES:
        df = _SESSION_CACHES.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n
