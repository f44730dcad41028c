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
