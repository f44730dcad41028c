"""Session-cache lifecycle (optimization r13, VERDICT r12 task 8):
operators that persist() reusable layouts register them with
operators.session_cache so callers can release executor storage at
query boundaries — the contract bench.py drains between reps."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_data_engineering_spark.operators import (
    _SESSION_CACHES,
    release_session_caches,
    session_cache,
)


def test_session_cache_registers_and_releases(spark):
    release_session_caches()  # drain whatever earlier tests left
    df = session_cache(spark.range(100).select(F.col("id")))
    assert df.count() == 100
    assert df.storageLevel.useMemory  # persisted
    assert len(_SESSION_CACHES) == 1
    n = release_session_caches()
    assert n == 1
    assert not _SESSION_CACHES
    assert not df.storageLevel.useMemory  # released
    # released frames recompute from lineage — values unaffected
    assert df.count() == 100


def test_release_is_idempotent_and_lifo(spark):
    release_session_caches()
    a = session_cache(spark.range(10))
    b = session_cache(spark.range(20))
    assert a.count() == 10 and b.count() == 20
    assert release_session_caches() == 2
    assert release_session_caches() == 0


def test_operators_register_their_persists(spark):
    """The three r12 persist sites (ALS ratings, CC edge list, simhash
    proxy) must flow through the registry so a session can release
    them (VERDICT r12: they previously leaked for the session's life)."""
    from nyc_taxi_data_engineering_spark.operators.als import prepare_ratings
    from nyc_taxi_data_engineering_spark.operators.dedup import (
        connected_components,
        simhash_neardup_pairs,
    )

    release_session_caches()
    ratings = spark.createDataFrame(
        [(1, 1, 3), (1, 2, 1), (2, 1, 2)], "u int, i int, r int"
    )
    prepared = prepare_ratings(ratings)
    assert prepared.count() == 3
    edges = spark.createDataFrame([(1, 2), (2, 3)], "a_id int, b_id int")
    comp = connected_components(edges)
    assert comp.count() == 3
    sim = spark.createDataFrame(
        [(1, 7), (2, 7)], "doc_id int, simhash long"
    )
    pairs = simhash_neardup_pairs(sim)
    assert pairs.count() == 1
    assert len(_SESSION_CACHES) >= 3
    assert release_session_caches() >= 3
    assert not _SESSION_CACHES
