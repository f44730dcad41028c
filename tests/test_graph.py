"""PageRank (operators/graph.py): fixed-point invariants and mass
conservation on hand-built graphs."""

from __future__ import annotations

from nyc_taxi_data_engineering_spark.operators.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_pagerank_cycle_is_uniform_fixed_point(spark):
    """On a 3-cycle the uniform distribution is the fixed point; with
    the 12-dp rounding contract the rank is exactly 0.333333333333
    from iteration 1 onward."""
    ranks = {r["node"]: r["rank"] for r in pagerank(_edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])).collect()}
    assert ranks == {"a": 0.333333333333, "b": 0.333333333333, "c": 0.333333333333}


def test_pagerank_hub_ranks_highest_and_mass_conserved(spark):
    """a->h, b->h, h->a, h->b: the hub absorbs both spokes' full rank
    each round, so it must rank strictly higher; with no dangling
    nodes total mass stays 1 (up to the 12-dp rounding)."""
    ranks = {
        r["node"]: r["rank"]
        for r in pagerank(_edges(spark, [("a", "h"), ("b", "h"), ("h", "a"), ("h", "b")])).collect()
    }
    assert ranks["h"] > ranks["a"] == ranks["b"]
    assert abs(sum(ranks.values()) - 1.0) < 1e-9


def test_pagerank_iters_zero_is_uniform_start(spark):
    ranks = {r["node"]: r["rank"] for r in pagerank(_edges(spark, [("a", "b"), ("b", "a")]), iters=0).collect()}
    assert ranks == {"a": 0.5, "b": 0.5}
