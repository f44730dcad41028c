from __future__ import annotations


def test_funnel_monotonically_narrows(spark, sf_dir):
    from nyc_taxi_data_engineering_spark.queries.curation import q_corpus_curation_funnel

    rows = sorted(
        q_corpus_curation_funnel(spark, sf_dir).collect(), key=lambda r: r["stage_no"]
    )
    counts = [r["rows_kept"] for r in rows]
    assert [r["stage"] for r in rows] == [
        "raw", "lang_en", "quality_ge_min", "exact_canonical", "neardup_canonical",
    ]
    assert counts == sorted(counts, reverse=True)  # never grows
    assert counts[0] > counts[-1] > 0  # funnel actually filters


def test_dsir_prefers_target_like_docs(spark):
    """Docs drawn from the target slice's vocabulary must outscore
    docs from a disjoint vocabulary: the target slice defines p, so
    its own n-gram buckets carry positive log-ratios."""
    from pyspark.sql import functions as F

    from nyc_taxi_data_engineering_spark.queries.dsir import (
        DSIR_TARGET_SOURCE,
        doc_features,
    )

    # 4 target docs (wiki-ish vocab), 4 raw docs sharing that vocab,
    # 4 raw docs with disjoint vocab.
    wiki = "the quick brown fox jumps over the lazy dog again and again"
    web = "buy cheap pills now click here winner prize claim fast money"
    rows = (
        [(i, wiki, DSIR_TARGET_SOURCE) for i in range(4)]
        + [(10 + i, wiki, "src9") for i in range(4)]
        + [(20 + i, web, "src9") for i in range(4)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    feats = doc_features(docs)
    # feature stream: unigrams + bigrams with multiplicity
    expected = {i: 2 * len(t.split()) - 1 for i, t, _ in rows}
    per_doc = feats.groupBy("doc_id").count().collect()
    assert {r["doc_id"]: r["count"] for r in per_doc} == expected
    assert feats.select(F.min("bucket"), F.max("bucket")).first()[1] < 256


def test_dsir_weights_separate_target_slice(spark, sf_dir):
    """At corpus scale the target slice (src1) must outscore the rest
    on average — its own feature distribution IS p."""
    from pyspark.sql import functions as F

    from nyc_taxi_data_engineering_spark.catalog import load_table
    from nyc_taxi_data_engineering_spark.queries.dsir import (
        DSIR_TARGET_SOURCE,
        q_dsir_importance_docs,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    scored = q_dsir_importance_docs(spark, sf_dir).join(docs, "doc_id")
    means = dict(
        scored.groupBy(F.col("source") == DSIR_TARGET_SOURCE)
        .agg(F.avg("avg_log_ratio"))
        .collect()
    )
    assert means[True] > means[False]
