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
