"""Custom Python DataSource (triplog) protocol semantics: bit-exact
roundtrip, per-file read parallelism, overwrite vs append, tmp-file
hygiene after commit, and parse-error reporting."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_engineering_spark.sources.triplog import HEADER, register


@pytest.fixture()
def trips(spark):
    register(spark)
    return spark.range(0, 120).select(
        F.col("id").alias("trip_id"),
        F.concat(F.lit("v"), (F.col("id") % 3).cast("string")).alias("vendor"),
        F.timestamp_seconds(F.col("id") * 3937).alias("ts"),
        (F.col("id") * 0.12345678901234567).alias("distance_km"),
        (F.col("id") * 1.01).alias("fare"),
    )


def test_bit_exact_roundtrip(spark, trips, tmp_path):
    d = str(tmp_path / "t")
    trips.write.format("triplog").mode("overwrite").save(d)
    back = spark.read.format("triplog").load(d)
    assert back.exceptAll(trips).count() == 0
    assert trips.exceptAll(back).count() == 0


def test_one_partition_per_file(spark, trips, tmp_path):
    d = str(tmp_path / "t")
    trips.repartition(5).write.format("triplog").mode("overwrite").save(d)
    files = [f for f in os.listdir(d) if f.endswith(".triplog")]
    assert len(files) == 5
    assert spark.read.format("triplog").load(d).rdd.getNumPartitions() == 5


def test_overwrite_replaces_append_accumulates(spark, trips, tmp_path):
    d = str(tmp_path / "t")
    trips.write.format("triplog").mode("overwrite").save(d)
    trips.limit(10).write.format("triplog").mode("overwrite").save(d)
    assert spark.read.format("triplog").load(d).count() == 10
    trips.limit(5).write.format("triplog").mode("append").save(d)
    assert spark.read.format("triplog").load(d).count() == 15


def test_no_tmp_files_survive_commit(spark, trips, tmp_path):
    d = str(tmp_path / "t")
    trips.write.format("triplog").mode("overwrite").save(d)
    assert not [f for f in os.listdir(d) if f.endswith(".tmp")]


def test_bad_header_and_bad_record_raise(spark, trips, tmp_path):
    d = tmp_path / "t"
    d.mkdir()
    (d / "bad.triplog").write_text("#wrong header\n1|v|2020-01-01T00:00:00|1.0|2.0\n")
    with pytest.raises(Exception, match="unsupported header"):
        spark.read.format("triplog").load(str(d)).collect()
    (d / "bad.triplog").write_text(HEADER + "\n1|v|2020-01-01T00:00:00|1.0\n")
    with pytest.raises(Exception, match="expected 5 fields"):
        spark.read.format("triplog").load(str(d)).collect()


def _write_batch(d, seq: int, rows: list[str]) -> None:
    p = d / f"batch-{seq:04d}.triplog"
    p.write_text(HEADER + "\n" + "".join(r + "\n" for r in rows))


def test_stream_tails_new_files_exactly_once(spark, tmp_path):
    """readStream over a triplog dir: each micro-batch consumes only
    files past the lexicographic watermark — no re-reads, no misses —
    and a restart from the checkpoint does not re-emit old rows."""
    register(spark)
    src = tmp_path / "stream_src"
    src.mkdir()
    out = tmp_path / "sink"
    ckpt = str(tmp_path / "ckpt")
    _write_batch(src, 1, ["1|v0|2020-01-01T00:00:00|1.5|10.0"])
    _write_batch(src, 2, ["2|v1|2020-01-01T01:00:00|2.5|20.0",
                          "3|v0|2020-01-01T02:00:00|3.5|30.0"])

    def run_until(n_expected):
        q = (
            spark.readStream.format("triplog").load(str(src))
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.read.parquet(str(out))
        assert got.count() == n_expected, got.collect()
        return got

    run_until(3)
    # new file arrives; restarted query emits ONLY the new rows
    _write_batch(src, 3, ["4|v1|2020-01-01T03:00:00|4.5|40.0"])
    got = run_until(4)
    assert sorted(r.trip_id for r in got.collect()) == [1, 2, 3, 4]
