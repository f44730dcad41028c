"""Geospatial operators: deterministic point derivation, grid-cell
binning, local flat-projection distance, and a cell-bucketed radius
self-join — the zone/OD-flow layer a trip-data engine needs.

Reference parity: the reference's domain is NYC trip records keyed by
pickup/dropoff location (see /root/reference — zone lookups and OD
aggregation are the canonical taxi analytics); the synthetic star
schema carries no coordinates, so points are derived md5-deterministic
per key inside a pinned NYC bounding box. Both engines derive the SAME
doubles from the same parquet keys, so every downstream comparison is
exact — the derivation is the fixture, the operators are the product.

Cross-engine determinism contract (no libm trig anywhere):
- uniform draw  u = ('0x'||substr(md5(salt||key),1,8))::BIGINT / 2^32 —
  integer arithmetic + one exact power-of-two division;
- point         lat = LAT0 + u_lat * LAT_SPAN (IEEE mul+add, identical
  operand order in Spark and DuckDB → bit-identical doubles);
- distance      sqrt((dlat*KM_PER_DEG_LAT)^2 + (dlon*KM_PER_DEG_LON)^2)
  — an equirectangular local projection with PINNED per-axis constants
  (no cos() at query time). sqrt is IEEE correctly-rounded, so the
  distance double is bit-identical cross-engine. Error vs true
  haversine is <0.3% inside the 0.37°-tall box — documented tolerance,
  not drift.
- cell          floor(lat / CELL) — exact division + floor.

100 TB design: the radius self-join is the pattern that matters. A
naive "pairs within R km" is a cross join (fatal); here each point
lands in exactly one grid cell sized ≥ R per axis, the left side
explodes its 3×3 neighbor-cell keys, and candidates come from one
hash-partitioned equi-join on (cx, cy) — candidate volume is
density-bounded (points-per-cell × 9), never O(n²). The exact distance
predicate then filters candidates; because a point has exactly one
cell, each pair is produced at most once (no post-join dedup). The
brute-force oracle in queries/geoq.py doubles as a losslessness proof.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Pinned NYC-ish bounding box and local projection constants.
LAT0 = 40.55
LAT_SPAN = 0.37
LON0 = -74.05
LON_SPAN = 0.35
KM_PER_DEG_LAT = 111.32
KM_PER_DEG_LON = 84.35  # 111.32 * cos(40.74 deg), pinned as a literal

_TWO32 = 4294967296.0


def _unit(salt: str, key: Column) -> Column:
    """md5-deterministic uniform double in [0, 1): bit-identical to the
    DuckDB twin ('0x'||substr(md5(salt||key),1,8))::BIGINT / 2^32."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(_TWO32)


def derive_point(df: DataFrame, key, salt: str, prefix: str) -> DataFrame:
    """Add ``{prefix}_lat`` / ``{prefix}_lon`` derived from md5(salt||key).

    Two independent draws (salt||key and salt||'~'||key) so lat and lon
    are uncorrelated. Pure projection — stays in whole-stage codegen.
    """
    key_col = F.col(key) if isinstance(key, str) else key
    lat = F.lit(LAT0) + _unit(salt, key_col) * F.lit(LAT_SPAN)
    lon = F.lit(LON0) + _unit(salt + "~", key_col) * F.lit(LON_SPAN)
    return df.withColumn(f"{prefix}_lat", lat).withColumn(f"{prefix}_lon", lon)


def derive_point_sql(key_expr: str, salt: str, prefix: str) -> str:
    """DuckDB twin of :func:`derive_point` — two SELECT-list items."""

    def unit(s: str) -> str:
        return (
            f"(('0x' || substr(md5('{s}' || CAST({key_expr} AS VARCHAR)), 1, 8))::BIGINT"
            f" / {_TWO32})"
        )

    return (
        f"{LAT0} + {unit(salt)} * {LAT_SPAN} AS {prefix}_lat, "
        f"{LON0} + {unit(salt + '~')} * {LON_SPAN} AS {prefix}_lon"
    )


def distance_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Equirectangular local distance in km (pinned constants, see module
    docstring). Bit-identical cross-engine: *, -, + are IEEE-exact on
    identical operands and sqrt is correctly rounded."""
    dns = (lat1 - lat2) * F.lit(KM_PER_DEG_LAT)
    dew = (lon1 - lon2) * F.lit(KM_PER_DEG_LON)
    return F.sqrt(dns * dns + dew * dew)


def distance_km_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """DuckDB twin of :func:`distance_km` (identical operand order)."""
    dns = f"(({lat1} - {lat2}) * {KM_PER_DEG_LAT})"
    dew = f"(({lon1} - {lon2}) * {KM_PER_DEG_LON})"
    return f"sqrt({dns} * {dns} + {dew} * {dew})"


def cell(coord: Column, size: float) -> Column:
    """Grid-cell index: floor(coord / size) — exact division + floor."""
    return F.floor(coord / F.lit(size)).cast("int")


def cell_sql(coord: str, size: float) -> str:
    return f"CAST(floor({coord} / {size}) AS INT)"


def radius_pairs(
    points: DataFrame,
    id_col: str,
    radius_km: float,
    cell_lat_deg: float,
    cell_lon_deg: float,
) -> DataFrame:
    """All unordered pairs of points within ``radius_km``, via the
    neighbor-cell equi-join (no cross join, no post-join dedup).

    ``points`` must carry ``id_col``, ``lat``, ``lon``. Cell sizes must
    be >= radius_km per axis (asserted), so every qualifying pair is
    within one cell step on each axis — the 3x3 neighbor explode is
    exhaustive. Returns (id_a, id_b, dist_km) with id_a < id_b.
    """
    if cell_lat_deg * KM_PER_DEG_LAT < radius_km or cell_lon_deg * KM_PER_DEG_LON < radius_km:
        raise ValueError("grid cells must be at least radius_km on each axis")
    pts = points.select(
        F.col(id_col).alias("_id"),
        "lat",
        "lon",
        cell(F.col("lat"), cell_lat_deg).alias("_cy"),
        cell(F.col("lon"), cell_lon_deg).alias("_cx"),
    )
    offsets = F.expr(
        "explode(array(struct(-1 as dy, -1 as dx), struct(-1 as dy, 0 as dx),"
        " struct(-1 as dy, 1 as dx), struct(0 as dy, -1 as dx), struct(0 as dy, 0 as dx),"
        " struct(0 as dy, 1 as dx), struct(1 as dy, -1 as dx), struct(1 as dy, 0 as dx),"
        " struct(1 as dy, 1 as dx)))"
    )
    left = (
        pts.select("_id", "lat", "lon", "_cy", "_cx", offsets.alias("_o"))
        .withColumn("_jy", F.col("_cy") + F.col("_o.dy"))
        .withColumn("_jx", F.col("_cx") + F.col("_o.dx"))
    )
    right = pts.select(
        F.col("_id").alias("_idb"),
        F.col("lat").alias("_latb"),
        F.col("lon").alias("_lonb"),
        F.col("_cy").alias("_jy"),
        F.col("_cx").alias("_jx"),
    )
    d = distance_km(F.col("lat"), F.col("lon"), F.col("_latb"), F.col("_lonb"))
    return (
        left.join(right, ["_jy", "_jx"])
        .filter(F.col("_id") < F.col("_idb"))
        .withColumn("dist_km", d)
        .filter(F.col("dist_km") <= F.lit(radius_km))
        .select(F.col("_id").alias("id_a"), F.col("_idb").alias("id_b"), "dist_km")
    )
