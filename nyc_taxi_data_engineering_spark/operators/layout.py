"""Physical-layout operators: Z-order (Morton) clustering for
multi-dimensional data skipping, and small-file compaction.

Z-ordering is what makes "WHERE a BETWEEN ... AND b BETWEEN ..."
prune files on BOTH columns: sorting by (a, b) gives perfect skipping
on `a` and none on `b`; interleaving the bits of both keys gives good
(bounded-loss) skipping on each. This is the same layout strategy
Delta Lake's OPTIMIZE ZORDER BY and Iceberg's sort-order rewrite use;
here it is expressed as pure DataFrame ops so any parquet table can be
clustered.

Scale design:
- Column normalization uses GLOBAL min/max from one agg (broadcast 1
  row) — a second full pass is avoided by letting the range join ride
  the same scan.
- The z-value is native bit arithmetic (shiftright/&/<<) inside
  whole-stage codegen — no UDF.
- ``repartitionByRange(z)`` does one range shuffle (sampled bounds),
  and ``sortWithinPartitions`` keeps row groups internally ordered so
  parquet page/row-group stats are tight, not just file stats.
- Compaction is metadata-driven: file count targets derive from the
  source byte size, the rewrite is one round-robin shuffle.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

Z_BITS = 16  # per-column resolution: 2^16 cells per dimension


def _normalize_to_grid(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map a numeric column onto the [0, 2^bits) integer grid by global
    min/max scaling (constant columns collapse to cell 0)."""
    cells = (1 << bits) - 1
    span = (hi - lo).cast("double")
    frac = F.when(span > 0, (col.cast("double") - lo.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    return F.least(F.floor(frac * cells).cast("long"), F.lit(cells))


def zvalue(grid_cols: list[Column], bits: int = Z_BITS) -> Column:
    """Morton code: interleave the bits of pre-gridded integer columns
    (col i contributes bit b to output bit b*n + i)."""
    n = len(grid_cols)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, g in enumerate(grid_cols):
            bit = F.shiftright(g, b).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, b * n + i)
    return z


def zorder_cluster(
    df: DataFrame,
    cols: list[str],
    n_files: int,
    bits: int = Z_BITS,
) -> DataFrame:
    """``df`` range-partitioned into ``n_files`` tasks by the Z-order
    of ``cols`` and sorted within each — every output file then covers
    a tight min/max range on EVERY clustered column, so any stats-aware
    sink (parquet footers, the Delta log's per-file ``stats``) can skip
    most files for a filter on any of them."""
    bounds = df.agg(
        *[f(c).alias(f"_{tag}_{c}") for c in cols for tag, f in (("lo", F.min), ("hi", F.max))]
    )
    with_bounds = df.crossJoin(F.broadcast(bounds))  # 1-row bounds side
    grids = [
        _normalize_to_grid(
            F.col(c), F.col(f"_lo_{c}"), F.col(f"_hi_{c}"), bits
        )
        for c in cols
    ]
    return (
        with_bounds.withColumn("_z", zvalue(grids, bits))
        .drop(*[f"_{tag}_{c}" for c in cols for tag in ("lo", "hi")])
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = Z_BITS,
) -> None:
    """Cluster ``df`` by the Z-order of ``cols`` into ``n_files``
    roughly equal range partitions and write parquet. Readers filtering
    on ANY of ``cols`` skip most files via parquet min/max stats."""
    zorder_cluster(df, cols, n_files, bits).write.mode("overwrite").parquet(path)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a fragmented parquet dataset into ~target-sized files;
    returns the output file count. File sizing is computed from source
    metadata (no data pass), the rewrite is one job."""
    df = spark.read.parquet(src)
    # Sum source bytes from the file index (driver-side metadata only).
    from py4j.java_gateway import java_import

    jvm = spark.sparkContext._jvm
    java_import(jvm, "org.apache.hadoop.fs.Path")
    p = jvm.Path(src)
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    total = sum(
        s.getLen()
        for s in fs.listStatus(p)
        if s.getPath().getName().endswith(".parquet")
    )
    n = max(1, math.ceil(total / target_file_bytes))
    df.repartition(n).write.mode("overwrite").parquet(dst)
    return n


def hilbert_step(
    df: DataFrame, b: int, bits: int, x: str = "_hx", y: str = "_hy", d: str = "_hd"
) -> DataFrame:
    """One bit-level of the Hilbert curve transform (classic xy2d:
    quadrant digit + rotation/reflection), as a PROJECTION producing
    fresh columns. Chained projections keep the expression tree linear
    — inlining the step into one nested Column would duplicate x/y
    three times per level (3^bits nodes). CollapseProject leaves the
    chain alone because each alias is referenced more than once by
    non-cheap expressions."""
    s = 1 << b
    n1 = (1 << bits) - 1
    rx = F.shiftright(F.col(x), b).bitwiseAND(F.lit(1))
    ry = F.shiftright(F.col(y), b).bitwiseAND(F.lit(1))
    digit = (rx * 3).bitwiseXOR(ry)
    new_d = F.col(d) + F.lit(s).cast("long") * F.lit(s) * digit
    # ry==0: reflect when rx==1 (about the FULL grid, n-1-v), then swap
    new_x = F.when(ry == 1, F.col(x)).otherwise(
        F.when(rx == 1, F.lit(n1) - F.col(y)).otherwise(F.col(y))
    )
    new_y = F.when(ry == 1, F.col(y)).otherwise(
        F.when(rx == 1, F.lit(n1) - F.col(x)).otherwise(F.col(x))
    )
    return df.withColumns({d: new_d, x: new_x, y: new_y})


def with_hilbert(
    df: DataFrame, xcol: Column, ycol: Column, bits: int = Z_BITS, out: str = "_hd"
) -> DataFrame:
    """Add the Hilbert-curve distance of two pre-gridded integer
    columns as ``out``. Pure native bit arithmetic in codegen (no
    UDF); ``bits`` chained projections."""
    work = df.withColumns(
        {"_hx": xcol.cast("long"), "_hy": ycol.cast("long"), out: F.lit(0).cast("long")}
    )
    for b in range(bits - 1, -1, -1):
        work = hilbert_step(work, b, bits, d=out)
    return work.drop("_hx", "_hy")


def hilbert_cluster(
    df: DataFrame, cols: list[str], n_files: int, bits: int = Z_BITS
) -> DataFrame:
    """Two-dimensional Hilbert clustering — same contract as
    :func:`zorder_cluster` but along the Hilbert curve, which never
    takes the Morton curve's long diagonal jumps: every unit step on
    the curve is a unit step in the grid, so file min/max boxes are
    tighter on average and stats-based skipping prunes at least as
    well. Hilbert costs ``bits`` chained projections instead of
    Morton's one, which only matters at write time."""
    if len(cols) != 2:
        raise ValueError("hilbert_cluster is 2-D; use zorder_cluster for other arities")
    bounds = df.agg(
        *[f(c).alias(f"_{tag}_{c}") for c in cols for tag, f in (("lo", F.min), ("hi", F.max))]
    )
    with_bounds = df.crossJoin(F.broadcast(bounds))
    gx, gy = [
        _normalize_to_grid(F.col(c), F.col(f"_lo_{c}"), F.col(f"_hi_{c}"), bits)
        for c in cols
    ]
    return (
        with_hilbert(with_bounds, gx, gy, bits)
        .drop(*[f"_{tag}_{c}" for c in cols for tag in ("lo", "hi")])
        .repartitionByRange(n_files, "_hd")
        .sortWithinPartitions("_hd")
        .drop("_hd")
    )
