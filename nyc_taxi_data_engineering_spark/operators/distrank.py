"""Scale-safe global ordering primitives: distributed running sums,
row numbers, and NTILE over a total order — WITHOUT the
single-partition window.

``Window.orderBy(...)`` with no partition clause is the one plan shape
Spark itself warns about ("No Partition Defined for Window operation!
Moving all data to a single partition"): every row funnels into ONE
task, so a rank over a grows-with-data grain (events, users,
customers, lineitem) is a hard ceiling at cluster scale no matter how
fast it is locally. This module replaces that shape with the classic
two-phase parallel prefix sum:

1. **Bucket** every row by a broadcast set of approximate quantile
   boundaries of the leading order column (one map-side-combined
   ``percentile_approx`` pass; no full-data shuffle). Bucket ids are
   monotone in the total order by construction, so concatenating
   buckets in id order IS the total order.
2. **Local pass**: one hash-partitioned window per bucket computes the
   within-bucket running sums (and the bucket totals, sharing the same
   exchange + sort).
3. **Offsets**: the per-bucket totals collapse to a ≤``n_buckets``-row
   table; its exclusive prefix (a window over a BOUNDED table — bounded
   by bucket count, not by data) broadcasts back and adds on.

Exactness: the accumulators here are integer/decimal counts and sums —
addition is associative, and since the bucket order refines into the
total order, `local running sum + exclusive bucket offset` equals the
single-partition running sum bit for bit. The boundary placement
(sampled, engine-dependent) only moves rows between buckets; it cannot
change any prefix value, so results are deterministic even though the
bucketing is approximate.

Skew note: a single dominant key value collapses into one bucket (the
same behavior as Spark's own RangePartitioner). That bounds the worst
case at (hottest key group) per task rather than (entire table) per
task — the same guarantee every keyed window in the engine has.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_B = "_dr_bucket"


def string_lead(col: Column | str) -> Column:
    """Order-preserving numeric image of a STRING column for
    ``ordered_prefix``'s ``lead=``: the first 8 BYTES, NUL-right-padded,
    read as a big-endian integer. Monotone non-decreasing in Spark's
    binary (UTF-8) string order — strings sharing an 8-byte prefix
    collapse to one bucket key, which bucketing tolerates.

    ``rpad`` counts CHARACTERS, so a multibyte string can carry more
    than 8 bytes into ``hex``; the ``substring(.., 1, 16)`` then keeps
    exactly the first 8 bytes (16 hex digits — always available, every
    char is >= 1 byte), which both fits ``conv``'s unsigned-64 domain
    (an unbounded hex string overflows ANSI conv) and stays monotone:
    UTF-8 byte order IS Spark's string comparison order."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.hex(F.rpad(c, 8, "\x00")), 1, 16), 16, 10).cast(
        "double"
    )


def descending_lead(col: Column | str) -> Column:
    """Numeric lead for a DESC-ordered leading column: negation flips
    monotonicity, so ``ordered_prefix(..., order_cols=[F.col(c).desc(),
    ...], lead=descending_lead(c))`` buckets correctly."""
    c = F.col(col) if isinstance(col, str) else col
    return -c.cast("double")


def _bucket_col(df: DataFrame, lead: Column, n_buckets: int) -> Column:
    """Monotone bucket id from broadcast approximate quantiles of the
    numeric lead expression. Double-casting keeps ``percentile_approx``
    happy for decimal/long inputs and preserves monotonicity, which is
    the only property bucketing needs."""
    g = lead.cast("double")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.agg(F.percentile_approx(g, F.lit(qs), F.lit(10_000)).alias("b")).first()
    bounds = [b for b in (row["b"] or []) if b is not None]
    # Dedup boundaries: repeated quantiles (skewed data) would otherwise
    # make empty buckets — harmless, but this keeps ids dense.
    uniq: list[float] = []
    for b in bounds:
        if not uniq or b != uniq[-1]:
            uniq.append(b)
    if not uniq:
        return F.lit(0)
    # bucket = number of boundaries <= g : monotone non-decreasing in g,
    # NULLs (if any) sort first in Spark ASC order and get bucket 0 via
    # the coalesce. Evaluated in codegen over a broadcast array literal.
    arr = F.lit(uniq)
    return F.coalesce(
        F.aggregate(
            arr,
            F.lit(0),
            lambda acc, b: acc + F.when(g >= b, F.lit(1)).otherwise(F.lit(0)),
        ),
        F.lit(0),
    )


def ordered_prefix(
    df: DataFrame,
    order_cols: Sequence[str | Column],
    sums: Mapping[str, Column],
    n_buckets: int | None = None,
    lead: Column | None = None,
) -> DataFrame:
    """Return ``df`` with one extra column per ``sums`` entry holding
    the INCLUSIVE global running sum of that expression over the total
    order given by ``order_cols`` — exactly
    ``F.sum(expr).over(Window.orderBy(*order_cols).rowsBetween(unboundedPreceding, 0))``
    but without moving all data to a single partition.

    ``order_cols`` entries are column names (ASC) or Column expressions
    (may carry ``.desc()``); the full tuple should be a total order
    (unique) whenever individual row positions matter — the same
    requirement the single-partition window had for determinism.
    ``lead`` is a NUMERIC expression monotone non-decreasing along that
    total order, used only for bucketing; it defaults to the first
    order column cast to double (correct when that column is a plain
    ASC numeric name — pass :func:`descending_lead` /
    :func:`string_lead` for DESC or string leaders).
    """
    spark = df.sparkSession
    if n_buckets is None:
        try:
            n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        except ValueError:  # e.g. "auto" under some AQE configs
            n_buckets = 32
    if lead is None:
        first = order_cols[0]
        assert isinstance(first, str), (
            "pass lead= explicitly when the leading order column is an "
            "expression (DESC / computed)"
        )
        lead = F.col(first)
    names = list(sums)
    vals = [sums[k].alias(f"_dr_val_{k}") for k in names]
    staged = df.select("*", *vals).withColumn(
        _B, _bucket_col(df, lead, n_buckets)
    )
    w_run = (
        Window.partitionBy(_B)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = staged.select(
        "*",
        *[F.sum(f"_dr_val_{k}").over(w_run).alias(f"_dr_loc_{k}") for k in names],
    )
    # Bucket totals come from a map-side-combined hash aggregate over
    # ``staged``, NOT from a full-partition window frame riding
    # ``local`` (optimization r13): ``local`` — the exchange + per-
    # bucket SORT + running-sum window, the expensive pass — used to
    # feed both the totals and the output join, so the sort+window
    # executed TWICE per call (guide §2.4: don't compute things twice
    # that one cheap pass can provide). A partial-aggregated sum per
    # bucket collapses to ≤ n_buckets rows before its exchange and is
    # bit-identical (same associative sums over the same rows), while
    # the window pass now runs exactly once.
    tots = staged.groupBy(_B).agg(
        *[F.sum(f"_dr_val_{k}").alias(f"_dr_tot_{k}") for k in names]
    )
    # Exclusive prefix across buckets via a triangle self-join over the
    # ≤ n_buckets-row totals table (bounded by config, not data) — NOT
    # a global window, so the helper itself never emits the
    # single-partition WindowExec warning it exists to remove.
    rhs = tots.select(
        F.col(_B).alias("_dr_b2"),
        *[F.col(f"_dr_tot_{k}").alias(f"_dr_t2_{k}") for k in names],
    )
    offs = (
        tots.select(_B)
        .join(rhs, F.col("_dr_b2") < F.col(_B), "left")
        .groupBy(_B)
        .agg(*[F.sum(f"_dr_t2_{k}").alias(f"_dr_off_{k}") for k in names])
    )
    out = local.join(F.broadcast(offs), _B)
    loc_type = {k: local.schema[f"_dr_loc_{k}"].dataType for k in names}
    return out.select(
        *df.columns,
        *[
            (F.col(f"_dr_loc_{k}") + F.coalesce(F.col(f"_dr_off_{k}"), F.lit(0)))
            .cast(loc_type[k])
            .alias(k)
            for k in names
        ],
    )


def global_row_number(
    df: DataFrame,
    order_cols: Sequence[str | Column],
    out: str = "rn",
    n_buckets: int | None = None,
    lead: Column | None = None,
) -> DataFrame:
    """``row_number() OVER (ORDER BY order_cols)`` (which must be a
    total order for the numbering to be well-defined) as a distributed
    prefix count; returns ``df`` + bigint column ``out``. NULL lead
    values land in the first bucket (ASC NULLS FIRST semantics) — for
    DESC leaders pass a NULL-free ``lead``."""
    res = ordered_prefix(
        df, order_cols, {out: F.lit(1).cast("bigint")}, n_buckets, lead=lead
    )
    return res.withColumn(out, F.col(out).cast("bigint"))


def ntile_from_rn(rn: Column, n: Column, k: int) -> Column:
    """Exact NTILE(k) bucket for global row number ``rn`` of ``n`` total
    rows, as pure integer arithmetic (matches Spark/DuckDB/ANSI: the
    first ``n % k`` buckets get ``n div k + 1`` rows). Lets a decile
    assignment ride a distributed row number instead of a
    single-partition ntile window. Integer divisions go through IEEE
    doubles, exact for n < 2^53 (nine decades above a 100 TB row
    count)."""
    rn = rn.cast("bigint")
    n = n.cast("bigint")
    base = (n / k).cast("bigint")  # n div k: n,k >= 0
    rem = n % k
    cut = rem * (base + 1)
    # ceil(a/b) = (a + b - 1) div b for positive ints; CASE keeps the
    # base=0 (n < k) path from ever evaluating the second branch.
    first = ((rn + base) / (base + 1)).cast("bigint")
    rest = rem + ((rn - cut + base - 1) / base).cast("bigint")
    return F.when(rn <= cut, first).otherwise(rest).cast("int")
