"""Z-order (Morton) clustering expression for multi-column file skipping.

Linear clustering (`cluster_by` = range-repartition + sort) gives the
FIRST column tight per-file min/max; every later column's stats span
the domain, so only leading-column predicates prune. Z-ordering maps
each row to a point on a Morton space-filling curve over quantile
buckets of ALL cluster columns, then range-partitions + sorts by that
z-value: every file covers a small hyper-rectangle, so min/max prunes
on ANY clustered column (Delta OSS OPTIMIZE ZORDER BY's construction:
range-bucket per dimension from a sample, interleave the bucket bits).

Everything is built-in Column expressions — the bucket CASE chains and
the bit interleave stay inside whole-stage codegen; the only driver
work is one approxQuantile sample per column at WRITE time.

Bucketing is quantile-based (equi-depth), not uniform-width: skewed
columns (long-tail user ids, bursty timestamps) still split into
balanced buckets, so no single z-prefix swallows the table.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, TimestampNTZType, TimestampType

# 4 bits/dimension = 16 equi-depth buckets per column. With the
# default 2-3 cluster columns that is 256-4096 distinct z-values —
# enough resolution that a file (one range-partition) covers a few
# hyper-rectangle cells, while the quantile sample stays tiny.
ZORDER_BITS = 4


def _as_double(df: DataFrame, col: str) -> Column:
    """Order-preserving double view of a zorderable column. int64
    beyond 2^53 loses ULP precision — irrelevant for BUCKETING (a
    boundary misassignment moves a row one bucket over; stats stay
    correct because they are collected from the real file contents)."""
    dt = df.schema[col].dataType
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        # NTZ lacks unix_micros; the session TZ is pinned UTC, so the
        # cast-to-TZ detour is order-preserving and value-exact
        return F.unix_micros(F.col(col).cast("timestamp")).cast("double")
    if isinstance(dt, NumericType):
        return F.col(col).cast("double")
    raise ValueError(
        f"zorder column {col!r} has type {dt.simpleString()}: only "
        "numeric/timestamp columns are zorderable (hash or dictionary-"
        "encode strings to a numeric surrogate first)"
    )


def _bucket(expr: Column, bounds: list[float]) -> Column:
    """Equi-depth bucket id = number of boundaries <= value, as a
    codegen-friendly CASE chain. NULLs sort into bucket 0."""
    return functools.reduce(
        lambda acc, b: acc + F.when(expr >= F.lit(b), 1).otherwise(0),
        bounds,
        F.lit(0),
    )


def zorder_column(df: DataFrame, cols: list[str], bits: int = ZORDER_BITS) -> Column:
    """The Morton z-value Column for ``cols`` over ``df``.

    Runs one approxQuantile per column (driver-side, sampled — the
    same mechanism repartitionByRange uses to pick its boundaries) to
    fix the equi-depth bucket bounds, then interleaves the bucket
    bits: z = Σ_{bit j, col i} bucket_i[j] << (j*ncols + i), so the
    high bits alternate between dimensions and nearby z-values are
    nearby in EVERY dimension."""
    if not cols:
        raise ValueError("zorder needs at least one column")
    n_buckets = 1 << bits
    qs = [i / n_buckets for i in range(1, n_buckets)]
    buckets = []
    for c in cols:
        dbl = _as_double(df, c)
        bounds = df.select(dbl.alias("_zq")).na.drop().stat.approxQuantile(
            "_zq", qs, 0.01
        )
        # dedupe plateau boundaries (heavy hitters collapse quantiles)
        uniq = sorted(set(bounds))
        buckets.append(_bucket(dbl, uniq))
    return interleave_bits(buckets, bits)


def interleave_bits(buckets: list[Column], bits: int = ZORDER_BITS) -> Column:
    """Morton interleave: bit j of bucket i lands at position
    j*n + i, so the curve alternates dimensions from the low bit up."""
    n = len(buckets)
    z = F.lit(0)
    for j in range(bits):
        for i, b in enumerate(buckets):
            z = z + F.shiftleft(
                F.shiftright(b, j).bitwiseAND(F.lit(1)), j * n + i
            )
    return z
