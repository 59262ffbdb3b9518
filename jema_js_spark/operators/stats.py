"""Per-column profile statistics — the dataset-level analog of schema
introspection (SURVEY.md §2.9): null/min/max/cardinality per column in
ONE aggregation pass (map-side combinable, no shuffle beyond the final
single-row reduce).

``approx_count_distinct`` is the HLL-sketch path (constant memory per
column at any scale); exact distinct counts are deliberately not
offered here — at 10^12 rows an exact count-distinct per column is a
full shuffle each.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["column_stats", "column_stats_long", "hll_distinct_agg"]


def hll_distinct_agg(c: str, dtype, rsd: float = 0.02):
    """The engine's ONE HLL-sketch recipe (shared with the contract
    miner, so the two profilers can't drift): long string/binary values
    are pre-hashed to 8 bytes — one xxhash64 pass replaces the sketch's
    internal hashing of the full multi-KB value, same estimate
    distribution.  NULLs must stay NULL (approx_count_distinct skips
    them; xxhash64 of a NULL argument is a non-NULL seed constant)."""
    if isinstance(dtype, (T.StringType, T.BinaryType)):
        hashed = F.when(F.col(c).isNotNull(), F.xxhash64(F.col(c)))
        return F.approx_count_distinct(hashed, rsd)
    return F.approx_count_distinct(c, rsd)


def column_stats(df: DataFrame, cols: Optional[Sequence[str]] = None,
                 rsd: float = 0.02) -> DataFrame:
    """One-row DataFrame of per-column stats: ``<col>_count,
    <col>_nulls, <col>_min, <col>_max, <col>_approx_distinct`` (min/max
    for orderable types only)."""
    if cols is None:
        cols = [f.name for f in df.schema.fields]
    by_name = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        dtype = by_name[c]
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls"))
        aggs.append(hll_distinct_agg(c, dtype, rsd)
                    .alias(f"{c}_approx_distinct"))
        if not isinstance(dtype, (T.ArrayType, T.MapType, T.StructType,
                                  T.BinaryType)):
            aggs.append(F.min(c).alias(f"{c}_min"))
            aggs.append(F.max(c).alias(f"{c}_max"))
    return df.agg(*aggs)


def column_stats_long(df: DataFrame, cols: Optional[Sequence[str]] = None,
                      rsd: float = 0.02) -> DataFrame:
    """Long-format stats: one row per column ``(column, n_rows, n_nulls,
    approx_distinct, min_str, max_str)`` — the metrics-row shape the
    checkpoint ledger stores."""
    if cols is None:
        cols = [f.name for f in df.schema.fields]
    wide = column_stats(df, cols, rsd).collect()[0].asDict()
    rows = []
    for c in cols:
        rows.append((
            c,
            wide["n_rows"],
            wide.get(f"{c}_nulls"),
            wide.get(f"{c}_approx_distinct"),
            str(wide.get(f"{c}_min")) if wide.get(f"{c}_min") is not None else None,
            str(wide.get(f"{c}_max")) if wide.get(f"{c}_max") is not None else None,
        ))
    return df.sparkSession.createDataFrame(
        rows, "column string, n_rows long, n_nulls long, "
              "approx_distinct long, min_str string, max_str string")
