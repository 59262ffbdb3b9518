"""Referential-integrity checks — the reference's ``x_foreign``
extension keyword (declared in tests/toSql.html:52-59, mapped at
tools/toSql.js) lifted to dataset scope (SURVEY.md §2.9).

Scale design: the manifest/dimension side is broadcast
(``F.broadcast``) so the fact-side scan never shuffles — a left-anti
broadcast hash join is a map-only operation at any fact cardinality.
For fact-to-fact FK checks (both sides huge) use ``broadcast=False``
and AQE picks the join strategy.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["fk_violations", "fk_report", "ts_window_violations"]


def fk_violations(fact: DataFrame, fact_key, dim: DataFrame, dim_key,
                  broadcast: bool = True) -> DataFrame:
    """Fact rows whose key has no match in the dimension (orphans)."""
    fk = F.col(fact_key) if isinstance(fact_key, str) else fact_key
    dk = F.col(dim_key) if isinstance(dim_key, str) else dim_key
    dim_keys = dim.select(dk.alias("__dim_key")).dropDuplicates()
    if broadcast:
        dim_keys = F.broadcast(dim_keys)
    return fact.join(dim_keys, fk.eqNullSafe(F.col("__dim_key")), "left_anti")


def fk_report(fact: DataFrame, fact_key, dim: DataFrame, dim_key,
              broadcast: bool = True) -> dict:
    orphans = fk_violations(fact, fact_key, dim, dim_key, broadcast).count()
    total = fact.count()
    return {"n_rows": total, "n_orphans": orphans, "ok": orphans == 0}


def ts_window_violations(pages: DataFrame, ts_col: str,
                         manifest: DataFrame, window_col: str,
                         window_seconds: int = 86400) -> DataFrame:
    """warc_ts → crawl-manifest window check (FIXTURES.md §2.3): a
    timestamp is valid iff it falls inside one of the manifest's
    windows.  The join key is the truncated window start, so this stays
    an equi-join (broadcastable), not a range join."""
    bucket = (F.unix_timestamp(F.col(ts_col)) / window_seconds).cast("long")
    win = (F.unix_timestamp(F.col(window_col)) / window_seconds).cast("long")
    windows = F.broadcast(manifest.select(win.alias("__win")).dropDuplicates())
    return (pages.withColumn("__bucket", bucket)
            .join(windows, F.col("__bucket") == F.col("__win"), "left_anti")
            .drop("__bucket"))
