"""Checkpoint/resume ledger: per-partition lineage + metrics rows so a
killed validation job resumes without recomputing completed partitions
(SURVEY.md §7.1 step 6; north-rule resumability requirement).

Design: plain library code over a parquet state table (the Iceberg
analog in this sandbox — the layout is a drop-in for an Iceberg table):

- the *unit of work* is a logical partition key (e.g. ``days(warc_ts)``
  — the Iceberg partition), not a Spark task id, so resume survives
  repartitioning and cluster-size changes;
- each completed unit appends one ledger row
  ``(run_id, partition_key, status, metrics_json, updated_at)`` —
  append-only, partition-atomic (one parquet append per unit batch);
- on restart, the planner anti-joins the todo list against completed
  keys (the ledger is tiny → broadcast).
"""

from __future__ import annotations

import json
import time
from typing import Callable, Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["CheckpointLedger", "run_partitioned",
           "hive_partition_keys", "iceberg_partition_keys"]

_LEDGER_SCHEMA = ("run_id string, partition_key string, status string, "
                  "metrics_json string, updated_at double")

# ledger key for the null partition (rows whose partition column is
# NULL — Hive's __HIVE_DEFAULT_PARTITION__).  A plain str(None) key
# would filter `col == "None"` and silently process zero rows.
NULL_KEY = "__null__"


class CheckpointLedger:
    def __init__(self, spark: SparkSession, path: str, run_id: str) -> None:
        self.spark = spark
        self.path = path
        self.run_id = run_id

    def completed_keys(self) -> List[str]:
        try:
            df = self.spark.read.parquet(self.path)
        except Exception:
            return []
        return [r["partition_key"] for r in
                df.filter((F.col("run_id") == self.run_id)
                          & (F.col("status") == "done"))
                .select("partition_key").distinct().collect()]

    def mark_done(self, partition_key: str, metrics: Optional[dict] = None) -> None:
        row = [(self.run_id, partition_key, "done",
                json.dumps(metrics or {}), time.time())]
        (self.spark.createDataFrame(row, _LEDGER_SCHEMA)
         .coalesce(1).write.mode("append").parquet(self.path))

    def metrics(self) -> DataFrame:
        return (self.spark.read.parquet(self.path)
                .filter(F.col("run_id") == self.run_id))


def hive_partition_keys(spark: SparkSession, path: str,
                        col: str) -> Callable[[], List[str]]:
    """Key provider reading a hive-layout table's partition values from
    the FILESYSTEM LISTING (``<path>/<col>=<value>/`` directories) —
    metadata-only, no data scan, any Hadoop-compatible filesystem
    (local, HDFS, s3a).  The cluster-scale analog of reading a
    catalog's partition metadata for plain partitioned parquet."""
    from urllib.parse import unquote

    def provider() -> List[str]:
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(conf)
        prefix = f"{col}="
        out = []
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if st.isDirectory() and name.startswith(prefix):
                raw = name[len(prefix):]
                # directory names carry Hive %xx escaping (round-6
                # review find: filtering on the ESCAPED value matches
                # zero rows and the ledger marks the day done anyway);
                # the null partition is returned as None — the planner
                # maps it to its sentinel and can then detect a GENUINE
                # value colliding with that sentinel
                out.append(None if raw == "__HIVE_DEFAULT_PARTITION__"
                           else unquote(raw))
        return sorted(out, key=lambda k: (k is None, str(k)))
    return provider


def iceberg_partition_keys(spark: SparkSession, table: str,
                           field: str) -> Callable[[], List[str]]:
    """Key provider reading an Iceberg table's ``.partitions`` metadata
    table — the catalog knows every partition value without touching a
    data file (SCALE.md: the distinct scan is correct but wasteful at
    10^6 partitions).  Requires a real Iceberg catalog; in this
    sandbox it exists for the deploy surface and is exercised against
    a catalog-less session only for its loud failure."""
    def provider() -> List[str]:
        rows = spark.sql(
            f"SELECT DISTINCT partition.`{field}` AS k "
            f"FROM {table}.partitions").collect()
        # raw values, NOT str(): a NULL partition must reach
        # run_partitioned as None so its NULL_KEY mapping (and the
        # isNull filter) fires — str(None) would filter col=='None',
        # process zero rows, and mark the day done (silent skip)
        return sorted((r["k"] for r in rows),
                      key=lambda k: (k is None, str(k)))
    return provider


def run_partitioned(spark: SparkSession, df: DataFrame, partition_col,
                    ledger: CheckpointLedger,
                    work: Callable[[DataFrame, str], dict],
                    key_provider: Optional[Callable[[], List[str]]] = None,
                    ) -> Dict[str, dict]:
    """Run ``work(slice_df, key)`` once per distinct value of
    ``partition_col``, skipping keys the ledger already marks done.

    ``work`` returns a metrics dict; it is recorded in the ledger row.
    ``key_provider`` (round 6, VERDICT r5 #7) supplies the todo list
    from metadata — :func:`hive_partition_keys` (directory listing) or
    :func:`iceberg_partition_keys` (catalog partitions table) — so a
    10^6-partition table doesn't pay a distinct scan just to plan;
    without one, keys fall back to one small distinct query over the
    input."""
    pcol = F.col(partition_col) if isinstance(partition_col, str) else partition_col
    if key_provider is not None:
        raw = list(key_provider())
    else:
        raw = [r["__pk"] for r in
               df.select(pcol.cast("string").alias("__pk"))
               .distinct().collect()]
    # a GENUINE partition value equal to the null sentinel would be
    # filtered as isNull → zero rows processed, ledger marks it done —
    # the exact silent skip the sentinel exists to prevent.  Refuse
    # loudly: that value space needs a different sentinel, not a guess.
    if NULL_KEY in raw:
        raise ValueError(
            f"partition value collides with the null sentinel "
            f"{NULL_KEY!r}; rename the value or use a custom ledger key")
    # Filter on the RAW typed value, not its Python str() (round-7
    # review find): Python str() and Spark CAST disagree for some
    # types — str(True) is 'True' while CAST(true AS STRING) renders
    # 'true', so a `cast(col as string) == str(k)` filter matches zero
    # rows and the ledger marks the partition done having processed
    # nothing (the same silent-skip class the NULL_KEY sentinel
    # exists to prevent).  `pcol == F.lit(k)` compares in the column's
    # own type (string provider keys coerce Spark-side).  Distinct raw
    # values that stringify to the same ledger key would be
    # indistinguishable on resume — refuse loudly.
    by_key: Dict[str, object] = {}
    for k in raw:
        key = NULL_KEY if k is None else str(k)
        if key in by_key and by_key[key] != k:
            raise ValueError(
                f"distinct partition values {by_key[key]!r} and {k!r} "
                f"both stringify to ledger key {key!r}; use a custom "
                "key scheme")
        by_key[key] = k
    done = set(ledger.completed_keys())
    results: Dict[str, dict] = {}
    for key in sorted(by_key):
        if key in done:
            results[key] = {"skipped": True}
            continue
        k = by_key[key]
        part = df.filter(pcol.isNull() if k is None else pcol == F.lit(k))
        metrics = work(part, key)
        ledger.mark_done(key, metrics)
        results[key] = metrics
    return results
