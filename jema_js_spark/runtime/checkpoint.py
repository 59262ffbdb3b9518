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

__all__ = ["CheckpointLedger", "run_partitioned"]

_LEDGER_SCHEMA = ("run_id string, partition_key string, status string, "
                  "metrics_json string, updated_at double")


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


def run_partitioned(spark: SparkSession, df: DataFrame, partition_col,
                    ledger: CheckpointLedger,
                    work: Callable[[DataFrame, str], dict]) -> Dict[str, dict]:
    """Run ``work(slice_df, key)`` once per distinct value of
    ``partition_col``, skipping keys the ledger already marks done.

    ``work`` returns a metrics dict; it is recorded in the ledger row.
    Partition keys are enumerated with one small distinct query (at
    real scale: read Iceberg partition metadata instead of scanning).
    """
    pcol = F.col(partition_col) if isinstance(partition_col, str) else partition_col
    keys = [str(r["__pk"]) for r in
            df.select(pcol.cast("string").alias("__pk")).distinct().collect()]
    done = set(ledger.completed_keys())
    results: Dict[str, dict] = {}
    for key in sorted(keys):
        if key in done:
            results[key] = {"skipped": True}
            continue
        part = df.filter(pcol.cast("string") == key)
        metrics = work(part, key)
        ledger.mark_done(key, metrics)
        results[key] = metrics
    return results
