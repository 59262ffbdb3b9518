"""Structured-Streaming surface for the validation engine.

The reference is a per-document batch validator (no streaming
constructs — SURVEY.md §2.9), but a crawl pipeline ingests pages
continuously, so the engine exposes its compiled plans over
``readStream`` too.  The compiled predicate DAG is identical in batch
and streaming — Catalyst doesn't care — which is the point: one
compile, both execution modes.

- :func:`validated_stream` — valid column + violation struct per
  micro-batched row.
- :func:`windowed_verdicts` — event-time-windowed pass/fail verdict
  aggregation with a watermark for late data (the streaming analog of
  per-partition verdicts).
- :func:`stream_to_violations` — side output of violation rows only
  (append-mode friendly: stateless projection + explode).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jema_js_spark.compiler.compile import SchemaCompiler

__all__ = ["validated_stream", "windowed_verdicts", "stream_to_violations"]


def validated_stream(stream_df: DataFrame, schema,
                     format_assertion: bool = False) -> DataFrame:
    plan = SchemaCompiler(schema, format_assertion).compile_plan(stream_df)
    return stream_df.withColumn("valid", plan.valid_column())


def windowed_verdicts(stream_df: DataFrame, schema, ts_col: str,
                      window: str = "1 hour",
                      watermark: str = "2 hours",
                      format_assertion: bool = False) -> DataFrame:
    """Per-event-time-window verdict rows.  Watermark bounds state so
    the aggregation runs forever at constant memory; late rows beyond
    the watermark are dropped (counted by Spark's metrics)."""
    valid = validated_stream(stream_df, schema, format_assertion)
    return (valid.withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window).alias("window"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.col("valid").cast("long")).alias("n_valid"))
            .withColumn("n_invalid", F.col("n_rows") - F.col("n_valid"))
            .withColumn("passed", F.col("n_invalid") == 0))


def stream_to_violations(stream_df: DataFrame, schema,
                         id_cols: Sequence[str],
                         format_assertion: bool = False) -> DataFrame:
    """Stateless violation-row stream (append mode — safe for any
    sink): one output row per failed check, reference error fields."""
    plan = SchemaCompiler(schema, format_assertion).compile_plan(stream_df)
    out = stream_df.select(*[F.col(c) for c in id_cols],
                           F.explode(plan.violations_struct()).alias("v"))
    return out.select(*id_cols, "v.check", "v.keyword", "v.schema_path",
                      "v.data_path", "v.schema_value", "v.message")
