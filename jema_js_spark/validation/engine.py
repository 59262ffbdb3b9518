"""DataFrame validation engine: the collection-level entry points.

Maps the reference's per-document API onto whole-DataFrame operations
(SURVEY.md §1.3):

========================  ====================================================
reference                 engine
========================  ====================================================
``schema.validate(v)``    :func:`with_valid` — boolean column per row
``schema.errors(v)``      :func:`violation_rows` — exploded violation rows
(per-call)                :func:`partition_verdicts` — per-partition pass/fail
========================  ====================================================

Everything here is lazy DataFrame algebra: one projection computes all
check predicates (the fused-pass idea the reference's experimental
build hints at, tools/schema-probably-faster.js:210-316), violations
are materialized only in the errors path (mirroring the reference's
validate-vs-errors laziness split, schema.js:59-73), and verdicts are a
map-side-combinable aggregation keyed by ``spark_partition_id()``.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jema_js_spark.compiler.compile import CompiledPlan, SchemaCompiler
from jema_js_spark.schema.frontend import Schema

__all__ = ["compile_for", "with_valid", "violation_rows",
           "partition_verdicts", "validation_report"]


def compile_for(df: DataFrame, schema, format_assertion: bool = False
                ) -> CompiledPlan:
    return SchemaCompiler(schema, format_assertion=format_assertion).compile_plan(df)


def with_valid(df: DataFrame, schema, col_name: str = "valid",
               format_assertion: bool = False) -> DataFrame:
    """``validate()`` over every row: adds a boolean column, computed
    entirely JVM-side for Plane-A schemas."""
    plan = compile_for(df, schema, format_assertion)
    return plan.with_valid(df, col_name)


def violation_rows(df: DataFrame, schema, id_cols: Sequence[str],
                   format_assertion: bool = False) -> DataFrame:
    """``errors()`` over every row: one output row per failed check,
    carrying the reference's error fields (message template, schema
    path, data path — schema.js:665-674) plus the row's identifier
    columns.

    Valid rows produce an empty array pre-explode, so the shuffle/write
    volume is proportional to violations, not to table size.
    """
    plan = compile_for(df, schema, format_assertion)
    out = df.select(*[F.col(c) for c in id_cols],
                    F.explode(plan.violations_struct()).alias("violation"))
    return out.select(
        *id_cols,
        F.col("violation.check").alias("check"),
        F.col("violation.keyword").alias("keyword"),
        F.col("violation.schema_path").alias("schema_path"),
        F.col("violation.data_path").alias("data_path"),
        F.col("violation.schema_value").alias("schema_value"),
        F.col("violation.message").alias("message"),
    )


def partition_verdicts(df: DataFrame, schema=None, valid_col: str = "valid",
                       partition_col: Optional[Column] = None) -> DataFrame:
    """Per-partition pass/fail + metrics rows (SURVEY.md §1.3): the unit
    of checkpoint/resume lineage.  Partial (map-side) aggregation makes
    this a near-free pass over the scan."""
    if schema is not None:
        df = with_valid(df, schema, valid_col)
    pid = partition_col if partition_col is not None else F.spark_partition_id()
    return (
        df.groupBy(pid.alias("partition_id"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col(valid_col).cast("long")).alias("n_valid"),
            (F.count(F.lit(1)) - F.sum(F.col(valid_col).cast("long"))).alias("n_invalid"),
        )
        .withColumn("passed", F.col("n_invalid") == 0)
    )


def validation_report(df: DataFrame, schema, id_cols: Sequence[str],
                      format_assertion: bool = False) -> dict:
    """Driver-side summary: totals + plane coverage (the compiler must
    publish its Plane-A share, SURVEY.md §7.0)."""
    plan = compile_for(df, schema, format_assertion)
    with_v = plan.with_valid(df)
    agg = with_v.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("valid").cast("long")).alias("n_valid")).collect()[0]
    return {
        "n_rows": agg["n"],
        "n_valid": agg["n_valid"],
        "n_invalid": agg["n"] - agg["n_valid"],
        "coverage": plan.coverage(),
    }
