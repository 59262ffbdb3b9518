"""Suite parity THROUGH the Spark engine: the conformance corpus as a
columnar fixture table (one row per case, FIXTURES.md §1), verdicts
computed by the Arrow-batched kernel UDF in a single job, compared to
the expected verdicts — the BASELINE 'suite parity' metric."""

from __future__ import annotations

import copy
import json

from pyspark.sql import functions as F

from jema_js_spark.validation.kernel_udf import kernel_validate_pair_udf
from tests.suite_cases import CASES, REMOTES, expected_for


def test_suite_parity_via_spark(spark):
    rows = []
    for i, case in enumerate(CASES):
        schema = copy.deepcopy(case.schema)
        rows.append((
            f"{case.file}#{i}",
            case.file,
            json.dumps(schema),
            json.dumps(case.data),
            bool(expected_for(case)),
        ))
    df = spark.createDataFrame(
        rows, "case_id string, file string, schema_json string, "
              "data_json string, expected boolean")

    udf = kernel_validate_pair_udf(remotes=REMOTES)
    got = (df.withColumn("verdict", udf(F.col("schema_json"), F.col("data_json")))
             .withColumn("ok", F.col("verdict") == F.col("expected")))

    agg = got.agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.col("ok").cast("long")).alias("n_ok")).collect()[0]
    mismatches = [r.asDict() for r in got.filter(~F.col("ok")).collect()]
    assert agg["n_ok"] == agg["n"], f"suite parity < 100%: {mismatches[:10]}"
