"""Structured-Streaming surface: same compiled plan, micro-batch
execution, windowed verdicts with watermark."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from jema_js_spark.streaming.validate_stream import (
    stream_to_violations,
    validated_stream,
    windowed_verdicts,
)

CONTRACT = {
    "required": ["url", "text"],
    "properties": {"url": {"pattern": "^https?://"},
                    "text": {"minLength": 1}},
}


def _drain(query, timeout=60):
    query.processAllAvailable()
    query.stop()


def test_validated_stream_memory_sink(spark):
    # replay a static parquet-like frame through a rate-less stream:
    # use the per-micro-batch format 'rate' mapped onto page-shaped rows
    stream = (spark.readStream.format("rate")
              .option("rowsPerSecond", "500").load()
              .withColumn("url", F.when(F.col("value") % 10 == 0,
                                        F.lit("ftp://bad"))
                          .otherwise(F.concat(F.lit("https://ok/"), "value")))
              .withColumn("text", F.when(F.col("value") % 7 == 0, F.lit(""))
                          .otherwise(F.lit("body"))))
    out = validated_stream(stream, CONTRACT)
    q = (out.writeStream.format("memory").queryName("v_stream")
         .outputMode("append").start())
    time.sleep(4)
    _drain(q)
    rows = spark.sql("SELECT * FROM v_stream").collect()
    assert rows, "stream produced no rows"
    for r in rows:
        expected = r["url"].startswith("http") and len(r["text"]) >= 1
        assert r["valid"] == expected


def test_windowed_verdicts(spark):
    stream = (spark.readStream.format("rate")
              .option("rowsPerSecond", "200").load()
              .withColumn("url", F.concat(F.lit("https://ok/"), "value"))
              .withColumn("text", F.lit("body")))
    verd = windowed_verdicts(stream, CONTRACT, ts_col="timestamp",
                             window="10 seconds", watermark="30 seconds")
    q = (verd.writeStream.format("memory").queryName("verd_stream")
         .outputMode("complete").start())
    time.sleep(4)
    _drain(q)
    rows = spark.sql("SELECT * FROM verd_stream").collect()
    assert rows
    assert all(r["n_invalid"] == 0 and r["passed"] for r in rows)


def test_stream_violations(spark):
    stream = (spark.readStream.format("rate")
              .option("rowsPerSecond", "500").load()
              .withColumn("url", F.when(F.col("value") % 2 == 0,
                                        F.lit("ftp://bad"))
                          .otherwise(F.lit("https://ok")))
              .withColumn("text", F.lit("body")))
    viol = stream_to_violations(stream, CONTRACT, id_cols=["value"])
    q = (viol.writeStream.format("memory").queryName("viol_stream")
         .outputMode("append").start())
    time.sleep(4)
    _drain(q)
    rows = spark.sql("SELECT * FROM viol_stream").collect()
    assert rows
    assert all(r["keyword"] == "pattern" for r in rows)
    assert all(r["value"] % 2 == 0 for r in rows)
