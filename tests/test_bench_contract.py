"""Pins for the benchmark workloads (BENCH_r*.json comparability):

- the flagship page contract must compile 100% Plane A — a silent
  regression of keywords to the kernel plane is the failure mode the
  bench's ``plane_a_pct`` field exists to catch (CLAUDE.md invariant);
- the representative kernel contract's Spark document stream and the
  bare-multiprocessing control's python dicts must be the SAME data,
  and the kernel UDF must agree with the driver-side Validator on it —
  otherwise the N→4N efficiency evidence compares different compute.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from jema_js_spark.bench_contracts import (
    REPRESENTATIVE_KERNEL_CONTRACT,
    representative_doc,
    representative_json_docs,
)

SF = "/root/testdata/sf0.001"


def test_flagship_contract_stays_plane_a(spark):
    from __spark_entry__ import PAGE_CONTRACT
    from jema_js_spark.sources.pages import pages_from_documents
    from jema_js_spark.validation.engine import compile_for

    pages = pages_from_documents(spark, SF).select(
        "doc_id", "url",
        F.timestamp_seconds("warc_epoch").alias("warc_ts"), "text", "lang")
    cov = compile_for(pages, PAGE_CONTRACT).coverage()
    assert cov["plane_a_fraction"] == 1.0, (
        f"flagship keywords regressed to Plane B: {cov['plane_b_names']}")
    assert cov["plane_a_checks"] > 0


def test_representative_stream_matches_control_docs(spark):
    import json

    rows = representative_json_docs(spark, 50, num_partitions=4).collect()
    for i, r in enumerate(rows):
        assert json.loads(r["doc"]) == representative_doc(i), i


def test_mixed_stream_route_rate_pinned(spark):
    """The bench's json_route_rate metric must stay at the stream's
    designed columnar share — a routing-gate regression (always-kernel)
    keeps verdicts right but collapses throughput invisibly (VERDICT r5
    task #3).  Slot 7 (whitespace variant) specifically pins the
    variant-gate tier: it must route columnar WITHOUT the round-trip
    shortcut."""
    from jema_js_spark.bench_contracts import (MIXED_COLUMNAR_RATE,
                                               mixed_json_docs)
    from jema_js_spark.validation.json_plane import with_valid_json

    n = 500
    docs = mixed_json_docs(spark, n, num_partitions=4)
    out = with_valid_json(docs, "doc", REPRESENTATIVE_KERNEL_CONTRACT,
                          route_col="route")
    counts = {r["route"]: r["count"]
              for r in out.groupBy("route").count().collect()}
    rate = counts.get("columnar", 0) / n
    assert rate == MIXED_COLUMNAR_RATE, counts
    # and the verdicts stay kernel-exact on the mixed stream
    from jema_js_spark.validation.kernel_udf import kernel_validate_udf
    udf = kernel_validate_udf(REPRESENTATIVE_KERNEL_CONTRACT)
    merged = {r["doc"]: r["valid"] for r in out.collect()}
    for r in docs.select("doc", udf(F.col("doc")).alias("kv")).collect():
        assert merged[r["doc"]] == (r["kv"] is True), r["doc"]


def test_kernel_udf_agrees_with_driver_validator(spark):
    from jema_js_spark.kernel.kernel import Validator
    from jema_js_spark.schema.frontend import Schema
    from jema_js_spark.validation.kernel_udf import kernel_validate_udf

    n = 300
    df = representative_json_docs(spark, n, num_partitions=4)
    udf = kernel_validate_udf(REPRESENTATIVE_KERNEL_CONTRACT)
    got = [r["v"] for r in
           df.select(udf(F.col("doc")).alias("v")).collect()]
    v = Validator(Schema(REPRESENTATIVE_KERNEL_CONTRACT))
    want = [v.validate(representative_doc(i)) for i in range(n)]
    assert got == want
    assert any(want) # the stream is not trivially all-invalid
