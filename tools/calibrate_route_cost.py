#!/usr/bin/env python
"""Calibrate the cost_model knobs (round 8, VERDICT r7 #1).

Two sweeps, both interleaved kernel/route pairs (the box is shared;
pairing keeps both sides under equal ambient pressure), MIN-of-3 per
side, verdict parity asserted per pair:

1. CONTRACT sweep at 1M canonical docs — graded contracts from
   trivial type/bound up to the representative Plane-B contract.
   Round-8 result: the route wins on EVERY grade (1.13-2.13×); the
   one loss (pattern3, 0.68×) is the number-slot shortcut-miss data
   hazard, not contract weight.
2. BATCH-SIZE sweep — the trivial contract (all-conforming corpus)
   and the representative contract (mixed corpus, real residue) at
   30k..3M docs.  Round-8 result: the small-batch kernel-wins regime
   tracks the RESIDUE rate, not the contract weight (representative
   0.81× at 30k, par at 100k; trivial wins from <30k) → ONE calibrated
   cutoff, cost_model.SMALL_BATCH_DOCS.

3. SHAPE DECOMPOSITION — kernel vs masked vs union per STREAM CLASS
   (canonical / whitespace-gate / wrong-type residue / malformed
   residue / the 80% mixed stream) at 1M docs.  Round-8 result: the
   union shape's residue path costs 4-5× the pure kernel per row
   (wasted parse + full-residue rebalance shuffle) — union 0.61× vs
   kernel on the mixed stream while masked wins 1.47×; union ahead
   only on all-canonical (~1.1×).  This is the evidence behind the
   round-8 default flip (auto plan shape = masked).

Writes BENCH/route_cost_calibration.json (the machine-readable
evidence twin).  The shipped cost_model.SMALL_BATCH_DOCS constant is
DERIVED from this artifact's batch sweep; tests/test_bench_evidence.py
pins the constant inside the sweep's measured bracket (above every
level where both calibrated streams lost to the kernel, at or below
the smallest level where both won), so editing the knob without
re-measuring — or re-measuring into a different bracket without
moving the knob — fails CI loudly.  ``small_batch_docs_knob_at_run``
records the constant as it stood when the artifact was written
(provenance only).

Usage: PYTHONPATH=/root/repo python tools/calibrate_route_cost.py
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

N = int(os.environ.get("CAL_DOCS", "1000000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def canonical_docs(spark, fields):
    """n canonical JSON docs with the given (name, col_fn) fields."""
    cols = [fn(F.col("id")).alias(name) for name, fn in fields]
    return spark.range(N, numPartitions=CPUS * 3).select(
        F.to_json(F.struct(*cols)).alias("doc"))


def main():
    from jema_js_spark.bench_contracts import (
        REPRESENTATIVE_KERNEL_CONTRACT, representative_json_docs)
    from jema_js_spark.runtime.session import build_session
    from jema_js_spark.validation.cost_model import kernel_cost_score
    from jema_js_spark.validation.json_plane import with_valid_json
    from jema_js_spark.validation.kernel_udf import kernel_validate_udf

    spark = build_session(app_name="jema-cal", master=f"local[{CPUS}]",
                          shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    int_f = lambda c: c % 100
    str_f = lambda c: F.concat(F.lit("user"), c.cast("string"))

    cases = []

    # T2: the round-7 measured loss case — a couple of type/bound checks
    cases.append(("trivial2", {
        "type": "object", "required": ["k"],
        "properties": {"k": {"type": "integer", "minimum": 0},
                       "name": {"type": "string", "maxLength": 64}}},
        [("k", int_f), ("name", str_f)]))

    # T5: five typed+bounded properties
    props5 = {f"f{i}": {"type": "integer", "minimum": 0, "maximum": 10**9}
              for i in range(4)}
    props5["name"] = {"type": "string", "minLength": 1, "maxLength": 64}
    cases.append(("five_props", {
        "type": "object", "required": ["f0", "name"],
        "properties": props5},
        [(f"f{i}", int_f) for i in range(4)] + [("name", str_f)]))

    # T10: ten typed+bounded properties
    props10 = {f"f{i}": {"type": "integer", "minimum": 0, "maximum": 10**9}
               for i in range(9)}
    props10["name"] = {"type": "string", "minLength": 1, "maxLength": 64}
    cases.append(("ten_props", {
        "type": "object", "required": ["f0", "f5", "name"],
        "properties": props10},
        [(f"f{i}", int_f) for i in range(9)] + [("name", str_f)]))

    # P: three properties, one Python-regex pattern on the kernel side
    cases.append(("pattern3", {
        "type": "object", "required": ["k", "name"],
        "properties": {"k": {"type": "integer", "minimum": 0},
                       "name": {"type": "string",
                                "pattern": "^user[0-9]+$"},
                       "m": {"type": "number"}}},
        [("k", int_f), ("name", str_f), ("m", lambda c: c % 7)]))

    # A: array items + enum — per-element kernel work
    cases.append(("array_enum", {
        "type": "object", "required": ["xs", "tag"],
        "properties": {
            "xs": {"type": "array", "minItems": 1,
                   "items": {"type": "integer", "minimum": 0}},
            "tag": {"enum": ["a", "b", "c", "d"]}}},
        [("xs", lambda c: F.array(c % 7, c % 11, c % 13)),
         ("tag", lambda c: F.element_at(
             F.array(F.lit("a"), F.lit("b"), F.lit("c"), F.lit("d")),
             (c % 4 + 1).cast("int")))]))

    # N: nested object + combinator — mid-weight
    cases.append(("nested_mid", {
        "type": "object", "required": ["id", "meta"],
        "properties": {
            "id": {"type": "integer", "minimum": 0},
            "meta": {"type": "object", "required": ["etype"],
                     "properties": {
                         "etype": {"type": "string", "minLength": 2},
                         "v": {"type": "number", "minimum": 0}}},
            "xs": {"type": "array", "items": {"type": "integer"}}},
        "anyOf": [{"required": ["xs"]}, {"required": ["meta"]}]},
        [("id", int_f),
         ("meta", lambda c: F.struct(
             F.concat(F.lit("ev"), (c % 9).cast("string")).alias("etype"),
             (c % 5).cast("double").alias("v"))),
         ("xs", lambda c: F.array(c % 7, c % 11))]))

    # U: unevaluatedProperties over a small claimed layout — the
    # evaluated-set class alone, no other expensive keywords
    cases.append(("uneval_small", {
        "type": "object", "required": ["k"],
        "properties": {"k": {"type": "integer", "minimum": 0},
                       "name": {"type": "string"}},
        "unevaluatedProperties": False},
        [("k", int_f), ("name", str_f)]))

    # R: three $ref hops to a shared def — the ref-chain class alone
    cases.append(("refs3", {
        "type": "object", "required": ["a"],
        "$defs": {"n": {"type": "integer", "minimum": 0,
                        "multipleOf": 1}},
        "properties": {"a": {"$ref": "#/$defs/n"},
                       "b": {"$ref": "#/$defs/n"},
                       "c": {"$ref": "#/$defs/n"}}},
        [("a", int_f), ("b", int_f), ("c", int_f)]))

    def pair(name, contract, docs, n):
        docs = docs.cache()
        docs.count()
        udf = kernel_validate_udf(contract)

        def kern():
            return docs.select(udf(F.col("doc")).alias("v")).agg(
                F.sum(F.col("v").cast("long"))).collect()[0][0]

        def route():
            # the AUTO DEFAULT (no expected_docs hint → routes, shape
            # masked since round 8) — the calibration must measure the
            # plan users actually get, not an opt-in
            out = with_valid_json(docs, "doc", contract)
            return out.agg(F.sum(F.col("valid").cast("long"))
                           ).collect()[0][0]

        kern(); route()                       # warm both sides
        ks, rs = [], []
        for _ in range(3):
            t0 = time.perf_counter(); kv = kern()
            ks.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); rv = route()
            rs.append(time.perf_counter() - t0)
            assert kv == rv, (name, kv, rv)
        row = {"case": name, "score": kernel_cost_score(contract),
               "kernel_sec": round(min(ks), 3),
               "route_sec": round(min(rs), 3),
               "route_vs_kernel": round(min(ks) / min(rs), 2),
               "n_valid": int(kv), "n": n}
        print(json.dumps(row), flush=True)
        docs.unpersist()
        return row

    contracts = []
    for name, contract, fields in cases + [("representative", None, None)]:
        if contract is None:
            contract = REPRESENTATIVE_KERNEL_CONTRACT
            docs = representative_json_docs(spark, N,
                                            num_partitions=CPUS * 3)
        else:
            docs = canonical_docs(spark, fields)
        contracts.append(pair(name, contract, docs, N))

    # batch-size sweep: trivial (all-conforming → empty residue) vs
    # representative over the MIXED stream (real residue + variant-gate
    # rows — the shape production batches actually have)
    from jema_js_spark.bench_contracts import (TRIVIAL_CONTRACT,
                                               mixed_json_docs,
                                               trivial_json_docs)
    batches = []
    for n in (10_000, 30_000, 100_000, 300_000, 1_000_000):
        batches.append(pair(
            f"trivial@{n}", TRIVIAL_CONTRACT,
            trivial_json_docs(spark, n, num_partitions=CPUS * 3), n))
        batches.append(pair(
            f"representative-mixed@{n}", REPRESENTATIVE_KERNEL_CONTRACT,
            mixed_json_docs(spark, n, num_partitions=CPUS * 3), n))

    # shape decomposition: kernel vs masked vs union per stream class
    def triple(name, contract, docs, n):
        docs = docs.cache()
        docs.count()
        udf = kernel_validate_udf(contract)

        def kern():
            return docs.select(udf(F.col("doc")).alias("v")).agg(
                F.sum(F.col("v").cast("long"))).collect()[0][0]

        def shape(s):
            out = with_valid_json(docs, "doc", contract, plan_shape=s)
            return out.agg(F.sum(F.col("valid").cast("long"))
                           ).collect()[0][0]

        kern(); shape("masked"); shape("union")
        ks, ms, us = [], [], []
        for _ in range(3):
            t0 = time.perf_counter(); kv = kern()
            ks.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); mv = shape("masked")
            ms.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); uv = shape("union")
            us.append(time.perf_counter() - t0)
            assert kv == mv == uv, (name, kv, mv, uv)
        row = {"stream": name,
               "kernel_sec": round(min(ks), 3),
               "masked_sec": round(min(ms), 3),
               "union_sec": round(min(us), 3),
               "masked_vs_kernel": round(min(ks) / min(ms), 2),
               "union_vs_kernel": round(min(ks) / min(us), 2),
               "n": n}
        print(json.dumps(row), flush=True)
        docs.unpersist()
        return row

    from jema_js_spark.bench_contracts import mixed_json_docs as _mx
    base = spark.range(N, numPartitions=CPUS * 3)
    canonical = F.to_json(F.struct(
        (F.col("id") % 100).alias("k"),
        F.concat(F.lit("user"), F.col("id")).alias("name"),
        F.array(F.col("id") % 7, F.col("id") % 11,
                F.col("id") % 13).alias("xs")))
    spaced = F.concat(
        F.lit('{ "k": '), (F.col("id") % 100).cast("string"),
        F.lit(', "name": "user'), F.col("id").cast("string"),
        F.lit('", "xs": [1, 2, 3] }'))
    wrong = F.concat(F.lit('{"k":"'), F.col("id").cast("string"),
                     F.lit('","name":"user","xs":[1,2,3]}'))
    malformed = F.concat(F.lit('{"k": '), F.col("id").cast("string"))
    shapes = [
        triple("canonical", REPRESENTATIVE_KERNEL_CONTRACT,
               base.select(canonical.alias("doc")), N),
        triple("whitespace-gate", REPRESENTATIVE_KERNEL_CONTRACT,
               base.select(spaced.alias("doc")), N),
        triple("wrongtype-residue", REPRESENTATIVE_KERNEL_CONTRACT,
               base.select(wrong.alias("doc")), N),
        triple("malformed-residue", REPRESENTATIVE_KERNEL_CONTRACT,
               base.select(malformed.alias("doc")), N),
        triple("mixed-80pct", REPRESENTATIVE_KERNEL_CONTRACT,
               _mx(spark, N, num_partitions=CPUS * 3), N),
    ]

    from jema_js_spark.validation.cost_model import SMALL_BATCH_DOCS
    out = {"protocol": "interleaved kernel/route pairs, MIN-of-3 per "
                       "side, warm pass first, verdict parity asserted",
           "contract_sweep_docs": N,
           "contracts": contracts,
           "batch_sweep": batches,
           "shape_decomposition": shapes,
           "small_batch_docs_knob_at_run": SMALL_BATCH_DOCS,
           "loadavg_after": [round(x, 2) for x in os.getloadavg()],
           "cpus": CPUS}
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/route_cost_calibration.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"loadavg": out["loadavg_after"], "cpus": CPUS,
                      "wrote": "BENCH/route_cost_calibration.json"}))
    spark.stop()


if __name__ == "__main__":
    main()
