"""Shared benchmark workloads — ONE definition of the representative
Plane-B (kernel) contract and its synthetic document stream, used by
``bench.py`` (the per-round kernel_json entry), ``bench_scaling.py``
(the N→4N efficiency evidence, Spark and bare-multiprocessing control),
and the pinned perf tests.  A single source of truth keeps the numbers
comparable across harnesses: a contract drift between them would make
"kernel-plane throughput" mean different things in different files.

The contract exercises what the kernel plane exists for (SURVEY.md
§7.0): combinators, a conditional, a $ref hop, array keywords, and
unevaluatedProperties — the whole-node Plane-B gate's worst case.  A
flat keyword list is NOT representative: round 3's boolean-mode
optimization made it so cheap the bench entry lost all signal
(VERDICT r3, "What's wrong" #3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["REPRESENTATIVE_KERNEL_CONTRACT", "representative_json_docs",
           "representative_doc", "mixed_json_docs", "MIXED_COLUMNAR_RATE",
           "TRIVIAL_CONTRACT", "trivial_json_docs"]

REPRESENTATIVE_KERNEL_CONTRACT = {
    "type": "object", "required": ["k", "name", "xs"],
    "$defs": {"small_int": {"type": "integer", "maximum": 12}},
    "properties": {
        "k": {"type": "integer", "minimum": 0, "multipleOf": 1},
        "name": {"allOf": [{"type": "string", "minLength": 5},
                           {"pattern": "^user[0-9]+$"}]},
        "xs": {"type": "array", "items": {"$ref": "#/$defs/small_int"},
               "minItems": 3, "uniqueItems": True,
               "contains": {"minimum": 0}, "minContains": 1},
    },
    "if": {"properties": {"k": {"minimum": 50}}, "required": ["k"]},
    "then": {"properties": {"xs": {"maxItems": 16}}},
    "else": {"properties": {"name": {"maxLength": 40}}},
    "anyOf": [{"required": ["name"]}, {"required": ["alias"]}],
    "unevaluatedProperties": {"type": ["string", "number", "array"]},
}


def representative_json_docs(spark: SparkSession, n: int,
                             num_partitions: int = 32) -> DataFrame:
    """``n`` deterministic JSON documents (column ``doc``) matching the
    shape the representative contract validates — the Spark twin of
    :func:`representative_doc`."""
    return spark.range(n, numPartitions=num_partitions).select(
        F.to_json(F.struct(
            (F.col("id") % 100).alias("k"),
            F.concat(F.lit("user"), F.col("id")).alias("name"),
            F.array(F.col("id") % 7, F.col("id") % 11,
                    F.col("id") % 13).alias("xs"),
        )).alias("doc"))


# deterministic columnar share of mixed_json_docs: slots 0-6 are
# canonical (round-trip shortcut), slot 7 is whitespace-variant (full
# variant gates), slots 8-9 are kernel-only shapes
MIXED_COLUMNAR_RATE = 0.8


def mixed_json_docs(spark: SparkSession, n: int,
                    num_partitions: int = 32) -> DataFrame:
    """A deterministic mixed conforming/hostile document stream for the
    route-rate observability metric (VERDICT r5 task #3): a routing-gate
    regression (a gate accidentally tightened to always-kernel) leaves
    verdicts correct but collapses throughput — ``json_route_rate`` in
    the bench JSON makes that visible, and the pinned lower bound in
    tests/test_bench_contract.py fails loudly.

    Slot layout by ``id % 10`` (exactly 10% each):
      0-6  canonical docs → columnar via the round-trip shortcut
      7    same doc with whitespace → columnar via the variant gates
           (round-trip inequality, shape still exactly representable)
      8    wrong-typed field (string k) → kernel
      9    malformed JSON → kernel
    """
    slot = F.col("id") % 10
    canonical = F.to_json(F.struct(
        (F.col("id") % 100).alias("k"),
        F.concat(F.lit("user"), F.col("id")).alias("name"),
        F.array(F.col("id") % 7, F.col("id") % 11,
                F.col("id") % 13).alias("xs")))
    spaced = F.concat(F.lit("{ \"k\": "), (F.col("id") % 100).cast("string"),
                      F.lit(", \"name\": \"user"), F.col("id").cast("string"),
                      F.lit("\", \"xs\": [1, 2, 3] }"))
    wrong_type = F.concat(F.lit('{"k":"'), F.col("id").cast("string"),
                          F.lit('","name":"user","xs":[1,2,3]}'))
    malformed = F.concat(F.lit('{"k": '), F.col("id").cast("string"))
    return spark.range(n, numPartitions=num_partitions).select(
        F.when(slot == 9, malformed)
        .when(slot == 8, wrong_type)
        .when(slot == 7, spaced)
        .otherwise(canonical).alias("doc"))


# The round-7 suspected-loss anchor (round 8, VERDICT r7 #1): the
# LIGHTEST realistic contract class — a couple of type/bound checks —
# where the kernel's C-scanner + boolean-mode path is at its absolute
# best.  The auto-vs-kernel bench pair runs THIS contract so the
# "auto must never pick the measured-slower plane" criterion is
# checked where the route's margin is thinnest (measured 1.48× route
# win at 1M docs, round-8 calibration).
TRIVIAL_CONTRACT = {
    "type": "object", "required": ["k"],
    "properties": {"k": {"type": "integer", "minimum": 0},
                   "name": {"type": "string", "maxLength": 64}},
}


def trivial_json_docs(spark: SparkSession, n: int,
                      num_partitions: int = 32) -> DataFrame:
    """``n`` deterministic canonical documents for TRIVIAL_CONTRACT."""
    return spark.range(n, numPartitions=num_partitions).select(
        F.to_json(F.struct(
            (F.col("id") % 100).alias("k"),
            F.concat(F.lit("user"), F.col("id")).alias("name"),
        )).alias("doc"))


def representative_doc(i: int) -> dict:
    """The python-dict twin of row ``i`` of
    :func:`representative_json_docs` — for the bare-multiprocessing
    machine control, which must run EXACTLY the same compute."""
    return {"k": i % 100, "name": f"user{i}", "xs": [i % 7, i % 11, i % 13]}
