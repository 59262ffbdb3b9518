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
           "representative_doc"]

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


def representative_doc(i: int) -> dict:
    """The python-dict twin of row ``i`` of
    :func:`representative_json_docs` — for the bare-multiprocessing
    machine control, which must run EXACTLY the same compute."""
    return {"k": i % 100, "name": f"user{i}", "xs": [i % 7, i % 11, i % 13]}
