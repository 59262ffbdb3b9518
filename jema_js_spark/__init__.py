"""jema_js_spark — a PySpark-native schema + constraint validation engine.

Reimplements the JSON Schema draft 2020-12 semantics of nuxodin/jema.js
(reference at /root/reference, studied not ported) as:

- a driver-side schema front-end (:mod:`jema_js_spark.schema`),
- a pure-Python row kernel, the semantic anchor
  (:mod:`jema_js_spark.kernel`),
- a columnar compiler emitting Catalyst ``Column`` predicate DAGs
  (:mod:`jema_js_spark.compiler`),
- a DataFrame validation engine with violation rows and per-partition
  verdicts (:mod:`jema_js_spark.validation`),
- dataset-level constraint operators — stats, uniqueness, referential,
  drift — plus web-scale pipeline operators — dedup, similarity, text
  analysis (:mod:`jema_js_spark.operators`).
"""

from jema_js_spark.schema.frontend import Schema, SchemaRegistry
from jema_js_spark.kernel.kernel import Validator, validate, iter_errors

__all__ = ["Schema", "SchemaRegistry", "Validator", "validate", "iter_errors"]
__version__ = "0.1.0"
