"""Contract mining: propose a draft 2020-12 schema from observed data —
the inverse direction of the §2.9 SQL bridge (reference scope:
``tools/toSql.js`` maps schema → storage; ``struct_to_schema`` maps
Spark types → schema; this module maps DATA → schema, an engine
extension for pipelines that need a starting contract for an
un-contracted table).

Plan shape (scale-first):

- pass 1 — ONE aggregation over the table (the same fused-agg shape as
  :func:`~jema_js_spark.operators.stats.column_stats`): per column the
  null count, min/max (values for numerics, code-point lengths for
  strings), and an HLL distinct sketch.
- pass 2 — ONLY for string columns whose sketch says the cardinality is
  small enough to be an enum: one ``collect_set`` aggregation over just
  those columns.  The sketch gates the collect, so a high-cardinality
  text column can never explode the driver; the cap is a visible knob.

The proposed contract is CLOSED over the observed data by construction
(bounds are observed min/max, enums are the observed value sets,
``required`` lists the never-null columns), so ``with_valid(df,
propose_contract(df))`` is all-true on the profiled table — the
self-consistency oracle the tests pin.  It compiles 100% Plane A.
Nested exception (round 5): struct/array sub-contracts are mined from
a bounded deterministic SAMPLE (same draw as the JSON miner), so on
tables larger than ``nested_sample_rows`` a nested value outside the
sampled bounds surfaces as a violation for contract review — the same
documented trade :func:`propose_json_contract` makes.

Non-finite exception: bounds are mined over FINITE values only, and a
NaN/Infinity row does NOT validate under the mined contract — by
engine semantics (mirroring the reference) a non-finite double matches
no ``type``, on both planes consistently.  That is the desired
outcome: non-finite rows surface as violations for contract review
rather than silently widening the mined bounds to NaN (which isn't
valid JSON and would reject everything).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["propose_contract", "propose_json_contract"]

# HLL relative error guard: accept a column as an enum candidate when
# the sketch estimate is below knob × (1 + 3·rsd) — the exact set is
# still size-checked after the bounded collect.
_RSD = 0.02


def _bound_down(v):
    """Largest double ≤ ``v`` (a Decimal/int/float observed minimum),
    or ``None`` when no finite double satisfies the ≤ contract.

    ``float()`` rounds to NEAREST, so a value not representable in a
    double (decimal128, or an int beyond 2^53) can round UP — emitting
    a ``minimum`` above the actual observed value and breaking the
    module's closed-over-observed-data guarantee (ADVICE r4; the int
    case hardened after a round-5 review).  Nudge one ULP down
    whenever rounding went up.  An int below −(double max) has NO
    finite double ≤ it — and −Infinity is not serializable JSON
    (json.dumps would emit a non-standard token the kernel contract
    path can't round-trip; ADVICE r5) — so the bound is omitted
    (``None``), meaning "unconstrained on this side"."""
    import math
    from decimal import Decimal

    import sys

    try:
        f = float(v)
    except OverflowError:                    # |int| beyond double range
        # largest double still ≤ v: the finite max for positive
        # overflow; for negative, no finite double is small enough —
        # omit the bound entirely
        return sys.float_info.max if v > 0 else None
    if not math.isfinite(f):
        return None                          # ±inf/NaN column extrema
    if isinstance(v, Decimal):
        rounded_up = Decimal(f) > v
    elif isinstance(v, int) and not isinstance(v, bool):
        rounded_up = f > v                   # exact int↔float compare
    else:
        rounded_up = False
    return math.nextafter(f, -math.inf) if rounded_up else f


def _bound_up(v):
    """Smallest double ≥ ``v`` — mirror of :func:`_bound_down` for the
    observed maximum (nearest-rounding can round DOWN); ``None`` when
    no finite double is ≥ ``v``."""
    import math
    from decimal import Decimal

    import sys

    try:
        f = float(v)
    except OverflowError:
        # mirror of the _bound_down cases
        return -sys.float_info.max if v < 0 else None
    if not math.isfinite(f):
        return None                          # ±inf/NaN column extrema
    if isinstance(v, Decimal):
        rounded_down = Decimal(f) < v
    elif isinstance(v, int) and not isinstance(v, bool):
        rounded_down = f < v
    else:
        rounded_down = False
    return math.nextafter(f, math.inf) if rounded_down else f


def _map_value_json_type(vt) -> Optional[dict]:
    """JSON type node for a map's value slot (scalar or array-of-scalar
    only — deeper shapes keep the bare object contract)."""
    if isinstance(vt, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)):
        return {"type": "integer"}
    if isinstance(vt, T.NumericType):
        return {"type": "number"}
    if isinstance(vt, T.StringType):
        return {"type": "string"}
    if isinstance(vt, T.BooleanType):
        return {"type": "boolean"}
    if isinstance(vt, T.ArrayType):
        elem = _map_value_json_type(vt.elementType)
        if elem is not None and elem["type"] != "array":
            return {"type": "array", "items": elem}
    return None


def _string_length_bounds(c: str):
    # code points, matching min/maxLength semantics (SURVEY §7.4)
    return (F.min(F.length(F.col(c))).alias(f"{c}_minlen"),
            F.max(F.length(F.col(c))).alias(f"{c}_maxlen"))


def _mine_container(df: DataFrame, c: str, dtype,
                    enum_max_distinct: int, sample_rows: int,
                    max_depth: int) -> dict:
    """Round-5 nested mining (VERDICT r4 #8): a struct/array column's
    sub-contract via the JSON miner over a bounded deterministic
    sample (smallest content hashes — same draw as
    :func:`propose_json_contract`, constant driver cost at any table
    size).  The relational bridge applies on the way out (``to_json``
    drops NULL struct fields → absent keys), and non-finite doubles are
    restored from the column's float paths so a NaN element mines as a
    number, not the string "NaN" (it still fails the mined ``type`` —
    the module's documented non-finite exception).  MapType columns
    stay a bare ``{"type": "object"}``: their key space is data, not
    schema, and sampled-key ``properties`` would be noise."""
    import json

    from jema_js_spark.compiler.compile import _TExpr
    from jema_js_spark.validation.kernel_udf import (_restore_nonfinite,
                                                      loads_doc)

    # filter BEFORE the projection: filtering on F.col(c) after
    # selecting only the to_json alias worked solely via Catalyst's
    # missing-attribute resolution through Project — a fragile analyzer
    # behavior for no benefit (ADVICE r5)
    rows = (df.filter(F.col(c).isNotNull())
            .select(F.to_json(F.col(c)).alias("doc"))
            .orderBy(F.xxhash64(F.col("doc")))
            .limit(sample_rows).collect())
    fpaths = [tuple(p) for p in _TExpr(F.col(c), dtype).float_paths()]
    values = []
    for r in rows:
        try:
            # loads_doc: a ~1000-deep document would RecursionError a
            # plain json.loads and kill the DRIVER (round-7 hardening)
            v = loads_doc(r["doc"])
        except (TypeError, ValueError):
            continue
        if fpaths:
            v = _restore_nonfinite(v, fpaths)
        values.append(v)
    if not values:
        return {}
    return _mine_node(values, enum_max_distinct, 1, max_depth)


def propose_contract(df: DataFrame, cols: Optional[Sequence[str]] = None,
                     enum_max_distinct: int = 16,
                     emit_required: bool = True,
                     nested_sample_rows: int = 2000,
                     max_depth: int = 3) -> dict:
    """Propose a draft 2020-12 object contract for ``df``'s rows.

    - numeric columns → ``{"type": "integer"|"number", "minimum",
      "maximum"}`` (observed closed bounds; all-null columns get the
      type alone)
    - string columns → ``enum`` when the exact distinct set fits in
      ``enum_max_distinct`` (HLL-gated two-pass), else ``{"type":
      "string", "minLength", "maxLength"}`` over code points
    - boolean → ``{"type": "boolean"}``; timestamps/dates → ``{"type":
      "string", "format": "date-time"|"date"}`` (annotation; the
      relational bridge renders them as strings)
    - struct/array columns → REAL sub-contracts (round 5): a bounded
      hash-ordered sample of the column runs through the JSON miner,
      so ``meta`` structs get per-field ``properties``/bounds/enums
      and arrays get ``items`` + size bounds, to ``max_depth`` levels;
      maps keep the bare container type (keys are data)
    - ``required`` = columns with zero observed NULLs (the relational
      bridge maps SQL NULL to "key absent")
    """
    if cols is None:
        cols = [f.name for f in df.schema.fields]
    by_name = {f.name: f.dataType for f in df.schema.fields}

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        dtype = by_name[c]
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls"))
        if isinstance(dtype, T.StringType):
            aggs.extend(_string_length_bounds(c))
            from jema_js_spark.operators.stats import hll_distinct_agg
            aggs.append(hll_distinct_agg(c, dtype, _RSD).alias(f"{c}_acd"))
        elif isinstance(dtype, (T.FloatType, T.DoubleType)):
            # NaN-safe: Spark max() sorts NaN greatest, and a NaN bound
            # is not valid JSON (and the kernel rejects every row under
            # it) — mine bounds over the finite values only
            finite = F.when(~F.isnan(F.col(c)), F.col(c))
            aggs.append(F.min(finite).alias(f"{c}_min"))
            aggs.append(F.max(finite).alias(f"{c}_max"))
        elif isinstance(dtype, T.NumericType):
            aggs.append(F.min(c).alias(f"{c}_min"))
            aggs.append(F.max(c).alias(f"{c}_max"))
    stats = df.agg(*aggs).collect()[0].asDict()

    # pass 2: exact value sets, only for HLL-gated enum candidates
    enum_cands = [
        c for c in cols
        if isinstance(by_name[c], T.StringType)
        and stats[f"{c}_acd"] <= enum_max_distinct * (1 + 3 * _RSD)]
    enum_values: Dict[str, list] = {}
    if enum_cands:
        sets = df.agg(*[F.collect_set(c).alias(c) for c in enum_cands]) \
            .collect()[0].asDict()
        for c, vals in sets.items():
            if vals and len(vals) <= enum_max_distinct:
                enum_values[c] = sorted(vals)

    props: Dict[str, dict] = {}
    required = []
    for c in cols:
        dtype = by_name[c]
        if emit_required and stats[f"{c}_nulls"] == 0:
            required.append(c)
        if c in enum_values:
            props[c] = {"enum": enum_values[c]}
        elif isinstance(dtype, T.StringType):
            sub = {"type": "string"}
            if stats.get(f"{c}_minlen") is not None:
                sub["minLength"] = int(stats[f"{c}_minlen"])
                sub["maxLength"] = int(stats[f"{c}_maxlen"])
            props[c] = sub
        elif isinstance(dtype, T.BooleanType):
            props[c] = {"type": "boolean"}
        elif isinstance(dtype, (T.IntegerType, T.LongType, T.ShortType,
                                T.ByteType)):
            sub = {"type": "integer"}
            if stats.get(f"{c}_min") is not None:
                sub["minimum"] = int(stats[f"{c}_min"])
                sub["maximum"] = int(stats[f"{c}_max"])
            props[c] = sub
        elif isinstance(dtype, T.NumericType):
            sub = {"type": "number"}
            if stats.get(f"{c}_min") is not None:
                lo = _bound_down(stats[f"{c}_min"])
                hi = _bound_up(stats[f"{c}_max"])
                if lo is not None:
                    sub["minimum"] = lo
                if hi is not None:
                    sub["maximum"] = hi
            props[c] = sub
        elif isinstance(dtype, T.TimestampType):
            props[c] = {"type": "string", "format": "date-time"}
        elif isinstance(dtype, T.DateType):
            props[c] = {"type": "string", "format": "date"}
        elif isinstance(dtype, T.ArrayType):
            sub = {"type": "array"}
            sub.update(_mine_container(df, c, dtype, enum_max_distinct,
                                       nested_sample_rows, max_depth))
            props[c] = sub
        elif isinstance(dtype, T.StructType):
            sub = {"type": "object"}
            sub.update(_mine_container(df, c, dtype, enum_max_distinct,
                                       nested_sample_rows, max_depth))
            props[c] = sub
        elif isinstance(dtype, T.MapType):
            # dynamic keys are data, not schema — no sampled-key
            # properties — but the VALUE type is schema, and emitting
            # it as additionalProperties makes the mined contract
            # map-routable on the JSON columnar plane (round 6)
            sub = {"type": "object"}
            vt = _map_value_json_type(dtype.valueType)
            if vt is not None:
                sub["additionalProperties"] = vt
            props[c] = sub
        else:
            props[c] = {}
    return {"type": "object", "required": required, "properties": props}


def _json_type(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "integer"
    if isinstance(v, float):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    return "object"


def _mine_node(values: list, enum_max: int, depth: int,
               max_depth: int) -> dict:
    """Union a list of sampled JSON values at one path into a schema
    node (driver-side: the sample is bounded, see caller)."""
    types = sorted({_json_type(v) for v in values})
    if "integer" in types and "number" in types:
        types.remove("integer")
    sub: dict = {}
    non_null = [t for t in types if t != "null"]
    if types:
        sub["type"] = types[0] if len(types) == 1 else types
    if non_null == ["string"]:
        vals = sorted({v for v in values if isinstance(v, str)})
        if 0 < len(vals) <= enum_max:
            if "null" in types:
                sub.pop("type", None)
                sub["enum"] = vals + [None]
            else:
                sub.pop("type", None)
                sub["enum"] = vals
        elif vals:
            sub["minLength"] = min(len(v) for v in vals)
            sub["maxLength"] = max(len(v) for v in vals)
    elif non_null and set(non_null) <= {"integer", "number"}:
        # bools excluded explicitly (bool subclasses int) and non-finite
        # values skipped: json.loads admits NaN/Infinity, Python's
        # min() is NaN-poisoned ORDER-DEPENDENTLY, and a NaN bound
        # would invalidate the very sample it was mined from
        import math
        nums = [v for v in values
                if isinstance(v, (int, float)) and not isinstance(v, bool)
                and math.isfinite(v)]
        if nums:
            sub["minimum"] = min(nums)
            sub["maximum"] = max(nums)
    if "object" in types and depth < max_depth:
        objs = [v for v in values if isinstance(v, dict)]
        if objs:
            keys = sorted({k for o in objs for k in o})
            sub["properties"] = {
                k: _mine_node([o[k] for o in objs if k in o],
                              enum_max, depth + 1, max_depth)
                for k in keys}
            always = [k for k in keys if all(k in o for o in objs)]
            if always and len(types) == 1:
                sub["required"] = always
    if "array" in types and depth < max_depth:
        elems = [e for v in values if isinstance(v, list) for e in v]
        if elems:
            sub["items"] = _mine_node(elems, enum_max, depth + 1, max_depth)
        lens = [len(v) for v in values if isinstance(v, list)]
        if lens:
            sub["minItems"] = min(lens)
            sub["maxItems"] = max(lens)
    return sub


def propose_json_contract(df: DataFrame, col: str, sample_rows: int = 2000,
                          enum_max_distinct: int = 16,
                          max_depth: int = 3) -> dict:
    """Contract mining for a DYNAMIC JSON column (the kernel plane's
    input): propose a draft 2020-12 schema from a bounded sample of
    documents.

    The sample is the ``sample_rows`` smallest content hashes — the
    same deterministic, partition-independent draw ``fit_centroids``
    uses (per-partition top-n + driver merge, no full shuffle), so the
    proposal is reproducible and the driver cost is constant regardless
    of table size.  Per path the miner unions observed JS types
    (integer ⊂ number), mines enums for low-cardinality strings and
    closed bounds for numerics/lengths/array sizes, and marks a key
    ``required`` only when EVERY sampled object carries it.

    The contract is closed over the sampled documents by construction
    (kernel-validate all-true, pinned in tests); rows outside the
    sample may exceed mined bounds — that is the point: they surface as
    violations for contract review."""
    from jema_js_spark.validation.kernel_udf import loads_doc

    rows = (df.select(F.col(col).alias("doc"))
            .filter(F.col(col).isNotNull())
            .orderBy(F.xxhash64(F.col(col)))
            .limit(sample_rows).collect())
    values = []
    for r in rows:
        try:
            values.append(loads_doc(r["doc"]))
        except (TypeError, ValueError):
            continue
    if not values:
        # a silent {} would be the accept-everything schema — the exact
        # inversion of the bootstrap's purpose.  Non-string columns,
        # all-null columns, and all-corrupt documents land here.
        raise ValueError(
            f"no parseable JSON documents sampled from column {col!r} "
            f"({len(rows)} non-null rows seen); contract mining needs "
            "a JSON-string column with at least one well-formed doc")
    return _mine_node(values, enum_max_distinct, 0, max_depth)
