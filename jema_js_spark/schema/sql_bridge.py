"""Schema ⇄ Spark-SQL type bridge — the engine's analog of the
reference's storage-layer tools (/root/reference/tools/toSql.js, 180
lines; IndexedDB layout hints in tools/toIDB.js).

Direction 1 (``schema_to_ddl`` / ``schema_to_create_table``): JSON
Schema → Spark column DDL / ``CREATE TABLE``, with the reference's
width-narrowing rules re-expressed for Spark's type system:

- integer min/max bounds → narrowest integral type
  (toSql.js:79-95 picks tinyint…bigint signed/unsigned; Spark has no
  unsigned types, so bounds map onto BYTE/SHORT/INT/LONG signed ranges)
- ``maxLength`` → the reference picks varchar/text tiers
  (toSql.js:96-103); Spark strings are unbounded, so the tier lands in
  a column comment and a ``VARCHAR(n)`` annotation where n ≤ 65535
- ``format: date/time/date-time`` → DATE/TIMESTAMP
  (toSql.js:105-107)
- ``default`` → column DEFAULT clause (toSql.js:117)
- ``required`` → NOT NULL (toSql.js:28-31 inverse)
- ``x_primary``/``x_unique``/``x_index`` → table properties + the
  layout hint consumed by the dataset-level checks
  (toSql.js:43-45, toIDB.js:10,24-26)

Direction 2 (``struct_to_schema``): Spark ``StructType`` → JSON Schema
object — the analog of ``fromShowFields`` (toSql.js:2-58): NOT NULL →
``required``, integral widths → min/max bounds, DATE/TIMESTAMP →
``format``, decimals → multipleOf granularity.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

from pyspark.sql import types as T

__all__ = ["schema_to_ddl", "schema_to_create_table", "struct_to_schema",
           "layout_hints", "autoincrement_columns", "with_autoincrement"]

# signed integral ranges, narrowest first — the Spark analog of the
# reference's width table (toSql.js:79-95 / defs/main.json:2-39)
_INT_TIERS: List[Tuple[str, int, int]] = [
    ("BYTE", -(2 ** 7), 2 ** 7 - 1),
    ("SHORT", -(2 ** 15), 2 ** 15 - 1),
    ("INT", -(2 ** 31), 2 ** 31 - 1),
    ("BIGINT", -(2 ** 63), 2 ** 63 - 1),
]


def _integer_type(minimum: Optional[float], maximum: Optional[float]) -> str:
    if minimum is None or maximum is None:
        return "BIGINT"
    for name, lo, hi in _INT_TIERS:
        if minimum >= lo and maximum <= hi:
            return name
    return "BIGINT"


def _field_type(prop: dict) -> str:
    """One property schema → Spark SQL type string (the
    ``toFieldDefinition`` analog, toSql.js:60-126)."""
    types = prop.get("type")
    if isinstance(types, list):
        non_null = [t for t in types if t != "null"]
        types = non_null[0] if len(non_null) == 1 else None
    fmt = prop.get("format")
    if types == "string" or (types is None and ("maxLength" in prop or fmt)):
        if fmt == "date":
            return "DATE"
        if fmt in ("date-time", "time"):
            return "TIMESTAMP"
        return "STRING"
    if types == "integer":
        return _integer_type(prop.get("minimum"), prop.get("maximum"))
    if types == "number":
        m = prop.get("multipleOf")
        if isinstance(m, (int, float)) and m == int(m) and m >= 1:
            return _integer_type(prop.get("minimum"), prop.get("maximum"))
        return "DOUBLE"
    if types == "boolean":
        return "BOOLEAN"
    if types == "array":
        items = prop.get("items")
        elem = _field_type(items) if isinstance(items, dict) else "STRING"
        return f"ARRAY<{elem}>"
    if types == "object":
        inner = prop.get("properties")
        if isinstance(inner, dict) and inner:
            required = set(prop.get("required") or [])
            parts = ", ".join(
                f"{name}: {_field_type(sub)}"
                + ("" if name in required else "")
                for name, sub in inner.items())
            return f"STRUCT<{parts}>"
        return "MAP<STRING, STRING>"
    return "STRING"


def schema_to_ddl(schema: dict) -> str:
    """Object schema → Spark DDL column list, e.g.
    ``url STRING NOT NULL, n_chars INT`` — usable directly in
    ``spark.createDataFrame(..., ddl)`` or DDL statements."""
    props = schema.get("properties") or {}
    required = set(schema.get("required") or [])
    cols = []
    for name, prop in props.items():
        if not isinstance(prop, dict):
            prop = {}
        t = _field_type(prop)
        null = " NOT NULL" if name in required else ""
        cols.append(f"{name} {t}{null}")
    return ", ".join(cols)


def schema_to_create_table(schema: dict, table: str,
                           using: str = "parquet") -> str:
    """Object schema → ``CREATE TABLE`` statement (the ``toCreateTable``
    analog, toSql.js:155-173) with layout hints from ``x_*`` keywords:
    ``x_index`` / ``x_primary`` become PARTITIONED BY-compatible
    comments + TBLPROPERTIES the engine's checks consume."""
    ddl = schema_to_ddl(schema)
    props = []
    if schema.get("x_primary"):
        props.append(f"'jema.primary'='{','.join(_as_list(schema['x_primary']))}'")
    if schema.get("x_unique"):
        props.append(f"'jema.unique'='{','.join(_as_list(schema['x_unique']))}'")
    if schema.get("x_index"):
        props.append(f"'jema.index'='{','.join(_as_list(schema['x_index']))}'")
    tbl_props = f"\nTBLPROPERTIES ({', '.join(props)})" if props else ""
    return f"CREATE TABLE {table} ({ddl})\nUSING {using}{tbl_props}"


def _as_list(v) -> List[str]:
    return [v] if isinstance(v, str) else list(v)


def autoincrement_columns(schema: dict) -> List[str]:
    """Property names declaring ``x_autoincrement: true``
    (toSql.js:47,69-75,114)."""
    props = schema.get("properties")
    if not isinstance(props, dict):
        return []
    return [name for name, sub in props.items()
            if isinstance(sub, dict) and sub.get("x_autoincrement")]


def with_autoincrement(df, schema_or_col, dense: bool = False):
    """Generation-side mapping of ``x_autoincrement`` (the reference
    emits ``AUTO_INCREMENT`` DDL, toSql.js:114; Spark has no engine
    sequence, so the engine generates the ids): adds the declared
    column(s) as 64-bit unique ids.

    Default (``dense=False``): ``monotonically_increasing_id`` — unique,
    partition-gapped, zero coordination; the only O(1) form at cluster
    scale.  ``dense=True``: gap-free 0..N-1 ids via the two-pass
    partition-offset plan (count per partition, cumulative offsets
    broadcast, offset + local row number) — no global sort, no single
    partition, one extra scan."""
    from pyspark.sql import functions as F

    names = ([schema_or_col] if isinstance(schema_or_col, str)
             else autoincrement_columns(schema_or_col))
    if not names:
        return df
    if not dense:
        for name in names:
            df = df.withColumn(name, F.monotonically_increasing_id())
        return df
    # NOTE: the dense path scans twice (count pass + generate pass);
    # the input must be a stable source (file scan / cached) so both
    # passes see the same partitioning.
    mono = df.withColumn("__pid", F.spark_partition_id()) \
             .withColumn("__mono", F.monotonically_increasing_id())
    counts = {r["__pid"]: r["cnt"] for r in
              mono.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt"))
                  .collect()}
    if not counts:
        for name in names:
            df = df.withColumn(name, F.lit(None).cast("long"))
        return df
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    # try_element_at: ANSI mode throws MAP_KEY_DOES_NOT_EXIST on a miss;
    # if the second pass sees a partition id the count pass did not
    # (non-stable source), ids degrade to NULL instead of killing the job
    offset_expr = F.try_element_at(
        F.create_map(*[F.lit(x) for pid in sorted(offsets)
                       for x in (pid, offsets[pid])]),
        F.col("__pid"))
    # monotonically_increasing_id is (partition_id << 33) + local index
    # by construction, so the local index falls out with no window and
    # no shuffle
    local = F.col("__mono") - F.shiftleft(F.col("__pid").cast("long"), 33)
    out = mono
    for name in names:
        out = out.withColumn(name, (offset_expr + local).cast("long"))
    return out.drop("__pid", "__mono")


def layout_hints(schema: dict) -> Dict[str, List[str]]:
    """``x_index``/``x_primary`` → partition/sort-order hints (the
    toIDB keyPath/index analog, toIDB.js:4-28)."""
    return {
        "partition_by": _as_list(schema.get("x_index") or []),
        "sort_by": _as_list(schema.get("x_primary") or []),
        "unique": _as_list(schema.get("x_unique") or []),
    }


# ---------------------------------------------------------------------------
# Direction 2: Spark StructType → JSON Schema (fromShowFields analog)
# ---------------------------------------------------------------------------

def _type_to_prop(dtype: T.DataType) -> dict:
    if isinstance(dtype, T.ByteType):
        return {"type": "integer", "minimum": -128, "maximum": 127}
    if isinstance(dtype, T.ShortType):
        return {"type": "integer", "minimum": -(2 ** 15), "maximum": 2 ** 15 - 1}
    if isinstance(dtype, T.IntegerType):
        return {"type": "integer", "minimum": -(2 ** 31), "maximum": 2 ** 31 - 1}
    if isinstance(dtype, T.LongType):
        return {"type": "integer"}
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return {"type": "number"}
    if isinstance(dtype, T.DecimalType):
        # scale s → values are multiples of 10^-s (the closest jema can
        # say about fixed-point storage)
        return {"type": "number", "multipleOf": 10 ** -dtype.scale}
    if isinstance(dtype, T.BooleanType):
        return {"type": "boolean"}
    if isinstance(dtype, T.DateType):
        return {"type": "string", "format": "date"}
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return {"type": "string", "format": "date-time"}
    if isinstance(dtype, T.BinaryType):
        return {"type": "string", "contentEncoding": "base64"}
    if isinstance(dtype, T.ArrayType):
        elem = _type_to_prop(dtype.elementType)
        if dtype.containsNull:
            et = elem.get("type")
            elem["type"] = [et, "null"] if isinstance(et, str) else et
        return {"type": "array", "items": elem}
    if isinstance(dtype, T.MapType):
        return {"type": "object",
                "additionalProperties": _type_to_prop(dtype.valueType)}
    if isinstance(dtype, T.StructType):
        return struct_to_schema(dtype)
    return {"type": "string"}


def struct_to_schema(struct: T.StructType) -> dict:
    """``StructType`` → JSON Schema object: non-nullable → ``required``,
    integral widths → bounds, temporal types → ``format`` — the inverse
    bridge (``fromShowFields``, toSql.js:2-58)."""
    properties = {}
    required = []
    for field in struct.fields:
        prop = _type_to_prop(field.dataType)
        properties[field.name] = prop
        if not field.nullable:
            required.append(field.name)
    out: dict = {"type": "object", "properties": properties}
    if required:
        out["required"] = required
    return out
