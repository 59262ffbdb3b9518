"""Schema ⇄ Spark-SQL bridge (the toSql.js/toIDB.js capability) and
meta-validation (schemaErrors, reference §3.4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jema_js_spark.schema.frontend import Schema
from jema_js_spark.schema.sql_bridge import (
    layout_hints,
    schema_to_create_table,
    schema_to_ddl,
    struct_to_schema,
)

PAGE_SCHEMA = {
    "type": "object",
    "required": ["url", "warc_ts", "text", "lang"],
    "properties": {
        "url": {"type": "string", "maxLength": 2048},
        "warc_ts": {"type": "string", "format": "date-time"},
        "html": {"type": ["string", "null"]},
        "text": {"type": "string", "minLength": 1},
        "lang": {"enum": ["en", "de"], "type": "string"},
        "fetch_day": {"type": "string", "format": "date"},
        "n_bytes": {"type": "integer", "minimum": 0, "maximum": 100000},
        "tiny": {"type": "integer", "minimum": -10, "maximum": 10},
        "score": {"type": "number"},
        "flags": {"type": "array", "items": {"type": "boolean"}},
    },
    "x_unique": ["url"],
    "x_index": ["warc_ts"],
}


def test_schema_to_ddl_types_and_nullability(spark):
    ddl = schema_to_ddl(PAGE_SCHEMA)
    assert "url STRING NOT NULL" in ddl
    assert "warc_ts TIMESTAMP NOT NULL" in ddl
    assert "fetch_day DATE" in ddl
    assert "n_bytes INT" in ddl          # fits in 32-bit → narrowed
    assert "tiny BYTE" in ddl            # fits in 8-bit → narrowest
    assert "score DOUBLE" in ddl
    assert "flags ARRAY<BOOLEAN>" in ddl
    # round-trip: the DDL must parse as a Spark schema
    struct = T._parse_datatype_string(f"struct<{ddl.replace(' NOT NULL', '')}>")
    assert isinstance(struct, T.StructType)
    df = spark.createDataFrame([], schema=ddl)
    assert not df.schema["url"].nullable
    assert df.schema["html"].nullable


def test_create_table_with_layout_hints():
    stmt = schema_to_create_table(PAGE_SCHEMA, "pages")
    assert stmt.startswith("CREATE TABLE pages (")
    assert "'jema.unique'='url'" in stmt
    assert "'jema.index'='warc_ts'" in stmt
    hints = layout_hints(PAGE_SCHEMA)
    assert hints["partition_by"] == ["warc_ts"]
    assert hints["unique"] == ["url"]


def test_struct_to_schema_roundtrip(spark):
    struct = T.StructType([
        T.StructField("url", T.StringType(), nullable=False),
        T.StructField("warc_ts", T.TimestampType(), nullable=False),
        T.StructField("n", T.IntegerType()),
        T.StructField("b", T.ByteType()),
        T.StructField("price", T.DecimalType(10, 2)),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("meta", T.StructType([
            T.StructField("k", T.LongType(), nullable=False)])),
    ])
    schema = struct_to_schema(struct)
    assert set(schema["required"]) == {"url", "warc_ts"}
    assert schema["properties"]["warc_ts"] == {
        "type": "string", "format": "date-time"}
    assert schema["properties"]["n"]["maximum"] == 2 ** 31 - 1
    assert schema["properties"]["b"]["minimum"] == -128
    assert schema["properties"]["price"]["multipleOf"] == pytest.approx(0.01)
    assert schema["properties"]["meta"]["required"] == ["k"]
    # the generated schema must itself be a valid 2020-12 schema and a
    # usable validator
    assert Schema(dict(schema)).schema_errors() == []
    v = Schema(dict(schema))
    assert v.validate({"url": "x", "warc_ts": "2024-01-01T00:00:00Z", "n": 5})
    assert not v.validate({"n": 5})  # required url/warc_ts missing


class TestSchemaErrors:
    def test_valid_schema_has_no_errors(self):
        assert Schema({"type": "string", "minLength": 3}).schema_errors() == []
        assert Schema(dict(PAGE_SCHEMA)).schema_errors() == []

    def test_bad_keyword_values_caught(self):
        errs = Schema({"type": "stirng"}).schema_errors()
        assert errs, "typo'd type name must fail meta-validation"
        errs = Schema({"minLength": -1}).schema_errors()
        assert errs
        errs = Schema({"required": "url"}).schema_errors()
        assert errs
        errs = Schema({"multipleOf": 0}).schema_errors()
        assert errs

    def test_nested_bad_schema_caught(self):
        errs = Schema({"properties": {"a": {"maxItems": "five"}}}).schema_errors()
        assert errs


class TestAutoincrement:
    """x_autoincrement generation op (toSql.js:47,69-75,114)."""

    SCHEMA = {"type": "object",
              "properties": {"rid": {"type": "integer",
                                      "x_autoincrement": True},
                              "v": {"type": "integer"}}}

    def test_detects_declared_columns(self):
        from jema_js_spark.schema.sql_bridge import autoincrement_columns
        assert autoincrement_columns(self.SCHEMA) == ["rid"]
        assert autoincrement_columns({"properties": {"v": {}}}) == []

    def test_sparse_ids_unique(self, spark):
        from jema_js_spark.schema.sql_bridge import with_autoincrement
        df = spark.range(1000).repartition(7).select(F.col("id").alias("v"))
        out = with_autoincrement(df, self.SCHEMA).collect()
        ids = [r["rid"] for r in out]
        assert len(set(ids)) == 1000

    def test_dense_ids_gap_free(self, spark):
        from jema_js_spark.schema.sql_bridge import with_autoincrement
        df = spark.range(500).repartition(9).select(F.col("id").alias("v"))
        out = with_autoincrement(df, "rid", dense=True).collect()
        ids = sorted(r["rid"] for r in out)
        assert ids == list(range(500))

    def test_dense_empty_input(self, spark):
        from jema_js_spark.schema.sql_bridge import with_autoincrement
        df = spark.range(0).select(F.col("id").alias("v"))
        assert with_autoincrement(df, "rid", dense=True).count() == 0
