"""Vendored draft 2020-12 meta-schema (consolidated single document).

The reference fetches the official meta-schema over HTTP to implement
``schemaErrors()`` (schema.js:49-52); this sandbox has no network, so
the dialect's vocabulary meta-schemas are consolidated here into one
self-describing document (public specification content, restated).
Sub-schema positions use ``$dynamicRef: "#meta"`` bookended by the root
``$dynamicAnchor``, exactly like the official core meta-schema, so
meta-validation also exercises the kernel's dynamic-scope machinery.
"""

from __future__ import annotations

META_ID = "https://json-schema.org/draft/2020-12/schema"

_META = {"$dynamicRef": "#meta"}
_SCHEMA_ARRAY = {"type": "array", "minItems": 1, "items": _META}
_NON_NEG_INT = {"type": "integer", "minimum": 0}
_STRING_ARRAY = {"type": "array", "items": {"type": "string"},
                 "uniqueItems": True}
_SIMPLE_TYPES = {"enum": ["array", "boolean", "integer", "null", "number",
                           "object", "string"]}
_ANCHOR = {"type": "string", "pattern": "^[A-Za-z_][-A-Za-z0-9._]*$"}
_URI = {"type": "string", "format": "uri"}
_URI_REF = {"type": "string", "format": "uri-reference"}

METASCHEMA_2020_12 = {
    "$schema": META_ID,
    "$id": META_ID,
    "$dynamicAnchor": "meta",
    "title": "Core and Validation specifications meta-schema (consolidated)",
    "type": ["object", "boolean"],
    "properties": {
        # core
        "$id": {"type": "string", "format": "uri-reference",
                 "pattern": "^[^#]*#?$"},
        "$schema": _URI,
        "$ref": _URI_REF,
        "$anchor": _ANCHOR,
        "$dynamicRef": _URI_REF,
        "$dynamicAnchor": _ANCHOR,
        "$vocabulary": {"type": "object",
                         "propertyNames": _URI,
                         "additionalProperties": {"type": "boolean"}},
        "$comment": {"type": "string"},
        "$defs": {"type": "object", "additionalProperties": _META},
        # applicators
        "prefixItems": _SCHEMA_ARRAY,
        "items": _META,
        "contains": _META,
        "additionalProperties": _META,
        "properties": {"type": "object", "additionalProperties": _META,
                        "default": {}},
        "patternProperties": {"type": "object",
                               "additionalProperties": _META,
                               "propertyNames": {"format": "regex"},
                               "default": {}},
        "dependentSchemas": {"type": "object",
                              "additionalProperties": _META,
                              "default": {}},
        "propertyNames": _META,
        "if": _META,
        "then": _META,
        "else": _META,
        "allOf": _SCHEMA_ARRAY,
        "anyOf": _SCHEMA_ARRAY,
        "oneOf": _SCHEMA_ARRAY,
        "not": _META,
        # unevaluated
        "unevaluatedItems": _META,
        "unevaluatedProperties": _META,
        # validation
        "type": {"anyOf": [
            _SIMPLE_TYPES,
            {"type": "array", "items": _SIMPLE_TYPES, "minItems": 1,
             "uniqueItems": True},
        ]},
        "const": True,
        "enum": {"type": "array"},
        "multipleOf": {"type": "number", "exclusiveMinimum": 0},
        "maximum": {"type": "number"},
        "exclusiveMaximum": {"type": "number"},
        "minimum": {"type": "number"},
        "exclusiveMinimum": {"type": "number"},
        "maxLength": _NON_NEG_INT,
        "minLength": {"type": "integer", "minimum": 0, "default": 0},
        "pattern": {"type": "string", "format": "regex"},
        "maxItems": _NON_NEG_INT,
        "minItems": {"type": "integer", "minimum": 0, "default": 0},
        "uniqueItems": {"type": "boolean", "default": False},
        "maxContains": _NON_NEG_INT,
        "minContains": {"type": "integer", "minimum": 0, "default": 1},
        "maxProperties": _NON_NEG_INT,
        "minProperties": {"type": "integer", "minimum": 0, "default": 0},
        "required": _STRING_ARRAY,
        "dependentRequired": {"type": "object",
                               "additionalProperties": _STRING_ARRAY},
        # metadata / annotations
        "title": {"type": "string"},
        "description": {"type": "string"},
        "default": True,
        "deprecated": {"type": "boolean", "default": False},
        "readOnly": {"type": "boolean", "default": False},
        "writeOnly": {"type": "boolean", "default": False},
        "examples": {"type": "array"},
        # format / content
        "format": {"type": "string"},
        "contentEncoding": {"type": "string"},
        "contentMediaType": {"type": "string"},
        "contentSchema": _META,
        # the reference's SQL-bridge extension keywords (tools/toSql.js)
        "x_primary": {"type": ["string", "array", "boolean"]},
        "x_unique": {"type": ["string", "array", "boolean"]},
        "x_index": {"type": ["string", "array", "boolean"]},
        "x_autoincrement": {"type": "boolean"},
        "x_foreign": {"type": "object"},
    },
}
