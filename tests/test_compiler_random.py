"""Randomized differential sweep: ~80 generated schemas over the typed
row shape, all compiled into ONE projection and compared against the
kernel verdict per (schema, row).  Complements the hand-picked
differential cases with breadth at negligible Spark cost."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from jema_js_spark.compiler.compile import SchemaCompiler
from jema_js_spark.kernel.kernel import Validator
from jema_js_spark.schema.frontend import Schema
from tests.test_compiler_spark import ROWS, ROWS_SCHEMA, _row_to_json_value

_STR_COLS = ["url", "text", "lang"]
_NUM_COLS = ["id", "score", "n"]
_ALL_COLS = ["id", "url", "text", "lang", "score", "n", "flag", "tags",
             "nums", "meta"]


def _leaf(rng: random.Random) -> dict:
    kind = rng.choice(["str", "num", "arr", "enum", "type",
                       "objapp", "uneval", "uneval_probe", "refs", "deps",
                       "uneval_static", "uneval_items_static"])
    if kind == "uneval_items_static":
        # round-5 items claim analysis: unevaluatedItems beside
        # allOf/anyOf/oneOf/not/$ref — randomly covered (→ Plane A) or
        # uncovered (→ Plane B), both pinned to the kernel
        col = rng.choice(["tags", "nums"])
        inner = ({"minLength": 1} if col == "tags"
                 else {"minimum": rng.randint(0, 2)})
        body = {"unevaluatedItems": rng.choice(
            [False, inner, {"type": "string" if col == "tags"
                             else "number"}])}
        if rng.random() < 0.7:
            body["prefixItems"] = [rng.choice([True, inner])
                                    for _ in range(rng.randint(1, 2))]
        sib = rng.choice(["allOf", "anyOf", "oneOf", "not", "ref",
                           "items", "if"])
        branch = rng.choice([
            {"prefixItems": [rng.choice([True, inner])
                              for _ in range(rng.randint(1, 3))]},
            {"minItems": rng.randint(0, 3)},
            {"items": inner},
            {"contains": inner},
        ])
        if sib in ("allOf", "anyOf", "oneOf"):
            body[sib] = [branch]
        elif sib == "not":
            body["not"] = rng.choice([branch,
                                       {"not": {"minItems": 1}}])
        elif sib == "items":
            body["items"] = inner
        elif sib == "if":
            body["if"] = branch
            if rng.random() < 0.6:
                body["then"] = rng.choice([branch, {"maxItems": 4}])
        else:
            anchor = f"i{rng.randrange(1 << 30):x}"
            body["$defs"] = {"t": {"$anchor": anchor, **branch}}
            body["$ref"] = f"#{anchor}"
        return {"properties": {col: body}}
    if kind == "uneval_static":
        # round-5 static claim-analysis shapes (VERDICT r4 #1):
        # unevaluated* beside anyOf/oneOf/not/dependentSchemas/$ref —
        # randomly covered (→ Plane A) or uncovered (→ Plane B), both
        # differentially pinned to the kernel
        claimed = rng.sample(_ALL_COLS, rng.randint(4, 9))
        out = {"properties": {c: True for c in claimed},
               "unevaluatedProperties": rng.choice(
                   [False, {"type": rng.choice(["string", "number"])}])}
        sib = rng.choice(["anyOf", "oneOf", "not", "deps", "ref"])
        if sib in ("anyOf", "oneOf"):
            branches = []
            for _ in range(rng.randint(1, 3)):
                b_col = rng.choice(_ALL_COLS)   # covered or not — random
                branches.append(rng.choice([
                    {"required": [b_col]},
                    {"properties": {b_col: {"type": rng.choice(
                        ["string", "number", "boolean", "array"])}}},
                    {"properties": {b_col: True}, "required": [b_col]},
                ]))
            out[sib] = branches
        elif sib == "not":
            inner = rng.choice([
                {"required": [rng.choice(_ALL_COLS)]},
                {"properties": {rng.choice(_ALL_COLS): {
                    "type": rng.choice(["string", "number"])}}},
                # nested not — must stay Plane B (plain-reset quirk)
                {"not": {"required": [rng.choice(_ALL_COLS)]}},
            ])
            out["not"] = inner
        elif sib == "deps":
            trigger = rng.choice(_ALL_COLS)
            dep_col = rng.choice(_ALL_COLS)
            out[rng.choice(["dependentSchemas", "dependencies"])] = {
                trigger: {"properties": {dep_col: True},
                          **({"required": [dep_col]}
                             if rng.random() < 0.3 else {})}}
        else:
            # $anchor, not a '#/$defs/…' pointer: the leaf may be
            # embedded at any depth by the combinator wrapper
            anchor = f"u{rng.randrange(1 << 30):x}"
            target_cols = rng.sample(_ALL_COLS, rng.randint(2, 6))
            out["$defs"] = {"t": {"$anchor": anchor,
                                   "properties": {c: True
                                                  for c in target_cols}}}
            out["$ref"] = f"#{anchor}"
        return out
    if kind == "uneval_probe":
        # round-2: unevaluated* with a claiming if-probe / combinator
        # sibling — must fall back to Plane B and match the kernel's
        # partial-claim probe semantics
        claimed = rng.sample(_ALL_COLS, rng.randint(4, 9))
        probe_col = rng.choice(_ALL_COLS)
        probe = {"properties": {probe_col: {
            "type": rng.choice(["string", "number", "boolean"])}}}
        if rng.random() < 0.5:
            probe["required"] = [probe_col]
        out = {"properties": {c: True for c in claimed},
               "unevaluatedProperties": rng.choice(
                   [False, {"type": rng.choice(["string", "number"])}]),
               "if": probe}
        if rng.random() < 0.5:
            out["then"] = {"properties": {rng.choice(_ALL_COLS): True}}
        return out
    if kind == "refs":
        # round-2: $ref inside (or beside) a Plane-B fallback subtree —
        # the detached mini-schema must resolve against the root's
        # anchor table.  $anchor (not a '#/$defs/…' pointer) because the
        # leaf may be embedded at any depth by the combinator wrapper.
        anchor = f"a{rng.randrange(1 << 30):x}"
        target = rng.choice([
            {"type": rng.choice(["string", "number"])},
            {"properties": {c: True for c in rng.sample(_ALL_COLS, 6)}},
            {"minimum": rng.randint(-5, 5)},
        ])
        target = {"$anchor": anchor, **target}
        body = {"$defs": {"t": target}}
        ref = {"$ref": f"#{anchor}"}
        shape = rng.random()
        if shape < 0.4 and "properties" in target:
            body.update({**ref,
                         "unevaluatedProperties": rng.choice(
                             [False, {"type": "string"}])})
        elif shape < 0.7:
            body["not"] = {**ref, "unevaluatedProperties": True}
        else:
            col = rng.choice(_NUM_COLS if "minimum" in target else _STR_COLS)
            body["properties"] = {col: {"anyOf": [ref, {"type": "null"}]}}
        return body
    if kind == "deps":
        trigger = rng.choice(_ALL_COLS)
        dep = rng.choice([
            rng.sample(_ALL_COLS, 2),
            {"properties": {rng.choice(_ALL_COLS): True},
             "required": rng.sample(_ALL_COLS, 1)},
        ])
        out = {"dependencies": {trigger: dep}}
        if rng.random() < 0.4:
            out.update({"properties": {c: True for c in
                                        rng.sample(_ALL_COLS, 8)},
                        "unevaluatedProperties": False})
        return out
    if kind == "objapp":
        return rng.choice([
            {"patternProperties": {rng.choice(["^t", "s$", "n"]):
                                    {"type": rng.choice(["string", "number",
                                                          "array"])}}},
            {"propertyNames": {"maxLength": rng.randint(1, 8)}},
            {"properties": {"meta": {"required": rng.sample(
                ["zip", "depth"], rng.randint(1, 2))}}},
            {"dependentRequired": {rng.choice(_ALL_COLS):
                                    rng.sample(_ALL_COLS, 2)}},
            {"properties": {c: True for c in
                             rng.sample(_ALL_COLS, rng.randint(2, 5))},
             "additionalProperties": rng.choice(
                 [False, {"type": "string"}, {"type": "number"}])},
            {"minProperties": rng.randint(0, 11)},
            {"maxProperties": rng.randint(0, 11)},
        ])
    if kind == "uneval":
        claimed = rng.sample(_ALL_COLS, rng.randint(5, 10))
        return {"properties": {c: True for c in claimed},
                "unevaluatedProperties": rng.choice(
                    [False, {"type": rng.choice(["string", "number"])}])}
    if kind == "str":
        col = rng.choice(_STR_COLS)
        checks = rng.sample([
            ("minLength", rng.randint(0, 30)),
            ("maxLength", rng.randint(0, 60)),
            # incl. \p property escapes (round 7): columnar js_rlike
            # pandas path vs kernel expanded-class re, differentially
            ("pattern", rng.choice(["^h", "o", "[a-z]+$", "^[a-z]{2}$",
                                    r"^\p{Ll}", r"\p{Nd}", r"^\P{N}+$"])),
        ], rng.randint(1, 2))
        return {"properties": {col: dict(checks)}}
    if kind == "num":
        col = rng.choice(_NUM_COLS)
        checks = rng.sample([
            ("minimum", rng.randint(-5, 5)),
            ("maximum", rng.randint(-2, 100)),
            ("exclusiveMinimum", rng.randint(-5, 5)),
            ("multipleOf", rng.choice([1, 2, 3, 0.5])),
            ("type", rng.choice(["integer", "number"])),
        ], rng.randint(1, 3))
        return {"properties": {col: dict(checks)}}
    if kind == "arr":
        col = rng.choice(["tags", "nums"])
        inner = ({"minLength": 1} if col == "tags"
                 else {"minimum": rng.randint(0, 3)})
        body = rng.choice([
            {"minItems": rng.randint(0, 3)},
            {"maxItems": rng.randint(0, 4)},
            {"uniqueItems": True},
            {"items": inner},
            {"contains": inner, "minContains": rng.randint(0, 2)},
        ])
        return {"properties": {col: body}}
    if kind == "enum":
        return {"properties": {"lang": {"enum": rng.sample(
            ["en", "de", "fr", "es", "xx", None], rng.randint(1, 4))}}}
    return {"required": rng.sample(_ALL_COLS, rng.randint(1, 3))}


def _schema(rng: random.Random, depth: int = 0) -> dict:
    if depth >= 2 or rng.random() < 0.5:
        return _leaf(rng)
    comb = rng.choice(["allOf", "anyOf", "oneOf", "not", "if"])
    if comb == "not":
        return {"not": _schema(rng, depth + 1)}
    if comb == "if":
        return {"if": _schema(rng, depth + 1),
                "then": _schema(rng, depth + 1),
                "else": _schema(rng, depth + 1)}
    return {comb: [_schema(rng, depth + 1)
                   for _ in range(rng.randint(1, 3))]}


def _random_row(rng: random.Random, i: int):
    """One random row for ROWS_SCHEMA — hostile value space: NaN/Inf,
    -0.0, huge ints/doubles, astral strings, empty/None containers."""
    def s():
        return rng.choice([
            None, "", "a", "en", "https://x.example/p", "x" * 60,
            "\U0001F600", "é́", "UP low 42", " white  space "])

    def num():
        return rng.choice([
            None, 0.0, -0.0, 1.0, -1.5, 0.5, float("nan"), float("inf"),
            float("-inf"), 1e308, -1e308, 1e-7, 2.0, 3.0, 97.5])

    def n_int():
        return rng.choice([None, 0, 1, -1, 7, 50, 96, -100,
                           9223372036854775807, -9223372036854775808])

    tags = rng.choice([None, [], [""], ["a"], ["a", "a"],
                       ["a", "b", "c", "d", "e"], ["\U0001F4A9"]])
    nums = rng.choice([None, [], [0.0], [1.0, 1.0], [2.5, -0.0],
                       [float("nan")], [float("inf"), 0.5], [1.0, 2.0, 3.0]])
    meta = rng.choice([None, ("8000", 2), ("", None), (None, 0),
                       ("9999", -1)])
    return (i, s(), s(), s(), num(), n_int(),
            rng.choice([None, True, False]), tags, nums, meta)


def test_random_rows_columnar_vs_kernel(spark):
    """Second hunt axis: the same random schema generator over RANDOM
    row values (hostile numerics, astral strings, empty containers) —
    catches value-space bugs the 9 fixed edge rows miss."""
    rng = random.Random(777)
    rows = [_random_row(rng, i) for i in range(40)]
    schemas = [_schema(rng) for _ in range(60)]
    df = spark.createDataFrame(rows, ROWS_SCHEMA)

    cols = [F.col("id").alias("__row_id")]
    for i, sch in enumerate(schemas):
        plan = SchemaCompiler(dict(sch)).compile_plan(df)
        cols.append(plan.valid_column().alias(f"v{i}"))
    got = {r["__row_id"]: r for r in df.select(*cols).collect()}

    collected = df.collect()
    mismatches = []
    for i, sch in enumerate(schemas):
        v = Validator(Schema(dict(sch)))
        for row in collected:
            value = _row_to_json_value(row, ROWS_SCHEMA)
            expected = v.validate(value)
            if got[row["id"]][f"v{i}"] != expected:
                mismatches.append((i, sch, row["id"], value, expected))
    assert not mismatches, f"{len(mismatches)} mismatches; first: {mismatches[0]}"


def test_random_schemas_columnar_vs_kernel(spark):
    rng = random.Random(42)
    schemas = [_schema(rng) for _ in range(150)]
    df = spark.createDataFrame(ROWS, ROWS_SCHEMA)

    cols = [F.col("id").alias("__row_id")]
    for i, sch in enumerate(schemas):
        plan = SchemaCompiler(dict(sch)).compile_plan(df)
        cols.append(plan.valid_column().alias(f"v{i}"))
    got = {r["__row_id"]: r for r in df.select(*cols).collect()}

    rows = df.collect()
    mismatches = []
    for i, sch in enumerate(schemas):
        v = Validator(Schema(dict(sch)))
        for row in rows:
            value = _row_to_json_value(row, ROWS_SCHEMA)
            expected = v.validate(value)
            actual = got[row["id"]][f"v{i}"]
            if actual != expected:
                mismatches.append((i, sch, row["id"], actual, expected))
    assert not mismatches, f"{len(mismatches)} mismatches; first: {mismatches[0]}"


def _map_schema(rng: random.Random) -> dict:
    """Random dynamic-key object contract (round 6): object keywords
    over a map<string,long> column — every admissible keyword, with
    boolean/dict additionalProperties, multi-pattern patternProperties,
    propertyNames constraints, presence dependencies, and counts."""
    out: dict = {"type": "object"}
    if rng.random() < 0.5:
        out["propertyNames"] = rng.choice([
            {"pattern": rng.choice(["^[a-z]+$", "^x", "[0-9]$"])},
            {"minLength": rng.randint(1, 2)},
            {"maxLength": rng.randint(1, 4)},
        ])
    if rng.random() < 0.6:
        out["patternProperties"] = {
            p: rng.choice([{"minimum": rng.randint(-2, 5)},
                           {"maximum": rng.randint(0, 8)},
                           {"type": "integer"}, True])
            for p in rng.sample(["^a", "b$", "^x[0-9]", "c"],
                                rng.randint(1, 2))}
    if rng.random() < 0.7:
        out["additionalProperties"] = rng.choice([
            True, False, {"minimum": 0}, {"maximum": 6},
            {"type": "integer", "multipleOf": 2}])
    if rng.random() < 0.4:
        out["required"] = rng.sample(["a", "b", "x1", "zz"],
                                     rng.randint(1, 2))
    if rng.random() < 0.4:
        out["minProperties"] = rng.randint(0, 3)
    if rng.random() < 0.3:
        out["maxProperties"] = rng.randint(0, 4)
    if rng.random() < 0.3:
        out["dependentRequired"] = {rng.choice(["a", "b"]):
                                    [rng.choice(["c", "x1"])]}
    if rng.random() < 0.2:
        out["dependentSchemas"] = {
            rng.choice(["a", "c"]): rng.choice([
                {"minProperties": 2}, {"required": ["b"]}])}
    if rng.random() < 0.2:
        out["properties"] = {rng.choice(["a", "b"]):
                             {"minimum": rng.randint(-1, 3)}}
    return out


def _map_rows(rng: random.Random, n: int):
    keys = ["a", "b", "c", "x1", "x9", "ab", "zz", "A", "é", ""]
    rows = []
    for _ in range(n):
        if rng.random() < 0.05:
            rows.append((None,))
            continue
        m = {}
        for _ in range(rng.randint(0, 4)):
            m[rng.choice(keys)] = rng.choice(
                [0, 1, -3, 5, 8, 100, None, 2**53 + 1])
        rows.append((m,))
    return rows


def test_random_map_schemas_columnar_vs_kernel(spark):
    """Round-6 sweep: random dynamic-key contracts × random
    map<string,long> rows — compiled map-lambda predicates must equal
    the kernel under the bridge (null map value ⇔ absent key), Plane B
    allowed only where the keyword genuinely needs the kernel."""
    from pyspark.sql import types as T

    rng = random.Random(606)
    schemas = [_map_schema(rng) for _ in range(80)]
    data = _map_rows(rng, 40)
    mt = T.MapType(T.StringType(), T.LongType())
    df = spark.createDataFrame(
        data, T.StructType([T.StructField("m", mt, True)])) \
        .withColumn("__row_id", F.monotonically_increasing_id())
    df = df.cache()
    rows = df.collect()

    cols = [F.col("__row_id")]
    for i, sch in enumerate(schemas):
        plan = SchemaCompiler(Schema(dict(sch))).compile_plan_for_column(
            F.col("m"), mt)
        cols.append(plan.valid_column().alias(f"v{i}"))
    got = {r["__row_id"]: r for r in df.select(*cols).collect()}

    mismatches = []
    for i, sch in enumerate(schemas):
        v = Validator(Schema(dict(sch)))
        for row in rows:
            d = row["m"]
            kd = None if d is None else {k: x for k, x in d.items()
                                         if x is not None}
            expected = v.validate(kd)
            actual = bool(got[row["__row_id"]][f"v{i}"])
            if actual != expected:
                mismatches.append((i, sch, d, actual, expected))
    assert not mismatches, \
        f"{len(mismatches)} mismatches; first: {mismatches[0]}"
