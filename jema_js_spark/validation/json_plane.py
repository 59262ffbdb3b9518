"""Columnar (Plane-A) validation for dynamic JSON string columns.

The kernel UDF (``kernel_udf.py``) validates any JSON document with
full draft 2020-12 semantics, but it is the slow plane: Arrow-batched
Python at ~300k docs/s vs the columnar plane's millions of rows/s.
At 100 TB a JSON column with a KNOWN contract should not pay that tax
for the overwhelmingly common well-shaped rows.

This module routes each row at runtime, entirely JVM-side:

1. A **round-trip shortcut** (round 6): the document is parsed once by
   ``from_json`` into the contract's typed struct, and
   ``to_json(struct) == doc`` proves the document IS the canonical
   rendering of that struct — exact key set, exact types, no JSON
   nulls at property level, no formatting the typed plane would lose.
   Anything the struct cannot hold drops out of the re-rendering
   (wrong-typed fields parse to NULL and are omitted; non-objects
   render as ``{}``; duplicate keys collapse; extra keys vanish), so
   any such document fails the equality and falls through — the
   shortcut is fail-closed by construction.  Only residual hazard:
   integer slots hold exact int64 beyond ±2^53 where the kernel's JS
   float semantics diverge — a magnitude guard on the struct covers it.
2. Shortcut misses are re-judged by the **variant gates**:
   ``try_parse_json`` + per-field ``schema_of_variant`` tags decide
   whether the observed shape is exactly representable in the typed
   relational bridge (SQL NULL ⇔ absent key — see compiler/compile.py).
   The tags are authoritative: typed ``variant_get`` extraction COERCES
   (a JSON string "5" extracts as long 5), so the gate must read the
   tag, never rely on extraction failure.  The variant parse is masked
   behind the shortcut (``F.when`` — CaseWhen branches evaluate lazily
   per row), so canonical documents never pay it.  Because every
   Jackson-backed parse is PREFIX-lenient (trailing garbage after one
   complete value is silently ignored — a round-7 find), the gates
   parse the doc inside a sentinel array ``[<doc>,"<md5(doc)>"]`` and
   require exactly two elements with the sentinel second — a
   structural completeness proof no trailing-garbage document can
   satisfy (see the stage-3 comment in ``_routing_pieces``).
3. Routable rows are validated by the columnar compiler
   (``SchemaCompiler.compile_plan_for_column``) over the ``from_json``
   struct — whole-stage-codegen, zero Python compute.  Three routing
   modes share the machinery: fixed-key STRUCT layouts (round 7:
   recursive — nested objects and arrays of objects), dynamic-key MAP
   contracts (``map<string, T>``), and ROOT-VALUE contracts (round 7:
   the document is a bare scalar or array — ``from_json`` cannot parse
   a non-object root, so the route parses ``{"v": <doc>}`` and
   validates the single extracted slot; the round-trip proof compares
   against the same wrapped string, so no document text can spoof it).
   Slots with no single storable type — union-typed properties
   (``{"type": ["integer", "string"]}``), mixed-type
   patternProperties, keys-only layoutless roots — store the value as
   an OPAQUE VARIANT when every constraint on it is TAG-AFFINE (type
   checks and combinators of type checks): the compiler judges those
   by ``schema_of_variant`` tags, still pure Plane A
   (compile.py ``_compile_variant_node``, round 7 session 5).
4. Every other row (malformed JSON, duplicate keys — ``try_parse_json``
   nulls both — non-objects, extra keys, JSON-null-valued fields,
   wrong-typed fields, numeric-exactness hazards) takes the kernel UDF,
   which is always right.  Two plan shapes deliver this split:

   - ``union`` (default): two filters over the source, fast ∪ slow,
     with the slow subset **rebalanced** (AQE shuffle) before its
     Python stage — the residue shuffle moves only non-conforming rows
     (tiny on a healthy corpus) and collapses near-empty partitions so
     the per-task Python worker handshake isn't paid by partitions
     that routed everything columnar.  Python touches ONLY residue
     rows.  Measured round 6 (same-harness MIN-of-3 per level,
     bench_scaling.py, quiet box): 3.0-4.3× over the kernel on the
     representative stream (4.32× at 2 threads/1.2M docs, 3.40× at
     8/4.8M, 3.05× at 32/4.8M; ~1.07M docs/s at 32 threads);
     floor-dominated 1M-doc interleaved pairs under ambient load
     read 1.6-2.1×.
   - ``masked`` (opt-in): ONE pass over the source; the kernel UDF is
     projected for every row (an ArrowEvalPython node cannot be
     skipped per-row) but its input is masked to SQL NULL for routed
     rows, and the UDF's null fast path (kernel_udf.py) vector-fills
     those in one validate call per batch.  Measured on an UNCACHED
     parquet source (round 7, bench_scaling.py plan-shape section):
     a wash at scale against a warm page cache (masked 5.19 s vs
     union 5.34 s at 4.8M docs/local[32] — the union's second
     decode+parse pass ≈ masked's all-rows Arrow projection), masked
     1.48× ahead at 100k-doc batches on local[8] where the union's
     per-branch fixed floors dominate.  On a CACHED source union wins
     (1.16 s vs 1.97 s at 1M docs — the projection floor is ~0.9 s at
     1M×96 tasks even for null input).  masked is the right opt-in
     for genuinely cold object-store scans (the page cache hides the
     union's re-paid IO here) and small per-batch row counts.

Routing gates that protect exact kernel parity (each has a
differential test in tests/test_json_plane.py):

- JSON null values route to the kernel: the bridge reads SQL NULL as
  *absent*, but the kernel sees a present null (e.g. ``required`` must
  still pass) — reference semantics, schema.js:231-288.
- Pure-integer literals beyond ±2^53 route to the kernel: json.loads
  keeps an exact Python int while the struct holds a rounded double
  (tag BIGINT gates on magnitude; a huge literal surfaces as
  DECIMAL(p≥16,0), and one past DECIMAL's 38 digits melts into a
  DOUBLE tag, caught by a raw-token pure-integer regex).
- DECIMAL-tagged values are admitted only while their integer part
  fits 15 digits (p − s ≤ 15): fractional literals are float on both
  planes (and Spark's decimal→double cast is correctly rounded — the
  tests pin parity against Python's strtod), but an integer-valued
  token like ``"10000000000000000001"`` also tags DECIMAL(20,0) and
  is exact only on the kernel plane.

The cost of a mis-routed row is never a wrong verdict — every gate
fails CLOSED onto the kernel; the gates only decide how FAST a row is
judged.

Reference scope: jema.js validates in-memory values one at a time
(schema.js:59-73); two-plane routing over a table is engine design
with no reference analog, mandated by the 10^12-row target.
"""

from __future__ import annotations

import functools
import re
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jema_js_spark.compiler.compile import (CompiledPlan, SchemaCompiler,
                                            _dynamic_scope_hazard,
                                            variant_tag_affine)
from jema_js_spark.schema.frontend import Schema

__all__ = ["analyze_json_contract", "with_valid_json",
           "json_violation_rows", "JsonColumnPlan"]

# struct field names addressable UNQUOTED in a $.name variant path
_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _routable_name(name: str) -> bool:
    """Field names the route can address: plain identifiers unquoted,
    anything else through the bracket form ``$['name']`` (round 7,
    session 4 — dashed keys like content-type are everywhere in web
    data).  The bracket form has NO escape syntax (probed: both quote
    styles reject backslash escapes at analysis time), so a name
    containing a single quote, a backslash, or a control character
    stays kernel-only."""
    if _NAME_RE.match(name):
        return True
    return not any(c == "'" or c == "\\" or ord(c) < 0x20 for c in name)


def _vpath(name: str) -> str:
    """One child segment of a variant-extraction / JSON path."""
    return f".{name}" if _NAME_RE.match(name) else f"['{name}']"

_SCALAR_SQL = {"integer": "bigint", "number": "double",
               "string": "string", "boolean": "boolean"}
_SCALAR_SPARK = {"integer": T.LongType(), "number": T.DoubleType(),
                 "string": T.StringType(), "boolean": T.BooleanType(),
                 # keys-only map routing (round 7): values parse as
                 # OPAQUE variants — never read by a Plane-A predicate
                 "variant": T.VariantType()}

# largest integer magnitude a double holds exactly
_EXACT_LONG = 1 << 53

# a pure-integer token of ≥16 digits may exceed 2^53 — kernel keeps it
# exact, a double would not.  Array form: the token must be delimited
# by array syntax so digit runs inside fractions don't match.  The
# doc-wide form (map routing: dynamic keys have no per-key raw path)
# also admits ':' and '"' delimiters so a hit anywhere — even a quoted
# token inside a string value — routes to the kernel, which only costs
# speed, never a verdict (string-tagged values fail the number gates
# regardless; the quote classes just keep the comment honest).
_BIG_INT_SCALAR = r"^-?[0-9]{16,}$"
_BIG_INT_IN_ARRAY = r"(^|[\[,\s])-?[0-9]{16,}([,\]\s]|$)"
_BIG_INT_ANYWHERE = "(^|[\\[,:\\s\"])-?[0-9]{16,}([,\\]}\\s\"]|$)"

# a number token may overflow to ±Infinity — the variant stores the
# infinity but ``to_json`` renders it as the STRING
# "Infinity"/"-Infinity", which a Plane-B check over a variant's
# rendering would then misread (variants carry no float_paths
# restoration, unlike typed double columns).  Completeness of the
# screen (round-7 review fix — the big-int screen does NOT bound
# mantissas here: its digit run must end at a delimiter, so
# '<310 nines>.5' matches neither):
#   |token| ≈ 10^(integer_digits + exponent), and the double max is
#   1.79e308, so overflow requires integer_digits + exponent ≥ 309.
#   Tokens with a ≥3-digit exponent are screened outright; with the
#   exponent thus ≤ 99, overflow needs ≥ 210 integer digits — any
#   210-digit run (in any context, fraction included: over-screening
#   only costs route rate) is screened too.  Negative exponents only
#   underflow, and underflow rounds identically on both engines.
# Fired only for plans that carry variant slots (round 7 session 5 —
# fixes a live keys-only verdict bug: {"k":1e999} vs a value-reading
# dependentSchemas body judged the string "Infinity").
_BIG_EXP_ANYWHERE = r"[0-9][eE][+-]?[0-9]{3,}|[0-9]{210}"
_BIG_INT_OR_EXP_ANYWHERE = (
    "(" + _BIG_INT_ANYWHERE + ")|(" + _BIG_EXP_ANYWHERE + ")")

# a surrogate \uXXXX escape token (either half, D800-DFFF).  The JVM
# parse REPLACES a lone surrogate with '?' while json.loads keeps it,
# so any content-sensitive check (const/enum equality, pattern,
# propertyNames — typed string slots and variant values alike) would
# judge the replaced form (round-7 review: route said const "?" matched
# a doc holding "\\ud800").  Raw documents are UTF-8 Spark strings and
# cannot hold a LITERAL lone surrogate, so the escape token is the only
# vector; such docs can never hit the round-trip shortcut (the
# re-rendering decodes or replaces the escape), so screening the GATE
# path alone is complete.  Valid astral PAIRS written as escapes are
# over-screened to the kernel — route-rate only (web JSON overwhelmingly
# carries literal UTF-8).  A doc with an escaped backslash + 'ud8xx'
# text also matches, but it round-trips exactly and never reaches the
# gates.
_SURROGATE_ESC_ANYWHERE = r"\\u[dD][89a-fA-F]"

# DECIMAL(p,s) admitted while the integer part fits 15 digits exactly
_DECIMAL_RE = r"DECIMAL\(([0-9]+),([0-9]+)\)"


# --- the routing type tree (round 7: recursive — nested objects and
# arrays of objects route instead of falling whole to the kernel) ----
#
# A *node* describes one typed slot.  The grammar keeps the flat round-6
# tuples verbatim (so published layouts and their tests read unchanged)
# and extends them structurally:
#
#   ("integer"|"number"|"string"|"boolean", None)   scalar slot
#   ("array", "<scalar>")                           array of scalars
#   ("array", <node>)                               array of objects /
#                                                   nested arrays
#   ("object", {name: <node>, ...})                 nested object
#   ("map", <node>)                                 dynamic-key object
#                                                   (round 7: nested
#                                                   additionalProperties/
#                                                   patternProperties
#                                                   slots — all value
#                                                   sources must agree
#                                                   on ONE node)
#
# Depth is capped (``_MAX_NEST``): past it — including any recursive
# $ref chain, which would otherwise unfold forever — the slot becomes
# an OPAQUE variant leaf (round-8 bounded unroll): shallow documents
# stay pure Plane A, deeper tails run as one kernel check over the
# variant's exact rendering (the compiler's variant net).
_MAX_NEST = 12

# Deep-expansion budget per contract: BRANCHING recursion (a
# binary-tree schema with two self-refs per node) would unroll
# 2^_MAX_NEST leaves — an 8k-field struct type and a plan Catalyst
# chews minutes on.  Past the budget the walk truncates to variant
# leaves exactly like the depth cap (sound anywhere — only the
# Plane-A share of the affected subtrees changes).  The budget is
# charged ONLY to nodes deeper than _BUDGET_FREE_DEPTH: exponential
# growth needs depth, while wide-but-shallow production contracts
# (hundreds of flat properties) live at depth 1-2 and must keep their
# full typed layout (round-8 review: charging breadth truncated a
# 300-property flat contract's tail fields to variant leaves).
# 64 deep slots fully unroll every non-branching shape (a linked list
# consumes ~2-4 slots per level × _MAX_NEST levels) while bounding
# the GATE expression tree: the round-8 recursive fuzz OOMed the JVM
# at 256 deep slots when branching recursion mixed arrays-of-self
# (nested forall/_reprable lambdas multiply per array level — the
# budget bounds compiled-plan size, not just analysis time).
_MAX_UNROLL_SLOTS = 64
_BUDGET_FREE_DEPTH = 3

# streaming residue floor (round 7): the union shape's kernel branch is
# repartitioned to this many partitions per microbatch — enough to keep
# a few Python workers busy on a residue-heavy batch, small enough that
# a near-empty residue doesn't pay the per-task Arrow handshake once
# per source partition
_STREAM_RESIDUE_PARTITIONS = 4


def _node_dtype(node: Tuple[str, Any]) -> T.DataType:
    decl, extra = node
    if decl == "object":
        return T.StructType([T.StructField(n, _node_dtype(c), True)
                             for n, c in extra.items()])
    if decl == "map":
        return T.MapType(T.StringType(), _node_dtype(extra))
    if decl == "array":
        et = _SCALAR_SPARK[extra] if isinstance(extra, str) \
            else _node_dtype(extra)
        return T.ArrayType(et)
    return _SCALAR_SPARK[decl]


def _node_has_integer(node: Tuple[str, Any]) -> bool:
    decl, extra = node
    if decl == "integer":
        return True
    if decl == "array":
        return extra == "integer" if isinstance(extra, str) \
            else _node_has_integer(extra)
    if decl == "object":
        return any(_node_has_integer(c) for c in extra.values())
    if decl == "map":
        return _node_has_integer(extra)
    return False


def _node_has_map(node: Tuple[str, Any]) -> bool:
    decl, extra = node
    if decl == "map":
        return True
    if decl == "array":
        return not isinstance(extra, str) and _node_has_map(extra)
    if decl == "object":
        return any(_node_has_map(c) for c in extra.values())
    return False


def _node_has_variant(node: Tuple[str, Any]) -> bool:
    decl, extra = node
    if decl == "variant":
        return True
    if decl == "array":
        return not isinstance(extra, str) and _node_has_variant(extra)
    if decl == "object":
        return any(_node_has_variant(c) for c in extra.values())
    if decl == "map":
        return _node_has_variant(extra)
    return False


def _node_needs_doc_screen(node: Tuple[str, Any],
                           under_elem: bool = False) -> bool:
    """True when a ``number`` slot sits below an array-of-node element
    or a map value — there is no per-value raw JSON path there, so the
    ≥16-digit integer-token screen must run doc-wide (computed once per
    row in the barrier)."""
    decl, extra = node
    if decl == "number":
        return under_elem
    if decl == "variant":
        # opaque slots need the doc-wide screen in EVERY position: big
        # integer tokens melt through the variant parse and big
        # exponents overflow to Infinity, which the variant rendering
        # turns into a string (see _BIG_EXP_ANYWHERE)
        return True
    if decl == "array":
        if isinstance(extra, str):
            return under_elem and extra == "number"
        return _node_needs_doc_screen(extra, True)
    if decl == "object":
        # a bracket-quoted field name has no reliable raw path either
        # (get_json_object can't address the empty name) — its subtree
        # uses the doc-wide screen, mirroring _reprable's descent
        return any(_node_needs_doc_screen(
                       c, under_elem or not _NAME_RE.match(n))
                   for n, c in extra.items())
    if decl == "map":
        return _node_needs_doc_screen(extra, True)
    return False


@dataclass
class JsonColumnPlan:
    """Static routing analysis of one contract: a typed field layout
    (struct mode — round 7: recursive, nested objects and arrays of
    objects included), a uniform dynamic-key value type (map mode,
    round 6 — contracts built from patternProperties / propertyNames /
    additionalProperties with one scalar/array value type), a ROOT
    VALUE slot (round 7: contracts whose documents are scalars or
    arrays, not objects — ``from_json`` cannot parse a bare scalar, so
    the route parses the doc wrapped as ``{"v": <doc>}`` and validates
    the single field), or the reasons the contract stays whole on the
    kernel plane."""

    schema: Any
    fields: Dict[str, Tuple[str, Any]] = field(default_factory=dict)
    map_value: Optional[Tuple[str, Optional[str]]] = None
    root: Optional[Tuple[str, Any]] = None
    reasons: List[str] = field(default_factory=list)

    @property
    def routable(self) -> bool:
        return not self.reasons and (bool(self.fields)
                                     or self.map_value is not None
                                     or self.root is not None)

    def struct_type(self) -> T.DataType:
        if self.map_value is not None:
            decl, elem = self.map_value
            vt: T.DataType = (T.ArrayType(_SCALAR_SPARK[elem])
                              if decl == "array" else _SCALAR_SPARK[decl])
            return T.MapType(T.StringType(), vt)
        if self.root is not None:
            return T.StructType(
                [T.StructField("v", _node_dtype(self.root), True)])
        return _node_dtype(("object", self.fields))


def _declared_type(schema: Schema, node: Any,
                   seen: Optional[set] = None) -> Optional[str]:
    """The single JSON type this subschema forces, found at the node,
    in an allOf branch, or through a $ref hop — conjunctive positions
    only, so a value of any OTHER type is guaranteed invalid (and may
    therefore be judged by the kernel route without a columnar twin)."""
    if seen is None:
        seen = set()
    if not isinstance(node, dict) or id(node) in seen:
        return None
    seen.add(id(node))
    t = node.get("type")
    if isinstance(t, str):
        return t
    if t is not None:
        return None                       # union type: not a single type
    for branch in node.get("allOf") or []:
        found = _declared_type(schema, branch, seen)
        if found is not None:
            return found
    if "$ref" in node:
        target = schema.registry.ref_targets.get(id(node))
        found = _declared_type(schema, target, seen)
        if found is not None:
            return found
    return None


def _find_items(schema: Schema, node: Any,
                seen: Optional[set] = None) -> Any:
    """First ``items`` subschema found in a conjunctive position of a
    property subschema (the node itself, allOf branches, $ref
    targets)."""
    if seen is None:
        seen = set()
    if not isinstance(node, dict) or id(node) in seen:
        return None
    seen.add(id(node))
    if node.get("items") is not None and "items" in node:
        return node["items"]
    for branch in node.get("allOf") or []:
        found = _find_items(schema, branch, seen)
        if found is not None:
            return found
    if "$ref" in node:
        return _find_items(schema, schema.registry.ref_targets.get(id(node)),
                           seen)
    return None


def _collect_property_sources(schema: Schema, node: Any,
                              out: Dict[str, list],
                              seen: Optional[set] = None) -> None:
    """Property subschemas from every CONJUNCTIVE position: the node's
    own ``properties`` plus allOf branches and non-cyclic $ref targets
    (all applied to the same document, so each source constrains the
    same field — any one of them may declare the routing type, and a
    value violating another source is invalid on whichever plane
    judges it)."""
    if seen is None:
        seen = set()
    if not isinstance(node, dict) or id(node) in seen:
        return
    seen.add(id(node))
    props = node.get("properties")
    if isinstance(props, dict):
        for k, v in props.items():
            out.setdefault(k, []).append(v)
    for branch in node.get("allOf") or []:
        _collect_property_sources(schema, branch, out, seen)
    if "$ref" in node:
        _collect_property_sources(
            schema, schema.registry.ref_targets.get(id(node)), out, seen)


def _collect_dynamic_value_sources(schema: Schema, node: Any,
                                   out: list,
                                   seen: Optional[set] = None) -> None:
    """Dynamic-key VALUE subschemas from conjunctive positions: dict
    ``additionalProperties`` and every ``patternProperties`` value.
    (Boolean additionalProperties and ``propertyNames`` constrain keys
    or presence, not value shape, so they are not type sources.)"""
    if seen is None:
        seen = set()
    if not isinstance(node, dict) or id(node) in seen:
        return
    seen.add(id(node))
    ap = node.get("additionalProperties")
    if isinstance(ap, dict):
        out.append(ap)
    pp = node.get("patternProperties")
    if isinstance(pp, dict):
        out.extend(pp.values())
    for branch in node.get("allOf") or []:
        _collect_dynamic_value_sources(schema, branch, out, seen)
    if "$ref" in node:
        _collect_dynamic_value_sources(
            schema, schema.registry.ref_targets.get(id(node)), out, seen)


# keyword → the single JSON type it constrains; used to pick a slot for
# TYPELESS subschemas.  ANY slot choice is sound: the routing gates are
# type-exact and fail closed (a value of any other type takes the
# kernel), and the compiler folds keywords whose affects-type cannot
# match the slot — the choice only decides which documents get the fast
# plane, never a verdict.  Order = pick priority when classes mix.
_AFFINITY: Tuple[Tuple[str, frozenset], ...] = (
    ("object", frozenset({
        "properties", "required", "patternProperties",
        "additionalProperties", "propertyNames", "minProperties",
        "maxProperties", "dependentRequired", "dependentSchemas"})),
    ("array", frozenset({
        "items", "prefixItems", "minItems", "maxItems", "uniqueItems",
        "contains", "minContains", "maxContains"})),
    ("number", frozenset({
        "minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum",
        "multipleOf"})),
    ("string", frozenset({"minLength", "maxLength", "pattern"})),
)

_SLOT_TYPES = ("object", "array", "string", "integer", "number", "boolean")


def _enum_type(values: list) -> Optional[str]:
    """The single scalar JSON type of all enum/const values, or None."""
    kinds = set()
    for v in values:
        if isinstance(v, bool):
            kinds.add("boolean")
        elif isinstance(v, int):
            kinds.add("integer")
        elif isinstance(v, float):
            kinds.add("number")
        elif isinstance(v, str):
            kinds.add("string")
        else:
            return None
    if kinds == {"integer"}:
        return "integer"
    if kinds <= {"integer", "number"} and kinds:
        return "number"
    return kinds.pop() if len(kinds) == 1 else None


def _slot_signals(schema: Schema, sub: Any,
                  seen: Optional[set] = None) -> tuple:
    """The raw type signals one subschema emits from conjunctive
    positions — ``(single, union, enum_t, classes, has_false)`` —
    shared by :func:`_slot_decl` (typed-slot pick) and
    :func:`_union_members` (variant-slot pick, round 7 session 5) so
    the two can never read the schema differently."""
    if seen is None:
        seen = set()
    single: List[str] = []
    union: List[str] = []
    enum_t: List[str] = []
    classes: List[str] = []
    has_false = [False]

    def walk(node: Any) -> None:
        if node is False:
            has_false[0] = True
            return
        if not isinstance(node, dict) or id(node) in seen:
            return
        seen.add(id(node))
        t = node.get("type")
        if isinstance(t, str):
            single.append(t)
        elif isinstance(t, list):
            union.extend(str(x) for x in t)
        # anyOf/oneOf where EVERY branch declares a type: the value
        # must satisfy some branch, so the branch types form a union —
        # the nullable idiom anyOf[{type: X}, {type: "null"}] routes
        # on X instead of the string default (slot choice is always
        # verdict-safe; it only decides which rows get the fast plane)
        for combo in ("anyOf", "oneOf"):
            branches = node.get(combo)
            if isinstance(branches, list) and branches and all(
                    isinstance(b, dict)
                    and isinstance(b.get("type"), (str, list))
                    for b in branches):
                for b in branches:
                    bt = b["type"]
                    union.extend([bt] if isinstance(bt, str)
                                 else [str(x) for x in bt])
        ev = node.get("enum")
        if isinstance(ev, list):
            et = _enum_type(ev)
            if et:
                enum_t.append(et)
        if "const" in node:
            et = _enum_type([node["const"]])
            if et:
                enum_t.append(et)
        for name, kws in _AFFINITY:
            if any(k in node for k in kws):
                classes.append(name)
        for branch in node.get("allOf") or []:
            walk(branch)
        if "$ref" in node:
            walk(schema.registry.ref_targets.get(id(node)))

    walk(sub)
    return single, union, enum_t, classes, has_false[0]


def _slot_decl(schema: Schema, sub: Any,
               seen: Optional[set] = None) -> Optional[str]:
    """The slot type for one subschema — round 7's generalization of
    :func:`_declared_type`.  Resolution order, all signals gathered
    from conjunctive positions only (the node, allOf branches, $ref
    targets — never anyOf/oneOf/not/if, which don't force a type):

    1. an explicit single ``type`` (the round-6 rule, unchanged);
    2. a ``type`` union list → its first supported non-"null" member
       (the other members' values simply take the kernel plane);
    3. the common scalar type of ``enum``/``const`` values;
    4. keyword affinity — the class of type-specific keywords the
       subschema uses (pick priority ``_AFFINITY`` when mixed);
    5. otherwise None (callers may default — see ``_build_node``).

    A conjunctive ``false`` schema short-circuits to "boolean": no
    value can satisfy it, so the slot is arbitrary and the compiled
    false-check judges whatever routes."""
    single, union, enum_t, classes, has_false = \
        _slot_signals(schema, sub, seen)
    if has_false:
        return "boolean"
    if single:
        return single[0]
    for t in union:
        if t != "null" and t in _SLOT_TYPES:
            return t
    if enum_t:
        return enum_t[0]
    for name, _kws in _AFFINITY:
        if name in classes:
            return name
    return None


def _union_members(schema: Schema, sub: Any) -> set:
    """The distinct non-null routable types a slot's UNION signals
    (type lists + all-branches-typed anyOf/oneOf) when no conjunctive
    single type pins it — {} otherwise.  ``integer`` collapses into a
    ``number`` member (a number slot already holds both exactly), so
    two members here mean two genuinely different storage shapes and a
    typed slot could route only the first one's documents."""
    single, union, _enum_t, _classes, has_false = _slot_signals(schema, sub)
    if single or has_false:
        return set()
    members = {t for t in union if t != "null" and t in _SLOT_TYPES}
    if {"integer", "number"} <= members:
        members.discard("integer")
    return members


def _value_decl(schema: Schema, sub: Any) -> Optional[Tuple[str, Optional[str]]]:
    """(decl, elem) routing type of one map-mode value subschema, or
    None.  Round 7: uses the generalized :func:`_slot_decl` (keyword
    affinity, union pick, enum types) with a "string" default for a
    fully unconstrained value — sound for the same fail-closed reason,
    see ``_AFFINITY``."""
    d = _slot_decl(schema, sub)
    if d is None and isinstance(sub, (dict, bool)):
        d = "string"
    if d in _SCALAR_SQL:
        return (d, None)
    if d == "array":
        items = _find_items(schema, sub)
        e = _slot_decl(schema, items)
        if e is None and (items is None or isinstance(items, (dict, bool))):
            e = "string"
        if e in _SCALAR_SQL:
            return ("array", e)
    return None


def _promote_numeric(nodes) -> list:
    """Collapse a mixed integer/number slot collection to the wider
    number slot — integers are exactly representable there (the gates
    keep them within 2^53 / DECIMAL-exact).  ONE implementation shared
    by the top-level map mode and nested map nodes so their
    routability can never silently diverge (round-7 review)."""
    reprs = sorted(repr(n) for n in nodes)
    if reprs == [repr(("array", "integer")), repr(("array", "number"))]:
        return [("array", "number")]
    if reprs == [repr(("integer", None)), repr(("number", None))]:
        return [("number", None)]
    return list(nodes)


def _dyn_map_node(schema: Schema, node: Any, dyn: list, merged: list,
                  typed: Optional[Tuple[str, Any]],
                  fa: bool) -> Optional[Tuple[str, Any]]:
    """ONE value-node decision for a dynamic-key slot, shared by the
    top-level map mode and nested map nodes (mirroring the
    _promote_numeric extraction: the two must never silently diverge —
    round-7 review).  ``typed`` is the agreed typed value node, or
    None when the sources disagree.  Returns the value node to use, or
    None (stay kernel / publish the disagreement):

    - sources that are all TAG-AFFINE under the session's
      format_assertion route as opaque variants — even over an
      agreeing typed node when any source is union-typed (the typed
      slot would route only the collapsed first member's documents);
    - unevaluated* anywhere under ``node`` keeps the kernel: the
      whole node compiles as one kernel check, routing buys nothing."""
    def all_affine() -> bool:
        # lazy: the common single-typed path decides without paying
        # the affinity walks + SchemaCompiler construction (round-7
        # review)
        return (all(variant_tag_affine(s, fa) for s in dyn + merged)
                and not SchemaCompiler(schema)
                ._contains_unevaluated_deep(node))

    if typed is not None:
        if any(len(_union_members(schema, s)) >= 2
               for s in dyn + merged) and all_affine():
            return ("variant", None)
        return typed
    return ("variant", None) if all_affine() else None


def _build_node(schema: Schema, sub: Any, label: str,
                reasons: List[str], depth: int,
                fa: bool = False,
                slots: Optional[list] = None) -> Optional[Tuple[str, Any]]:
    """Routing node of one property subschema, recursing into nested
    objects (fixed-key ``properties`` at any depth) and arrays of
    objects — or None with a published reason.  Depth counts EVERY
    recursion step, so a recursive $ref chain hits ``_MAX_NEST`` and
    truncates to a variant leaf (round-8 bounded unroll) instead of
    unfolding forever; ``slots`` is the per-contract expansion budget
    (``_MAX_UNROLL_SLOTS``) guarding BRANCHING recursion against an
    exponential unroll.  ``fa`` is the session's format_assertion:
    tag-affinity classes ``format`` as inert only when assertion is
    off, and the probe must match what the compiler will do (round-7
    review)."""
    if slots is None:
        slots = [0]
    if depth > _BUDGET_FREE_DEPTH:
        slots[0] += 1
    if depth > _MAX_NEST or slots[0] > _MAX_UNROLL_SLOTS:
        # round 8 (VERDICT r7 #4): bounded unroll.  Past the unroll
        # horizon the slot stores the remaining subtree as an OPAQUE
        # variant — exactly the keys-only slot type, so every existing
        # hazard guard applies as-is (doc-wide big-int/big-exp screens
        # via _node_has_variant/_node_needs_doc_screen, dup-key docs
        # null the gate parse, the round-trip equality proves the
        # shortcut rendering byte-exact).  The compiler's variant net
        # turns the (recursive) subschema at this point into ONE
        # kernel check over to_json of the variant, gated on presence:
        # documents no deeper than the horizon never pay it (absent
        # field → SQL NULL → check passes, matching the kernel's
        # absent-property semantics), deep documents pay one kernel
        # call on the sub-horizon TAIL only.  Recursive $ref contracts
        # — previously unroutable — route this way, with the unrolled
        # levels compiled Plane A (see compile.py _h_ref's
        # (node, dtype) cycle key).
        return ("variant", None)
    decl = _slot_decl(schema, sub)
    if decl == "null":
        # a null-typed slot has no storable value; any slot works:
        # absent keys route, a present null (or anything routed) is
        # judged by the compiled type-check exactly like the kernel
        decl = "string"
    if decl is None and isinstance(sub, (dict, bool)):
        # no signal at all (empty schema, anyOf-only, …): default slot
        # — sound per _AFFINITY's fail-closed argument; only the route
        # rate for non-string values is affected
        decl = "string"
    if len(_union_members(schema, sub)) >= 2 and variant_tag_affine(sub, fa):
        # round 7 session 5: a slot typed as a genuine UNION (type
        # lists, all-branches-typed anyOf/oneOf) whose constraints are
        # all TAG-AFFINE stores the value as an OPAQUE variant — the
        # compiler's tag predicates judge every member Plane A
        # (_compile_variant_node), where a typed slot would route only
        # the first member's documents and send the rest to the
        # kernel.  Value-reading keywords (bounds, lengths, enum, …)
        # keep the typed slot: they compile Plane A there but would
        # force the whole variant node onto the kernel.
        return ("variant", None)
    if decl in _SCALAR_SQL:
        return (decl, None)
    if decl == "array":
        items = _find_items(schema, sub)
        elem = _slot_decl(schema, items)
        if elem == "null":
            elem = "string"
        if elem is None and (items is None
                             or isinstance(items, (dict, bool))):
            elem = "string"
        if elem in _SCALAR_SQL:
            return ("array", elem)
        if elem in ("object", "array"):
            child = _build_node(schema, items, f"{label} items",
                                reasons, depth + 1, fa, slots)
            return None if child is None else ("array", child)
        reasons.append(
            f"{label}: array items need a single scalar/object/array "
            f"type, got {elem!r}")
        return None
    if decl == "object":
        dyn: list = []
        _collect_dynamic_value_sources(schema, sub, dyn)
        srcs: Dict[str, list] = {}
        _collect_property_sources(schema, sub, srcs)
        if dyn:
            # dynamic-key slot (round 7): a map<string, V> node.  Every
            # value source — dynamic AND fixed properties (their keys
            # live in the same map) — must agree on ONE routing node;
            # heterogeneous contracts publish a reason and stay kernel.
            probe: List[str] = []
            nodes: List[Any] = []
            merged_srcs = [subs[0] if len(subs) == 1 else {"allOf": subs}
                           for subs in srcs.values()]
            for s in dyn + merged_srcs:
                n = _build_node(schema, s, f"{label} values", probe,
                                depth + 1, fa, slots)
                if n not in nodes:          # object nodes hold dicts —
                    nodes.append(n)         # dedup by equality, not hash
            nodes = _promote_numeric(nodes)
            typed = nodes[0] if None not in nodes and len(nodes) == 1 \
                else None
            value_node = _dyn_map_node(schema, sub, dyn, merged_srcs,
                                       typed, fa)
            if value_node is not None:
                return ("map", value_node)
            reasons.append(
                f"{label}: dynamic-key value schemas disagree on a "
                "single routing node — kernel only"
                + (f" ({probe[0]})" if probe else ""))
            return None
        fields: Dict[str, Tuple[str, Any]] = {}
        ok = True
        for k, subs in srcs.items():
            if not _routable_name(k):
                reasons.append(
                    f"{label}.{k}: name not addressable in a variant "
                    "path (quote/backslash/control char) — kernel only")
                ok = False
                continue
            merged = subs[0] if len(subs) == 1 else {"allOf": subs}
            child = _build_node(schema, merged, f"{label}.{k}",
                                reasons, depth + 1, fa, slots)
            if child is None:
                ok = False
            else:
                fields[k] = child
        return ("object", fields) if ok else None
    if variant_tag_affine(sub, fa):
        # no typed slot exists for this declaration (an unknown type
        # string like "frob", say) but every constraint is a tag
        # check — store the value opaquely and let the compiled tag
        # predicates judge it (an unknown type matches nothing, on
        # both planes)
        return ("variant", None)
    reasons.append(
        f"{label}: no single scalar/array type (got {decl!r})")
    return None


def analyze_json_contract(schema: Any,
                          format_assertion: bool = False) -> JsonColumnPlan:
    """Decide whether a contract's conforming documents are exactly
    representable as a typed struct — round 7: RECURSIVELY, nested
    objects become nested ``StructType`` fields, arrays of objects
    ``ArrayType(StructType)``, and nested dynamic-key slots
    ``MapType`` (all value sources agreeing on one node) — or (round
    6, VERDICT r5 #6) as a ``map<string, T>`` when the contract types
    its values through dynamic-key keywords (``patternProperties`` /
    ``additionalProperties``) with ONE scalar/array type (object-typed
    values route as a root ``("map", node)`` through the wrapper), or
    (round 7) as a ROOT VALUE slot when the documents are bare scalars
    or arrays rather than objects.  Unroutable
    contracts are not an error — ``with_valid_json`` just runs them
    whole on the kernel plane — but the reasons are published so a
    pipeline owner can see why a contract is stuck on the slow plane.
    Layouts are drawn from every conjunctive position (root keywords,
    allOf branches, $ref targets) — the ``allOf``-composed
    strict-contract idiom routes like a flat one.

    ``format_assertion`` must match the validation call's setting: the
    variant-slot choices probe tag-affinity, which classes ``format``
    as inert only while it is annotation-only (round-7 review — a
    mismatch would route contracts whose compiled plans then carry the
    very kernel checks routing was meant to avoid)."""
    if not isinstance(schema, Schema):
        schema = Schema(schema)
    plan = JsonColumnPlan(schema=schema)
    slots = [0]                     # per-contract unroll budget
    root = schema.schema
    if not isinstance(root, dict):
        plan.reasons.append("root schema is boolean — no declared shape")
        return plan
    hazard = _dynamic_scope_hazard(schema)
    if hazard is not None:
        # the compiler hoists such contracts to ONE root-level kernel
        # check (compile.py _compile_root) — routing would pay parse +
        # gates to reach a plan that is 100% Plane B anyway
        plan.reasons.append(
            f"scope-sensitive $dynamicRef '#{hazard}' — whole-plan "
            "kernel check, routing buys nothing")
        return plan
    sources: Dict[str, list] = {}
    _collect_property_sources(schema, root, sources)
    dyn: list = []
    _collect_dynamic_value_sources(schema, root, dyn)
    if dyn:
        # map mode: every value source — dynamic AND fixed properties —
        # must agree on one routing type, so any conforming document's
        # values all fit the map's value slot; documents that don't fit
        # (heterogeneous values under a permissive additionalProperties)
        # simply fall to the kernel, never mis-judge
        merged_fixed = [subs[0] if len(subs) == 1 else {"allOf": subs}
                        for subs in sources.values()]
        decls = {_value_decl(schema, sub) for sub in dyn + merged_fixed}
        decls = _promote_numeric(decls)
        # round 7 session 5: _dyn_map_node (ONE decision, shared with
        # nested map nodes) may swap the typed value slot for an
        # opaque variant — when the sources disagree only through
        # tag-affine keywords (mixed-type patternProperties), or
        # "agree" only by collapsing a union type to its first member.
        typed = decls[0] if None not in decls and len(decls) == 1 \
            else None
        value_node = _dyn_map_node(schema, root, dyn, merged_fixed,
                                   typed, format_assertion)
        if value_node is not None:
            plan.map_value = value_node
            return plan
        if not sources:
            # round 7: value sources beyond scalars/arrays (object or
            # nested-map values) — route as a ROOT map node through the
            # {"v": <doc>} wrapper; _build_node's object branch builds
            # ("map", <node>) when every source agrees on one node,
            # else publishes the disagreement
            plan.root = _build_node(schema, root, "root value",
                                    plan.reasons, 1, format_assertion,
                                    slots)
            return plan
        # fall through: fixed-property struct mode still routes the
        # fixed-key documents; extra keys go to the kernel
    if not sources:
        # Root-value mode (round 7): the contract's documents are not
        # objects at all — a scalar ("5", "\"en\"") or an array
        # ("[1,2]") root.  Conformance suites and real pipelines are
        # full of these (a JSON column of tags lists, scores, ids).
        # Object-affine layoutless roots (bare {"type": "object"},
        # {"minProperties": 2}, …) stay on the kernel: a root slot for
        # them would route only the empty object and pay parse + gates
        # on everything else.
        decl = _slot_decl(schema, root)
        if decl == "object":
            # KEYS-ONLY map routing (round 7, session 4): an
            # object-affine root with no fixed properties and no typed
            # dynamic values (bare ``required``, ``propertyNames``,
            # ``dependentRequired``, ``min/maxProperties``,
            # ``dependentSchemas``, ``{"type": "object"}`` …) never
            # reads a value — its keywords constrain the KEY SET.  The
            # documents route as ``map<string, variant>``: keys are
            # real map keys, values opaque variants no Plane-A
            # predicate touches (the compiler's variant net turns any
            # value-reading subschema into one kernel check over the
            # value's exact rendering).  JSON-null values parse as
            # variant nulls — present, exactly like the kernel — so
            # the typed-map null-value hazard doesn't exist here.
            # unevaluated* anywhere in the subtree compiles as ONE
            # whole-node kernel check, so routing would pay parse +
            # gates to reach a 100% Plane-B plan — those stay kernel.
            if SchemaCompiler(schema)._contains_unevaluated_deep(root):
                plan.reasons.append(
                    "root has no properties and carries unevaluated* — "
                    "whole-plan kernel check, routing buys nothing")
                return plan
            plan.map_value = ("variant", None)
            return plan
        plan.root = _build_node(schema, root, "root value",
                                plan.reasons, 1, format_assertion, slots)
        return plan
    props = {name: subs[0] if len(subs) == 1 else {"allOf": subs}
             for name, subs in sources.items()}
    for name, sub in props.items():
        if not _routable_name(name):
            plan.reasons.append(
                f"property {name!r}: name not addressable in a variant "
                "path (quote/backslash/control char) — kernel only")
            continue
        node = _build_node(schema, sub, f"property {name!r}",
                           plan.reasons, 1, format_assertion, slots)
        if node is not None:
            plan.fields[name] = node
    return plan


def _decimal_gate(tag: Column, max_int_digits: int = 15) -> Column:
    p = F.regexp_extract(tag, _DECIMAL_RE, 1)
    s = F.regexp_extract(tag, _DECIMAL_RE, 2)
    return (p != "") & ((p.cast("int") - s.cast("int")) <= max_int_digits)


def _exact_long_range(x: Column) -> Column:
    # NOT F.abs: abs(Long.MIN_VALUE) throws under ANSI
    return x.between(F.lit(-_EXACT_LONG), F.lit(_EXACT_LONG))


def _reprable(base: Column, path: str, node: Tuple[str, Any],
              doc: Optional[Column], clean: Optional[Column]) -> Column:
    """True when the PRESENT variant value at ``path`` under ``base``
    is exactly representable in ``node``'s typed slot — the one
    recursive gate behind every routing mode (round 7; it subsumes the
    round-6 flat field gate and map-value gate).

    ``doc`` is the root raw JSON string when per-path raw text exists
    (``get_json_object`` powers the ≥16-digit integer-token screens for
    ``number`` slots); below array-of-node elements there is no raw
    path, so ``doc`` is None and the doc-wide ``clean`` screen applies
    — computed ONCE per row in the barrier (inlining ``doc.rlike``
    per value would re-scan the document each time, round-6 review
    find).  A hit routes to the kernel: slower, never wrong.

    A VOID tag (present JSON null) is never representable — struct
    ``to_json`` omits null fields, so the bridge would read it as
    absent.  Nested objects check key-exactness (``map<string,
    variant>`` extraction is NULL on non-objects = fail-closed) and
    recurse per fixed key; arrays of objects extract
    ``array<variant>`` (NULL on non-arrays) and recurse per element,
    where a VOID element IS representable: a NULL struct element
    round-trips as JSON null and the bridge reads array elements (which
    cannot be "absent") as JSON null — parity pinned differentially."""
    decl, extra = node

    def vg(cast: str) -> Column:
        return F.try_variant_get(base, path, cast)

    if decl == "variant":
        # keys-only map routing: the slot holds ANY JSON value as an
        # opaque variant — presence alone is representable (a VOID tag
        # included: JSON-null map values stay variant nulls, never SQL
        # nulls, so the bridge hazards of typed maps don't exist).  The
        # doc-wide screen still applies: a ≥16-digit token melts
        # through try_parse_json's DOUBLE tag, a big-exponent token
        # overflows to Infinity (rendered back as a STRING), and a
        # Plane-B check reading the value would judge the unfaithful
        # rendering (`clean` carries both regexes for variant plans).
        return clean if clean is not None else F.lit(True)

    tag = F.schema_of_variant(vg("variant"))
    if decl == "integer":
        return (tag == "BIGINT") & _exact_long_range(vg("bigint"))
    if decl == "number":
        screen = (~F.get_json_object(doc, path).rlike(_BIG_INT_SCALAR)) \
            if doc is not None else clean
        return (((tag == "BIGINT") & _exact_long_range(vg("bigint")))
                | ((tag == "DOUBLE") & screen)
                | _decimal_gate(tag))
    if decl == "string":
        return tag == "STRING"
    if decl == "boolean":
        return tag == "BOOLEAN"
    if decl == "object":
        m = vg("map<string, variant>")
        keys = F.map_keys(m)
        if extra:
            known = F.array(*[F.lit(n) for n in extra])
            ok = m.isNotNull() & (F.size(F.array_except(keys, known)) == 0)
        else:
            # bare {"type": "object"} node: only the empty object is
            # representable in an empty struct; any key → kernel
            ok = m.isNotNull() & (F.size(keys) == 0)
        for name, child in extra.items():
            # bracket-addressed names: get_json_object cannot address
            # every such path (the empty name, e.g.), so number slots
            # below a quoted name fall back to the doc-wide screen
            # (doc=None → clean; _node_needs_doc_screen mirrors this)
            child_doc = doc if _NAME_RE.match(name) else None
            ok = ok & _slot_ok(base, f"{path}{_vpath(name)}", child,
                               child_doc, clean)
        return ok
    if decl == "map":
        # dynamic-key node: any key set; every PRESENT value must be
        # representable in the value node.  A VOID value is not — the
        # bridge reads a NULL map entry as "absent key" while the
        # kernel sees a present null — and _reprable already rejects
        # VOID in every value branch.  Duplicate keys anywhere null
        # the whole-doc variant parse, so the gate path never sees
        # them (the shortcut path is guarded in _exact_guard).
        m = vg("map<string, variant>")
        value_node = extra

        def entry_bad(k: Column, vv: Column) -> Column:
            return ~F.coalesce(_reprable(vv, "$", value_node, None, clean),
                               F.lit(False))

        return m.isNotNull() & (F.size(F.map_filter(m, entry_bad)) == 0)
    # array slots
    if isinstance(extra, str):                    # array of scalars
        elem = extra
        if elem == "integer":
            arr = vg("array<bigint>")
            return (tag == "ARRAY<VOID>") | (
                (tag == "ARRAY<BIGINT>")
                & F.forall(arr, lambda e: e.isNull() | _exact_long_range(e)))
        if elem == "number":
            arr = vg("array<bigint>")
            screen = (~F.get_json_object(doc, path).rlike(_BIG_INT_IN_ARRAY)) \
                if doc is not None else clean
            dec_elem = F.regexp_extract(tag, r"ARRAY<" + _DECIMAL_RE + ">", 0)
            return (
                (tag == "ARRAY<VOID>")
                | ((tag == "ARRAY<BIGINT>")
                   & F.forall(arr, lambda e: e.isNull()
                              | _exact_long_range(e)))
                | ((tag == "ARRAY<DOUBLE>") & screen)
                | ((dec_elem != "")
                   & _decimal_gate(F.replace(F.replace(
                       tag, F.lit("ARRAY<"), F.lit("")),
                       F.lit(">"), F.lit(""))))
            )
        if elem == "string":
            return tag.isin("ARRAY<VOID>", "ARRAY<STRING>")
        return tag.isin("ARRAY<VOID>", "ARRAY<BOOLEAN>")
    # array of nodes: per-element recursion against the ELEMENT variant
    # (no per-element raw path — number screens fall to `clean`)
    arr = vg("array<variant>")
    child_node = extra

    def elem_ok(e: Column) -> Column:
        etag = F.schema_of_variant(e)
        return (etag == "VOID") | F.coalesce(
            _reprable(e, "$", child_node, None, clean), F.lit(False))

    return arr.isNotNull() & F.forall(arr, elem_ok)


def _slot_ok(base: Column, path: str, node: Tuple[str, Any],
             doc: Optional[Column], clean: Optional[Column]) -> Column:
    """Absent-or-representable: absent fields (tag SQL NULL) pass —
    absent maps to struct NULL = absent under the bridge."""
    tag = F.schema_of_variant(F.try_variant_get(base, path, "variant"))
    return tag.isNull() | F.coalesce(
        _reprable(base, path, node, doc, clean), F.lit(False))


def _exact_guard(col: Column, node: Tuple[str, Any]) -> Optional[Column]:
    """Round-trip-shortcut guard.  Two hazard classes the to_json
    equality cannot see:

    - no integer slot anywhere under ``col`` exceeds ±2^53 (an exact
      int64 in (2^53, 2^63] round-trips verbatim but the kernel
      applies JS float semantics there);
    - map nodes (round 7): ``from_json`` KEEPS duplicate keys in the
      map binary and ``to_json`` renders them all back — a dup-key
      canonical doc round-trips, but the map lookup is first-match vs
      the kernel's last-wins; and a JSON-null map value renders back
      while the bridge reads the NULL entry as "absent key".  Both
      route to the kernel.

    None when the subtree has neither hazard — no guard expression
    built.  Null-safe at every level: a NULL struct/array/map (absent /
    JSON null) passes, and NULL propagates through nested field
    access."""
    decl, extra = node
    if decl == "integer":
        return col.isNull() | _exact_long_range(col)
    if decl == "array":
        if isinstance(extra, str):
            if extra != "integer":
                return None
            return col.isNull() | F.forall(
                col, lambda x: x.isNull() | _exact_long_range(x))
        if not (_node_has_integer(extra) or _node_has_map(extra)):
            return None
        child_node = extra

        def elem_guard(e: Column) -> Column:
            g = _exact_guard(e, child_node)
            return F.lit(True) if g is None else F.coalesce(g, F.lit(True))

        return col.isNull() | F.forall(col, elem_guard)
    if decl == "object":
        subs = [g for n, c in extra.items()
                if (g := _exact_guard(col.getField(n), c)) is not None]
        if not subs:
            return None
        return functools.reduce(lambda a, b: a & b, subs)
    if decl == "map":
        keys = F.map_keys(col)
        g = ((F.size(keys) == F.size(F.array_distinct(keys)))
             & ~F.exists(F.map_values(col), lambda x: x.isNull()))
        child_node = extra
        if _node_has_integer(child_node) or _node_has_map(child_node):
            def val_guard(x: Column) -> Column:
                vg_ = _exact_guard(x, child_node)
                return F.lit(True) if vg_ is None \
                    else F.coalesce(vg_, F.lit(True))

            g = g & F.forall(F.map_values(col), val_guard)
        return col.isNull() | g
    return None


def with_valid_json(df: DataFrame, json_col: str, schema: Any,
                    col_name: str = "valid",
                    format_assertion: bool = False,
                    remotes: Optional[dict] = None,
                    route_col: Optional[str] = None,
                    plan_shape: str = "auto",
                    expected_docs: Optional[int] = None) -> DataFrame:
    """``validate()`` over a JSON string column: adds a boolean column,
    computed JVM-side for every row whose document fits the contract's
    typed shape, by the row kernel for the rest.  ``route_col`` (when
    set) additionally records which plane judged each row — the
    observability knob for route-rate monitoring at scale.

    ``plan_shape``: ``"auto"`` (default; round 8 COST-MODELS the
    choice, ``cost_model.plan_choice`` previews it).  The round-8
    calibration (module docstring of ``cost_model``, evidence in
    BENCH/BASELINE.md): at production batch sizes the routed plane
    wins on EVERY graded contract class — 1.13-2.2× on light
    contracts, 2.7-4.3× on kernel-heavy ones — so auto routes every
    routable contract by default.  The kernel's winning regime is
    SMALL BATCHES: the default masked plan pays the all-rows
    Python-wave handshake whatever the data, so below
    ``cost_model.SMALL_BATCH_DOCS`` (calibrated ~5×10^5 on local[32])
    the kernel's single stage wins — pass ``expected_docs`` (e.g. a
    streaming microbatch's typical size) and auto picks it.  A second, data-dependent slow case the static
    model only flags (``plan_choice(...)["shortcut_sensitive"]``):
    documents that systematically miss the ``to_json`` round-trip
    proof (integer-form tokens in a ``number``-typed slot) pay the
    gate path per row — correct verdicts, measured 0.68× when every
    doc misses; watch ``route_col``/ledger metrics and opt out with
    ``plan_shape="kernel"`` if the live data hits it.

    Routed plan shape (round 8: auto resolves to ``"masked"`` for
    pure-Plane-A compiled plans, ``"union"`` for Plane-B-carrying
    ones): ``"masked"`` is one pass — kernel UDF input masked to NULL
    on routed rows — no shuffle, single scan.  ``"union"`` (fast ∪
    slow filters, residue rebalanced before its Python stage) touches
    Python only on residue rows, but its residue path costs 4-5× the
    kernel plane per row (wasted parse + the full-residue rebalance
    shuffle): the round-8 stream decomposition measured union 0.51×
    vs the PURE KERNEL on the 80%-conforming mixed stream while
    masked won 1.14-1.47×, and union ahead only on an all-canonical
    stream (~1.1×, the per-partition Python handshake it avoids).
    Robust beats best-case at 100 TB, so auto = masked — EXCEPT when
    the compiled plan carries Plane-B checks (variant nets, whole-node
    unevaluated gates, recursive-tail nets): Catalyst extracts Python
    UDFs out of CaseWhen branches and runs them per ROW, so masked
    would pay the embedded kernel check on every row where union's
    fast filter isolates it to routed rows — those plans take union.
    ``"union"`` is also the manual opt-in for corpora known ~100%
    canonical (it keeps healthy partitions entirely JVM-side — no
    Python worker memory).  ``"kernel"`` forces the kernel UDF on
    every row (skips the routing analysis entirely).

    Verdict-equivalent to ``kernel_validate_udf(schema)(json_col)`` on
    every row (differentially pinned in tests/test_json_plane.py)."""
    from jema_js_spark.validation.kernel_udf import kernel_validate_udf

    if plan_shape not in ("auto", "masked", "union", "kernel"):
        raise ValueError(f"unknown plan_shape {plan_shape!r}")
    df = _maybe_consolidate(df)
    raw_schema = schema
    if plan_shape == "kernel":
        # the kernel opt-out exists for hot paths: skip the routing
        # analysis too, not just the routed plan
        if not isinstance(schema, Schema):
            schema = Schema(schema)
        plan = None
    elif not isinstance(schema, Schema):
        schema, plan = _cached_analysis(schema, format_assertion)
    else:
        plan = analyze_json_contract(schema,
                                     format_assertion=format_assertion)

    kernel_pred = kernel_validate_udf(
        schema.schema, remotes=remotes, format_assertion=format_assertion)

    if plan is not None and plan.routable and plan_shape == "auto" \
            and expected_docs is not None:
        # round 8 (VERDICT r7 #1): the small-batch regime is the one
        # place the kernel's single-stage plan beats the route (fixed
        # floors unamortized — and the floor tracks the RESIDUE rate,
        # not the contract weight, so the cutoff is a single
        # calibrated constant).  Without a hint auto assumes the
        # large-batch production regime and routes.
        from jema_js_spark.validation import cost_model
        if expected_docs < cost_model.SMALL_BATCH_DOCS:
            plan = None

    if plan is None or not plan.routable:
        out = df.withColumn(col_name, F.coalesce(
            kernel_pred(F.col(json_col)), F.lit(False)))
        if route_col:
            out = out.withColumn(route_col, F.lit("kernel"))
        return out

    cache_key = _route_bundle_key(df, json_col, raw_schema,
                                  format_assertion)
    b3, route, compiled, work = _routing_pieces(
        df, json_col, schema, plan, format_assertion, cache_key=cache_key)
    doc = F.col(json_col)

    # auto shape (round 8): masked for pure-Plane-A compiled plans —
    # the robust default (see the docstring).  A plan CARRYING Plane-B
    # checks must take the union shape: Catalyst extracts Python UDFs
    # out of CaseWhen branches and evaluates them per ROW, so under
    # masked a variant-net/whole-node kernel check would run on every
    # row (routed or not) instead of only the routed rows the union's
    # fast filter isolates.
    if plan_shape == "auto":
        shape = "masked" if all(c.plane == "A" for c in compiled.checks) \
            else "union"
    else:
        shape = plan_shape

    if shape == "masked":
        import json as _json
        mkey = (cache_key, _json.dumps(remotes, sort_keys=True)
                if remotes else None) if cache_key is not None else None
        masked = _MASKED_EXPR_CACHE.get(mkey) if mkey is not None else None
        if masked is None:
            masked = F.when(
                route, compiled.valid_column()).otherwise(
                F.coalesce(kernel_pred(F.when(~route, doc)), F.lit(False)))
            if mkey is not None:
                if len(_MASKED_EXPR_CACHE) >= _ROUTE_CACHE_CAP:
                    _MASKED_EXPR_CACHE.clear()
                _MASKED_EXPR_CACHE[mkey] = masked
        out = b3.withColumn(col_name, masked)
        if route_col:
            out = out.withColumn(route_col, F.when(
                route, F.lit("columnar")).otherwise(F.lit("kernel")))
        return out.drop(*work)

    fast = (b3.filter(route)
            .withColumn(col_name, compiled.valid_column())
            .drop(*work))
    # residue rebalance (round 6): shuffles ONLY non-conforming rows
    # (working columns dropped first — the struct/variant never ship),
    # so near-empty residue partitions coalesce under AQE and the
    # Python worker handshake isn't paid 96× for nothing.  Measured:
    # 2.05 s → 1.16 s at 1M all-conforming docs.  Streaming plans (AQE
    # does not apply to microbatches) instead repartition the residue
    # to a small fixed floor (round 7, VERDICT r6 #6): without it every
    # microbatch pays the ~10 ms/task ArrowEvalPython handshake once
    # per SOURCE partition on near-empty residue.  repartition, not
    # coalesce: coalesce would collapse the residue FILTER itself into
    # N tasks (it merges upstream), while this shuffle moves only the
    # residue rows and keeps the scan/gate work at full parallelism.
    slow = b3.filter(~route).drop(*work)
    if not slow.isStreaming:
        slow = slow.hint("rebalance")
    else:
        slow = slow.repartition(_STREAM_RESIDUE_PARTITIONS)
    slow = slow.withColumn(
        col_name, F.coalesce(kernel_pred(doc), F.lit(False)))
    if route_col:
        fast = fast.withColumn(route_col, F.lit("columnar"))
        slow = slow.withColumn(route_col, F.lit("kernel"))
    return fast.unionByName(slow)


# Round 9: session-scoped route-expression memo.  Building the routed
# plan's expression trees (parse struct, round-trip guards, sentinel
# wrap, variant gates, compiled Plane-A plan) is driver-side py4j work
# measured at ~0.6 s per with_valid_json call for the representative
# contract — paid per QUERY even when the (contract, column) pair is
# unchanged.  The bundle is df-independent (every expression addresses
# the input by column name and the generated __j* attributes), so it is
# reusable across DataFrames within one Spark application.  Caches
# expression CONSTRUCTION only — each query still builds a fresh
# DataFrame lineage and recomputes from its inputs.  Only plain-dict
# contracts are cached (a caller-supplied Schema may carry a registry
# whose remote documents the compiled Plane-B fallbacks embed).
_ROUTE_BUNDLE_CACHE: Dict[tuple, dict] = {}
_ROUTE_CACHE_CAP = 64

# Small-partition consolidation for Python-stage plans (round 9).  An
# ArrowEvalPython task costs ~8 ms of fixed per-task overhead
# regardless of rows (measured on this class of box), so a plan whose
# partitions hold only a few thousand documents pays a pure per-task
# tax: 1M cached docs in 96 partitions ran the masked plan in 1.51 s
# vs 0.95 s after a narrow (no-shuffle) coalesce to the core count.
# This is the no-shuffle analog of AQE's post-shuffle small-partition
# coalescing, decided from the optimizer's size estimate: it fires
# ONLY when the whole input is small (< _CONSOLIDATE_MAX_INPUT), so
# production-scale scans — guide §6 partitions of 128 MB-1 GB, inputs
# of TBs — are never touched and keep their retry/straggler
# granularity.  Streaming plans are left alone (microbatch sizing is
# the expected_docs hint's job).
_CONSOLIDATE_MAX_INPUT = 8 << 30
_CONSOLIDATE_TARGET_BYTES = 64 << 20


def _maybe_consolidate(df: DataFrame) -> DataFrame:
    if df.isStreaming:
        return df
    try:
        size = int(str(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    except Exception:
        return df
    if size <= 0 or size >= _CONSOLIDATE_MAX_INPUT:
        return df
    target = max(df.sparkSession.sparkContext.defaultParallelism,
                 size // _CONSOLIDATE_TARGET_BYTES + 1)
    return df.coalesce(target)   # no-op when target >= current partitions

# (schema-json, format_assertion) → (Schema, JsonColumnPlan): the pure-
# Python contract analysis is deterministic in its inputs; one shared
# Schema instance also keeps the kernel's id()-keyed node plans warm
_ANALYZE_CACHE: Dict[tuple, tuple] = {}

# (bundle key, remotes-json) → the masked-shape verdict Column (its
# construction registers the kernel UDF with the JVM — the most
# expensive single py4j call in the masked plan build)
_MASKED_EXPR_CACHE: Dict[tuple, Any] = {}


def _cached_analysis(raw_schema, format_assertion: bool):
    import json as _json
    try:
        key = (_json.dumps(raw_schema, sort_keys=True), format_assertion)
    except (TypeError, ValueError):
        key = None
    if key is not None:
        hit = _ANALYZE_CACHE.get(key)
        if hit is not None:
            return hit
    schema = Schema(raw_schema)
    plan = analyze_json_contract(schema, format_assertion=format_assertion)
    if key is not None:
        if len(_ANALYZE_CACHE) >= _ROUTE_CACHE_CAP:
            _ANALYZE_CACHE.clear()
        _ANALYZE_CACHE[key] = (schema, plan)
    return schema, plan


def _route_bundle_key(df: DataFrame, json_col: str, raw_schema,
                      format_assertion: bool):
    if not isinstance(raw_schema, (dict, bool)):
        return None
    import json as _json
    try:
        return (df.sparkSession.sparkContext.applicationId,
                _json.dumps(raw_schema, sort_keys=True),
                format_assertion, json_col)
    except (TypeError, ValueError):
        return None


def _routing_pieces(df: DataFrame, json_col: str, schema: Schema,
                    plan: JsonColumnPlan, format_assertion: bool,
                    cache_key: Optional[tuple] = None):
    """The shared routing construction for a ROUTABLE contract: the
    staged DataFrame (parse → round-trip shortcut → lazy variant), the
    per-row ``route`` predicate, the compiled Plane-A plan over the
    typed extraction, and the working-column names to drop.  Used by
    :func:`with_valid_json` (verdicts) and :func:`json_violation_rows`
    (screening — which needs the route and the columnar verdict but NOT
    a kernel verdict pass)."""
    reserved = {"__jp", "__jsc", "__jw", "__jv", "__jr"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"with_valid_json reserves working columns {sorted(reserved)}; "
            "rename or drop them on the input")

    work = ["__jp", "__jsc", "__jw", "__jv", "__jr"]
    bundle = _ROUTE_BUNDLE_CACHE.get(cache_key) \
        if cache_key is not None else None
    if bundle is None:
        bundle = _route_bundle(json_col, schema, plan, format_assertion)
        if cache_key is not None:
            if len(_ROUTE_BUNDLE_CACHE) >= _ROUTE_CACHE_CAP:
                _ROUTE_BUNDLE_CACHE.clear()
            _ROUTE_BUNDLE_CACHE[cache_key] = bundle
    b4 = (df.select("*", bundle["jp"])
          .select("*", bundle["jsc"])
          .select("*", bundle["jw"])
          .select("*", bundle["jv"])
          .select("*", bundle["jr"]))
    return b4, bundle["route"], bundle["compiled"], work


def _route_bundle(json_col: str, schema: Schema, plan: JsonColumnPlan,
                  format_assertion: bool) -> dict:
    """The df-independent expression bundle behind
    :func:`_routing_pieces` — see the staging rationale inline."""
    doc = F.col(json_col)
    struct_type = plan.struct_type()

    # Root-value mode (round 7): ``from_json`` parses struct/map/array
    # roots only, so a scalar-or-array-root contract parses the doc
    # WRAPPED as ``{"v": <doc>}`` into struct<v: T>.  The round-trip
    # proof compares against the same wrapped string: ``to_json(p)``
    # is ``{"v":`` + canonical(v) + ``}`` by construction, so equality
    # forces the raw doc to BE canonical(v) — no document text can
    # spoof it (an injection like ``5,"v":6`` changes the parse, fails
    # the equality, and the variant gates below run on the RAW doc, so
    # wrapper tricks only cost speed, never a verdict).
    root_mode = plan.root is not None
    parse_src = F.concat(F.lit('{"v":'), doc, F.lit('}')) \
        if root_mode else doc

    # Generate-node barriers (explode of a 1-element array): Catalyst
    # re-inlines a derived column's defining expression into EVERY
    # downstream reference (the documented ~100× minhash hazard,
    # CLAUDE.md).  Each multiply-referenced stage becomes a generated
    # attribute: parsed once per row, referenced for free.  (Round-6
    # measurement: inlining the parse into a single barrier's struct is
    # NOT saved by subexpression elimination — 2.27 s vs 1.24 s at 1M
    # docs — so the stages stay separate.)
    #
    # Stage 1: the typed struct, parsed directly from the string.  This
    # is the ONLY JSON parse canonical documents pay.
    jp = F.explode(F.array(
        F.from_json(parse_src, struct_type))).alias("__jp")
    p = F.col("__jp")

    # Stage 2: the round-trip shortcut.  ``to_json(p) == doc`` proves
    # the document is exactly the canonical rendering of the struct:
    # wrong types parse to NULL and are OMITTED from the re-rendering,
    # non-objects render as "{}", duplicate keys collapse, extra keys
    # vanish, JSON-null properties are omitted (absent ⇔ SQL NULL under
    # the bridge — a present null must NOT match, and doesn't), and any
    # number the double slot can't render back verbatim (int tokens,
    # 17+ significant digits, exponent-form mismatches) fails the
    # equality.  All hazards fall through to the variant gates =
    # fail-closed.  One residue the equality cannot see: an integer
    # slot holding an exact int64 in (2^53, 2^63) round-trips, but the
    # kernel applies JS float semantics there — the magnitude guard
    # routes those to the kernel.  (Null array ELEMENTS round-trip and
    # stay columnar: the bridge reads them as JSON null, parity pinned
    # in tests.)
    guards = [F.to_json(p) == parse_src]
    if root_mode:
        g = _exact_guard(p["v"], plan.root)
        if g is not None:
            guards.append(g)
    elif plan.map_value is not None:
        # map hazards the round-trip alone cannot see (probed round 6):
        # duplicate keys round-trip through from_json/to_json but the
        # map lookup is first-match while the kernel is last-wins; and
        # map to_json RENDERS null values the bridge reads as absent
        keys_ = F.map_keys(p)
        guards.append(F.size(keys_) == F.size(F.array_distinct(keys_)))
        decl, elem = plan.map_value
        if decl != "variant":
            # typed values only: variant values keep JSON nulls as
            # variant nulls (present, kernel semantics — no bridge
            # hazard) and big integers either render back exactly
            # (int64/decimal) or fail the round-trip equality above
            guards.append(~F.exists(F.map_values(p),
                                    lambda x: x.isNull()))
        if decl == "integer":
            guards.append(F.forall(F.map_values(p),
                                   lambda x: _exact_long_range(x)))
        elif decl == "array" and elem == "integer":
            guards.append(F.forall(
                F.map_values(p),
                lambda a: F.forall(a, lambda x: x.isNull()
                                   | _exact_long_range(x))))
    else:
        for n, node in plan.fields.items():
            g = _exact_guard(p[n], node)
            if g is not None:
                guards.append(g)
    jsc = F.explode(F.array(F.coalesce(
        functools.reduce(lambda a, b: a & b, guards),
        F.lit(False)))).alias("__jsc")
    sc = F.col("__jsc")

    # Stage 3: the variant, parsed ONLY for shortcut misses (CaseWhen
    # branches evaluate lazily per row) — canonical documents never pay
    # a second parse.
    #
    # COMPLETENESS PROOF (round 7 — closes a live round-6 hole): every
    # Jackson-backed Spark parse (from_json, try_parse_json,
    # get_json_object, json_tuple, …) is PREFIX-lenient — it consumes
    # one complete value and silently ignores trailing content, so
    # '{"k":1} junk' parses as {"k":1} and would route columnar while
    # the kernel's json.loads rejects the document.  No strict JVM
    # parser exists, so the proof is structural: parse the doc wrapped
    # as  [<doc>,"<md5(doc)>"]  and require the result to be an array
    # of EXACTLY two elements whose second equals the sentinel.  A doc
    # that is exactly one JSON value always qualifies; trailing garbage
    # either breaks the array syntax (parse → NULL) or changes the
    # element count; and the only way to fake the shape is a document
    # that CONTAINS its own md5 followed by ']' — a hash fixed point,
    # computationally infeasible.  Canonical-whitespace variants, key
    # order, and number forms are untouched, so the route rate is
    # unchanged; the gates' variant becomes element 0 of the SAME
    # single parse (no second pass).  Jackson also rejects \x0b/\f
    # between the value and our sentinel comma, matching json.loads's
    # stricter whitespace rules.
    #
    # The doc-wide big-int screen is materialized in the same barrier
    # once per row when any number slot lacks a per-value raw path:
    # map-mode number values (dynamic keys), struct-mode number slots
    # below an array-of-object element, or any root-mode number slot
    # (see _reprable).
    sentinel = F.md5(doc)
    wrapped_arr = F.concat(F.lit('['), doc, F.lit(',"'), sentinel,
                           F.lit('"]'))
    # the sentinel rides the barrier as a real attribute: referencing
    # the raw F.md5(doc) expression again downstream would re-hash the
    # whole document per miss row (Catalyst re-inlines, see above)
    jw = F.explode(F.array(F.when(~sc, F.struct(
        F.try_parse_json(wrapped_arr).alias("w"),
        sentinel.alias("s"))))).alias("__jw")
    vw = F.col("__jw.w")
    complete = (
        vw.isNotNull()
        & F.try_variant_get(vw, "$[2]", "variant").isNull()
        & (F.try_variant_get(vw, "$[1]", "string") == F.col("__jw.s")))
    v_expr = F.when(complete, F.try_variant_get(vw, "$[0]", "variant"))
    # root mode passes doc=None to the gates (the doc IS the value —
    # a per-path get_json_object buys nothing over the doc-wide
    # screen), so every number slot under the root uses `clean`
    needs_clean = (
        (root_mode and _node_needs_doc_screen(plan.root, True))
        or (plan.map_value is not None
            and ("number" in plan.map_value
                 # keys-only mode: a ≥16-digit integer token melts to
                 # a DOUBLE through try_parse_json, and a Plane-B check
                 # reading the value would judge the melted rendering —
                 # screen those docs to the kernel on the gate path
                 or plan.map_value[0] == "variant"))
        or (not root_mode and plan.map_value is None
            and any(_node_needs_doc_screen(n)
                    for n in plan.fields.values())))
    if needs_clean:
        # plans carrying variant slots also screen big exponents: a
        # non-finite double inside an opaque value renders as the
        # string "Infinity" wherever a Plane-B check reads it (variants
        # have no float_paths restoration) — one merged regex, one scan
        has_variant = (
            (plan.map_value is not None and plan.map_value[0] == "variant")
            or (root_mode and _node_has_variant(plan.root))
            or (not root_mode and plan.map_value is None
                and any(_node_has_variant(n)
                        for n in plan.fields.values())))
        screen_re = _BIG_INT_OR_EXP_ANYWHERE if has_variant \
            else _BIG_INT_ANYWHERE
        jv = F.explode(F.array(F.when(~sc, F.struct(
            v_expr.alias("v"),
            (~doc.rlike(screen_re)).alias("clean"),
        )))).alias("__jv")
        v = F.col("__jv.v")
        clean = F.col("__jv.clean")
    else:
        jv = F.explode(F.array(
            F.when(~sc, v_expr))).alias("__jv")
        v = F.col("__jv")
        clean = None

    if root_mode:
        # the gates judge the RAW doc (never the wrapped parse): one
        # recursive representability check of the root slot.  A VOID
        # tag (doc "null") is not representable — p.v NULL would read
        # as absent under the bridge — and _reprable already rejects it.
        gates = [
            v.isNotNull(),     # parses COMPLETELY; no duplicate keys
            F.coalesce(_reprable(v, "$", plan.root, None, clean),
                       F.lit(False)),
        ]
    elif plan.map_value is not None:
        vm = F.try_variant_get(v, "$", "map<string, variant>")
        value_node: Tuple[str, Any] = plan.map_value

        def entry_bad(k: Column, vv: Column) -> Column:
            return ~F.coalesce(_reprable(vv, "$", value_node, None, clean),
                               F.lit(False))

        gates = [
            v.isNotNull(),     # parses COMPLETELY; no duplicate keys
            vm.isNotNull(),                  # is an object
            F.size(F.map_filter(vm, entry_bad)) == 0,
        ]
    else:
        # the whole struct layout is one object node — key exactness
        # and per-field recursion (nested objects, arrays of objects)
        # all live in _reprable
        gates = [
            v.isNotNull(),     # parses COMPLETELY; no duplicate keys
            _reprable(v, "$", ("object", plan.fields), doc, clean),
        ]
    # every routing mode: documents carrying surrogate escape tokens
    # take the kernel — the JVM parse replaces lone surrogates while
    # the kernel keeps them (see _SURROGATE_ESC_ANYWHERE)
    gates.append(~doc.rlike(_SURROGATE_ESC_ANYWHERE))
    full_gates = functools.reduce(lambda a, b: a & b, gates)
    # shortcut hits skip the gate chain entirely (CaseWhen-lazy).  The
    # route verdict is then MATERIALIZED as a generated attribute
    # (round 8): every plan shape references `route` twice (the two
    # union filters / the masked CaseWhen + kernel-input mask), and
    # Catalyst re-inlines the gate expression tree into each reference
    # — on gate-path rows that re-ran schema_of_variant/_reprable
    # trees per consumer (part of the measured 4-5× residue-stream
    # overhead, BENCH/route_cost_calibration.json).
    route_expr = F.when(sc, F.lit(True)) \
        .otherwise(F.coalesce(full_gates, F.lit(False)))
    jr = F.explode(F.array(route_expr)).alias("__jr")
    route = F.coalesce(F.col("__jr"), F.lit(False))

    # root mode compiles the contract against the single extracted
    # value column — the schema root applies to p.v, not the wrapper
    compiled: CompiledPlan = SchemaCompiler(
        schema, format_assertion=format_assertion) \
        .compile_plan_for_column(
            p["v"] if root_mode else p,
            struct_type["v"].dataType if root_mode else struct_type)

    return {"jp": jp, "jsc": jsc, "jw": jw, "jv": jv, "jr": jr,
            "route": route, "compiled": compiled}


def json_violation_rows(df: DataFrame, json_col: str, schema: Any,
                        id_cols: Optional[List[str]] = None,
                        format_assertion: bool = False,
                        remotes: Optional[dict] = None,
                        expected_docs: Optional[int] = None) -> DataFrame:
    """``errors()`` over a JSON string column — the errors-path twin of
    :func:`with_valid_json`, completing the reference API triple
    (validate / errors) for dynamic JSON.  One output row per kernel
    error, carrying the reference's error fields in the same column
    shape as the row-plane ``violation_rows`` (check, keyword,
    schema_path, data_path, schema_value, message — schema.js:665-674;
    messages come straight from the kernel, so they are byte-identical
    to the reference's).

    Scale shape (round-6 rework): the columnar route SCREENS, it does
    not verdict — residue = every row except the columnar-routed-and-
    columnar-valid ones, computed with zero Python (the kernel verdict
    pass the round-5 implementation ran over the residue was redundant:
    ``iter_errors`` itself emits nothing for valid documents).  The
    residue is rebalanced before the Python stage, so on healthy data
    the errors pass stays scan-dominated with one small Python tail —
    the same property the row-plane violations path has (SCALE.md).
    The zero-Python JVM screen applies when the compiled plan is pure
    Plane A; a plan CARRYING Plane-B checks screens with the masked
    whole-doc verdict UDF instead (round 7 — input nulled on rows the
    screen cannot exonerate anyway, so the boolean kernel walk runs
    only on routed rows passing every Plane-A check, and the expensive
    ``iter_errors`` pass shrinks to actually-invalid rows).  Unroutable
    contracts skip screening — ``iter_errors`` does its own — and keep
    the source's partitioning (a rebalance of the WHOLE input would
    add a full-corpus shuffle for nothing).

    Unparseable documents (malformed JSON — a state the reference's
    in-memory API cannot even receive) emit a single synthetic row
    with keyword ``__parse__``.  Duplicate-key documents are NOT
    unparseable here: ``json.loads`` applies last-key-wins (as JS
    ``JSON.parse`` does), so they are judged and error-reported like
    any other document.  Kernel-level failures (depth limit,
    unresolvable refs) emit keyword ``__error__``."""
    import json as _json

    from jema_js_spark.kernel.jstypes import js_to_string

    id_cols = list(id_cols or [])
    base = _maybe_consolidate(df.select(*id_cols, json_col))
    raw_schema = schema
    if not isinstance(schema, Schema):
        schema, plan = _cached_analysis(schema, format_assertion)
    else:
        plan = analyze_json_contract(schema,
                                     format_assertion=format_assertion)
    if expected_docs is not None:
        # small-batch regime (round 8, same rule as with_valid_json):
        # the routed screen's fixed floors aren't amortized — skip
        # screening and let iter_errors self-screen, exactly the
        # unroutable-contract path
        from jema_js_spark.validation import cost_model
        if expected_docs < cost_model.SMALL_BATCH_DOCS:
            plan = JsonColumnPlan(schema=schema)    # not routable
    screened = False
    if plan.routable:
        b3, route, compiled, work = _routing_pieces(
            base, json_col, schema, plan, format_assertion,
            cache_key=_route_bundle_key(base, json_col, raw_schema,
                                        format_assertion))
        if compiled.coverage()["plane_b_checks"] == 0:
            residue = b3.filter(~(route & F.coalesce(
                compiled.valid_column(), F.lit(False)))).drop(*work)
            screened = True
        else:
            # Masked-kernel screen (round 7, VERDICT r6 #5).  A Plane-B
            # check cannot sit inside the JVM filter — its kernel UDF
            # would be projected over EVERY row — so round 6 skipped
            # screening entirely for these contracts, leaving the
            # errors pass kernel-bound for exactly the contracts that
            # are already slowest.  Instead: screen with the whole-doc
            # VERDICT UDF (boolean _boolean_mode walk, ~3.8× cheaper
            # than iter_errors' message formatting), its input masked
            # to NULL on rows that are in the residue regardless —
            # unrouted rows (iter_errors self-screens them) and routed
            # rows failing a Plane-A check (invalid without consulting
            # the kernel).  The masked rows cost one vectorized fill
            # (kernel_udf null fast path); only routed-and-Plane-A-ok
            # rows pay a real kernel walk, and of those only the
            # actually-invalid ones reach iter_errors.  Masked rows'
            # verdict values are irrelevant: `keep` is already False.
            from jema_js_spark.validation.kernel_udf import \
                kernel_validate_udf
            verdict_pred = kernel_validate_udf(
                schema.schema, remotes=remotes,
                format_assertion=format_assertion)
            keep = route & F.coalesce(compiled.plane_a_column(),
                                      F.lit(False))
            residue = b3.filter(~(keep & F.coalesce(
                verdict_pred(F.when(keep, F.col(json_col))),
                F.lit(False)))).drop(*work)
            screened = True
    if not screened:
        residue = base                     # iter_errors screens itself
    elif not residue.isStreaming:
        # the screened residue is a (usually tiny) filtered subset —
        # rebalance so empty partitions skip the Python stage; the
        # unscreened whole-input path keeps the scan partitioning
        residue = residue.hint("rebalance")
    schema_json = _json.dumps(schema.schema)
    remotes_json = _json.dumps(remotes) if remotes else None

    id_fields = [f"`{f.name}` {f.dataType.simpleString()}"
                 for f in df.select(*id_cols).schema.fields]
    out_schema = ", ".join(id_fields + [
        "check string", "keyword string", "schema_path string",
        "data_path string", "schema_value string", "message string"])

    def run(batches):
        import pandas as pd

        from jema_js_spark.validation.kernel_udf import (_get_validator,
                                                          loads_doc)

        v = _get_validator(schema_json, remotes_json, format_assertion)
        cols = id_cols + ["check", "keyword", "schema_path", "data_path",
                          "schema_value", "message"]
        for pdf in batches:
            rows = []
            # positional column zip, NOT itertuples: pandas renames
            # non-identifier / underscore-leading column names (e.g. a
            # document-store `_id`) to positional `_1`-style fields,
            # which would AttributeError per task (round-5 review find)
            id_arrays = [pdf[c].tolist() for c in id_cols]
            doc_array = pdf[json_col].tolist()
            for row_i, doc in enumerate(doc_array):
                ids = [a[row_i] for a in id_arrays]
                try:
                    value = loads_doc(doc)
                except (TypeError, ValueError):
                    rows.append(ids + ["__parse__", "__parse__", "[]", "[]",
                                       "", "document is not parseable JSON"])
                    continue
                try:
                    for err in v.iter_errors(value):
                        spath = [str(x) for x in err.schema_stack]
                        keyword = next(
                            (x for x in reversed(spath)
                             if not x.isdigit()), "")
                        rows.append(ids + [
                            ".".join(spath), keyword,
                            _json.dumps(err.schema_stack),
                            _json.dumps(err.data_stack),
                            js_to_string(err.schema_value),
                            err.message])
                except Exception as exc:
                    rows.append(ids + ["__error__", "__error__", "[]", "[]",
                                       "", str(exc)[:200]])
            yield pd.DataFrame(rows, columns=cols)

    return residue.mapInPandas(run, out_schema)
