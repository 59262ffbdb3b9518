"""JavaScript/JSON value-model semantics, reimplemented in Python.

This module pins the *exact* dynamic-typing quirks of the reference
validator (nuxodin/jema.js) so the row kernel and the columnar compiler
share one semantic source of truth:

- type detection incl. non-finite numbers matching no type
  (ref: schema.js:677-683)
- JS strict-equality-based deep equality, key-order-insensitive for
  objects (ref: schema.js:831-853)
- canonical "unique value" used by ``uniqueItems``
  (ref: schema.js:862-875)
- JS ``Math.round`` (ties toward +inf) needed by ``multipleOf``
  (ref: schema.js:462-468)
- JS string coercion for error messages (ref: schema.js:665-674)

All numbers behave as IEEE-754 doubles, as in JS.  Python ``bool`` is a
subclass of ``int``; JSON ``true`` is *not* a number, so every predicate
here checks ``bool`` first.
"""

from __future__ import annotations

import math
from typing import Any

__all__ = [
    "get_type",
    "deep_equal",
    "js_math_round",
    "js_to_string",
    "unique_value_ignore_key_order",
    "deep_copy_and_order_keys",
    "is_js_integer",
    "UNEVALUATED_NAMES",
]

# ref: schema.js:685-688
UNEVALUATED_NAMES = {
    "object": "unevaluatedProperties",
    "array": "unevaluatedItems",
}


# exact-type fast path for get_type: json.loads / plain-python data is
# always exact types, and this is the kernel's hottest helper (~25
# calls per document measured).  bool precedes int here because dict
# lookup on type() is exact — bool maps to "boolean", int to "number".
_TYPE_DISPATCH = {
    type(None): "null",
    bool: "boolean",
    int: "number",
    str: "string",
    list: "array",
    dict: "object",
}


def get_type(value: Any) -> str:
    """Dynamic JSON type of ``value`` — mirror of getType (schema.js:677-683).

    ``None`` covers both JS ``null`` and ``undefined`` (loose ``==`` in the
    reference).  Non-finite floats return ``'not supported'`` so they match
    *no* ``type`` keyword (pinned by reference tests.html:52,74-76).
    """
    t = type(value)
    name = _TYPE_DISPATCH.get(t)
    if name is not None:
        return name
    if t is float:
        return "number" if math.isfinite(value) else "not supported"
    # subclass / exotic fallback — the original isinstance chain
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, (int, float)):
        if isinstance(value, float) and not math.isfinite(value):
            return "not supported"
        return "number"
    if isinstance(value, str):
        return "string"
    if isinstance(value, list):
        return "array"
    if isinstance(value, dict):
        return "object"
    return "not supported"


def is_js_integer(value: Any) -> bool:
    """``Number.isInteger`` semantics: 1.0 IS an integer (schema.js:449)."""
    if isinstance(value, bool):
        return False
    if isinstance(value, int):
        return True
    if isinstance(value, float):
        return math.isfinite(value) and value.is_integer()
    return False


class _Missing:
    """Sentinel that equals nothing — stands in for JS ``undefined`` when a
    key is absent on one side of a deep comparison."""

    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover
        return "<missing>"


_MISSING = _Missing()


def deep_equal(a: Any, b: Any) -> bool:
    """JS strict-equality deep compare, key-order-insensitive for objects
    (mirror of deepEqual, schema.js:831-853).

    JS ``===`` is type-strict: ``true !== 1``, ``'1' !== 1``; but all
    numbers are one type, so ``1 === 1.0``.  ``NaN === NaN`` is false.
    Object compare checks key-count equality then recurses over ``a``'s
    keys — a missing key on ``b`` compares as undefined and fails.
    """
    if a is _MISSING or b is _MISSING:
        return False
    if a is None or b is None:
        return a is None and b is None
    a_bool = isinstance(a, bool)
    b_bool = isinstance(b, bool)
    if a_bool or b_bool:
        return a_bool and b_bool and a == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return a == b  # NaN != NaN falls out naturally
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    if isinstance(a, list) and isinstance(b, list):
        if len(a) != len(b):
            return False
        return all(deep_equal(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        if len(a) != len(b):
            return False
        return all(deep_equal(v, b.get(k, _MISSING)) for k, v in a.items())
    return False


def js_math_round(x: float) -> float:
    """Exact JS ``Math.round``: nearest integer, ties toward +infinity.

    NOT ``floor(x + 0.5)`` (that drifts on e.g. 0.49999999999999994) and
    NOT Python ``round`` (banker's rounding) — see SURVEY.md §7.4.
    """
    f = math.floor(x)
    return float(f) if (x - f) < 0.5 else float(f + 1)


def js_multiple_of(value: float, m_of: float) -> bool:
    """Mirror of the multipleOf check (schema.js:462-468):
    ``q = value / mOf; isFinite(q) && q*mOf === Math.round(q)*mOf``.

    Pure IEEE-754 double arithmetic — Python floats are doubles, so the
    float-tolerance behavior (pinned by reference tests.html:60-68:
    -8599.3 IS a multiple of 0.01) reproduces bit-for-bit.
    """
    try:
        q = value / m_of
    except ZeroDivisionError:
        # JS x/0 = ±Infinity → isFinite false → invalid
        return False
    if not math.isfinite(q):
        return False
    return q * m_of == js_math_round(q) * m_of


def _js_num_str(v: float) -> str:
    """JS Number→String coercion (shortest round-trip repr).

    Python ``repr(float)`` is also shortest-repr; the residual
    differences are integral floats (``1.0`` vs JS ``1``) and
    zero-padded exponents (``1e-07`` vs JS ``1e-7``).
    """
    if isinstance(v, int) and not isinstance(v, bool):
        return str(v)
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    if v == int(v) and abs(v) < 1e21:
        return str(int(v))
    s = repr(v)
    if "e" in s:
        mant, exp = s.split("e")
        exp_i = int(exp)
        s = f"{mant}e{'+' if exp_i >= 0 else '-'}{abs(exp_i)}"
    return s


def js_to_string(value: Any) -> str:
    """JS template-literal coercion ``${value}`` for error messages
    (ref: schema.js:668).  Arrays join with ',', objects print
    '[object Object]'."""
    if value is None:
        return "null"
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (int, float)):
        return _js_num_str(value)
    if isinstance(value, str):
        return value
    if isinstance(value, list):
        return ",".join("" if v is None else js_to_string(v) for v in value)
    if isinstance(value, dict):
        return "[object Object]"
    return str(value)


def deep_copy_and_order_keys(value: Any) -> Any:
    """Recursive copy with object keys sorted (schema.js:867-875) — the
    shared canonicalizer for uniqueItems / enum-on-JSON (SURVEY.md §7.4)."""
    if isinstance(value, list):
        return [deep_copy_and_order_keys(v) for v in value]
    if isinstance(value, dict):
        return {k: deep_copy_and_order_keys(value[k]) for k in sorted(value.keys())}
    return value


def _canonical_json(value: Any, out: list) -> None:
    # JSON.stringify-alike over an already-key-sorted copy, with JS number
    # formatting so 1 and 1.0 canonicalize identically (JS has one number
    # type; JSON.stringify(1.0) === '1').
    if value is None:
        out.append("null")
    elif isinstance(value, bool):
        out.append("true" if value else "false")
    elif isinstance(value, (int, float)):
        out.append(_js_num_str(value) if math.isfinite(value) else "null")
    elif isinstance(value, str):
        import json

        out.append(json.dumps(value, ensure_ascii=False))
    elif isinstance(value, list):
        out.append("[")
        for i, v in enumerate(value):
            if i:
                out.append(",")
            _canonical_json(v, out)
        out.append("]")
    else:
        import json

        out.append("{")
        for i, (k, v) in enumerate(value.items()):
            if i:
                out.append(",")
            out.append(json.dumps(k, ensure_ascii=False))
            out.append(":")
            _canonical_json(v, out)
        out.append("}")


def canonical_json(value: Any) -> str:
    """Canonical JSON string of ``value`` with recursively sorted object
    keys — two values are deep-equal-ignoring-key-order iff their
    canonical JSON is identical.  The single canonicalizer shared by the
    kernel and any Plane-A ``to_json`` shortcut (SURVEY.md §7.4)."""
    out: list = []
    _canonical_json(deep_copy_and_order_keys(value), out)
    return "".join(out)


def unique_value_ignore_key_order(value: Any):
    """Hashable identity under JS Set/SameValueZero semantics with
    key-order-insensitive containers (mirror of schema.js:862-866).

    Scalars: type-tagged (``true`` ≠ ``1`` ≠ ``'1'``), numbers unified
    int/float as one JS number type.  Containers: canonical JSON with a
    sentinel prefix, exactly like the reference's stringify approach.
    """
    if value is None:
        return ("null",)
    if isinstance(value, bool):
        return ("bool", value)
    if isinstance(value, (int, float)):
        if isinstance(value, float) and math.isnan(value):
            return ("nan",)  # JS Set: SameValueZero — NaN equals NaN
        try:
            return ("num", float(value))
        except OverflowError:
            return ("num-big", value)
    if isinstance(value, str):
        return ("str", value)
    return ("json", canonical_json(value))
