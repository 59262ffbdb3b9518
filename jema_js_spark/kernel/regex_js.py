"""ECMAScript → Python/Java regex dialect translation.

The reference evaluates ``pattern`` / ``patternProperties`` with
``new RegExp(p, 'u')`` and *unanchored* ``.test()``
(/root/reference/schema.js:260,493-496).  We must reproduce those
semantics in two target dialects (SURVEY.md §7.4):

- **Python ``re``** for the Plane-B kernel (and pandas-UDF execution);
- **Java ``java.util.regex``** for Plane-A ``Column.rlike`` so the
  predicate stays inside whole-stage codegen.

Key dialect deltas handled here (ES2015+ 'u' flag semantics):

- ``\\d``/``\\w`` are ASCII-only in JS; Python ``re`` defaults to
  Unicode → substituted with explicit classes.
- ``\\s`` in JS is the WhiteSpace+LineTerminator set (incl. NBSP, BOM,
  U+2028/9) → explicit class.
- ``$`` / ``^`` (no ``m`` flag): absolute string end/start; Python ``$``
  also matches before a trailing newline, Java likewise → ``\\Z``/``\\A``
  (Python) and ``\\z``/``\\A`` (Java).
- ``.`` excludes ``\\n \\r \\u2028 \\u2029`` in JS; Python excludes only
  ``\\n`` → explicit negated class (Java's default ``.`` already matches
  JS, but the explicit class is emitted for both).
- ``\\uXXXX`` / ``\\u{...}`` code-point escapes → ``\\uXXXX`` pairs /
  ``\\U…`` (Python) or ``\\x{…}`` (Java).
- ``\\cX`` control escapes → ``\\xNN``.
- ``(?<name>…)`` / ``\\k<name>`` named groups → ``(?P<name>…)`` /
  ``(?P=name)`` for Python (Java accepts JS syntax as-is).
- ``[]`` never matches in JS (Python: syntax error) → ``(?!x)x``;
  ``[^]`` matches anything → ``[\\s\\S]``.

``\\p{…}`` / ``\\P{…}`` Unicode property escapes (round 7): general
categories and White_Space expand into explicit codepoint-range
classes built from ``unicodedata`` for the Python target, matching the
reference's native 'u'-flag support; the Java target deliberately
rejects them (the JVM's Unicode tables can diverge from Python's
across versions), so \\p patterns always run Python-side — Plane-B
single-column pandas UDF or the kernel — and one implementation owns
every verdict.  Script properties and other binary properties stay
unsupported (loud).

Constructs with no faithful mapping (script ``\\p``, variable-length
lookbehind in Python) raise :class:`UnsupportedRegexError`; the
columnar compiler treats that as "not Java-safe / not Python-safe" and
the keyword falls back to the next plane.  The official suite's
non-optional ``pattern.json`` material stays inside the supported
subset (the reference itself excludes ``ecmascript-regex.json`` —
tests/test-suite-init.js:54).
"""

from __future__ import annotations

import re
from functools import lru_cache

__all__ = [
    "UnsupportedRegexError",
    "translate",
    "compile_js_regex",
    "js_regex_search",
    "java_regex_or_none",
    "java_regex_explain",
]

# JS \s under the 'u' flag: WhiteSpace ∪ LineTerminator
_JS_WS = "\\t\\n\\x0b\\x0c\\r \\xa0\\u1680\\u2000-\\u200a\\u2028\\u2029\\u202f\\u205f\\u3000\\ufeff"
_JS_DIGIT = "0-9"
_JS_WORD = "A-Za-z0-9_"
_JS_DOT = "[^\\n\\r\\u2028\\u2029]"


class UnsupportedRegexError(ValueError):
    """Pattern uses a construct with no faithful mapping in the target
    dialect — callers fall back to another execution plane."""


# -- \p{...} Unicode property escapes (round 7) -----------------------------
#
# The reference evaluates these natively (JS RegExp 'u' flag); Python re
# has no \p, so general-category properties are expanded into explicit
# codepoint-range classes built from unicodedata — ONE full-codespace
# pass, cached.  The Java target deliberately REJECTS \p (Java regex
# would evaluate it against the JVM's own Unicode tables, which can
# diverge from Python's across Unicode versions — a silent cross-plane
# verdict split); \p patterns therefore always run Python-side (kernel
# or the single-column pandas UDF), one implementation owning the
# verdict.  Script/binary properties beyond White_Space stay loud.

_GC_LONG_ALIASES = {
    "LETTER": "L", "UPPERCASE_LETTER": "Lu", "LOWERCASE_LETTER": "Ll",
    "TITLECASE_LETTER": "Lt", "MODIFIER_LETTER": "Lm", "OTHER_LETTER": "Lo",
    "CASED_LETTER": "LC",
    "MARK": "M", "NONSPACING_MARK": "Mn", "SPACING_MARK": "Mc",
    "ENCLOSING_MARK": "Me", "COMBINING_MARK": "M",
    "NUMBER": "N", "DECIMAL_NUMBER": "Nd", "DIGIT": "Nd",
    "LETTER_NUMBER": "Nl", "OTHER_NUMBER": "No",
    "PUNCTUATION": "P", "CONNECTOR_PUNCTUATION": "Pc",
    "DASH_PUNCTUATION": "Pd", "OPEN_PUNCTUATION": "Ps",
    "CLOSE_PUNCTUATION": "Pe", "INITIAL_PUNCTUATION": "Pi",
    "FINAL_PUNCTUATION": "Pf", "OTHER_PUNCTUATION": "Po", "PUNCT": "P",
    "SYMBOL": "S", "MATH_SYMBOL": "Sm", "CURRENCY_SYMBOL": "Sc",
    "MODIFIER_SYMBOL": "Sk", "OTHER_SYMBOL": "So",
    "SEPARATOR": "Z", "SPACE_SEPARATOR": "Zs", "LINE_SEPARATOR": "Zl",
    "PARAGRAPH_SEPARATOR": "Zp",
    "OTHER": "C", "CONTROL": "Cc", "CNTRL": "Cc", "FORMAT": "Cf",
    "SURROGATE": "Cs", "PRIVATE_USE": "Co", "UNASSIGNED": "Cn",
}
_GC_SHORT = {"L", "Lu", "Ll", "Lt", "Lm", "Lo", "LC", "M", "Mn", "Mc",
             "Me", "N", "Nd", "Nl", "No", "P", "Pc", "Pd", "Ps", "Pe",
             "Pi", "Pf", "Po", "S", "Sm", "Sc", "Sk", "So", "Z", "Zs",
             "Zl", "Zp", "C", "Cc", "Cf", "Cs", "Co", "Cn"}

# ECMAScript binary property White_Space (PropList.txt) — a fixed list,
# not derivable from general categories (it spans Zs/Zl/Zp/Cc)
_WHITE_SPACE_CPS = (
    list(range(0x09, 0x0E)) + [0x20, 0x85, 0xA0, 0x1680]
    + list(range(0x2000, 0x200B)) + [0x2028, 0x2029, 0x202F, 0x205F, 0x3000])


@lru_cache(maxsize=1)
def _category_ranges():
    """One pass over the whole codespace: general category → sorted
    [start, end] codepoint ranges (~1 s, done at most once per
    process; executors pay it lazily on first \\p evaluation)."""
    import unicodedata

    ranges: dict = {}
    prev_cat = None
    start = 0
    for cp in range(0x110000):
        cat = unicodedata.category(chr(cp))
        if cat != prev_cat:
            if prev_cat is not None:
                ranges.setdefault(prev_cat, []).append((start, cp - 1))
            prev_cat = cat
            start = cp
    ranges.setdefault(prev_cat, []).append((start, 0x10FFFF))
    return ranges


def _merge_ranges(ranges):
    out = []
    for a, b in sorted(ranges):
        if out and a <= out[-1][1] + 1:
            out[-1] = (out[-1][0], max(out[-1][1], b))
        else:
            out.append((a, b))
    return out


@lru_cache(maxsize=128)
def _property_class_body(prop: str) -> str:
    """Class-body range material (no brackets) for a \\p{prop}, or
    raises UnsupportedRegexError for properties outside the supported
    set (general categories + White_Space)."""
    raw = prop.strip()
    for prefix in ("General_Category=", "general_category=", "gc="):
        if raw.startswith(prefix):
            raw = raw[len(prefix):]
            break
    if raw == "White_Space":
        cps = [(c, c) for c in _WHITE_SPACE_CPS]
    else:
        key = raw if raw in _GC_SHORT else _GC_LONG_ALIASES.get(raw.upper())
        if key is None:
            raise UnsupportedRegexError(
                f"\\p{{{prop}}} property unsupported (general categories "
                "and White_Space only)")
        cats = (["Lu", "Ll", "Lt"] if key == "LC"
                else [c for c in _category_ranges() if c.startswith(key)]
                if len(key) == 1 else [key])
        cps = [r for c in cats for r in _category_ranges().get(c, [])]
    parts = []
    for a, b in _merge_ranges(cps):
        ea = _hex4(a) if a <= 0xFFFF else f"\\U{a:08x}"
        eb = _hex4(b) if b <= 0xFFFF else f"\\U{b:08x}"
        parts.append(ea if a == b else f"{ea}-{eb}")
    return "".join(parts)


def _hex4(cp: int) -> str:
    return f"\\u{cp:04x}"


def _code_point_escape(cp: int, target: str) -> str:
    if target == "java":
        return f"\\x{{{cp:x}}}"
    if cp <= 0xFFFF:
        return _hex4(cp)
    return f"\\U{cp:08x}"


def translate(pattern: str, target: str = "python") -> str:
    """Translate an ECMAScript 'u'-flag pattern into ``target`` dialect
    ('python' or 'java').  Raises :class:`UnsupportedRegexError` for
    untranslatable constructs."""
    out: list = []
    i = 0
    n = len(pattern)
    in_class = False

    while i < n:
        c = pattern[i]

        if c == "\\":
            if i + 1 >= n:
                raise UnsupportedRegexError("trailing backslash")
            e = pattern[i + 1]
            i += 2
            if e == "d":
                out.append(f"[{_JS_DIGIT}]" if not in_class else _JS_DIGIT)
            elif e == "D":
                if in_class:
                    raise UnsupportedRegexError(r"\D inside character class")
                out.append(f"[^{_JS_DIGIT}]")
            elif e == "w":
                out.append(f"[{_JS_WORD}]" if not in_class else _JS_WORD)
            elif e == "W":
                if in_class:
                    raise UnsupportedRegexError(r"\W inside character class")
                out.append(f"[^{_JS_WORD}]")
            elif e == "s":
                out.append(f"[{_JS_WS}]" if not in_class else _JS_WS)
            elif e == "S":
                if in_class:
                    raise UnsupportedRegexError(r"\S inside character class")
                out.append(f"[^{_JS_WS}]")
            elif e == "c":
                if i < n and pattern[i].isalpha():
                    out.append(f"\\x{ord(pattern[i].upper()) % 32:02x}")
                    i += 1
                else:
                    raise UnsupportedRegexError(r"bare \c")
            elif e == "u":
                if i < n and pattern[i] == "{":
                    j = pattern.find("}", i)
                    if j == -1:
                        raise UnsupportedRegexError(r"unterminated \u{...}")
                    cp = int(pattern[i + 1:j], 16)
                    out.append(_code_point_escape(cp, target))
                    i = j + 1
                elif i + 4 <= n and re.fullmatch(r"[0-9a-fA-F]{4}", pattern[i:i + 4]):
                    out.append("\\u" + pattern[i:i + 4])
                    i += 4
                else:
                    raise UnsupportedRegexError(r"malformed \uXXXX")
            elif e in ("p", "P"):
                if i >= n or pattern[i] != "{":
                    raise UnsupportedRegexError(r"bare \p")
                j = pattern.find("}", i)
                if j == -1:
                    raise UnsupportedRegexError(r"unterminated \p{...}")
                prop = pattern[i + 1:j]
                i = j + 1
                if target == "java":
                    # Java regex has native \p{...}, but the JVM's Unicode
                    # tables can diverge from Python's across versions —
                    # \p verdicts stay Python-owned (kernel / pandas UDF)
                    # so the two planes can never split on a codepoint
                    raise UnsupportedRegexError(
                        r"\p{...} kept Python-side for cross-plane parity")
                body = _property_class_body(prop)
                if e == "P":
                    if in_class:
                        raise UnsupportedRegexError(
                            r"\P inside character class")
                    out.append(f"[^{body}]")
                else:
                    out.append(body if in_class else f"[{body}]")
            elif e == "k":
                if i < n and pattern[i] == "<":
                    j = pattern.find(">", i)
                    if j == -1:
                        raise UnsupportedRegexError(r"unterminated \k<...>")
                    name = pattern[i + 1:j]
                    out.append(f"(?P={name})" if target == "python" else f"\\k<{name}>")
                    i = j + 1
                else:
                    raise UnsupportedRegexError(r"bare \k")
            elif e == "b" and in_class:
                out.append("\\x08")  # [\b] is backspace in JS classes
            elif e == "0" and (i >= n or not pattern[i].isdigit()):
                out.append("\\x00")
            else:
                # pass through identity escapes, backrefs \1.., \b \B \n
                # \r \t \f \v \xNN, escaped metachars, etc.
                out.append("\\" + e)
            continue

        if in_class:
            if c == "]":
                in_class = False
            out.append(c)
            i += 1
            continue

        if c == "[":
            # handle empty-class idioms before entering class mode
            if pattern.startswith("[]", i):
                out.append("(?!x)x")  # JS []: matches nothing
                i += 2
                continue
            if pattern.startswith("[^]", i):
                out.append("[\\s\\S]")  # JS [^]: matches anything
                i += 3
                continue
            in_class = True
            out.append(c)
            i += 1
            continue

        if c == ".":
            out.append(_JS_DOT)
        elif c == "$":
            out.append("\\Z" if target == "python" else "\\z")
        elif c == "^":
            out.append("\\A")
        elif c == "(":
            if pattern.startswith("(?<", i) and i + 3 < n and pattern[i + 3] not in "=!":
                j = pattern.find(">", i)
                if j == -1:
                    raise UnsupportedRegexError("unterminated (?<name>")
                name = pattern[i + 3:j]
                out.append(f"(?P<{name}>" if target == "python" else f"(?<{name}>")
                i = j + 1
                continue
            out.append(c)
        else:
            out.append(c)
        i += 1

    if in_class:
        raise UnsupportedRegexError("unterminated character class")
    return "".join(out)


@lru_cache(maxsize=4096)
def compile_js_regex(pattern: str):
    """Compile an ECMAScript pattern for Python execution.  Cached —
    unlike the reference, which recompiles per call (schema.js:260,494);
    SURVEY.md §4 marks that as a deliberate improvement."""
    translated = translate(pattern, target="python")
    try:
        return re.compile(translated)
    except re.error as exc:
        raise UnsupportedRegexError(f"untranslatable pattern {pattern!r}: {exc}") from exc


def js_regex_search(pattern: str, value: str) -> bool:
    """Unanchored test — mirror of ``new RegExp(p,'u').test(v)``."""
    return compile_js_regex(pattern).search(value) is not None


@lru_cache(maxsize=4096)
def java_regex_explain(pattern: str):
    """``(translated, None)`` when the pattern is inside the verified-safe
    Java subset, else ``(None, reason)`` naming the construct that blocked
    it.  The reason is threaded into ``CompiledPlan.coverage()`` (round 7,
    VERDICT r6 #7) so a corpus audit can count WHY patterns fall off the
    rlike path instead of just that they did."""
    try:
        translated = translate(pattern, target="java")
    except UnsupportedRegexError as exc:
        return None, f"java dialect: {exc}"
    # conservative: require the Python twin to compile too, so the two
    # planes can be differentially tested against each other
    try:
        compile_js_regex(pattern)
    except UnsupportedRegexError as exc:
        return None, f"python twin: {exc}"
    return translated, None


def java_regex_or_none(pattern: str):
    """Java-dialect translation for ``Column.rlike``, or ``None`` when the
    pattern is outside the verified-safe subset (caller falls back to the
    next plane)."""
    return java_regex_explain(pattern)[0]
