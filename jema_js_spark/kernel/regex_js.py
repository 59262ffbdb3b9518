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
every verdict.  ASCII/Any/Assigned evaluate too; other ES binary
properties are valid-but-unevaluable (plain Unsupported); script
properties are undecidable (loud); unknown names are ES SyntaxErrors
(:class:`InvalidRegexError` — exact-case matching, round-7 review
fix).

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
    "InvalidRegexError",
    "UndecidableRegexError",
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
    dialect — callers fall back to another execution plane.  Raised
    PLAIN only for constructs that are VALID ECMAScript 'u'-flag syntax
    (``new RegExp(p,'u')`` compiles in the reference) — that contract
    lets ``format: "regex"`` answer compilability questions without
    evaluating (formats.py valid_regex)."""


class InvalidRegexError(UnsupportedRegexError):
    """Pattern is a SyntaxError under ECMAScript 'u'-flag compilation —
    the reference's ``new RegExp(p,'u')`` throws.  ``format: "regex"``
    maps this to false exactly as the reference's catch does
    (schema.js:519)."""


class UndecidableRegexError(UnsupportedRegexError):
    """This engine cannot decide whether the pattern compiles under
    ECMAScript 'u' (e.g. ``\\p{Script=X}`` — validity depends on the
    Unicode script-name table, which this engine does not carry).
    ``format: "regex"`` refuses LOUDLY rather than guessing a verdict
    either way."""


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
# verdict.  ASCII/Any/Assigned evaluate too; other ES binary
# properties are recognized as VALID-but-unevaluable (plain
# Unsupported); script properties are UNDECIDABLE (loud); unknown
# names are ES SyntaxErrors (InvalidRegexError) — see
# _property_class_body.

# EXACT-case names per PropertyValueAliases.txt — ES property matching
# is case-sensitive (round-7 review find: the old .upper() matching
# accepted SyntaxError names like \p{letter}, splitting format:"regex"
# verdicts from the reference's new RegExp(p,'u') throw).  The
# lowercase entries (digit/cntrl/punct) are exact aliases from the
# file, not case forgiveness.
_GC_LONG_ALIASES = {
    "Letter": "L", "Uppercase_Letter": "Lu", "Lowercase_Letter": "Ll",
    "Titlecase_Letter": "Lt", "Modifier_Letter": "Lm",
    "Other_Letter": "Lo", "Cased_Letter": "LC",
    "Mark": "M", "Nonspacing_Mark": "Mn", "Spacing_Mark": "Mc",
    "Enclosing_Mark": "Me", "Combining_Mark": "M",
    "Number": "N", "Decimal_Number": "Nd", "digit": "Nd",
    "Letter_Number": "Nl", "Other_Number": "No",
    "Punctuation": "P", "Connector_Punctuation": "Pc",
    "Dash_Punctuation": "Pd", "Open_Punctuation": "Ps",
    "Close_Punctuation": "Pe", "Initial_Punctuation": "Pi",
    "Final_Punctuation": "Pf", "Other_Punctuation": "Po", "punct": "P",
    "Symbol": "S", "Math_Symbol": "Sm", "Currency_Symbol": "Sc",
    "Modifier_Symbol": "Sk", "Other_Symbol": "So",
    "Separator": "Z", "Space_Separator": "Zs", "Line_Separator": "Zl",
    "Paragraph_Separator": "Zp",
    "Other": "C", "Control": "Cc", "cntrl": "Cc", "Format": "Cf",
    "Surrogate": "Cs", "Private_Use": "Co", "Unassigned": "Cn",
}

# ES 'u'-flag binary Unicode property names (spec table incl. aliases)
# that this engine does NOT evaluate beyond White_Space/ASCII/Any/
# Assigned.  Their presence still means the pattern COMPILES in the
# reference — plain UnsupportedRegexError (es-valid), never Invalid.
_ES_BINARY_PROPS = frozenset({
    "Alphabetic", "Alpha", "Case_Ignorable", "CI", "Cased",
    "Changes_When_Casefolded", "CWCF", "Changes_When_Casemapped",
    "CWCM", "Changes_When_Lowercased", "CWL",
    "Changes_When_NFKC_Casefolded", "CWKCF", "Changes_When_Titlecased",
    "CWT", "Changes_When_Uppercased", "CWU", "Dash",
    "Default_Ignorable_Code_Point", "DI", "Deprecated", "Dep",
    "Diacritic", "Dia", "Emoji", "Emoji_Component", "EComp",
    "Emoji_Modifier", "EMod", "Emoji_Modifier_Base", "EBase",
    "Emoji_Presentation", "EPres", "Extended_Pictographic", "ExtPict",
    "Extender", "Ext", "Grapheme_Base", "Gr_Base", "Grapheme_Extend",
    "Gr_Ext", "Hex_Digit", "Hex", "ID_Continue", "IDC", "ID_Start",
    "IDS", "Ideographic", "Ideo", "IDS_Binary_Operator", "IDSB",
    "IDS_Trinary_Operator", "IDST", "Join_Control", "Join_C",
    "Logical_Order_Exception", "LOE", "Lowercase", "Lower", "Math",
    "Noncharacter_Code_Point", "NChar", "Pattern_Syntax", "Pat_Syn",
    "Pattern_White_Space", "Pat_WS", "Quotation_Mark", "QMark",
    "Radical", "Regional_Indicator", "RI", "Sentence_Terminal",
    "STerm", "Soft_Dotted", "SD", "Terminal_Punctuation", "Term",
    "Unified_Ideograph", "UIdeo", "Uppercase", "Upper",
    "Variation_Selector", "VS", "XID_Continue", "XIDC", "XID_Start",
    "XIDS",
})
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
    """Class-body range material (no brackets) for a \\p{prop}.

    Name matching is EXACT-case (ES 'u'-flag property matching is
    case-sensitive; no whitespace trimming either — ``\\p{ Letter }``
    is a SyntaxError in the reference).  Raises:

    - nothing — for evaluable properties: general categories (short,
      long, and exact file aliases), White_Space/WSpace, ASCII, Any,
      Assigned;
    - plain :class:`UnsupportedRegexError` — for ES-VALID binary
      properties this engine does not evaluate (Alphabetic, ID_Start,
      …): the reference compiles them, we cannot match them;
    - :class:`UndecidableRegexError` — for Script/Script_Extensions
      values (validity depends on the Unicode script-name table this
      engine does not carry);
    - :class:`InvalidRegexError` — for everything else: the
      reference's ``new RegExp(p,'u')`` throws."""
    raw = prop
    explicit_gc = raw.startswith(("General_Category=", "gc="))
    if explicit_gc:
        raw = raw.split("=", 1)[1]
    if not explicit_gc:
        if raw in ("White_Space", "WSpace"):
            return _ranges_to_body([(c, c) for c in _WHITE_SPACE_CPS])
        if raw == "ASCII":
            return _ranges_to_body([(0x00, 0x7F)])
        if raw == "Any":
            return _ranges_to_body([(0x00, 0x10FFFF)])
        if raw == "Assigned":
            cn = _category_ranges().get("Cn", [])
            return _ranges_to_body(_complement_ranges(cn))
        if raw in _ES_BINARY_PROPS:
            raise UnsupportedRegexError(
                f"\\p{{{prop}}}: ES-valid binary property this engine "
                "does not evaluate")
        if raw.startswith(("Script=", "sc=", "Script_Extensions=",
                           "scx=")):
            raise UndecidableRegexError(
                f"\\p{{{prop}}}: script-property validity needs the "
                "Unicode script table")
    key = raw if raw in _GC_SHORT else _GC_LONG_ALIASES.get(raw)
    if key is None:
        raise InvalidRegexError(
            f"\\p{{{prop}}}: not a known general category"
            + ("" if explicit_gc else " or supported binary property")
            + " — SyntaxError under the reference's RegExp(p,'u')")
    cats = (["Lu", "Ll", "Lt"] if key == "LC"
            else [c for c in _category_ranges() if c.startswith(key)]
            if len(key) == 1 else [key])
    cps = [r for c in cats for r in _category_ranges().get(c, [])]
    return _ranges_to_body(cps)


def _ranges_to_body(cps) -> str:
    parts = []
    for a, b in _merge_ranges(cps):
        ea = _hex4(a) if a <= 0xFFFF else f"\\U{a:08x}"
        eb = _hex4(b) if b <= 0xFFFF else f"\\U{b:08x}"
        parts.append(ea if a == b else f"{ea}-{eb}")
    return "".join(parts)


def _complement_ranges(ranges):
    """Sorted complement of [start, end] ranges over the codespace."""
    out = []
    nxt = 0
    for a, b in sorted(_merge_ranges(list(ranges))):
        if a > nxt:
            out.append((nxt, a - 1))
        nxt = max(nxt, b + 1)
    if nxt <= 0x10FFFF:
        out.append((nxt, 0x10FFFF))
    return out


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
                raise InvalidRegexError("trailing backslash")
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
                    raise InvalidRegexError(r"bare \c")
            elif e == "u":
                if i < n and pattern[i] == "{":
                    j = pattern.find("}", i)
                    if j == -1:
                        raise InvalidRegexError(r"unterminated \u{...}")
                    cp = int(pattern[i + 1:j], 16)
                    out.append(_code_point_escape(cp, target))
                    i = j + 1
                elif i + 4 <= n and re.fullmatch(r"[0-9a-fA-F]{4}", pattern[i:i + 4]):
                    out.append("\\u" + pattern[i:i + 4])
                    i += 4
                else:
                    raise InvalidRegexError(r"malformed \uXXXX")
            elif e in ("p", "P"):
                if i >= n or pattern[i] != "{":
                    raise InvalidRegexError(r"bare \p")
                j = pattern.find("}", i)
                if j == -1:
                    raise InvalidRegexError(r"unterminated \p{...}")
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
                        raise InvalidRegexError(r"unterminated \k<...>")
                    name = pattern[i + 1:j]
                    out.append(f"(?P={name})" if target == "python" else f"\\k<{name}>")
                    i = j + 1
                else:
                    raise InvalidRegexError(r"bare \k")
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
                    raise InvalidRegexError("unterminated (?<name>")
                name = pattern[i + 3:j]
                out.append(f"(?P<{name}>" if target == "python" else f"(?<{name}>")
                i = j + 1
                continue
            out.append(c)
        else:
            out.append(c)
        i += 1

    if in_class:
        raise InvalidRegexError("unterminated character class")
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
        # Python's fixed-width lookbehind restriction rejects patterns
        # that ARE valid ES2018 (unrestricted lookbehind) — plain
        # Unsupported (es-valid, unevaluable).  Every other re.error
        # on translated output (unbalanced groups, bad quantifier
        # ranges, undefined named backrefs) mirrors an ES SyntaxError.
        if "look-behind" in str(exc):
            raise UnsupportedRegexError(
                f"variable-width lookbehind in {pattern!r}: {exc}") from exc
        raise InvalidRegexError(
            f"invalid pattern {pattern!r}: {exc}") from exc


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
