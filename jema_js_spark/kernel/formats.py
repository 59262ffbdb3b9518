"""``format`` keyword validators — assertion mode (opt-in).

The shipped reference disables format assertion (hard ``return true`` at
/root/reference/schema.js:499, the draft 2020-12 annotation-only
default); the implementations below mirror the dead-code branch
(schema.js:500-523) and its helper functions (schema.js:692-809), which
the experimental build runs for real
(tools/schema-probably-faster.js:435-459).

The engine default matches the shipped reference (annotation-only) for
suite parity; ``Validator(format_assertion=True)`` turns these on.
"""

from __future__ import annotations

import ipaddress
import re
import unicodedata
from calendar import monthrange

__all__ = ["check_format"]

_DATE_RE = re.compile(r"^(\d{4})-(\d{2})-(\d{2})\Z")
_TIME_RE = re.compile(
    r"^(\d{2}):(\d{2}):(\d{2})(?:\.\d+)?(?:Z|([+-]\d{2}):(\d{2}))\Z", re.IGNORECASE)
_UUID_RE = re.compile(r"^[0-9a-f]{8}(?:-[0-9a-f]{4}){3}-[0-9a-f]{12}\Z", re.IGNORECASE)
_JSON_POINTER_RE = re.compile(r"^(?:/(?:[^~/]|~0|~1)*)*\Z")
_REL_JSON_POINTER_RE = re.compile(r"^(?:0|[1-9][0-9]*)(?:#|(?:/(?:[^~/]|~0|~1)*)*)\Z")
_URI_TEMPLATE_RE = re.compile(r"^(?:[^{}]|\{[^{}]+\})*\Z")
_HOSTNAME_RE = re.compile(r"^[a-zA-Z0-9\-.]+\Z")
_URI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:\S*\Z")
_EMAIL_LOCAL_RE = re.compile(
    r"^(?!\.)(\"([^\"\r\\]|\\[\"\r\\])*\"|([-a-z0-9!#$%&'*+/=?^_`{|}~]|(?<!\.)\.)*)(?<!\.)\Z")
_DUR_DATE_RE = re.compile(r"^P(?:(\d+)Y)?(?:(\d+)M)?(?:(\d+)W)?(?:(\d+)D)?\Z")
_DUR_TIME_RE = re.compile(r"^(?:(\d+)H)?(?:(\d+)M)?(?:(\d+)S)?\Z")


def valid_date(value: str) -> bool:
    """Mirror of validDate (schema.js:692-703): regex + real
    day-in-month check (leap years via the calendar)."""
    m = _DATE_RE.match(value)
    if not m:
        return False
    year, month, day = (int(g) for g in m.groups())
    if month > 12 or day > 31:
        return False
    if day > 28:
        if month < 1:
            return False
        try:
            max_days = monthrange(year, month)[1]
        except ValueError:
            return False
        if day > max_days:
            return False
    return True


def valid_time(value: str) -> bool:
    """Mirror of validTime (schema.js:704-724) incl. the leap-second
    rule: ``:60`` only at 23:59 UTC (or 00:-1 after offset shift)."""
    m = _TIME_RE.match(value)
    if not m:
        return False
    hours, minutes, seconds = int(m.group(1)), int(m.group(2)), int(m.group(3))
    off_h = m.group(4)
    off_m = m.group(5)
    if hours > 23 or minutes > 59 or seconds > 60:
        return False
    if off_h is not None:
        oh = int(off_h)
        if oh > 23 or oh < -23:
            return False
        if off_m is None or int(off_m) > 59:
            return False
    if seconds == 60:
        minutes_utc = minutes - (int(off_m) if off_m is not None else 0)
        hours_utc = hours - (int(off_h) if off_h is not None else 0)
        if minutes_utc not in (59, -1):
            return False
        if hours_utc not in (23, 0):
            return False
    return True


def valid_date_time(value: str) -> bool:
    parts = re.split(r"[Tt]", value, maxsplit=1)
    if len(parts) != 2:
        return False
    return valid_date(parts[0]) and valid_time(parts[1])


def valid_hostname(hostname: str) -> bool:
    """Mirror of isValidHostname (schema.js:731-741)."""
    if not hostname or len(hostname) > 255:
        return False
    if not _HOSTNAME_RE.match(hostname):
        return False
    for label in hostname.split("."):
        if not label or len(label) > 63:
            return False
        if label[0] == "-" or label[-1] == "-":
            return False
    return True


def _script_of(ch: str) -> str:
    # coarse script classes needed by the idn-hostname rules
    cp = ord(ch)
    if 0x0590 <= cp <= 0x05FF:
        return "Hebrew"
    if 0x0370 <= cp <= 0x03FF or 0x1F00 <= cp <= 0x1FFF:
        return "Greek"
    if 0x3040 <= cp <= 0x309F:
        return "Hiragana"
    if 0x30A0 <= cp <= 0x30FF or 0x31F0 <= cp <= 0x31FF:
        return "Katakana"
    if 0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF or 0xF900 <= cp <= 0xFAFF:
        return "Han"
    return ""


def valid_idn_hostname(hostname: str) -> bool:
    """Mirror of isValidIdnHostname (schema.js:742-766): label length,
    '--' in positions 3-4, hyphen edges, Hebrew GERESH/GERSHAYIM
    context, Greek KERAIA context, Hangul tone mark, and the
    middle-dot-requires-CJK rule."""
    if not hostname or any(ch in hostname for ch in " \t/\\#?@[]"):
        return False
    for label in hostname.split("."):
        label = label.lower()
        if len(label) > 63:
            return False
        if label[2:4] == "--":
            # RFC 5891: hyphens in 3rd+4th position forbidden UNLESS the
            # label is a valid punycode A-label ('xn--…').  The reference
            # omits the exception (schema.js:748) — an improvement here,
            # since its format assertions are dead code anyway.
            if not label.startswith("xn--"):
                return False
            try:
                label[4:].encode("ascii").decode("punycode")
            except (UnicodeDecodeError, UnicodeEncodeError):
                return False
        if label.startswith("-") or label.endswith("-"):
            return False
        for i, ch in enumerate(label):
            if ch == "״":  # GERSHAYIM must be preceded by something
                if i == 0:
                    return False
            if ch == "׳":  # GERESH must be preceded by Hebrew
                if i == 0 or _script_of(label[i - 1]) != "Hebrew":
                    return False
            if ch == "͵":  # KERAIA must be followed by Greek
                if i + 1 >= len(label) or _script_of(label[i + 1]) != "Greek":
                    return False
        if "〮" in label:
            return False
        if "・" in label or "·" in label:
            if not any(_script_of(ch) in ("Hiragana", "Katakana", "Han") for ch in label):
                return False
    return True


_IPV4_RE = re.compile(r"^((?!0\d)\d{1,3}\.){3}(?!0\d)\d{1,3}\Z")


def valid_ipv4(ip: str) -> bool:
    """Mirror of isValidIPv4 (schema.js:767-769): no leading zeros,
    each octet 0-255."""
    if not _IPV4_RE.match(ip):
        return False
    return all(0 <= int(p) <= 255 for p in ip.split("."))


def valid_ipv6(ip: str) -> bool:
    # the reference parses via URL (schema.js:770-773); the Python
    # equivalent of that bracket-literal parse is the ipaddress module
    if "%" in ip:
        return False
    try:
        ipaddress.IPv6Address(ip)
        return True
    except ValueError:
        pass
    # URL-style bracket parsing also accepts IPv4-mapped tails handled
    # above; anything else is invalid
    return False


def valid_email(value: str, idn: bool = False) -> bool:
    """Mirror of isValidEmail (schema.js:774-793) incl. ``[IPv6:…]``
    domain literals and the quoted/dot-atom local-part regex."""
    index = value.rfind("@")
    local = value[:index] if index >= 0 else ""
    domain = value[index + 1:]
    if local == "":
        return False
    if domain.startswith("[") and domain.endswith("]"):
        if domain.startswith("[IPv6:"):
            if not valid_ipv6(domain[6:-1]):
                return False
        else:
            if not valid_ipv4(domain[1:-1]):
                return False
    elif idn:
        if not valid_idn_hostname(domain):
            return False
    else:
        if not valid_hostname(domain):
            return False
    return _EMAIL_LOCAL_RE.match(local) is not None


def valid_duration(duration: str) -> bool:
    """Mirror of parseDuration (schema.js:794-809): ISO-8601 with the
    weeks-exclusivity rule and at-least-one-component requirement."""
    parts = duration.split("T")
    date_part = parts[0]
    time_part = parts[1] if len(parts) > 1 else None
    dm = _DUR_DATE_RE.match(date_part)
    if not dm:
        return False
    years, months, weeks, days = dm.groups()
    if weeks is not None and (years is not None or months is not None or days is not None):
        return False
    if time_part == "":
        return False
    tm = _DUR_TIME_RE.match(time_part) if time_part is not None else None
    hours, minutes, seconds = tm.groups() if tm else (None, None, None)
    if all(x is None for x in (years, months, weeks, days, hours, minutes, seconds)):
        return False
    return True


def valid_uri(value: str) -> bool:
    # reference: `new URL(value)` succeeds (schema.js:510) — i.e. an
    # absolute URI with a scheme and no raw whitespace
    return bool(_URI_RE.match(value)) and " " not in value


def valid_uri_reference(value: str) -> bool:
    # reference: `new URL(value, 'http://x.y')` (schema.js:512) — almost
    # anything resolves; reject characters the URL parser refuses
    return not any(ch in value for ch in " \t\n\r") or value == ""


def valid_regex(value: str) -> bool:
    """Mirror of ``case 'regex'`` (schema.js:519): the reference only
    asks whether ``new RegExp(value, 'u')`` COMPILES.  Round-7 review
    fix: classify instead of blanket-False —

    - :class:`InvalidRegexError` (ES SyntaxError) → False, like the
      reference's catch;
    - plain :class:`UnsupportedRegexError` (valid ES this engine can't
      *evaluate* — binary properties, variable-width lookbehind) →
      True: it compiles in the reference, and compilability is all
      this format asserts;
    - :class:`UndecidableRegexError` (script properties — validity
      needs tables this engine doesn't carry) → LOUD, never a guessed
      verdict."""
    from jema_js_spark.kernel.regex_js import (InvalidRegexError,
                                               UndecidableRegexError,
                                               UnsupportedRegexError,
                                               compile_js_regex)

    try:
        compile_js_regex(value)
        return True
    except InvalidRegexError:
        return False
    except UndecidableRegexError:
        raise
    except UnsupportedRegexError:
        return True


def check_format(fmt: str, value: str) -> bool:
    """Dispatch mirror of the format switch (schema.js:500-523).
    Unknown formats are valid (annotation), like the reference."""
    if fmt == "date-time":
        return valid_date_time(value)
    if fmt == "date":
        return valid_date(value)
    if fmt == "time":
        return valid_time(value)
    if fmt == "duration":
        return valid_duration(value)
    if fmt in ("email", "idn-email"):
        return valid_email(value, idn=(fmt == "idn-email"))
    if fmt == "ipv4":
        return valid_ipv4(value)
    if fmt == "ipv6":
        return valid_ipv6(value)
    if fmt in ("uri", "iri"):
        return valid_uri(value)
    if fmt in ("uri-reference", "iri-reference"):
        return valid_uri_reference(value)
    if fmt == "uri-template":
        return _URI_TEMPLATE_RE.match(value) is not None
    if fmt == "hostname":
        return valid_hostname(value)
    if fmt == "idn-hostname":
        return valid_idn_hostname(value)
    if fmt == "uuid":
        return _UUID_RE.match(value) is not None
    if fmt == "json-pointer":
        return _JSON_POINTER_RE.match(value) is not None
    if fmt == "relative-json-pointer":
        return _REL_JSON_POINTER_RE.match(value) is not None
    if fmt == "regex":
        return valid_regex(value)
    return True
