"""Format-assertion functions (kernel/formats.py) — ports of the
reference's dead-code branch (schema.js:692-809), active only in
opt-in assertion mode."""

from __future__ import annotations

import pytest

from jema_js_spark.kernel.formats import check_format
from jema_js_spark.kernel.kernel import validate

CASES = {
    "date": [("2024-02-29", True), ("2023-02-29", False), ("2024-13-01", False),
             ("2024-04-31", False), ("2024-04-30", True), ("20240430", False)],
    "time": [("23:59:59Z", True), ("23:59:60Z", True), ("12:00:60Z", False),
             ("24:00:00Z", False), ("12:30:15+05:30", True),
             ("12:30:15", False), ("08:30:06.283185Z", True)],
    "date-time": [("2024-01-15T10:30:00Z", True),
                  ("2024-01-15t10:30:00z", True),
                  ("2024-01-15 10:30:00Z", False),
                  ("2023-02-29T10:30:00Z", False)],
    "duration": [("P1Y2M3DT4H5M6S", True), ("P3W", True), ("P1Y3W", False),
                 ("PT", False), ("P", False), ("PT1H", True), ("xyz", False)],
    "email": [("a@example.com", True), ("@example.com", False),
              ("a.b@example.com", True), (".a@example.com", False),
              ("a..b@example.com", False), ('"quoted"@example.com', True),
              ("a@[192.168.1.1]", True), ("a@[IPv6:::1]", True),
              ("a@[999.1.1.1]", False)],
    "ipv4": [("192.168.0.1", True), ("256.1.1.1", False),
             ("01.2.3.4", False), ("1.2.3", False), ("0.0.0.0", True)],
    "ipv6": [("::1", True), ("2001:db8::8a2e:370:7334", True),
             ("12345::", False), ("1.2.3.4", False)],
    "hostname": [("example.com", True), ("ex_ample.com", False),
                 ("-bad.com", False), ("bad-.com", False),
                 ("a" * 64 + ".com", False), ("a" * 63 + ".com", True)],
    "uuid": [("2eb8aa08-aa98-11ea-b4aa-73b441d16380", True),
             ("2eb8aa08-aa98-11ea-b4aa-73b441d1638", False),
             ("2EB8AA08-AA98-11EA-B4AA-73B441D16380", True)],
    "json-pointer": [("/a/b", True), ("/a~0b", True), ("/a~2b", False),
                     ("a/b", False), ("", True)],
    "relative-json-pointer": [("0/a", True), ("1#", True), ("01/a", False),
                              ("/a", False)],
    "uri": [("http://example.com", True), ("not a uri", False),
            ("mailto:a@b.c", True), ("//missing-scheme", False)],
    "uri-template": [("http://x/{var}", True), ("http://x/{var", False),
                     ("plain", True)],
    "regex": [("^a+$", True), ("(unclosed", False)],
    "idn-hostname": [("example.com", True), ("xn--bcher-kva.com", True),
                     ("-bad.com", False), ("실례.테스트", True)],
}


@pytest.mark.parametrize(
    "fmt,value,expected",
    [(fmt, v, e) for fmt, pairs in CASES.items() for v, e in pairs],
    ids=lambda x: repr(x)[:30])
def test_format(fmt, value, expected):
    assert check_format(fmt, value) == expected, (fmt, value)


def test_unknown_format_is_valid():
    assert check_format("no-such-format", "anything")


def test_assertion_mode_wiring():
    schema = {"format": "ipv4"}
    # shipped default: annotation-only (schema.js:499)
    assert validate(schema, "999.999.999.999")
    # opt-in assertion mode runs the checks
    assert not validate(schema, "999.999.999.999", format_assertion=True)
    assert validate(schema, "10.0.0.1", format_assertion=True)
    # non-strings stay vacuous even in assertion mode (affects gate)
    assert validate(schema, 42, format_assertion=True)
