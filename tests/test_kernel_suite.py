"""Kernel conformance: every corpus case's verdict must match the
expected verdict (spec oracle / jema pin) — the boolean-only assertion
granularity of the reference's suite runner
(/root/reference/tests/test-suite-deno.js:26-32)."""

from __future__ import annotations

import copy

import pytest

from jema_js_spark.kernel.kernel import Validator
from jema_js_spark.schema.frontend import Schema
from tests.suite_cases import CASES, expected_for, load_remote_registry


def _case_id(i: int) -> str:
    c = CASES[i]
    return f"{c.file}::{c.desc or i}"


@pytest.mark.parametrize("i", range(len(CASES)), ids=_case_id)
def test_suite_case(i: int) -> None:
    case = CASES[i]
    expected = expected_for(case)
    reg = load_remote_registry()
    schema = Schema(copy.deepcopy(case.schema), registry=reg)
    got = Validator(schema).validate(copy.deepcopy(case.data))
    assert got == expected, (
        f"{case.file}: {case.desc}\nschema={case.schema}\ndata={case.data}\n"
        f"expected={expected} got={got}"
        + (f"\n(pinned: {case.pin_why})" if case.pinned is not None else "")
    )
