from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from jema_js_spark.runtime.session import build_session

    s = build_session(app_name="jema-tests", master="local[4]",
                      shuffle_partitions=4)
    yield s
    s.stop()
