"""Session-scoped memo for constant Column expressions (round 9).

Building a Column is driver-side work — literal conversion and
higher-order-lambda construction cost milliseconds EACH on the py4j
bridge (measured: a 64-element array literal ~37 ms, a zip_with+
aggregate dot ~15 ms, a 7-language stopword-marker bank ~250 ms) — and
operators that rebuild the same constant expression trees on every
call turn that into a fixed driver tax per query.  Column objects are
immutable expression trees addressed by input column NAME, so a
constant fragment is freely reusable across queries and DataFrames
within one Spark application.

``cached_column(key, build)`` memoizes ``build()`` under ``key``
scoped to the active application (stopped sessions' JVM handles are
never replayed: a new application gets a new cache slot).  This caches
expression CONSTRUCTION only — every query still builds a fresh
DataFrame lineage and recomputes results from its inputs.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

_CACHE: Dict[tuple, Any] = {}
_CAP = 256


def _app_id() -> Any:
    from pyspark.sql import SparkSession

    sess = SparkSession.getActiveSession()
    if sess is None:
        return None
    try:
        return sess.sparkContext.applicationId
    except Exception:
        return None


def cached_column(key: tuple, build: Callable[[], Any]) -> Any:
    """Return ``build()`` memoized under ``(applicationId,) + key``."""
    k = (_app_id(),) + key
    col = _CACHE.get(k)
    if col is None:
        col = build()
        if len(_CACHE) >= _CAP:
            _CACHE.clear()
        _CACHE[k] = col
    return col
