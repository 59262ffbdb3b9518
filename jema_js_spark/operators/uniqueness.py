"""Dataset-level uniqueness — the reference's ``x_primary``/``x_unique``
SQL-bridge keywords (tools/toSql.js:43-44,115) lifted to table scope
(SURVEY.md §2.9).

Scale design (the north rule's explicit skew handling):

- **Fingerprint pre-pass.**  The first (full-table) aggregation groups
  on ``xxhash64(key)`` — 8 shuffled bytes per row instead of the full
  url string (multi-KB keys at 10^12 rows would otherwise dominate the
  shuffle).  Only fingerprints seen more than once survive; the exact
  key strings travel in a second pass restricted to those (rare)
  candidate rows.  64-bit collisions merge two distinct keys into one
  candidate fingerprint (expected ~n²/2^65 — thousands at 10^12 rows),
  so the second pass re-groups by the REAL key and re-applies the
  ``> 1`` filter: a collision costs a few extra candidate rows, never a
  wrong answer.
- **Salting only where payload funnels.**  Pure COUNT aggregations are
  already skew-safe: Spark's map-side partial aggregation collapses a
  hot key to one partial count per map task before the shuffle.
  Salting a count actively HURTS — a per-row salt makes every row its
  own stage-1 group, defeating the combine (measured ~40% slower at
  8M rows).  Salting matters the moment the aggregation carries
  payload (example row-ids per duplicate key, which WOULD otherwise
  funnel every occurrence of a hot url into one task), so the salted
  two-stage shape runs only on the examples path — and only over the
  (rare) candidate rows that survive the fingerprint pre-pass.
- AQE skew handling stays on as the runtime backstop.  The candidate
  semi-join is left unhinted: AQE broadcasts it at runtime when the
  duplicate set is small (the normal case).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["duplicate_keys", "uniqueness_report"]


def _salted_dup_agg(df: DataFrame, keys: Sequence[str], salt_buckets: int,
                    examples_per_key: int,
                    example_col: Optional[str]) -> DataFrame:
    """Two-stage salted exact aggregation over ``keys`` → ``(key...,
    n_rows[, examples])`` filtered to ``n_rows > 1``."""
    salt = F.pmod(F.xxhash64(*[F.col(k) for k in keys],
                             F.monotonically_increasing_id()),
                  F.lit(salt_buckets)).alias("__salt")

    stage1_aggs = [F.count(F.lit(1)).alias("__cnt")]
    if example_col is not None:
        stage1_aggs.append(
            F.slice(F.collect_list(example_col), 1, examples_per_key)
            .alias("__ex"))

    stage1 = df.select(*keys,
                       *( [F.col(example_col)] if example_col else [] ),
                       salt).groupBy(*keys, "__salt").agg(*stage1_aggs)

    stage2_aggs = [F.sum("__cnt").alias("n_rows")]
    if example_col is not None:
        stage2_aggs.append(
            F.slice(F.flatten(F.collect_list("__ex")), 1, examples_per_key)
            .alias("examples"))

    return (stage1.groupBy(*keys).agg(*stage2_aggs)
            .filter(F.col("n_rows") > 1))


def duplicate_keys(df: DataFrame, key: str | Sequence[str],
                   salt_buckets: int = 64,
                   examples_per_key: int = 3,
                   example_col: Optional[str] = None) -> DataFrame:
    """Keys appearing more than once: ``(key..., n_rows, examples)``.

    Plan (see module docstring for the scale rationale):

    1. full-table count over the 8-byte ``xxhash64(key)`` fingerprint
       (two-stage salted) → candidate fingerprints with count > 1;
    2. semi-join the input to the candidates (AQE broadcasts when the
       duplicate set is small) and re-aggregate the surviving rows by
       the REAL key — exact output, immune to 64-bit collisions, and
       the only pass that ever shuffles key strings.

    ``examples`` carries up to ``examples_per_key`` sample values of
    ``example_col`` per duplicate key, collected skew-safely: capped
    per (key, salt) group in stage 1, so a url occurring 10^9 times
    contributes at most ``salt_buckets * examples_per_key`` strings to
    stage 2 instead of 10^9.
    """
    keys = [key] if isinstance(key, str) else list(key)
    fp = F.xxhash64(*[F.col(k) for k in keys]).alias("__fp")

    # pass 1: plain hash-aggregate count per fingerprint — map-side
    # partial combine de-skews hot keys, and the shuffle moves 8-byte
    # fps + partial counts, never key strings
    candidates = (df.select(fp)
                  .groupBy("__fp")
                  .agg(F.count(F.lit(1)).alias("__n"))
                  .filter(F.col("__n") > 1)
                  .select("__fp"))

    wanted = keys + ([example_col] if example_col else [])
    survivors = (df.select(*wanted, fp)
                 .join(candidates, "__fp", "left_semi"))
    if example_col is None:
        # pure count over the rare candidate rows: map-side combine is
        # the skew handling (salting would defeat it — module docstring)
        return (survivors.groupBy(*keys)
                .agg(F.count(F.lit(1)).alias("n_rows"))
                .filter(F.col("n_rows") > 1))
    return _salted_dup_agg(survivors, keys, salt_buckets,
                           examples_per_key, example_col)


def uniqueness_report(df: DataFrame, key: str | Sequence[str],
                      salt_buckets: int = 64) -> dict:
    """Verdict + magnitude: total rows, duplicate keys, surplus rows.
    Runs the two-pass :func:`duplicate_keys` plan (fingerprint count +
    candidate re-aggregation — two scans of the input) plus a separate
    ``count()``; verdict is ``dup_keys == 0``."""
    keys = [key] if isinstance(key, str) else list(key)
    dups = duplicate_keys(df, keys, salt_buckets=salt_buckets)
    agg = dups.agg(
        F.count(F.lit(1)).alias("dup_keys"),
        F.coalesce(F.sum(F.col("n_rows") - 1), F.lit(0)).alias("surplus_rows"),
    ).collect()[0]
    total = df.count()
    return {
        "n_rows": total,
        "dup_keys": agg["dup_keys"],
        "surplus_rows": agg["surplus_rows"],
        "unique": agg["dup_keys"] == 0,
    }
