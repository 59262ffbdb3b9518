"""Deterministic-sampling operators: reproducibility across
partitioning (the property rand() lacks), split disjointness/
exhaustiveness, rate accuracy, exact per-group caps, and the two-phase
cap's equality with a single-window reference."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from jema_js_spark.operators.sampling import (
    hash_sample,
    hash_split,
    stratified_cap,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_hash_sample_rate_and_determinism(spark, docs):
    total = docs.count()
    kept = hash_sample(docs, ["doc_id"], 0.25, seed=7)
    ids_a = {r[0] for r in kept.select("doc_id").collect()}
    # deterministic: same rows regardless of partitioning
    ids_b = {r[0] for r in
             hash_sample(docs.repartition(13), ["doc_id"], 0.25, seed=7)
             .select("doc_id").collect()}
    assert ids_a == ids_b
    assert 0.15 * total < len(ids_a) < 0.35 * total
    # monotone in rate: a bigger sample contains the smaller one
    ids_c = {r[0] for r in hash_sample(docs, ["doc_id"], 0.5, seed=7)
             .select("doc_id").collect()}
    assert ids_a <= ids_c
    # a different seed draws a different set
    ids_d = {r[0] for r in hash_sample(docs, ["doc_id"], 0.25, seed=8)
             .select("doc_id").collect()}
    assert ids_a != ids_d


def test_hash_sample_keeps_equal_keys_together(spark, docs):
    doubled = docs.union(docs)
    kept = hash_sample(doubled, ["doc_id"], 0.3, seed=1)
    counts = kept.groupBy("doc_id").count().collect()
    assert counts and all(r["count"] == 2 for r in counts)


def test_hash_sample_rejects_bad_rate(docs):
    with pytest.raises(ValueError, match="rate"):
        hash_sample(docs, ["doc_id"], 1.5)


def test_hash_split_disjoint_exhaustive(spark, docs):
    out = hash_split(docs, ["doc_id"],
                     {"train": 0.8, "val": 0.1, "test": 0.1}, seed=3)
    counts = {r["split"]: r["count"]
              for r in out.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == docs.count()      # exhaustive
    assert counts["train"] > counts["val"]
    # deterministic assignment (exactly reproducible)
    a = sorted((r["doc_id"], r["split"]) for r in
               out.select("doc_id", "split").collect())
    b = sorted((r["doc_id"], r["split"]) for r in
               hash_split(docs.repartition(9), ["doc_id"],
                          {"train": 0.8, "val": 0.1, "test": 0.1}, seed=3)
               .select("doc_id", "split").collect())
    assert a == b
    with pytest.raises(ValueError, match="fractions"):
        hash_split(docs, ["doc_id"], {})


def test_md5_method_matches_duckdb(spark, docs):
    # the engine-portable draw: DuckDB recomputes the identical md5
    # hash, so sample membership matches bit-for-bit across engines
    import duckdb

    got = sorted(r[0] for r in
                 hash_sample(docs, ["doc_id"], 0.3, seed=5, method="md5")
                 .select("doc_id").collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM read_parquet('{SF}/documents.parquet')")
    want = [r[0] for r in con.execute("""
        SELECT doc_id FROM documents
        WHERE ('0x' || substring(md5(doc_id::VARCHAR || '|' || '5'),
                                 1, 13))::BIGINT / 4503599627370496.0 < 0.3
        ORDER BY doc_id""").fetchall()]
    assert got == want and len(got) > 0


def test_unknown_hash_method_rejected(docs):
    with pytest.raises(ValueError, match="method"):
        hash_sample(docs, ["doc_id"], 0.5, method="sha999")


def test_rate_one_keeps_everything(spark, docs):
    # review pin (round 4): the unit hash is clamped below 1.0, so
    # rate=1.0 keeps every row (an unclamped draw could hit exactly
    # 1.0 for hashes near Long.MAX_VALUE and silently drop rows)
    n = docs.count()
    assert hash_sample(docs, ["doc_id"], 1.0).count() == n
    assert hash_sample(docs, ["doc_id"], 1.0, method="md5").count() == n
    assert hash_sample(docs, ["doc_id"], 0.0).count() == 0


def test_stratified_cap_exact(spark, docs):
    capped = stratified_cap(docs, ["lang"], n=5, seed=2)
    counts = {r["lang"]: r["count"]
              for r in capped.groupBy("lang").count().collect()}
    full = {r["lang"]: r["count"]
            for r in docs.groupBy("lang").count().collect()}
    for lang, c in counts.items():
        assert c == min(5, full[lang]), lang
    assert set(counts) == set(full)                  # no group lost
    # two-phase selection == single-window reference (exactness)
    pri = F.xxhash64(*[F.col(c) for c in docs.columns], F.lit(2))
    w = Window.partitionBy("lang").orderBy(pri)
    ref = (docs.withColumn("__rn", F.row_number().over(w))
           .filter(F.col("__rn") <= 5).drop("__rn"))
    got = sorted(r["doc_id"] for r in capped.select("doc_id").collect())
    want = sorted(r["doc_id"] for r in ref.select("doc_id").collect())
    assert got == want
    # stable across partitioning
    again = sorted(r["doc_id"] for r in
                   stratified_cap(docs.repartition(17), ["lang"], n=5, seed=2)
                   .select("doc_id").collect())
    assert got == again


def test_stratified_cap_rejects_reserved_columns(spark, docs):
    # working columns would be silently replaced then dropped (ADVICE
    # r4) — the guard must name the clash
    poisoned = docs.withColumn("__pri", F.lit(1))
    with pytest.raises(ValueError, match="__pri"):
        stratified_cap(poisoned, ["lang"], n=5)
