"""Dataset-level and pipeline operators vs independent oracles:
DuckDB for SQL-expressible checks, numpy for vector math, planted
duplicates for dedup recall."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from jema_js_spark.operators.dedup import (
    exact_dedup,
    exact_dup_groups,
    minhash_candidates,
    ngram_jaccard,
    simhash_candidates,
)
from jema_js_spark.operators.drift import (
    categorical_drift,
    ks_exact,
    ks_two_sample,
)
from jema_js_spark.operators.referential import fk_violations, ts_window_violations
from jema_js_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dups,
    fit_centroids,
    ivf_assign,
    ivf_topk,
)
from jema_js_spark.operators.stats import column_stats
from jema_js_spark.operators.text import (
    fingerprint64,
    lang_id_expr,
    quality_score,
    token_count,
    with_text_features,
)
from jema_js_spark.operators.uniqueness import duplicate_keys, uniqueness_report

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ["documents", "embeddings", "orders", "customer", "lineitem"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def test_column_stats_vs_duckdb(docs, duck):
    got = column_stats(docs, ["lang", "n_chars"]).collect()[0].asDict()
    exp = duck.execute(
        "SELECT count(*), sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END), "
        "min(n_chars), max(n_chars) FROM documents").fetchone()
    assert got["n_rows"] == exp[0]
    assert got["lang_nulls"] == exp[1]
    assert got["n_chars_min"] == exp[2]
    assert got["n_chars_max"] == exp[3]
    exact_distinct = duck.execute(
        "SELECT count(DISTINCT lang) FROM documents").fetchone()[0]
    assert abs(got["lang_approx_distinct"] - exact_distinct) <= max(
        1, 0.1 * exact_distinct)


def test_uniqueness_vs_duckdb(spark, docs, duck):
    # synthesize dups: every doc_id % 7 == 0 doubled
    dup = docs.filter(F.col("doc_id") % 7 == 0)
    with_dups = docs.union(dup)
    got = duplicate_keys(with_dups, "doc_id").count()
    exp = duck.execute(
        "SELECT count(*) FROM (SELECT doc_id FROM "
        "(SELECT * FROM documents UNION ALL SELECT * FROM documents "
        "WHERE doc_id % 7 = 0) GROUP BY doc_id HAVING count(*) > 1)"
    ).fetchone()[0]
    assert got == exp
    rep = uniqueness_report(docs, "doc_id")
    assert rep["unique"] and rep["dup_keys"] == 0


def test_uniqueness_examples_capped(spark, docs):
    many = docs.limit(1).crossJoin(spark.range(500).select(F.col("id").alias("j")))
    dups = duplicate_keys(many, "doc_id", example_col="j",
                          examples_per_key=3).collect()
    assert len(dups) == 1 and dups[0]["n_rows"] == 500
    assert len(dups[0]["examples"]) <= 3  # hot key didn't funnel 500 payloads


def test_fk_violations_vs_duckdb(spark, duck):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    # orphan orders: customers above a cutoff removed from the dim side
    dim = customer.filter(F.col("c_custkey") <= 100)
    got = fk_violations(orders, "o_custkey", dim, "c_custkey").count()
    exp = duck.execute(
        "SELECT count(*) FROM orders o WHERE NOT EXISTS ("
        "SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey "
        "AND c.c_custkey <= 100)").fetchone()[0]
    assert got == exp


def test_ts_window_violations(spark):
    from jema_js_spark.sources.pages import crawl_manifest, synthetic_pages

    pages = synthetic_pages(spark, 5000)
    manifest = crawl_manifest(spark)
    bad = ts_window_violations(pages, "warc_ts", manifest, "window")
    n_bad = bad.count()
    # generator plants ~0.5% out-of-window rows
    assert 5 <= n_bad <= 60
    # every flagged row is genuinely outside the crawl window
    from jema_js_spark.sources.pages import CRAWL_START, CRAWL_DAYS
    outside = bad.filter(
        (F.unix_timestamp("warc_ts") >= CRAWL_START)
        & (F.unix_timestamp("warc_ts") < CRAWL_START + CRAWL_DAYS * 86400)).count()
    assert outside == 0


def test_categorical_drift(spark, docs):
    # uniform split → no drift; skewed split → drift on the skewed group
    base = docs.withColumn("grp", F.pmod(F.col("doc_id"), F.lit(2)))
    d = categorical_drift(base, "grp", "lang").collect()
    assert all(0 <= r["tvd"] <= 1 for r in d)
    skew = docs.withColumn(
        "grp", F.when(F.col("lang") == "en", 0).otherwise(F.pmod(F.col("doc_id"), F.lit(2))))
    d2 = {r["grp"]: r["tvd"] for r in categorical_drift(skew, "grp", "lang").collect()}
    assert d2[0] > max(r["tvd"] for r in d)


def test_ks_two_sample(spark, docs):
    same = ks_two_sample(docs, docs, "n_chars")
    assert same["ks"] <= 0.02
    shifted = docs.withColumn("n_chars", F.col("n_chars") + 1000)
    diff = ks_two_sample(docs, shifted, "n_chars")
    assert diff["ks"] > 0.5


def test_ks_exact_vs_python_ecdf(spark, docs):
    # exact-histogram KS vs a brute-force python ECDF over the raw data
    a = docs.filter(F.col("lang") == "en")
    b = docs.filter(F.col("lang") != "en")
    got = ks_exact(a, b, "n_chars").collect()[0]["ks"]
    va = sorted(r[0] for r in a.select("n_chars").collect() if r[0] is not None)
    vb = sorted(r[0] for r in b.select("n_chars").collect() if r[0] is not None)
    import bisect
    want = max(abs(bisect.bisect_right(va, x) / len(va)
                   - bisect.bisect_right(vb, x) / len(vb))
               for x in set(va) | set(vb))
    assert got == pytest.approx(want, abs=1e-6)
    # identical sides → exactly 0
    assert ks_exact(docs, docs, "n_chars").collect()[0]["ks"] == 0.0


def test_ks_exact_distributed_plan_and_edges(spark):
    """Round-5 distributed cumulative (VERDICT r4 #3): the in-bucket
    window must be bucket-partitioned (parallel tasks), the only
    unpartitioned window may run over the bounded bucket-totals table,
    and degenerate shapes (single distinct value, partitions ≫
    distinct, heavy ties) stay exact."""
    import bisect

    a = spark.range(0, 20000).select(
        (F.pmod(F.col("id") * 37, F.lit(5000))).alias("x"))
    b = spark.range(0, 15000).select(
        (F.pmod(F.col("id") * 53, F.lit(5000)) + 200).alias("x"))
    got = ks_exact(a, b, "x", partitions=16).collect()[0]["ks"]
    va = sorted(r[0] for r in a.collect())
    vb = sorted(r[0] for r in b.collect())
    want = max(abs(bisect.bisect_right(va, x) / len(va)
                   - bisect.bisect_right(vb, x) / len(vb))
               for x in set(va) | set(vb))
    assert got == pytest.approx(want, abs=1e-6)

    plan = ks_exact(a, b, "x", partitions=16) \
        ._jdf.queryExecution().executedPlan().toString()
    # the O(distinct)-row cumulative is partitioned by bucket...
    assert "windowspecdefinition(__bkt" in plan
    # ...and no window runs a global sort over the raw value column
    # (the pre-round-5 single-task shape)
    assert "windowspecdefinition(v#" not in plan

    # degenerate: one distinct value on both sides → ks 0
    one = spark.range(5).select(F.lit(7).alias("x"))
    assert ks_exact(one, one, "x", partitions=64) \
        .collect()[0]["ks"] == 0.0
    # partitions ≫ distinct, disjoint supports → ks 1
    la = spark.range(3).select(F.lit(1).alias("x"))
    lb = spark.range(4).select(F.lit(2).alias("x"))
    assert ks_exact(la, lb, "x", partitions=64).collect()[0]["ks"] == 1.0


def test_ks_sketch_tracks_exact(spark, docs):
    # the sketch path (the unbounded-cardinality regime) must agree
    # with the exact statistic within its grid resolution
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1) \
        .withColumn("n_chars", F.col("n_chars") + 40)
    exact = ks_exact(a, b, "n_chars").collect()[0]["ks"]
    sketch = ks_two_sample(a, b, "n_chars")["ks"]
    assert abs(sketch - exact) < 0.05
    assert exact > 0.05   # the planted shift is visible


def test_text_features(spark, docs):
    feats = with_text_features(docs).select(
        "doc_id", "text", "lang", "n_tokens", "n_bpe_tokens", "quality",
        "lang_pred", "fingerprint").limit(50).collect()
    for r in feats:
        assert r["n_tokens"] == len([t for t in r["text"].lower().split() if t])
        assert r["n_bpe_tokens"] >= r["n_tokens"]
        assert 0.0 <= r["quality"] <= 1.0
    # fingerprint: equal normalized text ⇔ equal fingerprint
    two = spark.createDataFrame(
        [("a  b\tc",), ("a b c",), ("a b d",)], "text string")
    fps = two.select(fingerprint64(F.col("text")).alias("f")).collect()
    assert fps[0]["f"] == fps[1]["f"] and fps[0]["f"] != fps[2]["f"]


def test_lang_id_heuristic(spark):
    samples = [
        ("the cat sat on the mat and the dog is in the house", "en"),
        ("der Hund ist nicht in der Schule und das ist gut", "de"),
        ("le chat est dans la maison et les enfants sont pour", "fr"),
        ("el perro es una mascota para los amigos del barrio", "es"),
        ("xyzzy qwerty plugh", "unknown"),
    ]
    df = spark.createDataFrame([(s,) for s, _ in samples], "text string")
    got = [r[0] for r in df.select(lang_id_expr(F.col("text"))).collect()]
    assert got == [lang for _, lang in samples]


def test_exact_dedup(spark, docs):
    doubled = docs.union(docs.filter(F.col("doc_id") % 5 == 0))
    groups = exact_dup_groups(doubled, "doc_id")
    assert groups.count() == docs.filter(F.col("doc_id") % 5 == 0).select(
        "text").distinct().count()
    survivors = exact_dedup(doubled, "doc_id")
    # every distinct text appears exactly once
    assert survivors.count() == docs.select(
        fingerprint64(F.col("text"))).distinct().count()


def test_minhash_finds_planted_near_dups(spark, docs):
    base = docs.limit(100).select("doc_id", "text")
    # plant near-dups: append one token to a copy (ids offset by 10^6)
    near = base.select((F.col("doc_id") + 1000000).alias("doc_id"),
                       F.concat(F.col("text"), F.lit(" tail")).alias("text"))
    corpus = base.union(near)
    pairs = minhash_candidates(corpus, "doc_id", "text",
                               jaccard_threshold=0.5).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    planted = {(r["doc_id"], r["doc_id"] + 1000000) for r in base.collect()}
    recall = len(found & planted) / len(planted)
    assert recall >= 0.9, f"minhash recall {recall}"


def test_simhash_finds_planted_near_dups(spark, docs):
    base = docs.limit(100).select("doc_id", "text")
    near = base.select((F.col("doc_id") + 1000000).alias("doc_id"),
                       F.concat(F.col("text"), F.lit(" x")).alias("text"))
    corpus = base.union(near)
    pairs = simhash_candidates(corpus, "doc_id", "text").collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    planted = {(r["doc_id"], r["doc_id"] + 1000000) for r in base.collect()}
    recall = len(found & planted) / len(planted)
    assert recall >= 0.8, f"simhash recall {recall}"


def test_ngram_jaccard(spark):
    df = spark.createDataFrame(
        [("abcdefghij", "abcdefghij"), ("abcdefghij", "zzzzzzzzzz")],
        "a string, b string")
    vals = [r[0] for r in df.select(
        ngram_jaccard(F.col("a"), F.col("b"))).collect()]
    assert vals[0] == 1.0 and vals[1] == 0.0


def test_brute_force_topk_vs_numpy(spark, emb):
    queries = emb.limit(3).select(F.col("vec_id").alias("query_id"),
                                  "embedding")
    got = brute_force_topk(emb, queries, k=5).collect()
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in emb.collect()}
    for qid in [r["query_id"] for r in queries.collect()]:
        q = vecs[qid]
        sims = {vid: float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
                for vid, v in vecs.items()}
        exp_top = sorted(sims, key=lambda vid: (-sims[vid], vid))[:5]
        got_top = [r["vec_id"] for r in sorted(
            (g for g in got if g["query_id"] == qid), key=lambda g: g["rank"])]
        assert got_top == exp_top


def test_brute_force_topk_two_phase_matches_single_window(spark, emb):
    """The salted two-phase partial top-k must equal the naive single
    global window per query (the round-2 funnel it replaced), including
    tie-breaks on vec_id."""
    from pyspark.sql import Window
    from jema_js_spark.operators.similarity import cosine_sim

    queries = emb.limit(4).select(F.col("query_id"), "embedding") \
        if "query_id" in emb.columns else emb.limit(4).select(
            F.col("vec_id").alias("query_id"), "embedding")
    got = brute_force_topk(emb, queries, k=7, partial_buckets=5).collect()
    q = F.broadcast(queries.select("query_id",
                                   F.col("embedding").alias("__qvec")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("vec_id"))
    naive = (emb.select("vec_id", "embedding").crossJoin(q)
             .select("query_id", "vec_id",
                     cosine_sim(F.col("embedding"), F.col("__qvec"))
                     .alias("cosine"))
             .withColumn("rank", F.row_number().over(w))
             .filter(F.col("rank") <= 7).collect())
    assert sorted([(r["query_id"], r["rank"], r["vec_id"]) for r in got]) == \
        sorted([(r["query_id"], r["rank"], r["vec_id"]) for r in naive])


def test_duplicate_keys_string_key_fingerprint_path(spark, docs, duck):
    """String keys exercise the xxhash64 fingerprint pre-pass: exact
    counts and key strings must match the direct DuckDB group-by."""
    # text truncated to 40 chars collides heavily → real multi-row keys
    keyed = docs.select(F.substring("text", 1, 40).alias("k"), "doc_id")
    got = {(r["k"], r["n_rows"])
           for r in duplicate_keys(keyed, "k").collect()}
    exp = {(r[0], r[1]) for r in duck.execute(
        "SELECT substring(text, 1, 40) AS k, count(*) FROM documents "
        "GROUP BY 1 HAVING count(*) > 1").fetchall()}
    assert got == exp


def test_ivf_topk_recall(spark, emb):
    cents = fit_centroids(emb, nlist=8)
    assigned = ivf_assign(emb, cents).cache()
    queries = emb.limit(10).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = ivf_topk(assigned, queries, cents, k=5, nprobe=4).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    hit = total = 0
    for r in approx:
        total += 1
        hit += r["vec_id"] in exact_sets[r["query_id"]]
    assert total > 0 and hit / (5 * len(exact_sets)) >= 0.6, \
        f"IVF recall {hit}/{5 * len(exact_sets)}"


def test_simhash_single_pass_matches_63_filter_form(spark, docs):
    """The one-aggregate-pass simhash64 must be bit-identical to the
    round-1 63×(filter+size) formulation it replaced."""
    from jema_js_spark.operators.dedup import simhash64
    from jema_js_spark.operators.text import word_tokens

    def simhash64_multipass(text):
        hashes = F.transform(word_tokens(text), lambda t: F.xxhash64(t))
        n = F.size(hashes)

        def bit_vote(b):
            mask = F.lit(1 << b)
            ones = F.size(F.filter(hashes, lambda h: h.bitwiseAND(mask) != 0))
            return F.when(ones * 2 > n, F.lit(1 << b)).otherwise(F.lit(0))

        bits = [bit_vote(b) for b in range(63)]
        out = bits[0]
        for term in bits[1:]:
            out = out.bitwiseOR(term)
        return F.when(n > 0, out).otherwise(F.lit(None).cast("long"))

    sample = docs.limit(50).withColumn("empty", F.lit("   "))
    rows = sample.select(
        simhash64(F.col("text")).alias("fast"),
        simhash64_multipass(F.col("text")).alias("slow"),
        simhash64(F.col("empty")).alias("fast_empty")).collect()
    assert all(r["fast"] == r["slow"] for r in rows)
    assert all(r["fast_empty"] is None for r in rows)


def test_verify_pairs_matches_direct_jaccard(spark, docs):
    """verify_pairs (join-back verification, never a crossJoin) must
    score exactly what ngram_jaccard gives on the texts directly, and
    minhash candidates verified through it must surface the planted
    near-dups with high jaccard."""
    from jema_js_spark.operators.dedup import minhash_candidates, verify_pairs

    base = docs.filter(F.col("doc_id") < 100).select("doc_id", "text")
    near = base.select((F.col("doc_id") + 10**6).alias("doc_id"),
                       F.concat("text", F.lit(" tail")).alias("text"))
    corpus = base.union(near)
    cands = minhash_candidates(corpus, "doc_id", "text",
                               jaccard_threshold=0.5)
    verified = verify_pairs(corpus, cands.select("id_a", "id_b"),
                            "doc_id", "text")
    rows = verified.collect()
    assert rows, "no candidates verified"
    planted = {(r["doc_id"], r["doc_id"] + 10**6) for r in base.collect()}
    high = {(r["id_a"], r["id_b"]) for r in rows if r["jaccard"] >= 0.8}
    assert len(planted & high) >= 0.8 * len(planted)
    # spot-check one score against the direct column form
    a, b = rows[0]["id_a"], rows[0]["id_b"]
    ta = {r["doc_id"]: r["text"] for r in corpus.filter(
        F.col("doc_id").isin([a, b])).collect()}
    direct = spark.createDataFrame([(ta[a], ta[b])], "x string, y string") \
        .select(ngram_jaccard(F.col("x"), F.col("y")).alias("j")).collect()[0]["j"]
    assert abs(direct - rows[0]["jaccard"]) < 1e-12


def test_char_ngrams_short_text_empty(spark):
    from jema_js_spark.operators.text import char_ngrams

    df = spark.createDataFrame([("",), ("abc",), ("abcde",)], "t string")
    out = df.select(F.size(char_ngrams(F.col("t"), 5)).alias("n")).collect()
    assert [r["n"] for r in out] == [0, 0, 1]


def test_fit_centroids_partition_order_stable(spark, emb):
    """The quantizer sample is content-hash ordered, so centroids must
    not depend on partition count/order (round-1: .limit() took the
    first partitions — a biased shard sample at scale)."""
    a = fit_centroids(emb, nlist=4)
    b = fit_centroids(emb.repartition(13), nlist=4)
    c = fit_centroids(emb.coalesce(1), nlist=4)
    assert a == b == c
    # round 6: the bounded-driver merge tier (input partitions >
    # merge_fanin → executor-side fold) must select the SAME sample
    d = fit_centroids(emb.repartition(11), nlist=4, merge_fanin=3)
    e = fit_centroids(emb.repartition(11), nlist=4, merge_fanin=3,
                      sample_rows=40)
    f = fit_centroids(emb.coalesce(1), nlist=4, sample_rows=40)
    assert a == d
    assert e == f


def test_embedding_near_dups(spark, emb):
    # plant exact duplicates of 5 vectors
    dup = emb.limit(5).select((F.col("vec_id") + 1000000).alias("vec_id"),
                              "embedding", "label")
    corpus = emb.union(dup)
    cents = fit_centroids(corpus, nlist=4)
    pairs = embedding_near_dups(corpus, cents, threshold=0.999).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    planted = {(r["vec_id"], r["vec_id"] + 1000000)
               for r in emb.limit(5).collect()}
    assert planted <= found, f"missing {planted - found}"


def test_ks_exact_nonfinite_values(spark):
    """Round-5 review find: NaN/Inf values made the bucket bounds
    non-finite, width_bucket NULLed every row, and ks came back NULL.
    Non-finite values get explicit edge buckets matching Spark's sort
    order (−Inf < finite < +Inf < NaN)."""
    import bisect
    import math

    a = spark.createDataFrame(
        [(float(x),) for x in range(20)] + [(float("nan"),)],
        "x double")
    b = spark.createDataFrame(
        [(float(x) + 5,) for x in range(20)] + [(float("inf"),)],
        "x double")
    got = ks_exact(a, b, "x", partitions=4).collect()[0]["ks"]
    assert got is not None

    def key(x):       # Spark sort order: -inf < finite < +inf < nan
        return (2, 0.0) if math.isnan(x) else (1, x)
    va = sorted((key(float(x)) for x in range(20)), ) + [(2, 0.0)]
    va = sorted(va)
    vb = sorted([key(float(x) + 5) for x in range(20)] + [key(float("inf"))])
    grid = sorted(set(va) | set(vb))
    want = max(abs(bisect.bisect_right(va, g) / len(va)
                   - bisect.bisect_right(vb, g) / len(vb)) for g in grid)
    assert got == pytest.approx(want, abs=1e-6)
    # all-non-finite sides do not crash or NULL out
    nf = spark.createDataFrame([(float("nan"),), (float("inf"),)], "x double")
    assert ks_exact(nf, nf, "x").collect()[0]["ks"] == 0.0
