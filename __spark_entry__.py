"""Driver contract for the jema_js_spark engine.

``entry``   — flagship: schema-validate the Common-Crawl-style pages
              table derived from sf0.001 documents; per-partition
              verdict rows.
``queries`` — one entry per implemented operator from SURVEY.md §2
              (validation keywords, x_unique/x_foreign dataset checks,
              stats, drift, dedup, text analysis, similarity,
              multimodal), each a DataFrame program built on the
              engine's modules.  EXACTLY 50 entries, ordered so the
              round driver (which caps at 50) runs every one; the
              previously-untested six (violations_page + the five
              object-applicator keywords) lead the dict.  Keyword
              consolidations (each keyword still compiled and
              oracle-checked, several per query):
              - kw_length        = minLength + maxLength + pattern
                                   + \\p{Nd} property escape
                                   (three valid columns)
              - kw_enum_const    = enum + const
              - kw_bounds        = minimum + exclusiveMinimum +
                                   exclusiveMaximum + multipleOf
                                   (two valid columns)
              - kw_type          = type:number + type union
                                   (two valid columns)
              - kw_format        = ipv4 + calendar-exact date
                                   (two valid columns)
              - text_features    = token_count + lang_id + quality
              - near_dup_recall  = minhash + simhash + embedding
                                   planted-pair recall (full oracle)
``oracle_sql`` — DuckDB twins for EVERY query (round 4 closed the last
              two gaps: ivf_topk runs exhaustive probing, nprobe =
              nlist, which provably equals brute-force top-k — the
              approximate-recall behavior stays pinned in pytest —
              and ks_drift runs the exact-histogram KS operator).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["en", "de", "fr", "es", "it", "pt", "nl"]

PAGE_CONTRACT = {
    "type": "object",
    "required": ["url", "warc_ts", "text", "lang"],
    "properties": {
        "url": {"type": "string", "maxLength": 2048, "pattern": "^https?://"},
        "text": {"type": "string", "minLength": 1},
        "lang": {"enum": ["en", "de", "fr", "es", "it", "pt", "nl", "unknown"]},
    },
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _doc_valid(schema: dict):
    """(spark, sf_dir) → (doc_id, valid) through the columnar compiler."""
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from jema_js_spark.validation.engine import with_valid

        return with_valid(_docs(spark, sf_dir), schema).select("doc_id", "valid")
    return run


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).withColumn(
        "toks", F.split(F.trim(F.col("text")), r"\s+"))


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: validate the derived pages table against the page
    contract; return per-day verdict rows (the checkpoint/lineage
    unit)."""
    from jema_js_spark.sources.pages import pages_from_documents
    from jema_js_spark.validation.engine import partition_verdicts, with_valid

    pages = pages_from_documents(spark, "/root/testdata/sf0.001").select(
        "doc_id", "url",
        F.timestamp_seconds("warc_epoch").alias("warc_ts"),
        "text", "lang")
    valid = with_valid(pages, PAGE_CONTRACT)
    return partition_verdicts(
        valid, partition_col=F.to_date("warc_ts")).orderBy("partition_id")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from jema_js_spark.operators.dedup import (
        exact_dedup, minhash_candidates, simhash_candidates)
    from jema_js_spark.operators.drift import ks_exact
    from jema_js_spark.operators.referential import fk_violations, ts_window_violations
    from jema_js_spark.operators.similarity import (
        brute_force_topk, embedding_near_dups, fit_centroids, ivf_assign,
        ivf_topk)
    from jema_js_spark.operators.stats import column_stats
    from jema_js_spark.operators.text import (
        lang_id_expr, quality_score, token_count)
    from jema_js_spark.operators.uniqueness import duplicate_keys
    from jema_js_spark.sources.pages import crawl_manifest, pages_from_documents
    from jema_js_spark.validation.engine import with_valid
    from jema_js_spark.validation.kernel_udf import kernel_validate_udf

    # -- violation surface (the reference's errors() API) -------------------
    def q_violations_page(spark, sf_dir):
        # the reference's second public API (errors(), schema.js:665-674)
        # as exploded violation rows with the exact message template
        from jema_js_spark.validation.engine import violation_rows

        return violation_rows(
            _docs(spark, sf_dir),
            {"properties": {"n_chars": {"minimum": 150}},
             "required": ["lang"]},
            id_cols=["doc_id"])

    # -- dataset-level checks (x_* keywords) -------------------------------
    def q_unique_url(spark, sf_dir):
        pages = pages_from_documents(spark, sf_dir)
        return duplicate_keys(pages, "url").select("url", "n_rows")

    def q_fk_orders_customer(spark, sf_dir):
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
        dim = customer.filter(F.col("c_custkey") <= 100)
        return fk_violations(orders, "o_custkey", dim, "c_custkey") \
            .select("o_orderkey")

    def q_ts_window(spark, sf_dir):
        pages = pages_from_documents(spark, sf_dir).select(
            "doc_id", F.timestamp_seconds("warc_epoch_noisy").alias("warc_ts"))
        return ts_window_violations(
            pages, "warc_ts", crawl_manifest(spark), "window").select("doc_id")

    def q_stats_profile(spark, sf_dir):
        stats = column_stats(_docs(spark, sf_dir), ["text", "lang", "n_chars"])
        return stats.select(
            "n_rows", "text_nulls", "lang_nulls",
            F.col("n_chars_min").alias("min_chars"),
            F.col("n_chars_max").alias("max_chars"))

    def q_drift_lang_share(spark, sf_dir):
        counts = _docs(spark, sf_dir).groupBy("source", "lang").count()
        totals = counts.groupBy("source").agg(F.sum("count").alias("tot"))
        return (counts.join(totals, "source")
                .select("source", "lang",
                        F.round(F.col("count") / F.col("tot"), 6).alias("share")))

    # -- dynamic JSON (events.props): kernel plane + the round-5 JSON
    # columnar route side-by-side.  Both columns must agree with the
    # DuckDB twin; the route's kernel-parity on hostile shapes is
    # separately pinned in tests/test_json_plane.py.
    def q_json_props_kernel(spark, sf_dir):
        from jema_js_spark.validation.json_plane import (
            analyze_json_contract, with_valid_json)

        schema = {"type": "object", "required": ["k"],
                  "properties": {"k": {"type": "integer", "minimum": 0,
                                        "maximum": 80}}}
        # the same verdict expressed through DYNAMIC-key keywords
        # (round 6): routes via map<string,long> extraction — every key
        # is one lowercase letter and every value is bounded, so the
        # DuckDB twin is the same range check
        map_schema = {"type": "object", "required": ["k"],
                      "propertyNames": {"pattern": "^[a-z]$"},
                      "additionalProperties": {"type": "integer",
                                               "minimum": 0, "maximum": 80}}
        assert analyze_json_contract(map_schema).map_value == \
            ("integer", None)
        # round 7: a NESTED document (object-in-object) synthesized from
        # the event columns, validated through the recursive struct
        # route — `meta` must analyze as a nested object node and the
        # enum-typed `etype` exercises the heuristic slot inference.
        # The DuckDB twin states the same verdict over the raw columns.
        nested_schema = {
            "type": "object", "required": ["id", "meta"],
            "properties": {
                "id": {"type": "integer", "minimum": 0},
                "meta": {
                    "type": "object", "required": ["etype", "v"],
                    "properties": {
                        "etype": {"enum": ["click", "view",
                                           "purchase", "signup"]},
                        "v": {"type": "number", "minimum": 0.5,
                              "maximum": 150}}}}}
        nplan = analyze_json_contract(nested_schema)
        assert nplan.routable and nplan.fields["meta"][0] == "object", \
            nplan.reasons
        # round 7: a ROOT-VALUE document — the JSON column holds a bare
        # array, not an object ("[12.5]"); from_json cannot parse a
        # non-object root, so the route wraps it as {"v": <doc>} and
        # validates the single extracted slot (json_plane.py root mode).
        # The DuckDB twin restates the verdict over the raw column.
        root_schema = {"type": "array", "minItems": 1, "maxItems": 4,
                       "items": {"type": "number", "minimum": 0.5,
                                 "maximum": 150}}
        rplan = analyze_json_contract(root_schema)
        assert rplan.routable and rplan.root == ("array", "number"), \
            rplan.reasons
        # round 7 session 4: a KEYS-ONLY contract — no properties, no
        # typed values; the constraints read the KEY SET alone, so the
        # route extracts map<string, variant> (values opaque, never
        # touched by a Plane-A predicate).  The doc's single key IS the
        # event type, so the dependentRequired clause fails exactly the
        # 'error' events and the DuckDB twin restates that directly.
        keys_schema = {"minProperties": 1,
                       "propertyNames": {"pattern": "^[a-z]+$"},
                       "dependentRequired": {"error": ["recovery"]}}
        kplan = analyze_json_contract(keys_schema)
        assert kplan.routable and kplan.map_value == ("variant", None), \
            kplan.reasons
        # round 7 session 5: a UNION-TYPED slot ({"type": ["integer",
        # "string"]}) stores the value as an opaque VARIANT and the
        # compiler judges it by schema_of_variant tags — pure Plane A,
        # every member routed (a typed slot would route only the first
        # member's documents).  Docs cycle through integer / string /
        # fraction / boolean / missing by event_id % 5; the DuckDB twin
        # restates the verdict over that residue directly.
        union_schema = {"type": "object", "required": ["uid"],
                        "properties": {"uid": {"type": ["integer",
                                               "string"]}}}
        uplan = analyze_json_contract(union_schema)
        assert uplan.routable and uplan.fields == \
            {"uid": ("variant", None)}, uplan.reasons
        # ... and MIXED-TYPE patternProperties — dynamic-key value
        # schemas that disagree on a routing node but are all
        # tag-affine — route as map<string, variant> with per-entry
        # tag predicates inside the map lambdas.
        mixed_schema = {"type": "object", "minProperties": 1,
                        "patternProperties": {"^x-": {"type": "string"},
                                              "id$": {"type": "integer"}}}
        mplan = analyze_json_contract(mixed_schema)
        assert mplan.routable and mplan.map_value == ("variant", None), \
            mplan.reasons
        udf = kernel_validate_udf(schema)
        ev = _events(spark, sf_dir).withColumn(
            "nested_doc", F.to_json(F.struct(
                F.col("event_id").alias("id"),
                F.struct(F.col("event_type").alias("etype"),
                         F.col("value").alias("v")).alias("meta")))) \
            .withColumn("root_doc", F.to_json(F.array(F.col("value")))) \
            .withColumn("keys_doc", F.to_json(
                F.create_map(F.col("event_type"), F.col("value")))) \
            .withColumn("union_doc", F.concat(
                F.lit('{"uid":'),
                F.when(F.col("event_id") % 5 == 0,
                       F.col("event_id").cast("string"))
                 .when(F.col("event_id") % 5 == 1,
                       F.concat(F.lit('"e'), F.col("event_id").cast("string"),
                                F.lit('"')))
                 .when(F.col("event_id") % 5 == 2,
                       F.concat(F.col("event_id").cast("string"),
                                F.lit(".5")))
                 .otherwise(F.lit("true")),
                F.when(F.col("event_id") % 5 == 4,
                       F.lit(',"extra":1')).otherwise(F.lit("")),
                F.lit("}"))) \
            .withColumn("mixed_doc", F.concat(
                F.when(F.col("event_id") % 4 == 0,
                       F.concat(F.lit('{"x-a":"v'),
                                F.col("event_id").cast("string"),
                                F.lit('"}')))
                 .when(F.col("event_id") % 4 == 1,
                       F.concat(F.lit('{"myid":'),
                                F.col("event_id").cast("string"),
                                F.lit("}")))
                 .when(F.col("event_id") % 4 == 2,
                       F.concat(F.lit('{"x-a":'),
                                F.col("event_id").cast("string"),
                                F.lit("}")))
                 .otherwise(F.lit('{"myid":"s"}'))))
        # plan_shape="masked" FORCES the route (round 8): these columns
        # are the routed plane's oracle surface, so no present or
        # future auto cost-model policy (expected_docs hints,
        # recalibrated cutoffs) may ever divert them to the kernel.
        # masked, not union: each union shape references its whole
        # input plan twice, so stacking seven would re-reference the
        # base subtree 2^7 times (the exponential stacked-union hazard
        # the full-corpus route test documents); masked stacks
        # linearly.  Verdicts are plane-independent (differentially
        # pinned), so the oracle twins are unchanged.
        routed = with_valid_json(ev, "props", schema,
                                 col_name="valid_columnar",
                                 plan_shape="masked")
        routed = with_valid_json(routed, "props", map_schema,
                                 col_name="valid_map", plan_shape="masked")
        routed = with_valid_json(routed, "nested_doc", nested_schema,
                                 col_name="valid_nested",
                                 plan_shape="masked")
        routed = with_valid_json(routed, "root_doc", root_schema,
                                 col_name="valid_root", plan_shape="masked")
        routed = with_valid_json(routed, "keys_doc", keys_schema,
                                 col_name="valid_keys", plan_shape="masked")
        routed = with_valid_json(routed, "union_doc", union_schema,
                                 col_name="valid_union", plan_shape="masked")
        routed = with_valid_json(routed, "mixed_doc", mixed_schema,
                                 col_name="valid_mixed", plan_shape="masked")
        return routed.select("event_id", udf(F.col("props")).alias("valid"),
                             "valid_columnar", "valid_map", "valid_nested",
                             "valid_root", "valid_keys", "valid_union",
                             "valid_mixed")

    def q_windowed_verdicts(spark, sf_dir):
        # the batch analog of the streaming windowed-verdict surface:
        # hourly event-time buckets of contract verdicts
        schema = {"required": ["event_type", "props"],
                  "properties": {"value": {"type": "number", "minimum": 0.5},
                                  "event_type": {"enum": [
                                      "click", "view", "purchase", "signup",
                                      "error"]}}}
        ev = with_valid(_events(spark, sf_dir), schema)
        bucket = (F.unix_timestamp("ts") / 3600).cast("long")
        return (ev.groupBy(bucket.alias("hour_bucket"))
                .agg(F.count(F.lit(1)).alias("n_rows"),
                     F.sum(F.col("valid").cast("long")).alias("n_valid")))

    # -- text analysis (token counting + language-ID + quality, one pass) --
    def q_text_features(spark, sf_dir):
        return _docs(spark, sf_dir).select(
            "doc_id",
            token_count(F.col("text")).cast("long").alias("n_tokens"),
            lang_id_expr(F.col("text")).alias("lang_pred"),
            F.round(quality_score(F.col("text")), 6).alias("quality"))

    # -- dedup --------------------------------------------------------------
    def q_exact_dedup_count(spark, sf_dir):
        docs = _docs(spark, sf_dir)
        doubled = docs.union(docs.filter(F.col("doc_id") % 5 == 0))
        return spark.createDataFrame(
            [(doubled.count(), exact_dedup(doubled, "doc_id").count())],
            "n_docs bigint, n_unique bigint")

    def q_near_dup_recall(spark, sf_dir):
        # planted-truth recall for ALL THREE near-dup families,
        # DuckDB-oracled: every planted (id, id+10^6) pair must be
        # found.  Bucket caps are set above the corpus sizes so they
        # can never evict a plant (plants have the LARGEST ids and a
        # binding cap would drop them first — review finding, round 3).
        # - minhash: " tail" appended (true near-dup, est_jaccard ≈0.9
        #   even at the shortest sf texts, far above the 0.5 threshold;
        #   recall verified exactly 200/200 on the sf0.001 AND sf0.01
        #   tables — deterministic hash family, static data)
        # - simhash: identical-text plant → hamming 0 shares every
        #   block, so with the cap unable to bind, block-pigeonhole
        #   bucketing finds it PROVABLY; near-dup (perturbed) recall
        #   stays covered by tests/test_operators_spark.py's planted
        #   test
        # - embedding: identical-vector plant → identical (deterministic)
        #   centroid assignment → same IVF bucket, cosine exactly 1 ≥
        #   threshold → found PROVABLY
        docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 200) \
            .select("doc_id", "text")
        near_mh = docs.select((F.col("doc_id") + 10**6).alias("doc_id"),
                              F.concat("text", F.lit(" tail")).alias("text"))
        mh = minhash_candidates(docs.union(near_mh), "doc_id", "text",
                                jaccard_threshold=0.5, max_bucket=500) \
            .filter(F.col("id_b") - F.col("id_a") == 10**6) \
            .select(F.lit("minhash").alias("method"), "id_a", "id_b")
        near_sh = docs.select((F.col("doc_id") + 10**6).alias("doc_id"),
                              "text")
        sh = simhash_candidates(docs.union(near_sh), "doc_id", "text",
                                max_bucket=500) \
            .filter(F.col("id_b") - F.col("id_a") == 10**6) \
            .select(F.lit("simhash").alias("method"), "id_a", "id_b")
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        planted = emb.filter(F.col("vec_id") < 5).select(
            (F.col("vec_id") + 10**6).alias("vec_id"), "embedding", "label")
        corpus = emb.union(planted)
        cents = fit_centroids(corpus, nlist=4)
        # cap derived from the data (ADVICE r3): a fixed cap that a
        # larger SF's bucket could exceed would row_number-evict the
        # LARGEST ids — the plants — first; corpus.count()+1 can never
        # bind, at any SF
        nd = embedding_near_dups(corpus, cents, threshold=0.999,
                                 max_bucket=corpus.count() + 1) \
            .filter(F.col("id_b") - F.col("id_a") == 10**6) \
            .select(F.lit("embedding").alias("method"), "id_a", "id_b")
        return mh.unionAll(sh).unionAll(nd)

    def q_verified_pairs(spark, sf_dir):
        # the scale-safe candidate-verification path: equi-join the pair
        # list back to the texts, score with exact n-gram Jaccard —
        # deterministic consecutive-id pairs here so DuckDB can twin it
        from jema_js_spark.operators.dedup import verify_pairs

        docs = _docs(spark, sf_dir).filter(F.col("doc_id") <= 20) \
            .select("doc_id", "text")
        pairs = docs.select(F.col("doc_id").alias("id_a"),
                            (F.col("doc_id") + 1).alias("id_b")) \
            .filter(F.col("id_b") <= 20)
        return verify_pairs(docs, pairs, "doc_id").select(
            "id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))

    def q_token_jaccard(spark, sf_dir):
        from jema_js_spark.operators.text import word_tokens

        docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 30).select(
            "doc_id", F.array_distinct(word_tokens(F.col("text"))).alias("toks"))
        a = docs.select(F.col("doc_id").alias("id_a"), F.col("toks").alias("ta"))
        b = docs.select(F.col("doc_id").alias("id_b"), F.col("toks").alias("tb"))
        inter = F.size(F.array_intersect("ta", "tb"))
        union = F.size(F.array_union("ta", "tb"))
        return (a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b",
                        F.round(inter / union, 6).alias("jaccard")))

    # -- similarity ---------------------------------------------------------
    def q_cosine_topk(spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        queries_df = emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding")
        return brute_force_topk(emb, queries_df, k=5).select(
            "query_id", "vec_id", "rank")

    def q_ivf_topk(spark, sf_dir):
        # IVF ANN top-k in the EXHAUSTIVE-PROBE configuration (nprobe =
        # nlist): every corpus vector sits in exactly one bucket and the
        # query probes all of them, so the result provably equals
        # brute-force top-k and the DuckDB twin is exact (VERDICT r3
        # task #1).  The full plan machinery — centroid fit, assign,
        # bucket equi-join, two-phase window — still executes; the
        # approximate-recall behavior (nprobe < nlist) stays pinned by
        # tests/test_operators_spark.py::test_ivf_topk_recall.
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        cents = fit_centroids(emb, nlist=8)
        queries_df = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"), "embedding")
        return ivf_topk(ivf_assign(emb, cents), queries_df, cents,
                        k=5, nprobe=8).select("query_id", "vec_id", "rank")

    def q_ks_drift(spark, sf_dir):
        # exact-histogram KS (VERDICT r3 task #2): n_chars is a
        # bounded-cardinality column, the regime ks_exact exists for —
        # the statistic is sketch-free and DuckDB-expressible exactly;
        # the sketch path (ks_two_sample) stays pinned in pytest
        docs = _docs(spark, sf_dir)
        a = docs.filter(F.col("lang") == "en")
        b = docs.filter(F.col("lang") != "en")
        return ks_exact(a, b, "n_chars")

    # -- multimodal ----------------------------------------------------------
    def q_media_features(spark, sf_dir):
        # synthesize REAL PNG headers (signature + IHDR) so the header
        # parser runs against genuine container bytes, end to end:
        # expression-built bytes → attach_media_metadata byte-slicing →
        # mapInPandas decode — dims verifiable against a DuckDB twin
        from jema_js_spark.operators.multimodal import (
            attach_media_metadata, decode_image_features)

        docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 50)

        def be32(col):
            return F.unhex(F.lpad(F.hex(col), 8, "0"))

        png = F.concat(
            F.unhex(F.lit("89504E470D0A1A0A")),           # signature
            F.unhex(F.lit("0000000D49484452")),           # len(13) + IHDR
            be32(F.pmod(F.col("doc_id"), F.lit(240)) + 16),   # width
            be32(F.pmod(F.col("n_chars"), F.lit(200)) + 16),  # height
            F.unhex(F.lit("0802000000")),                 # depth8, RGB
            F.encode("text", "UTF-8"))                    # opaque tail
        media = attach_media_metadata(
            docs.select(F.col("doc_id").alias("media_id"), png.alias("payload")))
        return decode_image_features(media).select(
            "media_id", "width", "height")

    def q_media_pixels(spark, sf_dir):
        # REAL pixel decode end to end for ALL THREE codec-free formats:
        # - BMP: Catalyst-synthesized 24-bit payloads (valid headers +
        #   padded BGR rows) → built-in numpy decoder
        # - PNG: driver-built real PNGs (stdlib zlib IDAT, one of the
        #   five scanline filters per row) → built-in inflate+unfilter
        # - GIF: driver-built real GIF89a (palette + LZW stream) →
        #   built-in pure-python LZW decoder
        # Solid colors keep the expected channel means exact, so DuckDB
        # can twin the output without any decoder.
        import numpy as np

        from jema_js_spark.operators.multimodal import (
            attach_media_metadata, decode_image_features, gif_bytes,
            jpeg_bytes, jpeg_progressive_bytes, png_bytes, synthesize_bmp)

        docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 60)
        bmp = synthesize_bmp(
            F.pmod(F.col("doc_id"), F.lit(5)) + 1, F.lit(2),
            F.pmod(F.col("doc_id") * 13, F.lit(256)),
            F.pmod(F.col("doc_id") * 7, F.lit(256)),
            F.pmod(F.col("doc_id"), F.lit(256)))
        bmp_rows = docs.select(F.col("doc_id").alias("media_id"),
                               bmp.alias("payload"))
        png_rows = []
        for i in range(40):
            w, h = i % 4 + 1, 3
            color = [(i * 11) % 256, (i * 5) % 256, (i * 3) % 256]
            arr = np.full((h, w, 3), color, dtype=np.uint8)
            png_rows.append((1000 + i,
                             bytearray(png_bytes(arr, [i % 5] * h))))
        png_df = spark.createDataFrame(png_rows,
                                       "media_id long, payload binary")
        gif_rows = []
        for i in range(30):
            w, h = i % 3 + 1, 2
            color = [(i * 17) % 256, (i * 9) % 256, (i * 2) % 256]
            arr = np.full((h, w, 3), color, dtype=np.uint8)
            gif_rows.append((2000 + i, bytearray(gif_bytes(arr))))
        gif_df = spark.createDataFrame(gif_rows,
                                       "media_id long, payload binary")
        # JPEG (round 5): REAL baseline JFIF through the from-scratch
        # Huffman+dequant+IDCT decoder.  Solid YCbCr plants with EVEN
        # channel values make every DC-only block exact under the flat
        # q=16 tables, and the decoder's floor(x+0.5) YCbCr→RGB formula
        # is IEEE-reproducible in SQL — so the oracle needs no codec.
        jpeg_rows = []
        for i in range(30):
            w, h = i % 5 + 2, 2
            y, cb, cr = (i * 14) % 256, (i * 6 + 2) % 256, (i * 22) % 256
            arr = np.full((h, w, 3), [y, cb, cr], dtype=np.uint8)
            jpeg_rows.append((3000 + i, bytearray(jpeg_bytes(arr, ycbcr=True))))
        jpeg_df = spark.createDataFrame(jpeg_rows,
                                        "media_id long, payload binary")
        # progressive JPEG (round 6): REAL SOF2 scans — DC
        # first/refine, per-component AC spectral selection with EOB
        # runs, successive approximation on odd plants — through the
        # same decoder; solid even-valued YCbCr keeps DC-only
        # exactness, so the SAME closed-form oracle applies
        prog_rows = []
        for i in range(24):
            w, h = i % 4 + 2, 2
            y, cb, cr = (i * 12 + 4) % 256, (i * 8) % 256, (i * 18 + 6) % 256
            arr = np.full((h, w, 3), [y, cb, cr], dtype=np.uint8)
            prog_rows.append((4000 + i, bytearray(jpeg_progressive_bytes(
                arr, ycbcr=True, successive=bool(i % 2)))))
        prog_df = spark.createDataFrame(prog_rows,
                                        "media_id long, payload binary")
        media = attach_media_metadata(
            bmp_rows.unionAll(png_df).unionAll(gif_df).unionAll(jpeg_df)
            .unionAll(prog_df))
        fmt = F.when(F.col("media_id") >= 4000, F.lit("jpeg_prog")) \
            .when(F.col("media_id") >= 3000, F.lit("jpeg")) \
            .when(F.col("media_id") >= 2000, F.lit("gif")) \
            .when(F.col("media_id") >= 1000, F.lit("png")) \
            .otherwise(F.lit("bmp"))
        return decode_image_features(media).select(
            "media_id", fmt.alias("fmt"), "width", "height",
            "mean_r", "mean_g", "mean_b")

    def q_audio_features(spark, sf_dir):
        # REAL audio decode end to end: Catalyst-synthesized 16-bit PCM
        # WAV square waves (valid RIFF headers + sample data) → stdlib
        # chunk-walk decoder → rms/peak/mean/duration features.  The
        # planted waveform's features are closed-form ((v1²+v2²)/2 etc.
        # over exact int16 samples — float64 math is bit-exact), so
        # DuckDB twins the output without any decoder.
        from jema_js_spark.operators.multimodal import (
            decode_audio_features, synthesize_wav)

        # n_chars IS NOT NULL on both sides: a NULL would make the two
        # sides diverge (Spark: NULL payload -> decode_error row;
        # DuckDB: greatest() ignores NULL) — review finding, round 4
        docs = _docs(spark, sf_dir).filter(
            (F.col("doc_id") < 60) & F.col("n_chars").isNotNull())
        wav = synthesize_wav(
            n_pairs=F.pmod(F.col("doc_id"), F.lit(50)) + 10,
            sample_rate=F.lit(8000) + F.pmod(F.col("doc_id"), F.lit(5)) * 2000,
            v1=F.pmod(F.col("doc_id") * 523, F.lit(30000)) - 15000,
            v2=F.pmod(F.col("n_chars") * 37, F.lit(20000)) - 10000)
        rows = docs.select(F.col("doc_id").alias("media_id"),
                           wav.alias("payload"))
        # round-5 columns: zcr (square wave: exactly 1 when the two
        # levels straddle zero, else 0) and dominant_hz (alternating
        # square → exactly Nyquist rate/2; equal levels → flat
        # spectrum → 0.0) — both closed-form over the planted params
        return decode_audio_features(rows).select(
            "media_id", "sample_rate", "n_samples",
            F.round("duration_ms", 6).alias("duration_ms"),
            "peak", F.round("rms", 6).alias("rms"),
            F.round("mean_amp", 6).alias("mean_amp"),
            F.round("zcr", 6).alias("zcr"),
            F.round("dominant_hz", 6).alias("dominant_hz"))

    def q_video_frames(spark, sf_dir):
        # REAL video-frame decode end to end: driver-built multi-frame
        # animated GIFs (shared palette, per-frame graphic-control
        # blocks, valid LZW streams) → multi-frame LZW walk decoding
        # every 2nd frame's pixels (sampling exercised: odd frames'
        # LZW is skipped but still counted in n_frames).  Solid
        # per-frame colors keep the expected channel means exact.
        import numpy as np

        from jema_js_spark.operators.multimodal import (
            decode_video_frames, gif_bytes)

        rows = []
        for i in range(25):
            n = i % 4 + 1
            w, h = i % 3 + 1, 2
            frames = np.stack([
                np.full((h, w, 3),
                        [(i * 7 + f * 31) % 256, (i * 3 + f * 17) % 256,
                         (i * 11 + f * 5) % 256], dtype=np.uint8)
                for f in range(n)])
            rows.append((3000 + i, bytearray(gif_bytes(frames, delay_cs=5))))
        vids = spark.createDataFrame(rows, "media_id long, payload binary")
        return decode_video_frames(vids, every_n=2).select(
            "media_id", "frame_idx", "n_frames", "width", "height",
            "mean_r", "mean_g", "mean_b")

    # numeric bounds + multipleOf (JS float semantics), one query,
    # two valid columns
    def q_kw_bounds(spark, sf_dir):
        d = with_valid(_docs(spark, sf_dir),
                       {"properties": {"n_chars": {"minimum": 100,
                                                   "exclusiveMaximum": 400},
                                       "doc_id": {"exclusiveMinimum": 5}}},
                       col_name="valid_bounds")
        d = with_valid(d, {"properties": {"n_chars": {"multipleOf": 7}}},
                       col_name="valid_mult")
        return d.select("doc_id", "valid_bounds", "valid_mult")

    # engine-portable deterministic sampling (method="md5"): the DuckDB
    # twin recomputes the IDENTICAL draw (md5 is md5 everywhere; 52
    # hash bits keep the unit-interval division exact in both engines),
    # auditing exact sample membership and split assignment — the
    # reproducibility property the operator exists for.  Split weights
    # are binary-exact (0.75/0.125) so the cumulative thresholds are
    # the same doubles on both sides.
    def q_sample_split(spark, sf_dir):
        from jema_js_spark.operators.sampling import hash_sample, hash_split

        docs = _docs(spark, sf_dir).select("doc_id")
        split = hash_split(docs, ["doc_id"],
                           {"train": 0.75, "val": 0.125, "test": 0.125},
                           seed=3, method="md5")
        sampled = hash_sample(docs, ["doc_id"], 0.25, seed=7, method="md5") \
            .select("doc_id", F.lit(True).alias("sampled"))
        return (split.join(sampled, "doc_id", "left")
                .select("doc_id", "split",
                        F.coalesce("sampled", F.lit(False)).alias("sampled")))

    # minLength/maxLength + pattern over text, one query, two columns
    def q_kw_length(spark, sf_dir):
        d = with_valid(_docs(spark, sf_dir),
                       {"properties": {"text": {"minLength": 100,
                                                "maxLength": 400}}},
                       col_name="valid_len")
        d = with_valid(d, {"properties": {"text": {"pattern": "^[a-z]"}}},
                       col_name="valid_pattern")
        # round 7: \p{...} Unicode property escape (general categories)
        # — runs the Python-owned single-column regex path; DuckDB's
        # RE2 evaluates the same property class natively
        d = with_valid(d, {"properties": {"text": {"pattern": r"\p{Nd}"}}},
                       col_name="valid_prop")
        return d.select("doc_id", "valid_len", "valid_pattern",
                        "valid_prop")

    def q_mined_contract(spark, sf_dir):
        # contract mining (schema/inference.py): profile documents into
        # a draft 2020-12 contract, emit its per-column facts.  DuckDB
        # twins the same profiling facts with exact SQL aggregates (the
        # HLL enum gate is exact at these cardinalities), so the mined
        # shape itself is oracle-checked; the closed-over-data property
        # is pinned in tests/test_inference.py.
        from jema_js_spark.schema.inference import propose_contract

        contract = propose_contract(
            _docs(spark, sf_dir), cols=["doc_id", "text", "lang",
                                        "source", "n_chars"])
        rows = []
        for col, sub in sorted(contract["properties"].items()):
            if "enum" in sub:
                kind, lo, hi, n_enum = "enum", None, None, len(sub["enum"])
            elif sub.get("type") == "string":
                kind = "string"
                lo, hi = sub.get("minLength"), sub.get("maxLength")
                n_enum = None
            else:
                kind = sub.get("type")
                lo, hi = sub.get("minimum"), sub.get("maximum")
                n_enum = None
            rows.append((col, col in contract["required"], kind,
                         lo, hi, n_enum))
        return spark.createDataFrame(
            rows, "column string, required boolean, kind string, "
                  "lo bigint, hi bigint, n_enum int")

    # type: number assertion + union type, one query, two valid columns
    def q_kw_type(spark, sf_dir):
        d = with_valid(_docs(spark, sf_dir),
                       {"properties": {"n_chars": {"type": "number"}},
                        "required": ["n_chars"]}, col_name="valid_number")
        d = with_valid(d, {"properties": {"n_chars":
                                          {"type": ["string", "null"]}}},
                       col_name="valid_union")
        return d.select("doc_id", "valid_number", "valid_union")

    # -- validation keywords (SURVEY.md §2.2-2.7) ---------------------------
    keyword_schemas = {
        "kw_enum_const": {"properties": {"lang": {"enum": LANGS},
                                          "source": {"const": "src1"}},
                           "required": ["lang", "source"]},
        "kw_allof": {"allOf": [{"properties": {"n_chars": {"minimum": 100}}},
                                {"properties": {"n_chars": {"maximum": 400}}}]},
        "kw_anyof": {"anyOf": [
            {"properties": {"lang": {"const": "en"}}, "required": ["lang"]},
            {"properties": {"n_chars": {"exclusiveMaximum": 100}},
             "required": ["n_chars"]}]},
        "kw_oneof": {"oneOf": [
            {"properties": {"lang": {"const": "en"}}, "required": ["lang"]},
            {"properties": {"n_chars": {"exclusiveMaximum": 100}},
             "required": ["n_chars"]}]},
        "kw_not": {"not": {"properties": {"lang": {"const": "zh"}},
                            "required": ["lang"]}},
        "kw_ifthenelse": {
            "if": {"properties": {"lang": {"const": "en"}}, "required": ["lang"]},
            "then": {"properties": {"n_chars": {"minimum": 100}}},
            "else": {"properties": {"n_chars": {"minimum": 60}}}},
        "kw_ref": {"$defs": {"sized": {"minimum": 100, "maximum": 400}},
                    "properties": {"n_chars": {"$ref": "#/$defs/sized"}}},
        "kw_dependent_required": {"dependentRequired": {"lang": ["source"]}},
    }

    # array keywords over the token array
    def q_kw_items(spark, sf_dir):
        toks = _doc_tokens(spark, sf_dir)
        return with_valid(toks, {
            "properties": {"toks": {"items": {"minLength": 2},
                                     "minItems": 10, "maxItems": 100}}
        }).select("doc_id", "valid")

    def q_kw_uniqueitems(spark, sf_dir):
        toks = _doc_tokens(spark, sf_dir)
        return with_valid(toks, {
            "properties": {"toks": {"uniqueItems": True}}
        }).select("doc_id", "valid")

    def q_kw_contains(spark, sf_dir):
        toks = _doc_tokens(spark, sf_dir)
        return with_valid(toks, {
            "properties": {"toks": {"contains": {"const": "spark"},
                                     "minContains": 2}}
        }).select("doc_id", "valid")

    def q_kw_prefixitems(spark, sf_dir):
        toks = _doc_tokens(spark, sf_dir)
        return with_valid(toks, {
            "properties": {"toks": {"prefixItems": [
                {"minLength": 3}, {"pattern": "^[a-z]"}]}}
        }).select("doc_id", "valid")

    def q_kw_maxcontains(spark, sf_dir):
        toks = _doc_tokens(spark, sf_dir)
        return with_valid(toks, {
            "properties": {"toks": {"contains": {"pattern": "^th"},
                                     "minContains": 1, "maxContains": 5}}
        }).select("doc_id", "valid")

    def q_kw_unevaluateditems(spark, sf_dir):
        toks = _doc_tokens(spark, sf_dir)
        return with_valid(toks, {
            "properties": {"toks": {"prefixItems": [True, True],
                                     "unevaluatedItems": {"maxLength": 8}}}
        }).select("doc_id", "valid")

    # keywords needing absent keys: derive deterministically-nullable
    # columns (the relational bridge maps NULL to "key absent")
    def _masked_docs(spark, sf_dir):
        d = _docs(spark, sf_dir)
        return d.select(
            "doc_id",
            F.when(F.col("doc_id") % 3 != 0, F.col("lang")).alias("lang"),
            F.when(F.col("doc_id") % 5 != 0, F.col("source")).alias("source"),
            "n_chars")

    def q_kw_minmaxproperties(spark, sf_dir):
        return with_valid(
            _masked_docs(spark, sf_dir),
            {"minProperties": 3, "maxProperties": 4},
        ).select("doc_id", "valid")

    def q_kw_dependentschemas(spark, sf_dir):
        return with_valid(_masked_docs(spark, sf_dir), {
            "dependentSchemas": {"source": {
                "properties": {"n_chars": {"minimum": 120}},
                "required": ["lang"]}}
        }).select("doc_id", "valid")

    def q_kw_dependencies(spark, sf_dir):
        return with_valid(_masked_docs(spark, sf_dir), {
            "dependencies": {
                "lang": ["source"],
                "n_chars": {"properties": {"n_chars": {"maximum": 400}}}}
        }).select("doc_id", "valid")

    def q_kw_unevaluatedprops(spark, sf_dir):
        # static claims from properties + allOf; lang stays unclaimed —
        # valid exactly when the lang key is absent (masked to NULL)
        return with_valid(_masked_docs(spark, sf_dir), {
            "properties": {"doc_id": True, "n_chars": True},
            "allOf": [{"properties": {"source": True}}],
            "unevaluatedProperties": False,
        }).select("doc_id", "valid")

    def q_kw_unevaluatedprops_if(spark, sf_dir):
        # conditional claim: n_chars is only evaluated on the then-branch
        return with_valid(_masked_docs(spark, sf_dir), {
            "properties": {"doc_id": True, "lang": True, "source": True},
            "if": {"properties": {"lang": {"const": "en"}},
                    "required": ["lang"]},
            "then": {"properties": {"n_chars": True}},
            "unevaluatedProperties": False,
        }).select("doc_id", "valid")

    def q_kw_format(spark, sf_dir):
        # format-assertion mode (opt-in, SURVEY §2.5), two formats in
        # one query: a dotted quad whose octets overflow for some rows,
        # and a calendar-exact date (incl. leap years and the
        # reference's month-00 quirk) hitting invalid months/days and
        # Feb-29 on both leap and non-leap years
        d = _docs(spark, sf_dir).select(
            "doc_id",
            F.concat_ws(".", F.pmod(F.col("doc_id"), F.lit(300)),
                        F.pmod(F.col("n_chars"), F.lit(300)),
                        F.lit(0), F.lit(1)).alias("ip"),
            F.concat_ws(
                "-",
                (F.lit(2000) + F.pmod(F.col("doc_id"), F.lit(30))).cast("string"),
                F.lpad(F.pmod(F.col("doc_id"), F.lit(15)).cast("string"), 2, "0"),
                F.lpad(F.pmod(F.col("n_chars"), F.lit(35)).cast("string"), 2, "0"),
            ).alias("day"))
        d = with_valid(d, {"properties": {"ip": {"format": "ipv4"}}},
                       col_name="valid_ip", format_assertion=True)
        d = with_valid(d, {"properties": {"day": {"format": "date"}}},
                       col_name="valid_date", format_assertion=True)
        return d.select("doc_id", "valid_ip", "valid_date")

    def q_kw_dynamicref(spark, sf_dir):
        return _doc_valid({
            "$defs": {"num": {"$dynamicAnchor": "bound", "minimum": 100}},
            "properties": {"n_chars": {"$dynamicRef": "#bound"}},
        })(spark, sf_dir)

    # final dict: EXACTLY 50 entries in driver-run order — the six
    # queries the round-2 driver never reached lead the list
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        # formerly driver-untested six
        "violations_page": q_violations_page,
        "kw_propertynames": _doc_valid({"propertyNames": {"maxLength": 6}}),
        "kw_additionalprops": _doc_valid({
            "properties": {"doc_id": True, "text": True, "lang": True},
            "additionalProperties": {"type": "string"}}),
        "kw_patternprops": _doc_valid({
            "patternProperties": {"^n_": {"minimum": 100}}}),
        "kw_boolean_schema": _doc_valid({"properties": {"text": False}}),
        "kw_type": q_kw_type,
        # dataset-level operators
        "unique_url": q_unique_url,
        "fk_orders_customer": q_fk_orders_customer,
        "ts_window": q_ts_window,
        "stats_profile": q_stats_profile,
        "drift_lang_share": q_drift_lang_share,
        "json_props_kernel": q_json_props_kernel,
        "windowed_verdicts": q_windowed_verdicts,
        "text_features": q_text_features,
        "exact_dedup_count": q_exact_dedup_count,
        "near_dup_recall": q_near_dup_recall,
        "verified_pairs": q_verified_pairs,
        "token_jaccard": q_token_jaccard,
        "cosine_topk": q_cosine_topk,
        "ivf_topk": q_ivf_topk,
        "ks_drift": q_ks_drift,
        "media_features": q_media_features,
        "media_pixels": q_media_pixels,
        "audio_features": q_audio_features,
        "video_frames": q_video_frames,
        "sample_split": q_sample_split,
        "kw_bounds": q_kw_bounds,
        "kw_length": q_kw_length,
        "mined_contract": q_mined_contract,
    }
    for name, schema in keyword_schemas.items():
        out[name] = _doc_valid(schema)
    out.update({
        "kw_items": q_kw_items,
        "kw_uniqueitems": q_kw_uniqueitems,
        "kw_contains": q_kw_contains,
        "kw_prefixitems": q_kw_prefixitems,
        "kw_maxcontains": q_kw_maxcontains,
        "kw_unevaluateditems": q_kw_unevaluateditems,
        "kw_minmaxproperties": q_kw_minmaxproperties,
        "kw_dependentschemas": q_kw_dependentschemas,
        "kw_dependencies": q_kw_dependencies,
        "kw_unevaluatedprops": q_kw_unevaluatedprops,
        "kw_unevaluatedprops_if": q_kw_unevaluatedprops_if,
        "kw_format": q_kw_format,
        "kw_dynamicref": q_kw_dynamicref,
    })
    assert len(out) == 50, f"driver cap is 50 queries, got {len(out)}"
    return out


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect)
# ---------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    from jema_js_spark.operators.text import _LANG_MARKERS
    from jema_js_spark.sources.pages import (
        CRAWL_DAYS, CRAWL_START, PAGES_FROM_DOCUMENTS_SQL)

    pages_cte = f"WITH pages AS ({PAGES_FROM_DOCUMENTS_SQL})"
    day0 = CRAWL_START // 86400
    toks = (r"list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '')")
    # word_tokens twin: lowercase, split on whitespace, drop empties
    wtoks = (r"list_filter(string_split_regex(lower(text), '\s+'),"
             r" t -> t <> '')")

    def _duck_list(words: list[str]) -> str:
        return "[" + ",".join(f"'{w}'" for w in words) + "]"

    lang_names = list(_LANG_MARKERS.keys())
    lang_scores = ",".join(
        f"len(list_filter(toks, x -> list_contains("
        f"{_duck_list(_LANG_MARKERS[lg])}, x)))"
        for lg in lang_names)
    en_stop = _duck_list(_LANG_MARKERS["en"])

    sql = {
        "unique_url": f"""{pages_cte}
            SELECT url, count(*) AS n_rows FROM pages
            GROUP BY url HAVING count(*) > 1""",
        "fk_orders_customer": """
            SELECT o_orderkey FROM orders o WHERE NOT EXISTS (
              SELECT 1 FROM customer c
              WHERE c.c_custkey = o.o_custkey AND c.c_custkey <= 100)""",
        "ts_window": f"""{pages_cte}
            SELECT doc_id FROM pages
            WHERE NOT (warc_epoch_noisy // 86400
                       BETWEEN {day0} AND {day0 + CRAWL_DAYS - 1})""",
        "stats_profile": """
            -- CAST: duckdb sum(BIGINT) yields HUGEINT; Spark's is BIGINT
            SELECT count(*) AS n_rows,
                   CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                     AS text_nulls,
                   CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                     AS lang_nulls,
                   min(n_chars) AS min_chars, max(n_chars) AS max_chars
            FROM documents""",
        "drift_lang_share": """
            SELECT source, lang,
                   round(count(*)::DOUBLE /
                         sum(count(*)) OVER (PARTITION BY source), 6) AS share
            FROM documents GROUP BY source, lang""",
        "json_props_kernel": """
            SELECT event_id,
                   coalesce(try_cast(json_extract_string(props, '$.k') AS BIGINT)
                            BETWEEN 0 AND 80, FALSE) AS valid,
                   coalesce(try_cast(json_extract_string(props, '$.k') AS BIGINT)
                            BETWEEN 0 AND 80, FALSE) AS valid_columnar,
                   coalesce(try_cast(json_extract_string(props, '$.k') AS BIGINT)
                            BETWEEN 0 AND 80, FALSE) AS valid_map,
                   -- the nested doc is to_json(struct(id, meta(etype, v)))
                   -- built from these very columns, so the contract's
                   -- verdict restates directly over them
                   coalesce(event_id >= 0
                            AND event_type IN ('click', 'view',
                                               'purchase', 'signup')
                            AND value BETWEEN 0.5 AND 150,
                            FALSE) AS valid_nested,
                   -- the root doc is to_json(array(value)): a bare
                   -- JSON array, validated through the wrapped
                   -- root-value route; same bounds restated
                   coalesce(value BETWEEN 0.5 AND 150,
                            FALSE) AS valid_root,
                   -- the keys doc is to_json(map(event_type -> value)):
                   -- a keys-only contract (dependentRequired on the
                   -- 'error' key, lowercase propertyNames) routed as
                   -- map<string, variant> — verdict restated directly
                   coalesce(event_type <> 'error', FALSE) AS valid_keys,
                   -- the union doc cycles integer / string / fraction /
                   -- boolean / boolean+extra by event_id % 5 against a
                   -- {"type": ["integer","string"]} VARIANT slot —
                   -- only the first two residues conform
                   (event_id % 5) IN (0, 1) AS valid_union,
                   -- the mixed doc cycles x-string / id-integer /
                   -- x-integer / id-string by event_id % 4 against
                   -- mixed-type patternProperties routed as
                   -- map<string, variant> tag predicates
                   (event_id % 4) IN (0, 1) AS valid_mixed
            FROM events""",
        "text_features": f"""
            WITH t AS (
              SELECT doc_id, text, {toks} AS rt, {wtoks} AS toks,
                     greatest(length(text), 1)::DOUBLE AS safe_chars,
                     greatest(len({wtoks}), 1)::DOUBLE AS safe_toks
              FROM documents),
            s AS (
              SELECT doc_id, rt, text, toks, safe_chars, safe_toks,
                     [{lang_scores}] AS scores
              FROM t),
            f AS (
              SELECT doc_id, rt, scores,
                     len(toks) AS n_toks_w,
                     length(text) / safe_toks AS mean_word_len,
                     length(regexp_replace(text, '[^[:punct:]]', '', 'g'))
                       / safe_chars AS punct_ratio,
                     length(regexp_replace(text, '[^0-9]', '', 'g'))
                       / safe_chars AS digit_ratio,
                     len(list_filter(toks, x -> list_contains({en_stop}, x)))
                       / safe_toks AS stopword_ratio
              FROM s)
            SELECT doc_id,
                   len(rt) AS n_tokens,
                   CASE WHEN list_max(scores) <= 0 THEN 'unknown'
                        ELSE ({_duck_list(lang_names)})[
                               list_position(scores, list_max(scores))]
                   END AS lang_pred,
                   round(least(greatest(
                     1.0
                     * (CASE WHEN n_toks_w < 5 THEN 0.1
                             WHEN n_toks_w > 100000 THEN 0.5 ELSE 1.0 END)
                     * (CASE WHEN mean_word_len < 2 OR mean_word_len > 15
                             THEN 0.3 ELSE 1.0 END)
                     * (CASE WHEN punct_ratio > 0.3 THEN 0.3 ELSE 1.0 END)
                     * (CASE WHEN digit_ratio > 0.3 THEN 0.4 ELSE 1.0 END)
                     * (CASE WHEN stopword_ratio < 0.01 THEN 0.5 ELSE 1.0 END),
                     0.0), 1.0), 6) AS quality
            FROM f""",
        "exact_dedup_count": r"""
            WITH doubled AS (
              SELECT * FROM documents
              UNION ALL SELECT * FROM documents WHERE doc_id % 5 = 0)
            SELECT count(*) AS n_docs,
                   count(DISTINCT regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
                     AS n_unique
            FROM doubled""",
        # planted-pair ground truth (VERDICT r2 #2): every plant must be
        # found.  minhash recall measured exactly 200/200 at sf0.001 and
        # sf0.01 (deterministic hash family, static data); simhash plants
        # are identical-text (hamming 0) so block-pigeonhole recall is
        # provably 1.0 — the only excluded rows are token-less texts,
        # whose simhash is NULL by definition (none exist in the data).
        "near_dup_recall": f"""
            SELECT 'minhash' AS method, doc_id AS id_a,
                   doc_id + 1000000 AS id_b
            FROM documents WHERE doc_id < 200
            UNION ALL
            SELECT 'simhash' AS method, doc_id AS id_a,
                   doc_id + 1000000 AS id_b
            FROM documents
            WHERE doc_id < 200 AND len({wtoks}) > 0
            UNION ALL
            SELECT 'embedding' AS method, vec_id AS id_a,
                   vec_id + 1000000 AS id_b
            FROM embeddings WHERE vec_id < 5""",
        "cosine_topk": """
            SELECT query_id, vec_id, rank FROM (
              SELECT q.vec_id AS query_id, e.vec_id,
                     row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(e.embedding, q.embedding)
                                DESC, e.vec_id) AS rank
              FROM embeddings e, embeddings q WHERE q.vec_id < 3)
            WHERE rank <= 5""",
        "ivf_topk": """
            -- exhaustive probing (nprobe = nlist): IVF provably equals
            -- brute-force top-k, so the twin is the same exact ranking
            SELECT query_id, vec_id, rank FROM (
              SELECT q.vec_id AS query_id, e.vec_id,
                     row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(e.embedding, q.embedding)
                                DESC, e.vec_id) AS rank
              FROM embeddings e, embeddings q WHERE q.vec_id < 10)
            WHERE rank <= 5""",
        "ks_drift": """
            -- exact two-sample KS over per-side value histograms: the
            -- same counts → cumulative shares → max gap formula the
            -- ks_exact operator runs (integer counts divided once into
            -- doubles, so the statistic reproduces bit-for-bit)
            WITH a AS (SELECT n_chars AS v, count(*) AS ca FROM documents
                       WHERE lang = 'en' AND n_chars IS NOT NULL GROUP BY 1),
            b AS (SELECT n_chars AS v, count(*) AS cb FROM documents
                  WHERE lang <> 'en' AND n_chars IS NOT NULL GROUP BY 1),
            u AS (SELECT coalesce(a.v, b.v) AS v, coalesce(ca, 0) AS ca,
                         coalesce(cb, 0) AS cb
                  FROM a FULL OUTER JOIN b ON a.v = b.v),
            c AS (SELECT sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                           / (SELECT sum(ca) FROM u) AS fa,
                         sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                           / (SELECT sum(cb) FROM u) AS fb
                  FROM u)
            SELECT round(max(abs(fa - fb)), 6) AS ks FROM c""",
        # validation keywords over documents — each the exact relational
        # twin of the compiled predicate (NULL column ⇔ absent key)
        "kw_type": """
            SELECT doc_id, (n_chars IS NOT NULL) AS valid_number,
                   (n_chars IS NULL) AS valid_union
            FROM documents""",
        "kw_length": """
            SELECT doc_id,
                   (text IS NULL OR length(text) BETWEEN 100 AND 400)
                     AS valid_len,
                   (text IS NULL OR regexp_matches(text, '^[a-z]'))
                     AS valid_pattern,
                   (text IS NULL OR regexp_matches(text, '\\p{Nd}'))
                     AS valid_prop
            FROM documents""",
        "mined_contract": """
            -- the mined contract's per-column facts recomputed with
            -- exact SQL aggregates: never-null -> required, low exact
            -- cardinality -> enum (the Spark side's HLL gate is exact
            -- at these cardinalities), observed bounds / code-point
            -- length bounds otherwise
            SELECT 'doc_id' AS "column",
                   count(*) FILTER (WHERE doc_id IS NULL) = 0 AS required,
                   'integer' AS kind, min(doc_id) AS lo, max(doc_id) AS hi,
                   NULL::INT AS n_enum
            FROM documents
            UNION ALL
            SELECT 'lang', count(*) FILTER (WHERE lang IS NULL) = 0,
                   CASE WHEN count(DISTINCT lang) <= 16
                        THEN 'enum' ELSE 'string' END,
                   CASE WHEN count(DISTINCT lang) <= 16
                        THEN NULL ELSE min(length(lang)) END,
                   CASE WHEN count(DISTINCT lang) <= 16
                        THEN NULL ELSE max(length(lang)) END,
                   CASE WHEN count(DISTINCT lang) <= 16
                        THEN count(DISTINCT lang)::INT END
            FROM documents
            UNION ALL
            SELECT 'n_chars', count(*) FILTER (WHERE n_chars IS NULL) = 0,
                   'integer', min(n_chars), max(n_chars), NULL::INT
            FROM documents
            UNION ALL
            SELECT 'source', count(*) FILTER (WHERE source IS NULL) = 0,
                   CASE WHEN count(DISTINCT source) <= 16
                        THEN 'enum' ELSE 'string' END,
                   CASE WHEN count(DISTINCT source) <= 16
                        THEN NULL ELSE min(length(source)) END,
                   CASE WHEN count(DISTINCT source) <= 16
                        THEN NULL ELSE max(length(source)) END,
                   CASE WHEN count(DISTINCT source) <= 16
                        THEN count(DISTINCT source)::INT END
            FROM documents
            UNION ALL
            SELECT 'text', count(*) FILTER (WHERE text IS NULL) = 0,
                   CASE WHEN count(DISTINCT text) <= 16
                        THEN 'enum' ELSE 'string' END,
                   CASE WHEN count(DISTINCT text) <= 16
                        THEN NULL ELSE min(length(text)) END,
                   CASE WHEN count(DISTINCT text) <= 16
                        THEN NULL ELSE max(length(text)) END,
                   CASE WHEN count(DISTINCT text) <= 16
                        THEN count(DISTINCT text)::INT END
            FROM documents""",
        "kw_enum_const": f"""
            SELECT doc_id,
                   (coalesce(lang IN ({','.join(repr(l) for l in LANGS)}), FALSE)
                    AND coalesce(source = 'src1', FALSE)) AS valid
            FROM documents""",
        "kw_bounds": """
            SELECT doc_id,
                   ((n_chars IS NULL OR (n_chars >= 100 AND n_chars < 400))
                    AND doc_id > 5) AS valid_bounds,
                   (n_chars IS NULL OR n_chars % 7 = 0) AS valid_mult
            FROM documents""",
        "sample_split": """
            -- the md5 draw recomputed verbatim: first 52 bits of
            -- md5('<doc_id>|<seed>') scaled by 2^-52; split thresholds
            -- 0.75/0.875 are binary-exact, so assignment matches the
            -- Spark side bit-for-bit
            WITH d AS (
              SELECT doc_id,
                     ('0x' || substring(md5(doc_id::VARCHAR || '|' || '3'),
                                        1, 13))::BIGINT
                       / 4503599627370496.0 AS u_split,
                     ('0x' || substring(md5(doc_id::VARCHAR || '|' || '7'),
                                        1, 13))::BIGINT
                       / 4503599627370496.0 AS u_samp
              FROM documents)
            SELECT doc_id,
                   CASE WHEN u_split < 0.75 THEN 'train'
                        WHEN u_split < 0.875 THEN 'val'
                        ELSE 'test' END AS split,
                   (u_samp < 0.25) AS sampled
            FROM d""",
        "kw_allof": """
            SELECT doc_id,
                   ((n_chars IS NULL OR n_chars >= 100)
                    AND (n_chars IS NULL OR n_chars <= 400)) AS valid
            FROM documents""",
        "kw_anyof": """
            SELECT doc_id,
                   (coalesce(lang = 'en', FALSE)
                    OR coalesce(n_chars < 100, FALSE)) AS valid
            FROM documents""",
        "kw_oneof": """
            SELECT doc_id,
                   ((coalesce(lang = 'en', FALSE)::INT
                     + coalesce(n_chars < 100, FALSE)::INT) = 1) AS valid
            FROM documents""",
        "kw_not": """
            SELECT doc_id, NOT coalesce(lang = 'zh', FALSE) AS valid
            FROM documents""",
        "kw_ifthenelse": """
            SELECT doc_id,
                   CASE WHEN coalesce(lang = 'en', FALSE)
                        THEN (n_chars IS NULL OR n_chars >= 100)
                        ELSE (n_chars IS NULL OR n_chars >= 60) END AS valid
            FROM documents""",
        "kw_ref": """
            SELECT doc_id,
                   (n_chars IS NULL OR (n_chars >= 100 AND n_chars <= 400))
                     AS valid
            FROM documents""",
        "kw_dependent_required": """
            SELECT doc_id, (lang IS NULL OR source IS NOT NULL) AS valid
            FROM documents""",
        "kw_items": f"""
            SELECT doc_id,
                   (len({toks}) = len(list_filter({toks}, t -> length(t) >= 2))
                    AND len({toks}) >= 10 AND len({toks}) <= 100) AS valid
            FROM documents""",
        "kw_uniqueitems": f"""
            SELECT doc_id,
                   (len(list_distinct({toks})) = len({toks})) AS valid
            FROM documents""",
        "kw_contains": f"""
            SELECT doc_id,
                   (len(list_filter({toks}, t -> t = 'spark')) >= 2) AS valid
            FROM documents""",
        "kw_prefixitems": f"""
            SELECT doc_id,
                   ((len({toks}) < 1 OR length({toks}[1]) >= 3)
                    AND (len({toks}) < 2 OR regexp_matches({toks}[2], '^[a-z]')))
                     AS valid
            FROM documents""",
        "kw_maxcontains": f"""
            SELECT doc_id,
                   (len(list_filter({toks}, t -> regexp_matches(t, '^th')))
                      BETWEEN 1 AND 5) AS valid
            FROM documents""",
        "kw_unevaluateditems": f"""
            SELECT doc_id,
                   (len(list_filter({toks}[3:], t -> length(t) <= 8))
                      = greatest(len({toks}) - 2, 0)) AS valid
            FROM documents""",
        "kw_minmaxproperties": """
            SELECT doc_id,
                   ((1 + (doc_id % 3 <> 0)::INT + (doc_id % 5 <> 0)::INT + 1)
                      BETWEEN 3 AND 4) AS valid
            FROM documents""",
        "kw_dependentschemas": """
            SELECT doc_id,
                   (doc_id % 5 = 0
                    OR (n_chars >= 120 AND doc_id % 3 <> 0)) AS valid
            FROM documents""",
        "kw_dependencies": """
            SELECT doc_id,
                   ((doc_id % 3 = 0 OR doc_id % 5 <> 0)
                    AND n_chars <= 400) AS valid
            FROM documents""",
        "kw_unevaluatedprops": """
            SELECT doc_id, (doc_id % 3 = 0) AS valid FROM documents""",
        "kw_unevaluatedprops_if": """
            SELECT doc_id,
                   coalesce(lang = 'en' AND doc_id % 3 <> 0, FALSE) AS valid
            FROM documents""",
        "kw_format": r"""
            -- valid_date is the kernel valid_date mirror: month<=12,
            -- day<=31, day>28 needs a real calendar day; month 00
            -- passes when day<=28
            WITH d AS (
              SELECT doc_id, n_chars,
                     2000 + doc_id % 30 AS y,
                     doc_id % 15 AS m,
                     n_chars % 35 AS dd
              FROM documents)
            SELECT doc_id,
                   regexp_matches(
                     (doc_id % 300) || '.' || (n_chars % 300) || '.0.1',
                     '^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$')
                     AS valid_ip,
                   (m <= 12 AND dd <= 31 AND (dd <= 28 OR (m >= 1 AND
                      dd <= CASE WHEN m = 2 THEN
                                   CASE WHEN (y % 4 = 0 AND y % 100 <> 0)
                                             OR y % 400 = 0
                                        THEN 29 ELSE 28 END
                                 WHEN m IN (4, 6, 9, 11) THEN 30
                                 ELSE 31 END))) AS valid_date
            FROM d""",
        "kw_dynamicref": """
            SELECT doc_id, (n_chars >= 100) AS valid FROM documents""",
        "media_features": """
            SELECT doc_id AS media_id,
                   (doc_id % 240 + 16)::INT AS width,
                   (n_chars % 200 + 16)::INT AS height
            FROM documents WHERE doc_id < 50""",
        "media_pixels": """
            -- solid-color BMPs + real zlib PNGs: channel means equal
            -- the generating formula exactly (real decode on Spark)
            SELECT doc_id AS media_id, 'bmp' AS fmt,
                   (doc_id % 5 + 1)::INT AS width,
                   2::INT AS height,
                   (doc_id * 13 % 256)::DOUBLE AS mean_r,
                   (doc_id * 7 % 256)::DOUBLE AS mean_g,
                   (doc_id % 256)::DOUBLE AS mean_b
            FROM documents WHERE doc_id < 60
            UNION ALL
            SELECT doc_id + 1000, 'png',
                   (doc_id % 4 + 1)::INT, 3::INT,
                   (doc_id * 11 % 256)::DOUBLE,
                   (doc_id * 5 % 256)::DOUBLE,
                   (doc_id * 3 % 256)::DOUBLE
            FROM documents WHERE doc_id < 40
            UNION ALL
            SELECT doc_id + 2000, 'gif',
                   (doc_id % 3 + 1)::INT, 2::INT,
                   (doc_id * 17 % 256)::DOUBLE,
                   (doc_id * 9 % 256)::DOUBLE,
                   (doc_id * 2 % 256)::DOUBLE
            FROM documents WHERE doc_id < 30
            UNION ALL
            -- real baseline JPEG: solid even-valued YCbCr plants are
            -- DC-only-exact under flat q=16 tables, and the decoder's
            -- floor(x+0.5) YCbCr->RGB float formula is reproduced here
            -- verbatim (same IEEE doubles, same operation order)
            SELECT doc_id + 3000, 'jpeg',
                   (doc_id % 5 + 2)::INT, 2::INT,
                   least(255, greatest(0, floor(
                       (doc_id * 14 % 256)
                       + 1.402 * ((doc_id * 22 % 256) - 128) + 0.5)))::DOUBLE,
                   least(255, greatest(0, floor(
                       (doc_id * 14 % 256)
                       - 0.344136 * (((doc_id * 6 + 2) % 256) - 128)
                       - 0.714136 * ((doc_id * 22 % 256) - 128) + 0.5)))::DOUBLE,
                   least(255, greatest(0, floor(
                       (doc_id * 14 % 256)
                       + 1.772 * (((doc_id * 6 + 2) % 256) - 128) + 0.5)))::DOUBLE
            FROM documents WHERE doc_id < 30
            UNION ALL
            -- real PROGRESSIVE JPEG (SOF2, round 6): same DC-only
            -- exactness argument — the scans reassemble the identical
            -- quantized coefficients, so the same color formula holds
            SELECT doc_id + 4000, 'jpeg_prog',
                   (doc_id % 4 + 2)::INT, 2::INT,
                   least(255, greatest(0, floor(
                       ((doc_id * 12 + 4) % 256)
                       + 1.402 * (((doc_id * 18 + 6) % 256) - 128)
                       + 0.5)))::DOUBLE,
                   least(255, greatest(0, floor(
                       ((doc_id * 12 + 4) % 256)
                       - 0.344136 * ((doc_id * 8 % 256) - 128)
                       - 0.714136 * (((doc_id * 18 + 6) % 256) - 128)
                       + 0.5)))::DOUBLE,
                   least(255, greatest(0, floor(
                       ((doc_id * 12 + 4) % 256)
                       + 1.772 * ((doc_id * 8 % 256) - 128) + 0.5)))::DOUBLE
            FROM documents WHERE doc_id < 24""",
        "audio_features": """
            -- planted square wave (n pairs of samples v1, v2): the
            -- decoded features are closed-form over exact integers —
            -- rms = sqrt((v1²+v2²)/2), mean = (v1+v2)/2, and the
            -- divisions are IEEE-exactly-representable, so the Spark
            -- float64 decode reproduces them bit-for-bit
            WITH d AS (
              SELECT doc_id AS media_id,
                     (doc_id % 50 + 10) * 2 AS n,
                     8000 + (doc_id % 5) * 2000 AS sr,
                     (doc_id * 523) % 30000 - 15000 AS v1,
                     (n_chars * 37) % 20000 - 10000 AS v2
              FROM documents WHERE doc_id < 60 AND n_chars IS NOT NULL)
            SELECT media_id, sr::INT AS sample_rate,
                   CAST(n AS BIGINT) AS n_samples,
                   round(n * 1000 / sr, 6) AS duration_ms,
                   greatest(abs(v1), abs(v2))::INT AS peak,
                   round(sqrt((v1 * v1 + v2 * v2) / 2.0), 6) AS rms,
                   round((v1 + v2) / 2.0, 6) AS mean_amp,
                   -- adjacent products are all v1*v2: every pair
                   -- crosses (zcr 1) iff the levels straddle zero
                   (CASE WHEN v1 * v2 < 0 THEN 1.0
                         ELSE 0.0 END)::DOUBLE AS zcr,
                   -- alternating square: all energy at Nyquist sr/2
                   -- (an exactly representable double both engines hit);
                   -- equal levels → flat spectrum → reported 0.0
                   round(CASE WHEN v1 = v2 THEN 0.0
                              ELSE sr / 2.0 END, 6) AS dominant_hz
            FROM d""",
        "video_frames": """
            -- animated-GIF plants: media i has (i%4 + 1) solid-color
            -- frames; the Spark side decodes every 2nd frame's pixels
            -- for real, so per-frame channel means equal the generator
            -- formula exactly
            WITH v AS (
              SELECT doc_id AS i, 3000 + doc_id AS media_id,
                     doc_id % 4 + 1 AS n, doc_id % 3 + 1 AS w
              FROM documents WHERE doc_id < 25),
            f AS (
              SELECT media_id, i, n, w,
                     unnest(range(0, n::BIGINT, 2)) AS frame_idx
              FROM v)
            SELECT media_id, frame_idx::INT AS frame_idx, n::INT AS n_frames,
                   w::INT AS width, 2::INT AS height,
                   ((i * 7 + frame_idx * 31) % 256)::DOUBLE AS mean_r,
                   ((i * 3 + frame_idx * 17) % 256)::DOUBLE AS mean_g,
                   ((i * 11 + frame_idx * 5) % 256)::DOUBLE AS mean_b
            FROM f""",
        "violations_page": """
            SELECT doc_id,
                   'properties.n_chars.minimum' AS "check",
                   'minimum' AS keyword,
                   '["properties", "n_chars", "minimum"]' AS schema_path,
                   '["n_chars"]' AS data_path,
                   '150' AS schema_value,
                   '"' || n_chars || '" does not match minimum:150' AS message
            FROM documents WHERE n_chars < 150
            UNION ALL
            SELECT doc_id, 'required.0', 'required', '["required", 0]', '[]',
                   'lang', 'object missing required property 0:lang'
            FROM documents WHERE lang IS NULL""",
        # propertyNames maxLength 6: only 'n_chars' (7 chars) violates,
        # and only when present (non-null under the relational bridge)
        "kw_propertynames": """
            SELECT doc_id, (n_chars IS NULL) AS valid FROM documents""",
        # additionalProperties {type: string}: unclaimed columns are
        # source (string, ok) and n_chars (integer, violates if present)
        "kw_additionalprops": """
            SELECT doc_id, (n_chars IS NULL) AS valid FROM documents""",
        "kw_patternprops": """
            SELECT doc_id, (n_chars IS NULL OR n_chars >= 100) AS valid
            FROM documents""",
        "kw_boolean_schema": """
            SELECT doc_id, (text IS NULL) AS valid FROM documents""",
        "windowed_verdicts": """
            -- floor(epoch(...)): duckdb's ::BIGINT cast rounds, Spark's
            -- unix_timestamp floors — boundary events would drift buckets
            SELECT floor(epoch(ts))::BIGINT // 3600 AS hour_bucket,
                   count(*) AS n_rows,
                   CAST(sum(((event_type IS NOT NULL AND props IS NOT NULL)
                        AND (value IS NULL OR value >= 0.5)
                        AND coalesce(event_type IN
                            ('click','view','purchase','signup','error'),
                            FALSE))::BIGINT) AS BIGINT) AS n_valid
            FROM events GROUP BY 1""",
        "verified_pairs": r"""
            WITH t AS (
              SELECT doc_id,
                     regexp_replace(lower(text), '\s+', ' ', 'g') AS norm
              FROM documents WHERE doc_id <= 20),
            g AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, least(greatest(length(norm) - 4, 0), 512) + 1),
                       i -> substring(norm, i, 5))) AS sh
              FROM t)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(
                     len(list_filter(a.sh, x -> list_contains(b.sh, x)))::DOUBLE
                     / greatest(len(list_distinct(list_concat(a.sh, b.sh))), 1),
                     6) AS jaccard
            FROM g a JOIN g b ON b.doc_id = a.doc_id + 1""",
        "token_jaccard": f"""
            WITH t AS (
              SELECT doc_id, list_distinct({toks}) AS toks
              FROM documents WHERE doc_id < 30)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_filter(a.toks, x -> list_contains(b.toks, x)))::DOUBLE
                         / len(list_distinct(list_concat(a.toks, b.toks))), 6)
                     AS jaccard
            FROM t a, t b WHERE a.doc_id < b.doc_id""",
    }
    # every queries() entry has a twin: round 4 oracled the last two
    # (ivf_topk via exhaustive probing, ks_drift via the exact-histogram
    # KS operator) — zero rows-only entries remain
    return sql
