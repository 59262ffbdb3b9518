#!/usr/bin/env python
"""Per-query isolation harness for the optimization rounds (guide §1.4).

bench.py is FROZEN for measurement, so exploratory per-entry timing
lives here: the SAME workloads at the SAME scales with the same
warm-pass + MIN-of-3 protocol, selectable by name, so a single entry
can be measured before/after a change without paying the full sweep.

Usage: python bench_extra.py [entry ...]        (default: all)
Env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_PAGES,
       SPARK_GRAFT_BENCH_KERNEL_DOCS — same meaning as bench.py.

Prints one JSON line: {"queries": {...}, "loadavg_before": ...,
"loadavg_after": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "8000000"))
N_KERNEL_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_KERNEL_DOCS", "1000000"))


def main() -> None:
    only = set(sys.argv[1:])

    from jema_js_spark.runtime.session import build_session
    spark = build_session(app_name="jema-bench-extra",
                          master=f"local[{CPUS}]",
                          shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    from jema_js_spark.operators.dedup import exact_dedup, minhash_candidates
    from jema_js_spark.operators.drift import categorical_drift
    from jema_js_spark.operators.referential import ts_window_violations
    from jema_js_spark.operators.similarity import (
        brute_force_topk, fit_centroids, ivf_assign, ivf_topk)
    from jema_js_spark.operators.stats import column_stats
    from jema_js_spark.operators.text import with_text_features
    from jema_js_spark.operators.uniqueness import duplicate_keys
    from jema_js_spark.sources.pages import crawl_manifest, synthetic_pages
    from jema_js_spark.validation.engine import violation_rows, with_valid
    from __spark_entry__ import PAGE_CONTRACT

    needs_pages = (not only) or (only & {
        "flagship_validate", "violations", "unique_url", "ts_window",
        "stats", "drift_lang"})
    needs_docs = (not only) or (only & {
        "text_features", "exact_dedup", "minhash_lsh"})
    needs_emb = (not only) or (only & {"cosine_topk", "ivf_topk"})
    needs_kdocs = (not only) or (only & {"kernel_json", "json_columnar"})
    needs_mdocs = (not only) or (only & {"json_mixed"})

    import shutil
    import tempfile
    pages = None
    pages_dir = None
    if needs_pages:
        pages_dir = tempfile.mkdtemp(prefix="jema_benchx_pages_")
        synthetic_pages(spark, N_PAGES, num_partitions=CPUS * 4) \
            .write.mode("overwrite").parquet(pages_dir)
        pages = spark.read.parquet(pages_dir)
    docs = emb = None
    if needs_docs:
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()
        docs.count()
    if needs_emb:
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
        emb.count()

    timings: dict[str, float] = {}
    loadavg_before = os.getloadavg()

    def bench(name, fn):
        if only and name not in only:
            return None
        fn()
        samples = []
        result = None
        for _ in range(3):
            t0 = time.perf_counter()
            result = fn()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(min(samples), 3)
        return result

    if pages is not None:
        def flagship():
            v = with_valid(pages, PAGE_CONTRACT)
            return v.agg(F.count(F.lit(1)),
                         F.sum(F.col("valid").cast("long"))).collect()
        bench("flagship_validate", flagship)
        bench("violations", lambda: violation_rows(
            pages, PAGE_CONTRACT, id_cols=["url"]).count())
        bench("unique_url", lambda: duplicate_keys(pages, "url").count())
        manifest = crawl_manifest(spark)
        bench("ts_window", lambda: ts_window_violations(
            pages, "warc_ts", manifest, "window").count())
        bench("stats", lambda: column_stats(
            pages, ["url", "lang", "text"]).collect())
        drift_in = pages.withColumn(
            "grp", F.pmod(F.xxhash64("url"), F.lit(16)))
        bench("drift_lang", lambda: categorical_drift(
            drift_in, "grp", "lang").collect())

    if docs is not None:
        bench("text_features", lambda: with_text_features(docs).agg(
            F.sum("n_tokens"), F.avg("quality")).collect())
        doubled = docs.union(docs.limit(2000))
        bench("exact_dedup", lambda: exact_dedup(doubled, "doc_id").count())
        slice_ = docs.filter(F.col("doc_id") < 2000)
        bench("minhash_lsh", lambda: minhash_candidates(
            slice_, "doc_id", "text", jaccard_threshold=0.8).count())

    if emb is not None:
        queries_df = emb.filter(F.col("vec_id") < 16).select(
            F.col("vec_id").alias("query_id"), "embedding")
        bench("cosine_topk", lambda: brute_force_topk(
            emb, queries_df, k=10).count())
        cents = fit_centroids(emb, nlist=16)
        assigned = ivf_assign(emb, cents)
        bench("ivf_topk", lambda: ivf_topk(
            assigned, queries_df, cents, k=10, nprobe=4).count())

    from jema_js_spark.bench_contracts import (
        REPRESENTATIVE_KERNEL_CONTRACT, mixed_json_docs,
        representative_json_docs)
    from jema_js_spark.validation.json_plane import with_valid_json
    from jema_js_spark.validation.kernel_udf import kernel_validate_udf

    if needs_kdocs:
        kdocs = representative_json_docs(
            spark, N_KERNEL_DOCS, num_partitions=CPUS * 3).cache()
        kdocs.count()
        udf = kernel_validate_udf(REPRESENTATIVE_KERNEL_CONTRACT)

        def kernel_run():
            return kdocs.select(udf(F.col("doc")).alias("v")).agg(
                F.sum(F.col("v").cast("long"))).collect()
        bench("kernel_json", kernel_run)

        def json_columnar_run():
            out = with_valid_json(kdocs, "doc", REPRESENTATIVE_KERNEL_CONTRACT)
            return out.agg(F.sum(F.col("valid").cast("long"))).collect()
        bench("json_columnar", json_columnar_run)

    if needs_mdocs:
        mdocs = mixed_json_docs(
            spark, N_KERNEL_DOCS, num_partitions=CPUS * 3).cache()
        mdocs.count()

        def json_mixed_run():
            out = with_valid_json(mdocs, "doc",
                                  REPRESENTATIVE_KERNEL_CONTRACT,
                                  route_col="route")
            return {r["route"]: r["count"]
                    for r in out.groupBy("route").count().collect()}
        bench("json_mixed", json_mixed_run)

    print(json.dumps({
        "queries": timings,
        "loadavg_before": [round(x, 2) for x in loadavg_before],
        "loadavg_after": [round(x, 2) for x in os.getloadavg()],
    }))
    spark.stop()
    if pages_dir:
        shutil.rmtree(pages_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
