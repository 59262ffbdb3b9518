#!/usr/bin/env python
"""Capture .explain("formatted") for every bench.py query into
plans/<tag>/<query>_<suffix>.txt — the optimization round's plan
evidence (guide §1: plan shape before/after every change).

Usage: python tools/capture_plans.py <suffix> [query ...]
  suffix: "before" / "after"; optional query names filter the set.

Reuses the exact DataFrame constructions bench.py times (bench.py
itself is frozen for measurement, so the plans are captured here).
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "8000000"))
N_KERNEL_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_KERNEL_DOCS", "1000000"))
TAG = os.environ.get("SPARK_GRAFT_PLAN_TAG", "r09")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", TAG)
    os.makedirs(outdir, exist_ok=True)

    from jema_js_spark.runtime.session import build_session
    spark = build_session(app_name="jema-plans", master=f"local[{CPUS}]",
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

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    # plans only — a tiny page table yields the same plan shape
    import tempfile
    pages_dir = tempfile.mkdtemp(prefix="jema_plans_pages_")
    synthetic_pages(spark, 10000, num_partitions=4) \
        .write.mode("overwrite").parquet(pages_dir)
    pages = spark.read.parquet(pages_dir)

    from jema_js_spark.bench_contracts import (
        REPRESENTATIVE_KERNEL_CONTRACT, mixed_json_docs,
        representative_json_docs)
    from jema_js_spark.validation.json_plane import with_valid_json
    from jema_js_spark.validation.kernel_udf import kernel_validate_udf
    kdocs = representative_json_docs(spark, 1000, num_partitions=4)
    mdocs = mixed_json_docs(spark, 1000, num_partitions=4)
    udf = kernel_validate_udf(REPRESENTATIVE_KERNEL_CONTRACT)

    manifest = crawl_manifest(spark)
    drift_in = pages.withColumn("grp", F.pmod(F.xxhash64("url"), F.lit(16)))
    doubled = docs.union(docs.limit(2000))
    slice_ = docs.filter(F.col("doc_id") < 2000)
    queries_df = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), "embedding")
    cents = fit_centroids(emb, nlist=16)
    assigned = ivf_assign(emb, cents)

    builders = {
        "flagship_validate": lambda: with_valid(pages, PAGE_CONTRACT).agg(
            F.count(F.lit(1)), F.sum(F.col("valid").cast("long"))),
        "violations": lambda: violation_rows(
            pages, PAGE_CONTRACT, id_cols=["url"]),
        "unique_url": lambda: duplicate_keys(pages, "url"),
        "ts_window": lambda: ts_window_violations(
            pages, "warc_ts", manifest, "window"),
        "stats": lambda: column_stats(pages, ["url", "lang", "text"]),
        "drift_lang": lambda: categorical_drift(drift_in, "grp", "lang"),
        "text_features": lambda: with_text_features(docs).agg(
            F.sum("n_tokens"), F.avg("quality")),
        "exact_dedup": lambda: exact_dedup(doubled, "doc_id"),
        "minhash_lsh": lambda: minhash_candidates(
            slice_, "doc_id", "text", jaccard_threshold=0.8),
        "cosine_topk": lambda: brute_force_topk(emb, queries_df, k=10),
        "ivf_topk": lambda: ivf_topk(assigned, queries_df, cents,
                                     k=10, nprobe=4),
        "kernel_json": lambda: kdocs.select(
            udf(F.col("doc")).alias("v")).agg(
            F.sum(F.col("v").cast("long"))),
        "json_columnar": lambda: with_valid_json(
            kdocs, "doc", REPRESENTATIVE_KERNEL_CONTRACT).agg(
            F.sum(F.col("valid").cast("long"))),
        "json_mixed": lambda: with_valid_json(
            mdocs, "doc", REPRESENTATIVE_KERNEL_CONTRACT,
            route_col="route").groupBy("route").count(),
    }

    for name, build in builders.items():
        if only and name not in only:
            continue
        df = build()
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text.splitlines())} lines)")

    spark.stop()
    import shutil
    shutil.rmtree(pages_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
