"""spark-submit job surfaces run end-to-end as subprocesses (the
deploy shape): planted ground truth in, reported counts out."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dedup_corpus_job(spark, tmp_path):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet") \
        .filter(F.col("doc_id") < 100).select("doc_id", "text")
    exact = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 10**6).alias("doc_id"), "text")
    near = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2 * 10**6).alias("doc_id"),
        F.concat("text", F.lit(" tail")).alias("text"))
    n_exact_planted = exact.count()
    n_near_planted = near.count()
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    docs.union(exact).union(near).write.parquet(src)

    env = {**os.environ, "PYTHONPATH": REPO}
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "dedup_corpus.py"),
         "--input", src, "--output", out, "--jaccard", "0.8"],
        capture_output=True, text=True, env=env, timeout=420)
    assert res.returncode == 0, res.stderr[-2000:]
    report = json.loads(res.stdout.strip().splitlines()[-1])
    assert report["n_input"] == 100 + n_exact_planted + n_near_planted
    # every planted exact copy collapses onto its original
    assert report["exact_removed"] == n_exact_planted
    # every planted near-dup (larger id of a verified pair) drops;
    # organic near-dups in the synthetic corpus may drop too
    assert report["near_removed"] >= n_near_planted
    assert report["n_survivors"] == report["n_after_exact"] - report["near_removed"]

    survivors = spark.read.parquet(f"{out}/survivors")
    ids = {r["doc_id"] for r in survivors.select("doc_id").collect()}
    # no planted near-dup id survives; min-id originals do
    assert not any(i >= 2 * 10**6 for i in ids)
    assert report["n_survivors"] == len(ids)
