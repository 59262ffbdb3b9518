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


def test_connected_components_chain_semantics(spark):
    # A–B, B–C verified but A–C not: pair mode orphans C from every
    # verified neighbor; cc mode maps both B and C to the chain root A
    from jema_js_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3),            # chain A=1, B=2, C=3
         (10, 11),                  # separate pair
         (20, 21), (21, 22), (20, 22),  # triangle
         (30, 31), (32, 31)],       # root via larger-first edge
        "id_a long, id_b long")
    roots = {r["id"]: r["root"]
             for r in connected_components(pairs).collect()}
    assert roots == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                     20: 20, 21: 20, 22: 20, 30: 30, 31: 30, 32: 30}


def test_connected_components_long_path_and_guard(spark):
    from jema_js_spark.operators.dedup import connected_components

    # a 64-vertex path: pointer jumping must converge well under
    # max_iter (O(log diameter))
    pairs = spark.createDataFrame([(i, i + 1) for i in range(63)],
                                  "id_a long, id_b long")
    roots = connected_components(pairs, max_iter=12)
    assert roots.filter(F.col("root") != 0).count() == 0
    # non-convergence is loud, never partial
    import pytest
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=1)


def test_dedup_corpus_job_cc_mode(spark, tmp_path):
    # planted A–B–C chain: base doc (A), one near-dup of A (B), one
    # near-dup of B (C, built so its similarity to A sits lower) — cc
    # mode must drop B and C with canonicals pointing at the chain root
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet") \
        .filter(F.col("doc_id") < 40).select("doc_id", "text")
    b = docs.select((F.col("doc_id") + 10**6).alias("doc_id"),
                    F.concat("text", F.lit(" tail one")).alias("text"))
    c = docs.select((F.col("doc_id") + 2 * 10**6).alias("doc_id"),
                    F.concat("text", F.lit(" tail one more")).alias("text"))
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    docs.union(b).union(c).write.parquet(src)

    env = {**os.environ, "PYTHONPATH": REPO}
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "dedup_corpus.py"),
         "--input", src, "--output", out, "--jaccard", "0.8",
         "--survivor-mode", "cc"],
        capture_output=True, text=True, env=env, timeout=420)
    assert res.returncode == 0, res.stderr[-2000:]
    report = json.loads(res.stdout.strip().splitlines()[-1])

    canon = {r["id"]: r["root"] for r in
             spark.read.parquet(f"{out}/canonicals").collect()}
    survivors = {r["doc_id"] for r in
                 spark.read.parquet(f"{out}/survivors").collect()}
    # every plant dropped, canonical = chain root = the base doc id
    for base in range(40):
        for plant in (base + 10**6, base + 2 * 10**6):
            if plant in canon:
                assert canon[plant] < 10**6, (plant, canon[plant])
            assert plant not in survivors, plant
    # roots survive, dropped set == canonicals' members
    assert report["near_removed"] == len(canon)
    assert all(r in survivors for r in set(canon.values()))


def test_validate_pages_job_kill_and_resume(spark, tmp_path):
    """The production validation job end-to-end via subprocess: fresh
    run validates every partition-day; a re-submitted --resume run
    skips all of them through the parquet ledger (north-rule
    resumability at the deploy surface, not just the library)."""
    from jema_js_spark.sources.pages import synthetic_pages

    src = str(tmp_path / "pages")
    out = str(tmp_path / "run")
    synthetic_pages(spark, 4000, num_partitions=8).write.parquet(src)
    contract = {
        "required": ["url", "text"],
        "properties": {"url": {"pattern": "^https?://"},
                        "text": {"minLength": 1}},
    }
    schema_path = str(tmp_path / "contract.json")
    with open(schema_path, "w") as f:
        json.dump(contract, f)

    env = {**os.environ, "PYTHONPATH": REPO}
    args = [sys.executable, os.path.join(REPO, "jobs", "validate_pages.py"),
            "--input", src, "--schema", schema_path, "--output", out,
            "--run-id", "t1"]
    res = subprocess.run(args, capture_output=True, text=True, env=env,
                         timeout=420)
    assert res.returncode == 0, res.stderr[-2000:]
    rep = json.loads(res.stdout.strip().splitlines()[-1])
    assert rep["partitions_done"] > 0 and rep["partitions_skipped"] == 0
    # the pages generator plants hot-domain duplicate urls — the job's
    # dataset check must agree with an in-process recount
    from jema_js_spark.operators.uniqueness import duplicate_keys

    expected_dups = duplicate_keys(spark.read.parquet(src), "url").count()
    assert rep["checks"]["uniqueness"]["dup_keys"] == expected_dups > 0

    # violations landed per day and carry the reference message shape
    days = spark.read.parquet(f"{out}/days/*/violations")
    assert days.count() > 0
    msg = days.select("message").first()["message"]
    assert "does not match" in msg or "missing required" in msg

    # kill-free resume: everything skips, nothing recomputes
    res2 = subprocess.run(args + ["--resume"], capture_output=True,
                          text=True, env=env, timeout=420)
    assert res2.returncode == 0, res2.stderr[-2000:]
    rep2 = json.loads(res2.stdout.strip().splitlines()[-1])
    assert rep2["partitions_done"] == 0
    assert rep2["partitions_skipped"] == rep["partitions_done"]


def test_validate_pages_json_col_and_hive_keys(spark, tmp_path):
    """Round-6 deploy surfaces in one subprocess pass: ``--json-col``
    validates a dynamic JSON column through the routed planes (kernel
    message shape in the violations output, __parse__ rows for
    malformed docs), and ``--keys-from hive`` plans the day list from
    the directory layout instead of a distinct scan.  A --resume
    re-submission skips every day through the ledger."""
    docs = [
        ('https://a.example/0', '2024-01-01', '{"k":1,"name":"ok"}'),
        ('https://a.example/1', '2024-01-01', '{"k":-5,"name":"ok"}'),
        ('https://a.example/2', '2024-01-02', '{"name":"ok"}'),
        ('https://a.example/3', '2024-01-02', 'not json'),
        ('https://a.example/4', '2024-01-03', '{"k":2,"name":"ok"}'),
    ]
    src = str(tmp_path / "jdocs")
    out = str(tmp_path / "jrun")
    spark.createDataFrame(docs, "url string, day string, doc string") \
        .write.partitionBy("day").parquet(src)
    contract = {"type": "object", "required": ["k"],
                "properties": {"k": {"type": "integer", "minimum": 0},
                               "name": {"type": "string"}}}
    schema_path = str(tmp_path / "jcontract.json")
    with open(schema_path, "w") as f:
        json.dump(contract, f)

    env = {**os.environ, "PYTHONPATH": REPO}
    args = [sys.executable, os.path.join(REPO, "jobs", "validate_pages.py"),
            "--input", src, "--schema", schema_path, "--output", out,
            "--run-id", "j1", "--json-col", "doc",
            "--keys-from", "hive", "--partition-col", "day"]
    res = subprocess.run(args, capture_output=True, text=True, env=env,
                         timeout=420)
    assert res.returncode == 0, res.stderr[-2000:]
    rep = json.loads(res.stdout.strip().splitlines()[-1])
    assert rep["partitions_done"] == 3 and rep["partitions_skipped"] == 0

    viol = spark.read.parquet(f"{out}/days/*/violations")
    got = {(r["url"], r["keyword"], r["message"]) for r in viol.collect()}
    # reference message shape straight from the kernel
    assert ('https://a.example/1', 'minimum',
            '"-5" does not match minimum:0') in got
    assert ('https://a.example/2', 'required',
            'object missing required property 0:k') in got
    assert ('https://a.example/3', '__parse__',
            'document is not parseable JSON') in got
    # valid docs emit nothing
    assert not any(u in ('https://a.example/0', 'https://a.example/4')
                   for u, _, _ in got)

    # route-rate observability (round 7, VERDICT r6 #4): the ledger's
    # per-partition metrics carry the routed/kernel split, so a
    # routing-gate regression in production is visible in the state
    # table, not just the Spark UI.  Day 1: both docs route (canonical
    # ints); day 2: the missing-k doc routes (shape fits; verdict
    # false), "not json" takes the kernel; day 3: routes.
    ledger = spark.read.parquet(f"{out}/ledger")
    lm = {r["partition_key"]: json.loads(r["metrics_json"])
          for r in ledger.collect()}
    assert {k: (m["n_routed"], m["n_kernel"]) for k, m in lm.items()} == {
        "2024-01-01": (2, 0), "2024-01-02": (1, 1), "2024-01-03": (1, 0)}
    assert all(m["n_routed"] + m["n_kernel"] == m["n_rows"]
               for m in lm.values())

    res2 = subprocess.run(args + ["--resume"], capture_output=True,
                          text=True, env=env, timeout=420)
    assert res2.returncode == 0, res2.stderr[-2000:]
    rep2 = json.loads(res2.stdout.strip().splitlines()[-1])
    assert rep2["partitions_done"] == 0 and rep2["partitions_skipped"] == 3
