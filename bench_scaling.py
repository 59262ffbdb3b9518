#!/usr/bin/env python
"""Scaling-efficiency evidence (BASELINE.json north rule: ≥0.8 from N
to 4N executors).

No real cluster exists in this sandbox, so per the driver instruction
the same job runs at two parallelism levels — local[8] and local[32] —
on the SAME deterministic input (the synthetic pages generator is
parallelism-independent), and efficiency is

    eff = (throughput_32 / throughput_8) / 4

Each level runs in a fresh subprocess (own JVM) so executor-thread
counts are honest.  Results land in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_PAGES = int(os.environ.get("SPARK_GRAFT_SCALE_PAGES", "4000000"))
LEVELS = (8, 32)

_CHILD = r"""
import json, sys, time
from pyspark.sql import functions as F
from jema_js_spark.runtime.session import build_session
from jema_js_spark.sources.pages import synthetic_pages
from jema_js_spark.validation.engine import with_valid
from __spark_entry__ import PAGE_CONTRACT

cpus = int(sys.argv[1]); n = int(sys.argv[2])
spark = build_session(app_name=f"scale-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
pages = synthetic_pages(spark, n, num_partitions=cpus * 4)
# warm-up: JIT + codegen, excluded from the measurement
with_valid(pages.limit(50000), PAGE_CONTRACT).agg(F.count(F.lit(1))).collect()
t0 = time.perf_counter()
res = with_valid(pages, PAGE_CONTRACT).agg(
    F.count(F.lit(1)), F.sum(F.col("valid").cast("long"))).collect()
dt = time.perf_counter() - t0
print(json.dumps({"cpus": cpus, "seconds": dt, "rows": res[0][0],
                  "valid": res[0][1]}))
spark.stop()
"""


def run_level(cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, str(cpus), str(N_PAGES)],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.abspath(__file__)))
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no result from local[{cpus}]:\n{out.stderr[-2000:]}")


def main() -> None:
    results = {c: run_level(c) for c in LEVELS}
    t8, t32 = results[8]["seconds"], results[32]["seconds"]
    thr8, thr32 = N_PAGES / t8, N_PAGES / t32
    eff = (thr32 / thr8) / (LEVELS[1] / LEVELS[0])
    assert results[8]["valid"] == results[32]["valid"], \
        "same input must give identical verdicts at both levels"

    md = f"""# BENCH / BASELINE — measured numbers

## Scaling efficiency (north rule: ≥0.8 from N to 4N)

Same job (flagship page-contract validation over {N_PAGES:,} synthetic
pages, deterministic generator — identical input bytes at every
parallelism level), run at two parallelism levels in separate JVMs:

| level | wall sec | pages/sec |
|---|---|---|
| local[{LEVELS[0]}] (N) | {t8:.2f} | {thr8:,.0f} |
| local[{LEVELS[1]}] (4N) | {t32:.2f} | {thr32:,.0f} |

**Scaling efficiency (thr_4N / thr_N) / 4 = {eff:.3f}**

Verdict parity across levels: identical ({results[8]['valid']:,} valid rows).

## Flagship throughput

local[{LEVELS[1]}]: **{thr32:,.0f} validated pages/sec** (all-keyword
page contract: required×4, type, maxLength, pattern, minLength, enum —
pure whole-stage-codegen plane).

Reference baseline: jema.js publishes no numbers (BASELINE.md); this
table is the measured engine baseline for future rounds.
"""
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(md)
    print(json.dumps({"efficiency": round(eff, 3),
                      "local8_sec": round(t8, 2),
                      "local32_sec": round(t32, 2),
                      "pages_per_sec_32": round(thr32)}))


if __name__ == "__main__":
    main()
