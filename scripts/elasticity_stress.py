"""Core-count elasticity: does halving/quartering the cores scale the wall?

SCALE.md's 10x tables hold parallelism FIXED at local[32] and grow the
data — that isolates plan shape but says nothing about whether the
plans actually expose enough partition-level parallelism to use more
cores (a plan with a single-partition bottleneck stage is "linear in
data" and still un-scalable). This probe holds the data fixed (sf0.1)
and varies the cores: local[2] / local[8] / local[32], one SUBPROCESS
per size so `SPARK_GRAFT_CPUS` also sizes `spark.sql.shuffle.partitions`
(that is how a real cluster is resized — partitions track cores, not a
constant).

Per size, each query runs once cold then three warm; the reported
number is MIN of the warm runs — this host's steal-time spread on
identical plans (91-231 s documented in SCALE.md) swamps single-run
comparisons, and min-of-N is the standard steal-resistant estimator.
Queries materialize through a noop WRITE, not count(): count() lets
Catalyst prune unused window/agg expressions and times a gutted plan.

Queries chosen to span the physical shapes: scan+hash-agg (a1),
shuffle-heavy window dedup (l29), broadcast-iterative (l19_kmeans).

Usage: python scripts/elasticity_stress.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CORES = (32, 8, 2)
QUERIES = ("a1_pricing_summary", "l29_exact_substring_dedup",
           "l19_kmeans")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
from mric_bak_etl_spark.session import get_spark
from mric_bak_etl_spark.catalog import all_specs

sf_dir, names = sys.argv[1], sys.argv[2].split(",")
spark = get_spark("elasticity")
spark.sparkContext.setLogLevel("ERROR")
out = {}
for name in names:
    fn = all_specs()[name].builder
    runs = []
    for _ in range(4):  # [0] = cold, [1:] = warm
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        runs.append(round(time.perf_counter() - t0, 2))
    out[name] = runs
print("CHILD_RESULT " + json.dumps(out), flush=True)
spark.stop()
"""


def main() -> None:
    results: dict[int, dict[str, list[float]]] = {}
    for n in CORES:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(n))
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD, SF_DIR, ",".join(QUERIES)],
            env=env, capture_output=True, text=True, cwd=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))),
        )
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("CHILD_RESULT ")]
        if not line:
            print(f"cores={n} FAILED:\n{proc.stderr[-2000:]}", flush=True)
            continue
        results[n] = json.loads(line[0].removeprefix("CHILD_RESULT "))
        print(f"cores={n}: {results[n]}", flush=True)

    if 2 in results and 32 in results:
        print("\nmin-warm strong scaling (wall_2 / wall_N, ideal = N/2):")
        for q in QUERIES:
            best = {n: min(results[n][q][1:]) for n in results if q in results[n]}
            row = [f"{n}c={best[n]}s" for n in sorted(best)]
            if 2 in best and 32 in best:
                sp = best[2] / max(best[32], 1e-9)
                row.append(f"speedup(2->32)={sp:.1f}x (ideal 16x)")
            print(f"  {q:28s} " + "  ".join(row))


if __name__ == "__main__":
    main()
