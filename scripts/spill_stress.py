#!/usr/bin/env python
"""Spill-pressure probe (SCALE.md round-6): does a heavy dedup plan
degrade GRACEFULLY — spill to disk and finish — when the unified memory
pool is ~50x smaller than the comfortable default, or does it OOM?

The 10x synth corpus fits this host's page cache, so the main SCALE.md
table never exercises spill; this probe shrinks the pool instead of
growing the data (same partition sizes a 100 TB run would see per task
when executors are memory-tight). Two modes, run in SEPARATE processes
(driver heap is a static JVM conf):

  python scripts/spill_stress.py --normal       [corpus]
  python scripts/spill_stress.py --constrained  [corpus]

--normal:      48g heap, spark.memory.fraction 0.6 (the bench posture)
--constrained: 12g heap, spark.memory.fraction 0.03 — execution+storage
               pool ~360 MB shared by 32 task threads (~11 MB/task
               before eviction), the point where Tungsten sorts/aggs
               must spill. The heap itself stays large on purpose:
               UNMANAGED allocations (parquet read-ahead/decompression
               buffers, codegen rows) are not pool-accounted, and a
               first attempt with a 3g heap OOMed on those before any
               managed operator got the chance to spill — the probe
               targets the memory-manager path, not raw heap
               exhaustion.

The probe runs l2e_dup_clusters (union-find over the LSH pair graph —
shuffle-heavy, JVM-only, 52.7 s at 10x in SCALE.md) on the 10x corpus,
then reads per-stage memoryBytesSpilled/diskBytesSpilled from the UI
REST API (enabled just for this probe) and prints one JSON line.
Results land in SCALE.md (manual; minutes-long experiment, not a test).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERY = "l2e_dup_clusters"
UI_PORT = 4049


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "--constrained"
    corpus = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_synth"
    constrained = mode == "--constrained"

    from pyspark.sql import SparkSession

    from mric_bak_etl_spark.catalog import all_specs
    from mric_bak_etl_spark.session import ensure_runtime_confs

    builder = (
        SparkSession.builder.appName(f"spill-stress{mode}")
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "12g" if constrained else "48g")
        .config("spark.memory.fraction", "0.03" if constrained else "0.6")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = ensure_runtime_confs(builder.getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    build = all_specs()[QUERY].builder
    # one small warm pass primes codegen/parquet footers so the measured
    # run times the plan, not JVM warm-up
    build(spark, "/root/testdata/sf0.001").write.mode("overwrite").format(
        "noop"
    ).save()

    t0 = time.perf_counter()
    build(spark, corpus).write.mode("overwrite").format("noop").save()
    wall = round(time.perf_counter() - t0, 1)

    mem_spilled = disk_spilled = 0
    try:
        base = f"http://localhost:{UI_PORT}/api/v1/applications"
        apps = json.load(urllib.request.urlopen(base, timeout=10))
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(f"{base}/{app_id}/stages", timeout=10)
        )
        mem_spilled = sum(s.get("memoryBytesSpilled", 0) for s in stages)
        disk_spilled = sum(s.get("diskBytesSpilled", 0) for s in stages)
    except Exception as e:  # metrics are the point — surface the failure
        print(f"REST metrics unavailable: {e!r}", file=sys.stderr)

    print(
        json.dumps(
            {
                "mode": mode.lstrip("-"),
                "query": QUERY,
                "corpus": corpus,
                "wall_sec": wall,
                "memory_spilled_gb": round(mem_spilled / 2**30, 2),
                "disk_spilled_gb": round(disk_spilled / 2**30, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
