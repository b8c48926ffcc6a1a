#!/usr/bin/env python
"""Isolated noop-sink timing for named catalog queries (guide §1.4).

Usage: python scripts/time_queries.py [-n RUNS] [--no-warmup] <name> [...]
Prints per-query min/median over RUNS measured passes (after one untimed
warm-up pass unless --no-warmup). Same timing methodology as bench.py,
without the other 60 queries' interleave — the clean A/B instrument.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mric_bak_etl_spark.catalog import all_specs  # noqa: E402
from mric_bak_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    warmup = True
    if "-n" in args:
        i = args.index("-n")
        runs = int(args[i + 1])
        del args[i : i + 2]
    if "--no-warmup" in args:
        warmup = False
        args.remove("--no-warmup")
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("mric-bak-etl-spark-ab")
    specs = all_specs()
    out: dict[str, dict[str, float]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"ab:{name}")
        if warmup:
            specs[name].builder(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
        samples: list[float] = []
        for _ in range(runs):
            start = time.perf_counter()
            specs[name].builder(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            samples.append(round(time.perf_counter() - start, 3))
        out[name] = {
            "min": min(samples),
            "med": round(statistics.median(samples), 3),
            "all": samples,
        }
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
