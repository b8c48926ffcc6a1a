"""Per-operator scale probe: min-of-warm noop-sink walls across corpora.

Generalizes the per-round one-off probes (/tmp/scale_r7ops.py,
/tmp/scale_r8ops.py) that produced SCALE.md's operator curves: for each
requested catalog query, run the builder against each (label, dir)
point, materialize via the noop sink (NEVER .count() — Catalyst prunes
unused expressions under count and times a gutted plan), and report
min-of-warm walls (first run discarded: page cache + stage compilation).

Usage:
    python scripts/op_scale_probe.py QUERY[,QUERY...] \
        LABEL=DIR [LABEL=DIR ...] [--runs 4]

Example (the round-8 curves):
    python scripts/op_scale_probe.py \
        a23b_portable_sketch_merge_rollup,m2b_portable_feature_extract \
        x1=/root/testdata/sf0.1 x10=/tmp/sf1_synth x100=/tmp/sf100_docs
"""

from __future__ import annotations

import argparse
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", help="comma-separated catalog query names")
    ap.add_argument("points", nargs="+", help="LABEL=DIR corpus points")
    ap.add_argument("--runs", type=int, default=4)
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from mric_bak_etl_spark.catalog import all_specs
    from mric_bak_etl_spark.session import get_spark

    spark = get_spark("op-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    points = [p.split("=", 1) for p in args.points]
    for name in args.queries.split(","):
        builder = specs[name].builder
        for label, d in points:
            walls = []
            for _ in range(args.runs):
                t0 = time.time()
                builder(spark, d).write.mode("overwrite").format(
                    "noop"
                ).save()
                walls.append(round(time.time() - t0, 2))
            warm = min(walls[1:]) if len(walls) > 1 else walls[0]
            print(
                f"{name} {label}: walls={walls} min_warm={warm}",
                flush=True,
            )


if __name__ == "__main__":
    main()
