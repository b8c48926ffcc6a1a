#!/usr/bin/env python
"""Dump .explain('formatted') for named catalog queries to plans/r13/.

Usage: python scripts/dump_plans.py <suffix> <name> [<name> ...]
Writes plans/r13/<name>_<suffix>.txt. Measurement aid for the
optimization rounds (guide §1: capture the plan before and after).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mric_bak_etl_spark.catalog import all_specs  # noqa: E402
from mric_bak_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r13",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("mric-bak-etl-spark-plans")
    specs = all_specs()
    for name in names:
        df = specs[name].builder(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
