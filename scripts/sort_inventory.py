#!/usr/bin/env python
"""Classify each headline query's plan root: presentational global sort
(Sort at the analyzed-plan root, no limit above it), top-k (GlobalLimit
above the sort), or no final sort. Measurement aid for the r14
final-orderBy item (guide §2.4: "an orderBy used only to make output
deterministic" is a removable exchange).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mric_bak_etl_spark.catalog import all_specs, headline_names  # noqa: E402
from mric_bak_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("mric-bak-etl-spark-sortinv")
    specs = all_specs()
    out: dict[str, str] = {}
    names = sys.argv[1:] or headline_names()
    for name in names:
        try:
            df = specs[name].builder(spark, sf_dir)
            root = df._jdf.queryExecution().analyzed()
            # Walk the top of the logical plan: Sort at root (global) with
            # no Limit above it is presentational; GlobalLimit above Sort
            # is top-k.
            node = root.nodeName()
            if node == "Sort":
                out[name] = "presentational_sort"
            elif node in ("GlobalLimit", "Limit", "Offset"):
                out[name] = "topk"
            else:
                # Sort one level down under a Project is still effectively
                # final ordering followed by projection-only.
                kids = [root.children().apply(i) for i in range(root.children().length())]
                sub = kids[0].nodeName() if kids else ""
                if node == "Project" and sub == "Sort":
                    out[name] = "project_over_sort"
                else:
                    out[name] = f"none({node})"
        except Exception as exc:  # noqa: BLE001
            out[name] = f"error: {exc}"[:120]
    print(json.dumps(out, indent=1))
    counts: dict[str, int] = {}
    for v in out.values():
        k = v.split("(")[0]
        counts[k] = counts.get(k, 0) + 1
    print(json.dumps(counts), file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
