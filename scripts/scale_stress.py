#!/usr/bin/env python
"""10x scale stress: do the headline plans actually scale linearly?

Synthesizes a ~10x corpus from sf0.1 by unioning 10 key-shifted copies
(keys shift so join cardinalities scale honestly; document TEXTS repeat,
so the dedup family faces a corpus where every document has 9 true
duplicates — the adversarial-but-realistic case for l29/l2) and runs a
representative slice of the catalog at 1x and 10x, reporting the runtime
ratio. A plan whose shuffle volume is linear in the input should land
near 10x or below (sub-linear when fixed stage overhead dominates at
1x); a quadratic pair-blowup or a driver-side bottleneck lands far
above. Results land in SCALE.md (manual; not part of the test suite —
this is a ~minutes experiment, run when plans change).

Usage: python scripts/scale_stress.py [out_dir]
       python scripts/scale_stress.py --highdup [out_dir] [n_base] [k]
The --highdup mode builds the l29-vs-l32 crossover corpus (n_base
clusters x k copies; default k=45, just under L29_STOP_CAP) and times
both queries on it; SCALE.md's round-5 section records the k=45
crossover and the round-6 section the k=200 drop-as-boilerplate
regime (k above the cap: both queries must drop the windows, emitting
~nothing at ~flat cost instead of enumerating C(200,2) pairs).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mric_bak_etl_spark.catalog import all_specs
from mric_bak_etl_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
COPIES = 10

# Key columns to shift per copy so ids stay unique and joins scale
# linearly (same shift for both sides of every FK so matches preserve).
KEY_SHIFTS = {
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {"l_orderkey": 10_000_000, "l_suppkey": 1_000_000,
                 "l_partkey": 1_000_000},
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "part": {"p_partkey": 1_000_000},
    "events": {"event_id": 100_000_000, "user_id": 1_000_000},
    # documents shift by 100M, NOT 1M: corpus_with_near_dups plants
    # ground-truth variants at doc_id + 1_000_000 (a fixture-only id
    # range — see its docstring), and a 1M copy shift would alias
    # synth copies with planted variants (found the hard way: aliased
    # ids make two different TEXTS share a doc_id, so Jaccard
    # denominators degenerate and l2b/l2e divide by zero).
    "documents": {"doc_id": 100_000_000},
    "embeddings": {"vec_id": 1_000_000},
    # region/nation: tiny dims, copied once unshifted
    "region": {},
    "nation": {},
}

QUERIES = [
    "a1_pricing_summary",      # scan + wide agg
    "h5_local_supplier_volume",  # 6-way join
    "w3_frames",               # window frames
    "j8_salted_skew_join",     # skew salting
    "l2_minhash_lsh",          # LSH banding under 10x duplication
    "l29_exact_substring_dedup",  # window-hash dedup under 10x duplication
    "g5_user_pagerank",        # iterative rank loop
    "e9_sequence_pattern",     # user-grain CEP
    "l19_kmeans",              # broadcast-centroid clustering
    "l40_incremental_banded_neardup",  # capped band-index probe (r6)
    "s19_replica_checksum_audit",  # two-scan map-side checksum fold (r6)
]


def synth(spark, out_dir: str, copies: int = COPIES,
          tables: tuple[str, ...] | None = None) -> None:
    for name, shifts in KEY_SHIFTS.items():
        if tables is not None and name not in tables:
            continue
        src = spark.read.parquet(os.path.join(SRC, f"{name}.parquet"))
        if not shifts:
            src.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"{name}.parquet")
            )
            continue
        parts = []
        for i in range(copies):
            df = src
            for col, step in shifts.items():
                df = df.withColumn(col, F.col(col) + F.lit(i * step))
            parts.append(df)
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )


def run(spark, specs, sf_dir: str, names) -> dict[str, float]:
    out = {}
    for name in names:
        t0 = time.time()
        specs[name].builder(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        out[name] = round(time.time() - t0, 2)
        print(f"  {name}: {out[name]}s", flush=True)
    return out


def synth_highdup(spark, out_dir: str, n_base: int = 100, k: int = 45) -> None:
    """High-duplication corpus for the l29-vs-l32 crossover: n_base
    distinct documents, each replicated k times under fresh doc_ids —
    ~n_base clusters of duplication multiplicity k. k sits just under
    L29_STOP_CAP (50): above the cap BOTH queries drop the windows as
    boilerplate by design, so the measurable crossover regime is the
    band below it, where l29 enumerates C(k,2) pairs per shared window
    and l32 emits k star edges."""
    src = (
        spark.read.parquet(os.path.join(SRC, "documents.parquet"))
        .filter(F.length("text") >= 40)
        .orderBy("doc_id")
        .limit(n_base)
    )
    parts = []
    for i in range(k):
        parts.append(src.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000)))
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))


def highdup_main() -> None:
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/highdup_synth"
    n_base = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 45
    spark = get_spark("scale-stress-highdup")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    if not os.path.exists(os.path.join(out_dir, "documents.parquet")):
        print(
            f"synthesizing high-dup corpus at {out_dir} "
            f"(n_base={n_base}, k={k})",
            flush=True,
        )
        synth_highdup(spark, out_dir, n_base=n_base, k=k)
    # warm-up on the small corpus primes codegen/workers for both plans;
    # derive the dir explicitly (r5 ADVICE: a str.replace no-ops silently
    # if SRC is repointed) and fall back to the highdup corpus itself.
    warm_dir = os.path.join(os.path.dirname(SRC.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        print(f"warm-up dir {warm_dir} missing; warming on {out_dir}",
              flush=True)
        warm_dir = out_dir
    for name in ("l29_exact_substring_dedup", "l32_substring_dup_clusters"):
        specs[name].builder(spark, warm_dir).write.mode(
            "overwrite"
        ).format("noop").save()
    report = {}
    for name in ("l29_exact_substring_dedup", "l32_substring_dup_clusters"):
        t0 = time.time()
        df = specs[name].builder(spark, out_dir)
        df.write.mode("overwrite").format("noop").save()
        report[name] = {"sec": round(time.time() - t0, 2),
                        "out_rows": df.count()}
        print(f"  {name}: {report[name]}", flush=True)
    print(json.dumps(report, indent=1))


REL_TABLES = ("lineitem", "orders", "customer", "supplier", "part",
              "region", "nation")
REL_QUERIES = ("a1_pricing_summary", "h5_local_supplier_volume",
               "w3_frames", "j8_salted_skew_join")


def relational100_main() -> None:
    """Two-decade relational scale curve: the same slice at 1x/10x/100x.

    The 10x table caps the measured relational range at one decade;
    this extends it to two on the join/window/skew shapes (the
    key-shift synth keeps FK fan-outs constant, so correct cost is
    linear in copies). Documents/events stay out — the dedup family
    has its own 100x curve (scripts/incr_stress.py)."""
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10_synth"
    spark = get_spark("scale-stress-100x")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    if not os.path.exists(os.path.join(out_dir, "lineitem.parquet")):
        print(f"synthesizing 100x relational corpus at {out_dir}",
              flush=True)
        synth(spark, out_dir, copies=100, tables=REL_TABLES)
    print("warm-up", flush=True)
    specs["a1_pricing_summary"].builder(spark, SRC).write.mode(
        "overwrite"
    ).format("noop").save()
    report = {}
    for label, d in (("x1", SRC), ("x10", "/tmp/sf1_synth"),
                     ("x100", out_dir)):
        if not os.path.exists(os.path.join(d, "lineitem.parquet")):
            print(f"skipping {label}: {d} missing", flush=True)
            continue
        print(label, flush=True)
        report[label] = run(spark, specs, d, REL_QUERIES)
    print(json.dumps(report, indent=1))


def graph100_main() -> None:
    """Two-decade iterative-graph scale curve: g5 at 1x/10x/100x.

    g5 reads ONLY events; the key-shift synth gives 100 disjoint copies
    of the sf0.1 co-activity graph (user_id shifts per copy), so nodes,
    edges, and rank rows all scale 100x with no cross-copy edges — the
    honest linear case. The question the curve answers: g5's sf0.1 wall
    is dominated by fixed stage latency (5 aggregation barriers + setup
    jobs on a 1k-node graph); does that overhead amortize into
    sub-linear growth across two decades, as the 10x row claims?
    Min-of-3 warm runs per point (single runs invert orderings on this
    host — SCALE.md round-6 note)."""
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf100_events"
    spark = get_spark("scale-stress-graph100")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    if not os.path.exists(os.path.join(out_dir, "events.parquet")):
        print(f"synthesizing 100x events corpus at {out_dir}", flush=True)
        synth(spark, out_dir, copies=100, tables=("events",))
    report = {}
    for label, d in (("x1", SRC), ("x10", "/tmp/sf1_synth"),
                     ("x100", out_dir)):
        if not os.path.exists(os.path.join(d, "events.parquet")):
            print(f"skipping {label}: {d} missing", flush=True)
            continue
        walls = []
        for _ in range(4):  # first run warms; min of the last 3
            t0 = time.time()
            specs["g5_user_pagerank"].builder(spark, d).write.mode(
                "overwrite"
            ).format("noop").save()
            walls.append(round(time.time() - t0, 2))
        report[label] = {"walls": walls, "min_warm": min(walls[1:])}
        print(f"  g5 {label}: {report[label]}", flush=True)
    print(json.dumps(report, indent=1))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--highdup":
        highdup_main()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--relational100":
        relational100_main()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--graph100":
        graph100_main()
        return
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_synth"
    spark = get_spark("scale-stress")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()

    if not os.path.exists(os.path.join(out_dir, "lineitem.parquet")):
        print(f"synthesizing {COPIES}x corpus at {out_dir}", flush=True)
        synth(spark, out_dir)

    print("warm-up", flush=True)
    specs["a1_pricing_summary"].builder(spark, SRC).write.mode(
        "overwrite"
    ).format("noop").save()

    print("1x (sf0.1)", flush=True)
    base = run(spark, specs, SRC, QUERIES)
    print(f"{COPIES}x", flush=True)
    big = run(spark, specs, out_dir, QUERIES)
    report = {
        q: {"x1_sec": base[q], "x10_sec": big[q],
            "ratio": round(big[q] / base[q], 2)}
        for q in QUERIES
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
