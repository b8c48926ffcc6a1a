#!/usr/bin/env python
"""Repair economics: does s20's phase-2 cost track the DAMAGE, not the table?

s19+s20's claim is two-phase anti-entropy: phase 1 exchanges #buckets
checksum rows; phase 2 re-reads only flagged buckets. The registered
fixture is deliberately divergence-DENSE (~40% of buckets flagged at
every scale — SCALE.md round-6 calls it s20's worst case), so the claim
that sparse damage collapses phase-2 cost is asserted, not measured.
This probe measures it on the 100x relational synth (15M orders):

  dense   — the fixture mods (del 997 / upd 1499): ~every-40th-bucket
            damage, flat parquet layout. The registered worst case.
  sparse  — one large prime deletion mod (~10 damaged keys): a handful
            of flagged buckets, same flat layout. Phase 2 still SCANS
            the whole table twice (the filter is post-scan), so the
            win is join/sort volume only.
  sparse+partitioned — same sparse damage, but the replicas live in
            the s4 layout (parquet partitioned by the audit bucket) and
            phase 2 filters on the flagged-bucket list, so the scan
            itself partition-prunes to the damage. This is the
            production posture the s20 doc promises at 100 TB.

Usage: python scripts/repair_stress.py [corpus_dir]
Expects the 100x synth at /tmp/sf10_synth (scripts/scale_stress.py
--relational100 builds it); writes the bucket-partitioned copy once
under /tmp/repair_corpus. Min-of-2 warm walls per variant.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from mric_bak_etl_spark.pipeline.lifecycle import (
    _S19_BUCKETS,
    _S19_DEL_MOD,
    _S19_HV_SPARK,
    _S19_SUM,
    _S19_UPD_MOD,
    _s19_canon,
)
from mric_bak_etl_spark.session import get_spark
from mric_bak_etl_spark.tables import materialize

SRC = "/tmp/sf10_synth"
PART_DIR = "/tmp/repair_corpus/orders_by_bucket"
SPARSE_DEL = 1_499_917  # prime; ~10 keys in the 15M-row synth


def damaged_rows(orders: DataFrame, price_expr: str, where: str | None,
                 bucket_from_file: bool = False) -> DataFrame:
    df = orders.filter(F.expr(where)) if where else orders
    # In the partitioned layout the audit bucket IS the partition column
    # read back from the directory structure — filtering on it prunes
    # the scan; recomputing it from o_orderkey would not.
    bucket = (
        F.col("bucket")
        if bucket_from_file
        else F.expr(f"o_orderkey % {_S19_BUCKETS}").alias("bucket")
    )
    return df.select(
        "o_orderkey",
        bucket,
        F.expr(f"md5({_s19_canon(price_expr)})").alias("h"),
    )


def audit_buckets(prim: DataFrame, repl: DataFrame) -> DataFrame:
    def agg(df: DataFrame) -> DataFrame:
        return (
            df.select("bucket", F.expr(_S19_HV_SPARK).alias("hv"))
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.expr("bit_xor(hv)").alias("x"),
                F.expr(_S19_SUM).alias("s"),
            )
        )

    p, r = agg(prim).alias("p"), agg(repl).alias("r")
    return materialize(
        p.join(r, F.col("p.bucket") == F.col("r.bucket"), "full_outer")
        .filter(
            ~F.col("p.n").eqNullSafe(F.col("r.n"))
            | ~F.col("p.x").eqNullSafe(F.col("r.x"))
            | ~F.col("p.s").eqNullSafe(F.col("r.s"))
        )
        .select(F.coalesce("p.bucket", "r.bucket").alias("bucket"))
    )


def phase2(prim: DataFrame, repl: DataFrame, diverged: DataFrame,
           bucket_list: list[int] | None = None) -> DataFrame:
    if bucket_list is not None:
        # Partitioned posture: the flagged buckets (<= _S19_BUCKETS
        # scalars — bounded by the audit design, the same class as a
        # node count) become a partition-column IN filter, so the scan
        # itself prunes to the damaged directories. DPP via the
        # broadcast semi-join is the no-collect alternative; the
        # explicit literal filter keeps the measurement deterministic.
        prim = prim.filter(F.col("bucket").isin(bucket_list))
        repl = repl.filter(F.col("bucket").isin(bucket_list))
    pf = prim.join(F.broadcast(diverged), "bucket", "left_semi").alias("pf")
    rf = repl.join(F.broadcast(diverged), "bucket", "left_semi").alias("rf")
    joined = pf.join(
        rf, F.col("pf.o_orderkey") == F.col("rf.o_orderkey"), "full_outer"
    )
    return (
        joined.filter(
            F.col("pf.o_orderkey").isNull()
            | F.col("rf.o_orderkey").isNull()
            | (F.col("pf.h") != F.col("rf.h"))
        )
        .select(
            F.coalesce("pf.o_orderkey", "rf.o_orderkey").alias("o_orderkey"),
            F.when(F.col("rf.o_orderkey").isNull(), "missing_in_replica")
            .when(F.col("pf.o_orderkey").isNull(), "missing_in_primary")
            .otherwise("value_drift")
            .alias("status"),
        )
    )


def run_variant(spark, label: str, orders: DataFrame, del_mod: int,
                upd_mod: int, partitioned: bool) -> None:
    upd_price = (
        f"CASE WHEN o_orderkey % {upd_mod} = 0 "
        "THEN o_totalprice + 1.0 ELSE o_totalprice END"
        if upd_mod
        else "o_totalprice"
    )
    where = f"o_orderkey % {del_mod} <> 0" if del_mod else None
    prim = damaged_rows(orders, "o_totalprice", None, partitioned)
    repl = damaged_rows(orders, upd_price, where, partitioned)
    t0 = time.time()
    diverged = audit_buckets(prim, repl)
    flagged = [r["bucket"] for r in diverged.collect()]
    t1 = time.time()
    bucket_list = flagged if partitioned else None
    walls = []
    for _ in range(2):
        t = time.time()
        out = phase2(prim, repl, diverged, bucket_list)
        n_rows = out.count()
        walls.append(round(time.time() - t, 2))
    print(
        f"{label}: audit={t1 - t0:.2f}s flagged_buckets={len(flagged)} "
        f"phase2={walls} repair_rows={n_rows} partitioned={partitioned}",
        flush=True,
    )


def main() -> None:
    spark = get_spark("repair-stress")
    spark.sparkContext.setLogLevel("ERROR")
    src = sys.argv[1] if len(sys.argv) > 1 else SRC
    flat = spark.read.parquet(f"{src}/orders.parquet")
    if not os.path.exists(PART_DIR):
        print(f"writing bucket-partitioned copy at {PART_DIR}", flush=True)
        flat.withColumn(
            "bucket", F.expr(f"o_orderkey % {_S19_BUCKETS}")
        ).write.mode("overwrite").partitionBy("bucket").parquet(PART_DIR)
    part = spark.read.parquet(PART_DIR)

    run_variant(spark, "dense_flat", flat, _S19_DEL_MOD, _S19_UPD_MOD, False)
    run_variant(spark, "sparse_flat", flat, SPARSE_DEL, 0, False)
    run_variant(spark, "sparse_partitioned", part, SPARSE_DEL, 0, True)
    spark.stop()


if __name__ == "__main__":
    main()
