"""Skew-join stress: measure AQE skew-splitting vs manual salting.

SCALE.md's dedup rows show the engine's *algorithmic* scale behavior;
this script measures the *physical* skew story the 100 TB posture
depends on (brief: "skewed keys hurt ... salting for skew, AQE for
runtime re-plan"). It synthesizes a deliberately skewed fact table —
sf0.1 lineitem plus N_HOT extra lines all carrying ONE order key — and
times the same fact-to-fact shuffle join three ways:

  1. baseline   — sort-merge join, AQE off: the hot key's entire
                  posting lands in one task (the straggler regime).
  2. aqe        — AQE on with skew-join splitting: Spark re-plans at
                  runtime, splitting the oversized partition into
                  advisory-sized chunks and replicating the build side
                  per chunk. No query change.
  3. salted     — the j8_salted_skew_join recipe: hot keys detected by
                  a sampled count, probe side salted pmod(hash, 32),
                  build side exploded 32 ways for hot keys only.

Broadcast is disabled throughout (autoBroadcastJoinThreshold=-1): at
100 TB both join sides are fact-sized, which is the only regime where
key skew matters — a broadcast join has no shuffle to skew.

AQE's skew thresholds are tuned DOWN to fixture scale
(skewedPartitionThresholdInBytes / advisoryPartitionSizeInBytes = 8m)
for the same reason SCALE.md's spill probe shrank the memory pool
instead of growing the data: the mechanism under test is triggered by a
RATIO (hot partition vs advisory size), so shrinking the trigger is the
honest local proxy for growing the data 1000x. The 256 MB production
default corresponds to the same hot/average ratio at cluster scale.

Usage:
    python scripts/skew_stress.py [n_hot_rows]   # default 12_000_000

Writes the skew corpus once under /tmp/skew_corpus (reused across
runs); prints one result line per variant plus whether the AQE plan
actually marked the join skew=true (the mechanism, not just the wall).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CORPUS = "/tmp/skew_corpus"
N_HOT_DEFAULT = 12_000_000
N_SALTS = 32


def build_corpus(spark: SparkSession, n_hot: int) -> None:
    """sf0.1 lineitem + n_hot rows on ONE existing order key."""
    li = spark.read.parquet(f"{SRC}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity"
    )
    hot_key = li.groupBy("l_orderkey").count().orderBy(F.desc("count"), F.asc("l_orderkey")).first()["l_orderkey"]
    # The payload must be INCOMPRESSIBLE: a cyclic quantity plus the
    # constant hot key lz4-compresses the hot shuffle partition below
    # any realistic skew threshold and the experiment silently measures
    # nothing (first attempt did exactly that — column pruning left only
    # the constant key and the partition shrank to ~nothing). Random
    # doubles keep the shuffled bytes proportional to the row count,
    # like real fact payloads are.
    hot = spark.range(n_hot).select(
        F.lit(hot_key).cast("long").alias("l_orderkey"),
        (F.col("id") % 1000).cast("int").alias("l_linenumber"),
        (F.col("id") % 20000 + 1).cast("long").alias("l_partkey"),
        (F.rand(seed=7) * 50.0).alias("l_quantity"),
    )
    li.unionByName(hot).write.mode("overwrite").parquet(f"{CORPUS}/lineitem_skew")
    spark.read.parquet(f"{SRC}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    ).write.mode("overwrite").parquet(f"{CORPUS}/orders")
    with open(f"{CORPUS}/hot_key.txt", "w") as fh:
        fh.write(str(hot_key))


def the_join(spark: SparkSession, salted: bool) -> DataFrame:
    """The measured query: skewed-fact x orders shuffle join + agg.

    The agg result is key-skew-invariant (same rows either way), so all
    three variants are value-comparable; only the join's physical
    partitioning differs.
    """
    li = spark.read.parquet(f"{CORPUS}/lineitem_skew")
    o = spark.read.parquet(f"{CORPUS}/orders")
    if not salted:
        j = li.join(o, li.l_orderkey == o.o_orderkey)
    else:
        # j8's recipe, inlined: sampled hot-key detection, hot-only salt.
        rate, threshold = 0.01, 5000
        hot_keys = [
            r["l_orderkey"]
            for r in li.sample(fraction=rate, seed=42)
            .groupBy("l_orderkey")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") > threshold * rate)
            .orderBy(F.desc("c"), F.asc("l_orderkey"))
            .limit(32)
            .collect()
        ]
        li_hot = F.col("l_orderkey").isin(hot_keys) if hot_keys else F.lit(False)
        o_hot = F.col("o_orderkey").isin(hot_keys) if hot_keys else F.lit(False)
        sli = li.withColumn(
            "salt",
            F.when(
                li_hot,
                F.pmod(
                    F.xxhash64("l_orderkey", "l_linenumber", "l_partkey"),
                    F.lit(N_SALTS),
                ).cast("int"),
            ).otherwise(F.lit(0)),
        )
        so = o.select(
            "o_orderkey",
            "o_orderpriority",
            F.explode(
                F.when(
                    o_hot, F.sequence(F.lit(0), F.lit(N_SALTS - 1))
                ).otherwise(F.array(F.lit(0)))
            ).alias("salt"),
        )
        j = sli.join(
            so,
            (sli.l_orderkey == so.o_orderkey) & (sli.salt == so.salt),
        )
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_quantity"), 4).alias("total_qty"),
        )
        .orderBy("o_orderpriority")
    )


def run_variant(name: str, confs: dict, salted: bool, runs: int = 2) -> None:
    builder = SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    ).appName(f"skew-{name}")
    for k, v in confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try:
        walls = []
        for _ in range(runs):
            t0 = time.perf_counter()
            rows = the_join(spark, salted).collect()
            walls.append(round(time.perf_counter() - t0, 1))
        # Evidence the AQE mechanism fired: the final (adaptive) plan
        # marks the sort-merge join skew=true when a partition was split.
        plan = the_join(spark, salted)
        plan.collect()
        final_plan = plan._jdf.queryExecution().executedPlan().toString()
        skew_marked = "skew=true" in final_plan
        print(
            f"RESULT {name}: walls={walls}s skew_split_in_plan={skew_marked} "
            f"rows={len(rows)}",
            flush=True,
        )
    finally:
        spark.stop()


COMMON = {
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
    "spark.ui.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
}


def main() -> None:
    n_hot = int(sys.argv[1]) if len(sys.argv) > 1 else N_HOT_DEFAULT
    if not os.path.exists(f"{CORPUS}/hot_key.txt"):
        spark = (
            SparkSession.builder.master("local[32]")
            .appName("skew-build")
            .config("spark.driver.memory", COMMON["spark.driver.memory"])
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        build_corpus(spark, n_hot)
        spark.stop()
        print(f"corpus built: sf0.1 lineitem + {n_hot} hot rows", flush=True)

    run_variant(
        "baseline_aqe_off",
        {**COMMON, "spark.sql.adaptive.enabled": "false"},
        salted=False,
    )
    run_variant(
        "aqe_skew_split",
        {
            **COMMON,
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            # fixture-scale trigger (see module doc): production keeps the
            # 256m default; the RATIO hot/advisory is what's under test.
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
        },
        salted=False,
    )
    run_variant(
        "manual_salted",
        {**COMMON, "spark.sql.adaptive.enabled": "false"},
        salted=True,
    )


if __name__ == "__main__":
    main()
