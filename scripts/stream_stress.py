"""Structured Streaming throughput probe: rows/sec through stateful ops.

SCALE.md measures the batch families (dedup, joins, iterative, skew,
spill); this probe extends it to the streaming family, which until now
was correctness-tested (exactly-once, watermark cutoffs, sink-log
handoff) but never throughput-measured. Three pipelines, each driven by
the `rate` source (in-JVM row generator — measures the ENGINE path, not
a network source) at an offered load high enough to saturate:

  1. window_agg — watermark + 10 s tumbling window, count/sum per
     (window, key % 1000): the t1/t4 shape. State = open windows x
     keys; the partial agg before the state store is Spark's map-side
     combine, so per-batch shuffle volume is bounded by (windows x
     keys), not input rows.
  2. stateful_dedup — dropDuplicatesWithinWatermark on a 10%-duplicate
     key stream: the t5/t11 shape. State = distinct keys in the
     watermark horizon; every input row probes the state store.
  3. stream_static_join — rate stream broadcast-joined to a static
     dimension + agg: the t8 shape. Stateless join (broadcast), so
     throughput should approach the window_agg path.

Each runs ~40 s with a 5 s trigger; reported numbers are the mean and
max of `processedRowsPerSecond` across completed micro-batches (the
first batch is warm-up and excluded), plus state-store rows where the
operator keeps state. Rows/sec here is per 32 local threads; on a
1000-executor cluster the same per-core figure applies per executor
core since every pipeline shuffles only (key-bounded) aggregate state,
never raw input.

Usage: python scripts/stream_stress.py [rows_per_sec]   # default 2_000_000
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

RATE = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
RUN_SECONDS = 40
TRIGGER = "5 seconds"


def rate_stream(spark: SparkSession, rows_per_sec: int):
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_sec)
        .option("numPartitions", 32)
        .load()
    )


def probe(name: str, build) -> None:
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName(f"stream-stress-{name}")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ckpt = tempfile.mkdtemp(prefix=f"stream_stress_{name}_")
    try:
        q = (
            build(spark)
            .writeStream.outputMode("update")
            .format("noop")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime=TRIGGER)
            .start()
        )
        deadline = time.time() + RUN_SECONDS
        progresses = []
        seen = set()
        while time.time() < deadline:
            time.sleep(2)
            p = q.lastProgress
            if p and p["batchId"] not in seen and p["numInputRows"] > 0:
                seen.add(p["batchId"])
                progresses.append(p)
        q.stop()
        # First completed batch is warm-up (codegen + state-store open).
        steady = progresses[1:] if len(progresses) > 1 else progresses
        rps = [p["processedRowsPerSecond"] for p in steady]
        state_rows = max(
            (
                op.get("numRowsTotal", 0)
                for p in steady
                for op in p.get("stateOperators", [])
            ),
            default=0,
        )
        batch_ms = [p["durationMs"].get("triggerExecution", 0) for p in steady]
        print(
            f"RESULT {name}: offered={RATE}/s batches={len(steady)} "
            f"mean_rows_per_sec={int(sum(rps) / max(len(rps), 1))} "
            f"max_rows_per_sec={int(max(rps, default=0))} "
            f"state_rows={state_rows} batch_ms={batch_ms}",
            flush=True,
        )
    finally:
        spark.stop()
        import shutil

        shutil.rmtree(ckpt, ignore_errors=True)


def window_agg(spark: SparkSession):
    r = rate_stream(spark, RATE)
    return (
        r.withColumn("key", F.col("value") % 1000)
        .withWatermark("timestamp", "10 seconds")
        .groupBy(F.window("timestamp", "10 seconds"), "key")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
    )


def stateful_dedup(spark: SparkSession):
    # 10% duplicate keys: value % (RATE // 10) collides within a batch.
    r = rate_stream(spark, RATE)
    return (
        r.withColumn("event_id", F.col("value") % F.lit(int(RATE * 0.9)))
        .withWatermark("timestamp", "10 seconds")
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n"))
    )


def stream_static_join(spark: SparkSession):
    dim = spark.range(1000).select(
        F.col("id").alias("key"), (F.col("id") % 7).alias("bucket")
    )
    r = rate_stream(spark, RATE)
    return (
        r.withColumn("key", F.col("value") % 1000)
        .join(F.broadcast(dim), "key")
        .withWatermark("timestamp", "10 seconds")
        .groupBy(F.window("timestamp", "10 seconds"), "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def main() -> None:
    probe("window_agg", window_agg)
    probe("stateful_dedup", stateful_dedup)
    probe("stream_static_join", stream_static_join)


if __name__ == "__main__":
    main()
