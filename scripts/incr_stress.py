"""Incremental dedup vs corpus growth: persisted index, fixed increment.

SCALE.md's 10x rows time the REGISTERED incremental queries, which
rebuild the corpus index inline every run — fine at 10x where the build
is overhead-dominated, but at larger corpora the inline build dominates
the wall and hides the property that matters: per-crawl cost must track
the INCREMENT, not the corpus. This probe separates the two terms the
way production would (l40's doc: "the index is the persisted artifact,
the per-crawl cost is O(|new| + capped probe)"):

  build  — corpus -> shingle table + capped MinHash band index (l40's
           index path, same library functions), written to parquet.
           One-time / amortized across crawls.
  probe  — a FIXED increment (truncated revisions of the 5,000 real
           base docs that must match, fresh docs that must not, and
           ONE boilerplate doc that must cap out to zero candidates)
           band-probes the PERSISTED index and exact-verifies band
           survivors against the persisted shingle table. Per-crawl.

The corpus carries l40's planted boilerplate cluster
(L40_BOILER_COPIES identical docs) at every size, so the posting-list
cap is exercised end-to-end: dropped at index build, zero candidates
at probe — this is the REGISTERED l40 composition run against a
persisted index, not just its happy path.

Corpus sizes 1x / 10x / 100x (5 k / 50 k / 500 k docs): the 5 k real
sf0.1 documents plus (k-1) x 5 k synthetic docs whose texts are sha2
token streams — unique by construction, like mostly-unique crawl mass;
corpus growth adds index entries, NOT near-duplicates, so the probe's
output is identical at every size and any wall growth is pure
index-size cost.

Also times the l38 analog (md5 exact-hash index, same persisted-probe
split) — the cheapest incremental shape as the baseline.

Usage: python scripts/incr_stress.py
Writes corpora + indexes under /tmp/incr_corpus (reused if present).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mric_bak_etl_spark.llm.dedup import (
    _L40_BOILER_TEXT,
    L40_BOILER_COPIES,
    L40_MAX_POSTING,
    band_hashes,
    minhash_signatures,
    shingle_hashes,
)
from mric_bak_etl_spark.llm.text import tokens  # noqa: F401  (revision build)
from mric_bak_etl_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
BASE_DIR = "/tmp/incr_corpus_v2"  # v2: corpora carry the l40 boiler block
SIZES = (1, 10, 100)
N_TOK = 60  # synthetic doc length ~ real doc token count


def synth_corpus(spark: SparkSession, k: int, out: str) -> None:
    base = spark.read.parquet(f"{SRC}/documents.parquet").select("doc_id", "text")
    n_base = base.count()
    parts = [base]
    if k > 1:
        # Unique noise docs: sha2 token streams share no shingles with
        # anything (each token is an 8-hex-char word keyed by doc+pos).
        noise = spark.range((k - 1) * n_base).select(
            (F.col("id") + 100_000_000).alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(N_TOK)),
                    lambda j: F.substring(
                        F.sha2(
                            F.concat(F.col("id").cast("string"), F.lit("-"), j.cast("string")),
                            256,
                        ),
                        1,
                        8,
                    ),
                ),
            ).alias("text"),
        )
        parts.append(noise)
    # The l40 boilerplate cluster rides along at EVERY corpus size:
    # L40_BOILER_COPIES identical disclaimer docs whose band posting
    # lists exceed the cap, so the index build must drop them and the
    # boiler probe doc must produce zero candidates — the full l40
    # composition, not just its happy path.
    boiler = spark.range(L40_BOILER_COPIES).select(
        (F.col("id") + 8_000_000).alias("doc_id"),
        F.lit(_L40_BOILER_TEXT).alias("text"),
    )
    parts.append(boiler)
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.write.mode("overwrite").parquet(out)


def fixed_increment(spark: SparkSession) -> DataFrame:
    """Same probe batch regardless of corpus size: truncated revisions
    of base docs (must match their source) + fresh docs (must not)."""
    base = spark.read.parquet(f"{SRC}/documents.parquet").select("doc_id", "text")

    revisions = base.filter(F.col("doc_id") % 10 == 4).select(
        (F.col("doc_id") + 9_000_000).alias("doc_id"),
        F.array_join(
            F.slice(tokens(), 1, F.greatest(F.size(tokens()) - 5, F.lit(1))), " "
        ).alias("text"),
    )
    fresh = base.filter(F.col("doc_id") % 10 == 6).select(
        (F.col("doc_id") + 9_500_000).alias("doc_id"),
        F.concat(
            F.lit("fresh content "), F.col("doc_id").cast("string"),
            F.lit(" entirely new tokens"),
        ).alias("text"),
    )
    # l40's third probe class: one boilerplate doc that would fan out to
    # every planted copy without the posting cap and must generate ZERO
    # candidates with it (drop-as-boilerplate).
    boiler_probe = spark.range(1).select(
        F.lit(9_999_999).cast("long").alias("doc_id"),
        F.lit(_L40_BOILER_TEXT).alias("text"),
    )
    return revisions.unionByName(fresh).unionByName(boiler_probe)


def build_index(spark: SparkSession, corpus_path: str, idx_dir: str) -> float:
    t0 = time.perf_counter()
    corpus = spark.read.parquet(corpus_path)
    corpus_sh = corpus.select("doc_id", shingle_hashes().alias("sh"))
    corpus_sh.write.mode("overwrite").parquet(f"{idx_dir}/shingles")
    corpus_sh = spark.read.parquet(f"{idx_dir}/shingles")
    index = band_hashes(minhash_signatures(corpus_sh))
    hot = (
        index.groupBy("band", "band_hash")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > L40_MAX_POSTING)
        .select("band", "band_hash")
    )
    index.join(F.broadcast(hot), ["band", "band_hash"], "left_anti").write.mode(
        "overwrite"
    ).parquet(f"{idx_dir}/bands")
    # l38 analog: exact md5 index.
    corpus.select(F.md5("text").alias("h")).distinct().write.mode(
        "overwrite"
    ).parquet(f"{idx_dir}/md5")
    return round(time.perf_counter() - t0, 2)


def probe_banded(spark: SparkSession, idx_dir: str, nb_sh: DataFrame) -> tuple[float, int]:
    t0 = time.perf_counter()
    capped = spark.read.parquet(f"{idx_dir}/bands").select(
        F.col("doc_id").alias("match_doc"), "band", "band_hash"
    )
    corpus_sh = spark.read.parquet(f"{idx_dir}/shingles")
    probe = band_hashes(minhash_signatures(nb_sh)).withColumnRenamed("doc_id", "new_id")
    cands = (
        F.broadcast(probe)
        .join(capped, ["band", "band_hash"])
        .select("new_id", "match_doc")
        .distinct()
    )
    out = (
        F.broadcast(cands)
        .join(nb_sh.select(F.col("doc_id").alias("new_id"), F.col("sh").alias("a")), "new_id")
        .join(
            corpus_sh.select(F.col("doc_id").alias("match_doc"), F.col("sh").alias("b")),
            "match_doc",
        )
        .select(
            "new_id",
            "match_doc",
            (
                F.size(F.array_intersect("a", "b")).cast("double")
                / F.size(F.array_union("a", "b"))
            ).alias("j"),
        )
        .filter(F.col("j") >= 0.5)
    )
    n = out.count()
    wall = round(time.perf_counter() - t0, 2)
    # Cap assertion, end-to-end: the boilerplate probe doc must survive
    # to zero candidates at every corpus size (its corpus copies were
    # dropped at index build).
    n_boiler = out.filter(F.col("new_id") == 9_999_999).count()
    return wall, n, n_boiler


def probe_exact(spark: SparkSession, idx_dir: str, nb: DataFrame) -> tuple[float, int]:
    t0 = time.perf_counter()
    idx = spark.read.parquet(f"{idx_dir}/md5")
    hits = (
        nb.select("doc_id", F.md5("text").alias("h"))
        .join(idx, "h", "left_semi")
        .count()
    )
    return round(time.perf_counter() - t0, 2), hits


def main() -> None:
    spark = get_spark("incr-stress")
    spark.sparkContext.setLogLevel("ERROR")
    nb = fixed_increment(spark)
    nb_sh = nb.select("doc_id", shingle_hashes().alias("sh"))
    nb_sh.cache().count()  # increment is fixed; pin it once
    for k in SIZES:
        cdir = f"{BASE_DIR}/{k}x/documents"
        idir = f"{BASE_DIR}/{k}x/index"
        if not os.path.exists(cdir):
            synth_corpus(spark, k, cdir)
        build_s = build_index(spark, cdir, idir)
        # Warm + measure probe twice (first read populates page cache).
        p1, n1, b1 = probe_banded(spark, idir, nb_sh)
        p2, n2, b2 = probe_banded(spark, idir, nb_sh)
        e1, h1 = probe_exact(spark, idir, nb)
        e2, h2 = probe_exact(spark, idir, nb)
        assert b1 == b2 == 0, f"boilerplate cap leaked: {b1}/{b2}"
        print(
            f"RESULT {k}x: docs={5000 * k + L40_BOILER_COPIES} "
            f"build={build_s}s "
            f"banded_probe={p1}/{p2}s out={n1}/{n2} boiler={b1}/{b2} "
            f"exact_probe={e1}/{e2}s hits={h1}/{h2}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
