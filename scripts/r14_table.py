#!/usr/bin/env python
"""Emit the OPTIMIZATION_r14.md per-operator table: baseline vs close
bench seconds plus the change tag for each headline query."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SWEPT = set("""a1_pricing_summary a4_rollup j1_inner_equi j2_broadcast_dims
j6_asof w1_ranking u2b_except_all f5_arrays h5_local_supplier_volume
j8_salted_skew_join t1_tumbling_window l2_minhash_lsh l17_semdedup
l18_unigram_lm e4_event_transitions m2_feature_extract
a18_bitmap_exact_distinct j12_interval_overlap_join l19_kmeans
j15_bloom_prejoin r21_incremental_agg g5_user_pagerank
l29_exact_substring_dedup e9_sequence_pattern l38_incremental_exact_dedup
l40_incremental_banded_neardup w10_distributed_running_total
a26_moment_profile s19_replica_checksum_audit
a23b_portable_sketch_merge_rollup m2b_portable_feature_extract
m7_bmp_decode e15_srm_check t13b_streaming_register_maintenance
m8_bmp_channel_stats l41_duplication_profile s21_schema_evolution_read
m9_wav_decode l26b_bpe_encode m10_wav_window_stats
m10b_portable_wav_window_stats m11_ppm_decode m12_zip_manifest
l26c_bpe_encode_persisted m13_zip_deflate_manifest
m14_zip_persisted_manifest l42_incremental_crawl
l43_quality_score_persisted l42b_incremental_crawl_persisted
l42c_crawl_index_maintenance""".split())
GATED = set("""l2_minhash_lsh l29_exact_substring_dedup
l40_incremental_banded_neardup l42_incremental_crawl
l42b_incremental_crawl_persisted l42c_crawl_index_maintenance""".split())
SPREAD = set("""l2_minhash_lsh l29_exact_substring_dedup l4_tokenize_tf
l18_unigram_lm e9_sequence_pattern l17_semdedup l22_slice_divergence
l26b_bpe_encode l26c_bpe_encode_persisted l38_incremental_exact_dedup
l40_incremental_banded_neardup l41_duplication_profile
l42_incremental_crawl l42b_incremental_crawl_persisted
l42c_crawl_index_maintenance m2_feature_extract
m2b_portable_feature_extract m7_bmp_decode m8_bmp_channel_stats
m9_wav_decode m10_wav_window_stats m10b_portable_wav_window_stats
m11_ppm_decode m12_zip_manifest m13_zip_deflate_manifest
m14_zip_persisted_manifest""".split())
ROCKS = {"t13b_streaming_register_maintenance"}


def main() -> None:
    base = json.load(
        open("plans/r14/bench_r14_baseline_detail.json")
    )["queries"]
    close = json.load(open("bench_detail.json"))["queries"]
    rows = []
    for n in sorted(set(base) | set(close)):
        tags = []
        if n in SWEPT:
            tags.append("orderBy dropped")
        if n in GATED:
            tags.append("window gate")
        if n in SPREAD:
            tags.append("sized spread")
        if n in ROCKS:
            tags.append("RocksDB state")
        tag = " + ".join(tags) if tags else "untouched (loader/conf only)"
        b, c = base.get(n), close.get(n)
        d = f"{(1 - c / b) * 100:+.0f}%" if b and c else ""
        rows.append((n, b, c, d, tag))
    print("| query | base | close | delta | change |")
    print("|---|---|---|---|---|")
    for n, b, c, d, tag in rows:
        bs = f"{b:.2f}" if b else "—"
        cs = f"{c:.2f}" if c else "—"
        print(f"| {n} | {bs} | {cs} | {d} | {tag} |")


if __name__ == "__main__":
    main()
