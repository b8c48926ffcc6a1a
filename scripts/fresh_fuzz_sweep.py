"""Fresh-seed (non-derandomized) sweep over every fuzz grammar.

The in-suite fuzz tests are DERANDOMIZED — a fixed regression floor that
runs identically every time. This sweep is the searched depth: every
invocation draws genuinely new cases for all 20 grammars and fails loudly
on the first cross-engine divergence. Round 8 ran 4,050 fresh cases this
way (300 x grammars 1-12, then a reduced budget for the heavier recipe
grammars), zero divergences; the grammar-16 IN-SUITE run had already
falsified the round(sum-of-rounded) composition on its first execution,
which is the discipline this script keeps applying between rounds.

Usage:
    python scripts/fresh_fuzz_sweep.py [--n 300] [--sf /root/testdata/sf0.01]
    python scripts/fresh_fuzz_sweep.py --only psketch,bytemoment --n 100
"""

from __future__ import annotations

import argparse
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=300)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="", help="comma-separated grammar names")
    args = ap.parse_args()

    sys.path.insert(0, ".")
    sys.path.insert(0, "tests")
    import duckdb
    from hypothesis import HealthCheck, given, settings

    import test_fuzz as tf
    import test_properties as tp
    from mric_bak_etl_spark.session import get_spark
    from mric_bak_etl_spark.tables import TABLE_NAMES

    spark = get_spark("fresh-fuzz-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    # (name, strategy, test fn, needs sf_dir kwarg)
    grammars = [
        ("agg", tf.CASES, tf.test_random_agg_plans_agree, True),
        ("join", tf.JOIN_CASES, tf.test_random_join_plans_agree, True),
        ("window", tf.WINDOW_CASES, tf.test_random_window_plans_agree, True),
        ("setop", tf.SETOP_CASES, tf.test_random_setop_plans_agree, True),
        ("subquery", tf.SUBQ_CASES, tf.test_random_subquery_plans_agree, True),
        ("grouping", tf.GROUPING_CASES,
         tf.test_random_grouping_set_plans_agree, True),
        ("range_frame", tf.RANGE_FRAME_CASES,
         tf.test_random_range_frame_plans_agree, True),
        ("variant", tf.VARIANT_CASES,
         tf.test_random_variant_payload_typing_agrees, False),
        ("asof", tf.ASOF_CASES, tf.test_random_asof_joins_agree, True),
        ("hof", tf.HOF_CASES,
         tf.test_random_higher_order_array_plans_agree, True),
        ("datetime", tf.DT_CASES, tf.test_random_datetime_plans_agree, True),
        ("strings", tf.STR_CASES, tf.test_random_string_plans_agree, True),
        ("exact_stat", tf.XSTAT_CASES,
         tf.test_random_exact_stat_plans_agree, True),
        ("audit", tf.AUDIT_CASES,
         tf.test_random_checksum_audits_agree_and_locate_planted_damage,
         True),
        ("psketch", tf.PSKETCH_CASES,
         tf.test_random_portable_sketch_plans_agree, True),
        ("bytemoment", tf.BYTEMOMENT_CASES,
         tf.test_random_byte_moment_plans_agree, True),
        ("wavsum", tf.WAVSUM_CASES,
         tf.test_random_wav_codec_recipes_agree, True),
        ("wavwin", tf.WAVWIN_CASES,
         tf.test_random_wav_window_recipes_agree, True),
        ("zipman", tf.ZIPMAN_CASES,
         tf.test_random_zip_manifest_recipes_agree, True),
        # Grammar 20 (r11 verdict task 6): decoder vs an INDEPENDENT
        # producer — stdlib-zipfile-generated archives (entry counts/
        # sizes/methods/comments/UTF-8 names/streamed bit-3 writers).
        # Pure bytes math: no spark/duck session needed.
        ("zipfile_interop", tp.ZIPFILE_CASES,
         tp.test_zip_decoder_against_zipfile_generated_archives, "pure"),
        # Grammar 21 (r12 verdict task 7): the crawl funnel as a RECIPE —
        # (signature geometry x cap x threshold x duplication regime x
        # batch composition) vs the parameterized funnel-CTE oracle.
        ("crawl", tf.CRAWL_CASES,
         tf.test_random_crawl_funnel_recipes_agree, True),
    ]
    only = {g for g in args.only.split(",") if g}
    cfg = settings(
        max_examples=args.n,
        deadline=None,
        suppress_health_check=list(HealthCheck),
        derandomize=False,
    )
    for name, strat, test, needs_sf in grammars:
        if only and name not in only:
            continue
        inner = test.hypothesis.inner_test

        def make_body(fn, mode):
            # closure factory: @given rejects functions with defaults
            if mode == "pure":  # no session: pure bytes-math grammar
                def body(case):
                    fn(case=case)
            elif mode:
                def body(case):
                    fn(spark=spark, duck=con, sf_dir=args.sf, case=case)
            else:
                def body(case):
                    fn(spark=spark, duck=con, case=case)
            return body

        body = make_body(inner, needs_sf)
        t0 = time.time()
        cfg(given(case=strat)(body))()
        print(
            f"{name}: {args.n} fresh cases clean in {time.time() - t0:.1f}s",
            flush=True,
        )
    print("ALL SWEEPS CLEAN", flush=True)


if __name__ == "__main__":
    main()
