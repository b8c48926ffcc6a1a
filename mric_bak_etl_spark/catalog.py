"""Query catalog: the driver-verified contract surface.

Every operator the engine implements registers here as a named
:class:`QuerySpec` — a Spark builder ``(spark, sf_dir) -> DataFrame`` plus,
when the semantics are ANSI-SQL-expressible, the equivalent DuckDB oracle
SQL. ``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over
this registry, so "implemented" and "driver-verified" stay the same set by
construction (SURVEY.md §2B: one entry per operator).

Conventions that keep the value-hash compare stable (SURVEY §7 risk #4):

- alias every computed/aggregate column identically in Spark and SQL;
- round floating aggregates to 4 decimals on BOTH sides (sum-of-doubles is
  order-sensitive in the last ulps; partial aggregation order differs
  between engines). Known residual risk, observed via fuzzing: a true
  value landing exactly on a .xxxx5 boundary lets that last-ulp noise
  flip the rounded digit between engines — fixed fixtures are verified
  clear of it, and queries whose Spark/oracle sides sum structurally
  DIFFERENT terms (r21's IVM) round coarser (2dp) for margin;
- cast DuckDB integer SUMs to BIGINT (DuckDB widens to HUGEINT, Spark keeps
  LONG);
- top-k queries always carry a unique tiebreak key in the ORDER BY.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkBuilder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: SparkBuilder
    oracle: str | None  # DuckDB SQL; None → driver does a rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[SparkBuilder], SparkBuilder]:
    """Decorator: add a query builder to the catalog under ``name``."""

    def deco(fn: SparkBuilder) -> SparkBuilder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags
        )
        return fn

    return deco


def _load_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    import mric_bak_etl_spark.operators.aggregates  # noqa: F401
    import mric_bak_etl_spark.operators.projection  # noqa: F401
    import mric_bak_etl_spark.operators.joins  # noqa: F401
    import mric_bak_etl_spark.operators.subqueries  # noqa: F401
    import mric_bak_etl_spark.operators.tpch  # noqa: F401
    import mric_bak_etl_spark.operators.setops  # noqa: F401
    import mric_bak_etl_spark.operators.sort  # noqa: F401
    import mric_bak_etl_spark.operators.events  # noqa: F401
    import mric_bak_etl_spark.operators.graph  # noqa: F401
    import mric_bak_etl_spark.operators.windows  # noqa: F401
    import mric_bak_etl_spark.functions.scalar  # noqa: F401
    import mric_bak_etl_spark.pipeline.queries  # noqa: F401
    import mric_bak_etl_spark.pipeline.lifecycle  # noqa: F401
    import mric_bak_etl_spark.pipeline.blob_source  # noqa: F401
    import mric_bak_etl_spark.streaming.windows  # noqa: F401
    import mric_bak_etl_spark.streaming.stateful  # noqa: F401
    import mric_bak_etl_spark.llm.dedup  # noqa: F401
    import mric_bak_etl_spark.llm.similarity  # noqa: F401
    import mric_bak_etl_spark.llm.text  # noqa: F401
    import mric_bak_etl_spark.llm.sampling  # noqa: F401
    import mric_bak_etl_spark.llm.multimodal  # noqa: F401


def all_specs() -> dict[str, QuerySpec]:
    _load_modules()
    return dict(_REGISTRY)


# Verification order — round 3 rotation. The driver's correctness run is
# time-budgeted (~50 entries/round); rounds 1-2 drove 78 distinct queries
# green, so this round front-loads what has no driver row yet: the
# flagship canary, then the 14 SURVEY §2B operators the budget never
# reached (VERDICT r2 item 1), then the 31 round-3 additions (brand-new —
# highest verification risk), then the not-yet-verified remainder
# cheapest-first (measured at sf0.01, warm session — /tmp profile
# 2026-08-13). Entries whose check is rows-only by design (no oracle) are
# demoted — they yield weaker driver rows. Already-green queries follow in
# sorted order; the local parity suite (tests/test_oracle_parity.py, plus
# the full-catalog hostile-session value replay run before every round-3
# commit: 228 value-matched, 0 failures) remains the regression guard.
_VERIFY_FIRST: tuple[str, ...] = (
    "a1_pricing_summary", "s2_file_manifest", "t4_watermark_cutoff",
    "l5_slice_stats", "f5_arrays", "f4_conditional",
    "f6_map_struct", "o1_multikey_sort", "s3_snapshot_roundtrip",
    "t2_sliding_window", "t3_session_window", "x2_grouped_pandas_agg",
    "w2_lag_lead", "x1_unzip_payload", "f3_math",
    # round-3 additions (never driver-sampled; highest verification risk)
    "j13_null_safe_join", "j15_bloom_prejoin", "u4_intersect_all",
    "a20_approx_topk", "tx_entropy", "l21_bottomk_sample",
    "l22_slice_divergence", "g4_triangle_count", "s14_time_travel",
    "t10_foreach_batch_upsert", "f26_regexp_family", "q5_sql_udf",
    "x9_iter_pandas_udf", "q6_pipe_syntax", "r21_incremental_agg",
    "l23_containment_neardup", "dq6_schema_drift", "e8_attribution",
    "a23_sketch_rollup", "w8_interpolation", "l24_bigram_lm",
    "l25_url_dedup", "l3e_pq_topk", "f27_csv_expressions",
    "q7_exec_immediate", "q8_sql_scripting", "t11_dedup_within_watermark",
    "o5_distributed_row_number", "dq7_psi_drift", "l26_bpe_merges",
    "l27_weighted_sample", "l28_record_linkage",
    "o4_limit_offset", "u5_union_missing_columns", "h6_forecast_revenue",
    "tx_fingerprint", "r2_listing_parse_latest", "o3_range_partitioned_sort",
    "f22_number_format", "x8_arrow_python_udf", "x5_map_in_arrow",
    "f8_string_distance", "f9_hashing", "tx_quality_score",
    "u3_union_distinct", "f12_bitwise", "f21_intervals",
    "w5_forward_fill", "t7_stream_stream_join", "tx_redaction",
    "tx_repetition", "w6_distribution", "f24_higher_order_complete",
    "h15_top_supplier", "u2b_except_all", "s10_zorder_layout",
    "f16_transcendental", "l3b_ann_lsh_bucket", "h22_sales_opportunity",
    "m5_binary_dedup", "l7_chunking", "f18_try_family",
    "h4_order_priority_check", "w7_running_distinct", "l16_quality_classifier",
    "l9_sequence_packing", "f11_datetime_advanced", "r20_scd2_asof_lookup",
    "t8_stream_static_join", "f25_map_higher_order", "h17_small_quantity_revenue",
    "h19_disjunctive_predicates", "l3c_grouped_centroids", "e6_event_paths",
    "f10_array_advanced", "f19_malformed_json", "l10_embedding_hygiene",
    "r16_snapshot_diff", "h12_late_line_priority", "f14_variant",
    "x6_grouped_pandas_map", "h13_order_distribution", "r18_scd2_history",
    "s6_schema_evolution", "f15_url", "l11_curation_pipeline",
    "e7_interarrival", "s9_sorted_layout", "r19_scd2_multi_generation",
    "e2_cohort_retention", "dq2_volume_anomaly", "tx_bigram_freq",
    "l3d_ivf_topk", "e5_rfm_segments", "m3_frame_sample",
    "h11_important_stock", "h9_product_profit", "f13_date_spine",
    "f23_collation", "a22_regression_aggregates", "l15_mixture_rebalance",
    "l14_pmi_collocations", "e3_gaps_islands", "q3_session_variables",
    "w4_range_interval_frame", "q4_parameterized_sql", "h20_dominant_supplier",
    "l13_decontamination", "l17_semdedup", "h16_supplier_part_count",
    "s4_partitioned_snapshot", "h2_min_cost_supplier", "l18_unigram_lm",
    "l8_tfidf", "s5_format_roundtrip", "l20_oov_rate",
    "dq3_column_profile", "s8_dynamic_partition_pruning", "tx_boilerplate",
    "s11_write_audit_publish", "h21_waiting_supplier", "l2d_embedding_neardup",
    "s13_jdbc_roundtrip", "s5b_orc_xml_roundtrip", "m4_resize",
    "f17_encoding", "s7_compaction", "x3_python_udtf",
    "a19_listagg", "dq4_observed_metrics", "x7_polymorphic_udtf",
    "f20_xml", "q2_recursive_cte", "t6_stateful_custom",
    "l2e_dup_clusters", "s12_python_datasource", "g2_shortest_path",
    "g3_user_components",
    "a21_approx_percentile", "a14_hll_sketch", "l2_minhash_lsh",
    "l2c_simhash", "m2_feature_extract", "a3_approx_count_distinct",
)


def _ordered_specs() -> list[QuerySpec]:
    specs = all_specs()
    missing = [n for n in _VERIFY_FIRST if n not in specs]
    assert not missing, f"_VERIFY_FIRST names unknown queries: {missing}"
    head = [specs[n] for n in _VERIFY_FIRST]
    tail = [specs[n] for n in sorted(specs) if n not in set(_VERIFY_FIRST)]
    return head + tail


def queries() -> dict[str, SparkBuilder]:
    return {spec.name: spec.builder for spec in _ordered_specs()}


def oracle_sql() -> dict[str, str]:
    return {
        spec.name: spec.oracle
        for spec in _ordered_specs()
        if spec.oracle is not None
    }
