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


# Verification order — round 9 rotation. The driver's correctness run is
# time-budgeted (~50 entries/round); rounds 1-8 drove 288 distinct
# queries (279 full value-hash green, 9 rows-only by design, 0 failures
# ever — CORRECTNESS_r01-r08), leaving exactly 2 never sampled: the
# round-8 late additions parked below the budget so the r8 attestation
# head stayed frozen. Round-9 head (r8 verdict task 1): the flagship
# canary; e15 + t13 first rows (closing the catalog at 290/290
# driver-sampled); post-change rows for EVERY registered consumer of
# code changed this round — stream_events gained Hadoop-FS layout
# detection (ADVICE r8), so all six of its consumers re-enter (t6, t10,
# t11, t12, t13, AND s16, the transitive consumer the r8 hand-rotation
# missed), and decode_media gained degenerate-geometry rejection, so m7
# re-enters. The changed-consumer set is no longer hand-maintained:
# `python -m mric_bak_etl_spark.introspect` sweeps the registry
# builders' transitive references against the round-base git diff, and
# tests/test_plans.py::test_verify_first_queues_every_changed_code_consumer
# fails if any consumer of changed code is absent from this list (it
# would have caught the s16 miss). Then the bench HEADLINE set and
# heavy flagships re-confirm the queries users actually run — 50
# entries exactly fill the driver's budget. The reconciliation: 13
# required slots (canary + e15/t13 first rows + 6 stream_events
# consumers incl. m7's decode sibling + the 4 round-9 additions) + 37
# re-confirmations = 50, which means 4 deliberate cuts from the
# 43-entry HEADLINE ∪ heavy-flagship re-confirm pool:
# t1_tumbling_window (green r1/r3/r8), o2_topk (green r3/r8),
# u2b_except_all (green r8) and s20_bucket_scoped_repair (green r8) —
# all unchanged this round — sit out, re-entering next rotation. Already-green queries
# follow in sorted order; the local parity suite
# (tests/test_oracle_parity.py, value-matched before every commit)
# remains the regression guard.
_VERIFY_FIRST: tuple[str, ...] = (
    "a1_pricing_summary",
    # Round-8 rotation debt — the only never-driver-sampled queries;
    # green rows close the catalog at 290/290.
    "e15_srm_check",
    "t13_streaming_sketch_registers",
    # Changed this round (introspect sweep): stream_events consumers +
    # decode_media consumer.
    "t6_stateful_custom",
    "t10_foreach_batch_upsert",
    "t11_dedup_within_watermark",
    "t12_sink_log_handoff",
    "s16_streaming_file_sink",
    "m7_bmp_decode",
    # Round-9 additions — first driver rows (inside the budget, so the
    # catalog stays fully sampled with zero rotation debt).
    "t13b_streaming_register_maintenance",
    "m8_bmp_channel_stats",
    "l41_duplication_profile",
    "s21_schema_evolution_read",
    # Re-confirmations: bench HEADLINE order, then heavy flagships.
    "a4_rollup", "j1_inner_equi", "j2_broadcast_dims", "j6_asof",
    "w1_ranking", "w3_frames", "f5_arrays",
    "h3_shipping_priority", "h5_local_supplier_volume",
    "h18_large_volume_customer", "sq2_scalar_correlated",
    "j8_salted_skew_join",
    "l2_minhash_lsh", "l3_cosine_topk", "l4_tokenize_tf", "l17_semdedup",
    "l18_unigram_lm", "e4_event_transitions", "m2_feature_extract",
    "e6_event_paths", "a18_bitmap_exact_distinct",
    "j12_interval_overlap_join", "l19_kmeans", "j15_bloom_prejoin",
    "g4_triangle_count", "l22_slice_divergence", "r21_incremental_agg",
    "g5_user_pagerank", "l29_exact_substring_dedup",
    "e9_sequence_pattern", "l38_incremental_exact_dedup",
    "l40_incremental_banded_neardup", "w10_distributed_running_total",
    "a26_moment_profile", "s19_replica_checksum_audit",
    "a23b_portable_sketch_merge_rollup", "m2b_portable_feature_extract",
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
