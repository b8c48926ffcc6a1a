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
  between engines);
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


# Verification order: one fast representative of EVERY family first, so a
# time-budgeted correctness run (round 1's recorded run stopped mid-module
# after 45 of 173 queries, in registration order) still samples the whole
# surface before depth. Everything not listed follows in sorted order.
_VERIFY_FIRST: tuple[str, ...] = (
    # flagship + core relational
    "a1_pricing_summary", "s1_parquet_scan", "p1_projection",
    "p2_filter_predicates", "j1_inner_equi", "j2_broadcast_dims",
    "j4b_left_anti", "a4_rollup", "a7_percentiles", "w1_ranking",
    "w3_frames", "o2_topk", "u1_union_by_name", "u2_intersect",
    # scalar functions / SQL entry
    "f1_strings", "f2_datetime", "f7_json", "q1_sql_parity",
    # subqueries / composites
    "sq1_exists_correlated", "sq5_lateral_topk_per_group",
    "h3_shipping_priority", "h5_local_supplier_volume",
    # reference pipeline / quality
    "r7_state_antijoin", "r17_merge_apply", "dq1_quality_gate",
    "dq5_referential_integrity",
    # streaming / events / graph
    "t1_tumbling_window", "t5_stateful_dedup", "e1_funnel",
    "e4_event_transitions", "g1_pagerank",
    # joins, advanced
    "j6_asof", "j8_salted_skew_join", "j12_interval_overlap_join",
    # llm / text / multimodal / udf
    "l1_exact_dedup", "l3_cosine_topk", "l4_tokenize_tf",
    "l6_stratified_sample", "l2b_ngram_jaccard", "l19_kmeans",
    "tx_token_count", "tx_langid", "m1_multimodal_metadata",
    "x4_scalar_pandas_udf",
    # exactness / sketches
    "a16_decimal_exact", "a18_bitmap_exact_distinct",
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
