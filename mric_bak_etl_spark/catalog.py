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


def queries() -> dict[str, SparkBuilder]:
    return {name: spec.builder for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
