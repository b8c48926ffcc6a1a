"""Differential testing vs DuckDB — local mirror of the driver's gate.

For every catalog query with an oracle: run the Spark builder and the DuckDB
SQL on the same parquet tables, then compare row count, column-name set, and
values (rows compared order-insensitively, floats with a tight tolerance —
the driver's value-hash is the strict version of this).
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from mric_bak_etl_spark.catalog import _VERIFY_FIRST, all_specs

SPECS = all_specs()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is None)


def _parity_selected(name: str) -> bool:
    """Suite-wall trim rung 2 (r11 verdict task 1, the declared parity
    rotation): each round runs the FULL driver verification head (this
    round's new + changed + vintage-sweep queries — exactly the rows
    whose semantics moved) plus HALF of the remaining oracle set,
    alternating halves per round, so every query is locally
    value-checked at least every other round and the skipped half is
    visible as skips, never silently absent. Rotation key = the
    explicit catalog.ROUND constant (ADVICE r12: the old key — a
    CORRECTNESS_r*.json file COUNT — included untracked files, so the
    driver writing the new round's file mid-round flipped which half
    ran between two runs of the same commit). SPARK_GRAFT_FULL_PARITY=1
    restores the full sweep (use for release-grade runs)."""
    import os
    import zlib

    from mric_bak_etl_spark.catalog import ROUND

    if os.environ.get("SPARK_GRAFT_FULL_PARITY"):
        return True
    if name in _VERIFY_FIRST:
        return True
    # Phase: == 1 keeps the alternation unbroken across the key change
    # (the r12 closing runs used the old key at k=11 ≡ crc-odd half, so
    # round 13 must run the crc-even half; ROUND=13 + phase 1 does).
    return (zlib.crc32(name.encode()) + ROUND) % 2 == 1


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        s = df[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[col] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[col] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[col] = s.astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            df[col] = s.astype("bool")
        elif s.dtype == object:
            # date objects, Decimals, strings → canonical string form
            df[col] = s.map(lambda v: None if v is None else str(v))
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(duck_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    )
    a = _normalize(spark_pdf)
    b = _normalize(duck_pdf)
    for col in a.columns:
        if pd.api.types.is_float_dtype(a[col]):
            sa, sb = a[col].to_numpy(), b[col].to_numpy()
            for i, (x, y) in enumerate(zip(sa, sb)):
                both_nan = (x != x) and (y != y)
                if not both_nan and not math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
                    raise AssertionError(f"{name}.{col}[{i}]: {x!r} != {y!r}")
        else:
            pd.testing.assert_series_equal(
                a[col], b[col], check_dtype=False, obj=f"{name}.{col}"
            )


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, duck, sf_dir, name):
    if not _parity_selected(name):
        pytest.skip(
            "rotated out this round (driver-head + half-set rotation; "
            "set SPARK_GRAFT_FULL_PARITY=1 for the full sweep)"
        )
    spec = SPECS[name]
    spark_pdf = spec.builder(spark, sf_dir).toPandas()
    duck_pdf = duck.execute(spec.oracle).df()
    assert_frames_match(spark_pdf, duck_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_queries_run(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.builder(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
