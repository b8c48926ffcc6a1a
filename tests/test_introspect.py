"""Unit tests for the changed-consumer sweep (mric_bak_etl_spark.introspect).

The sweep is itself a guard, so its blind spots become rotation misses —
each reference style it must resolve gets a pinned case here, using live
registry builders where the style actually occurs. The decorator-edit
case lives next to the rotation guard in test_plans.py.
"""

from __future__ import annotations

from mric_bak_etl_spark.catalog import all_specs
from mric_bak_etl_spark.introspect import _top_level_symbols, transitive_refs

SPECS = all_specs()


def refs_of(query: str) -> set[tuple[str, str]]:
    return transitive_refs(SPECS[query].builder)


def test_sees_function_local_from_import():
    # s16's builder does `from ...streaming.windows import stream_events`
    # INSIDE the function body — the exact style that hid it from the
    # hand-rotation in round 8. The walker must resolve it through the
    # dotted module path in co_names.
    assert (
        "mric_bak_etl_spark.streaming.windows",
        "stream_events",
    ) in refs_of("s16_streaming_file_sink")


def test_sees_module_level_import_and_transitive_helper():
    # t13b reaches stream_events via a module-level import, and the
    # shared sink scaffold two hops away (builder -> windows.
    # make_register_merge_sink -> stateful.make_versioned_merge_sink).
    refs = refs_of("t13b_streaming_register_maintenance")
    assert ("mric_bak_etl_spark.streaming.windows", "stream_events") in refs
    assert (
        "mric_bak_etl_spark.streaming.stateful",
        "make_versioned_merge_sink",
    ) in refs


def test_sees_data_constants():
    # m8's builder references its output schema string — a data binding,
    # recorded so a schema edit queues the query for a post-change row.
    assert ("mric_bak_etl_spark.llm.multimodal", "_M8_SCHEMA") in refs_of(
        "m8_bmp_channel_stats"
    )


def test_every_builder_is_its_own_consumer_key():
    # consumers_of_changed seeds each query with its builder's
    # (module, name); spot-check the convention the seeding relies on —
    # register() stores the plain function (no wrapper), so __module__/
    # __name__ identify the top-level symbol the differ reports.
    for name in ("a1_pricing_summary", "l41_duplication_profile"):
        b = SPECS[name].builder
        assert not hasattr(b, "__wrapped__")
        assert b.__module__.startswith("mric_bak_etl_spark.")


def test_symbol_differ_covers_assignments_and_new_symbols():
    old = "X = 1\n\ndef f():\n    return X\n"
    new = "X = 2\n\ndef f():\n    return X\n\ndef g():\n    return 3\n"
    so, sn = _top_level_symbols(old), _top_level_symbols(new)
    assert so["X"] != sn["X"]          # assignment edit visible
    assert "g" in sn and "g" not in so  # new symbol visible
    assert so["f"] == sn["f"]          # untouched symbol unchanged
