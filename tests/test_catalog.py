"""Registry-level contracts: bench-membership enforcement (r10 verdict
task 6 — the per-round "new ops join the bench" step must be impossible
to forget) and HEADLINE/registry consistency."""

from __future__ import annotations

import glob
import json
import os
import sys

from mric_bak_etl_spark.catalog import HEADLINE, all_specs, headline_names

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_new_query_joins_the_bench_headline():
    """A query with NO driver attestation yet (absent from every
    committed CORRECTNESS_r*.json — i.e. first registered this round)
    must be in catalog.HEADLINE, so its first driver round benches it
    too. Once its first correctness row lands, membership becomes a
    curation choice again."""
    attested: set[str] = set()
    for f in glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json")):
        with open(f) as fh:
            attested |= set(json.load(fh))
    new = set(all_specs()) - attested
    missing = sorted(new - set(HEADLINE))
    assert not missing, (
        f"queries new this round are missing from the bench HEADLINE: "
        f"{missing}"
    )


def test_headline_names_resolve_and_cover_common23():
    names = headline_names()
    assert len(names) == len(set(names)), "duplicate HEADLINE entries"
    sys.path.insert(0, _ROOT)
    import bench

    assert set(bench.COMMON23) <= set(names), (
        "COMMON23 (the cross-round comparable set) must stay a subset "
        "of the headline"
    )


def _ladder_inputs(n_queries: int, n_heavy: int):
    """Synthetic bench results sized to force specific ladder rungs."""
    timings = {f"q{i:03d}_some_operator_name": 1.234 for i in range(n_queries)}
    duck = {n: 0.345 for n in timings}
    heavy = {n: 3.6 for n in list(timings)[:n_heavy]}
    return timings, heavy, duck


def test_bench_line_ladder_keeps_queries_map_and_gate():
    """The shed ladder must drop ratio entries — never the per-query map
    — and the c23 weather gate must survive every rung (r11 ADVICE: the
    old decrement skipped the k=1/k=0 rungs and fell through to the
    headline-only form, losing the map)."""
    sys.path.insert(0, _ROOT)
    import bench

    # A heavy map big enough that the roomy form overflows, over a
    # descending budget sweep. Invariant at every budget down to the
    # k=0 rung: the per-query map and the c23 gate survive — only ratio
    # entries shed. The r11 bug (rung sequence 5 → 2 → -1) is caught by
    # the tightest budgets: they need the k=1/k=0 rungs the old
    # decrement skipped.
    timings, heavy, duck = _ladder_inputs(60, 20)
    # Find the minimal budget at which the queries map survives — that
    # is by construction the k=0 compact form's exact length.
    k0_len = None
    for budget in range(2800, 300, -1):
        parsed = json.loads(
            bench.compose_line(74.0, timings, 0.1, heavy, duck, budget=budget)
        )
        if "queries" not in parsed:
            break
        if "queries_shed" in parsed:  # rung 3: partial map, shed visible
            assert len(parsed["queries"]) + parsed["queries_shed"] == len(
                timings
            )
            assert "c23_ratio" in parsed
            continue
        k0_len = budget
        assert set(parsed["queries"]) == set(timings)
        assert "c23_ratio" in parsed and "duck_common23" in parsed
        if "heavy_shed" in parsed:  # compact rungs: trim is visible
            assert parsed["heavy_shed"] == len(heavy) - len(
                parsed["spark_over_duck_heavy"]
            )
    assert k0_len is not None, "queries map never survived any budget"
    # One notch below the minimal full-map budget: rung 3 keeps the
    # SLOWEST queries with the shed visible (r12: the 60-entry headline
    # overflowed even the k=0 form — the map must degrade to its
    # slowest members, never vanish wholesale).
    parsed = json.loads(
        bench.compose_line(74.0, timings, 0.1, heavy, duck, budget=k0_len - 1)
    )
    assert "queries" in parsed and parsed["queries_shed"] > 0
    assert len(parsed["queries"]) + parsed["queries_shed"] == len(timings)
    assert "c23_ratio" in parsed and "duck_common23" in parsed
    # Only below every rung-3 form does the map finally drop — and the
    # gate still survives in the last resort.
    parsed = json.loads(
        bench.compose_line(74.0, timings, 0.1, heavy, duck, budget=320)
    )
    assert "queries" not in parsed
    assert "c23_ratio" in parsed and "duck_common23" in parsed


def test_bench_line_gate_survives_last_resort():
    """Even the headline-only last resort must carry the c23 gate, and
    the roomy form must carry it too."""
    sys.path.insert(0, _ROOT)
    import bench

    # Tiny headline: roomy form fits.
    timings, heavy, duck = _ladder_inputs(5, 2)
    # Make the COMMON23 members present so the ratio is real.
    for n in bench.COMMON23:
        timings[n] = 2.0
        duck[n] = 0.4
    line = bench.compose_line(10.0, timings, 0.01, heavy, duck)
    parsed = json.loads(line)
    assert parsed["c23_ratio"] == round(
        sum(timings[n] for n in bench.COMMON23)
        / sum(duck[n] for n in bench.COMMON23),
        2,
    )
    # Pathological budget: every rung overflows → last resort still
    # carries the gate fields.
    line = bench.compose_line(10.0, timings, 0.01, heavy, duck, budget=250)
    parsed = json.loads(line)
    assert "queries" not in parsed  # genuinely the last resort
    assert "c23_ratio" in parsed and "duck_common23" in parsed


def test_bench_rung3_never_sheds_common23():
    """Rung-3 shedding must keep every COMMON23 member present in the
    timings map (r14, judge item 5: slowest-only shedding made improved
    fast queries unreadable in the cross-round comparison; the frozen
    comparable set is unsheddable, the shed count stays visible)."""
    sys.path.insert(0, _ROOT)
    import bench

    timings, heavy, duck = _ladder_inputs(60, 20)
    # c23 members timed FAST — exactly the rows slowest-only shedding
    # would drop first.
    for n in bench.COMMON23:
        timings[n] = 0.05
        duck[n] = 0.4
    line = bench.compose_line(74.0, timings, 0.1, heavy, duck, budget=1800)
    parsed = json.loads(line)
    assert "queries_shed" in parsed and parsed["queries_shed"] > 0
    missing = [n for n in bench.COMMON23 if n not in parsed["queries"]]
    assert not missing, f"c23 members shed from the line: {missing}"
    assert len(parsed["queries"]) + parsed["queries_shed"] == len(timings)
