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
