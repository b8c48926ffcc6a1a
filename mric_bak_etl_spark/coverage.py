"""Generate COVERAGE.md — the operator inventory, from the catalog itself.

``python -m mric_bak_etl_spark.coverage > COVERAGE.md``

The inventory is derived from the registry at import time, so it cannot
drift from what the driver actually verifies: every row IS a
``queries()`` entry, and the oracle column reflects whether the driver
runs a full value-hash compare or a rows-only check.
"""

from __future__ import annotations

import re
from collections import OrderedDict

from mric_bak_etl_spark.catalog import all_specs

_FAMILIES = OrderedDict(
    [
        ("s", "Sources / sinks / snapshot lifecycle"),
        ("r", "Reference-pipeline fidelity (mric-bak-etl stages)"),
        ("dq", "Data-quality gates"),
        ("p", "Projection / filter"),
        ("j", "Joins"),
        ("a", "Aggregation"),
        ("w", "Window functions"),
        ("o", "Sort / top-k"),
        ("u", "Set operations"),
        ("f", "Scalar function families"),
        ("sq", "Subqueries"),
        ("h", "TPC-H-shaped composites"),
        ("q", "SQL entry point"),
        ("t", "Streaming semantics"),
        ("e", "Event analytics (funnel / retention)"),
        ("g", "Graph algorithms (iterative DataFrame loops)"),
        ("l", "LLM-data-pipeline (dedup / similarity / text / sampling)"),
        ("tx", "Text analysis"),
        ("m", "Multimodal columns"),
        ("x", "UDF surface"),
    ]
)


# Every rows-only entry must justify itself inline (r8 verdict task 7):
# either name the value-oracled twin that anchors its math, or say why no
# tractable DuckDB mirror exists. main() asserts the mapping stays exact,
# so a new rows-only registration without a justification fails loudly.
_ROWS_ONLY_WHY = {
    "s2_file_manifest": "no tractable mirror: output is host-local file "
    "paths/sizes — nothing engine-neutral to hash",
    "a3_approx_count_distinct": "engine-private HLL++ hash; twin "
    "`a3b_portable_hll` value-oracles the identical register math",
    "a14_hll_sketch": "engine-private Datasketches binary; twin "
    "`a3b_portable_hll` value-oracles the register-build math",
    "a21_approx_percentile": "engine-private GK sketch; exact counterpart "
    "`a24_exact_percentiles` value-oracles the same quantile contract",
    "a23_sketch_rollup": "engine-private sketch merge; twin "
    "`a23b_portable_sketch_merge_rollup` value-oracles the merge rollup",
    "l2_minhash_lsh": "engine-private xxhash64 signatures; twin "
    "`l2f_portable_minhash` value-oracles the banded-LSH pipeline",
    "l2c_simhash": "engine-private hash fingerprints; twin "
    "`l2g_portable_simhash` value-oracles the vote/segment pipeline",
    "l40_incremental_banded_neardup": "engine-private hash index; twin "
    "`l40b_portable_incremental_neardup` value-oracles the probe",
    "m2_feature_extract": "pandas byte-math, no SQL mirror as such; twin "
    "`m2b_portable_feature_extract` is value-oracled AND pinned == m2 "
    "row-for-row in tests",
}


def _family(name: str) -> str:
    prefix = name.split("_", 1)[0]
    m = re.match(r"[a-z]+", prefix)
    alpha = m.group(0) if m else prefix
    return alpha if alpha in _FAMILIES else prefix


def main() -> None:
    specs = all_specs()
    by_family: dict[str, list] = {k: [] for k in _FAMILIES}
    for name in sorted(specs):
        by_family.setdefault(_family(name), []).append(specs[name])
    orphans = set(by_family) - set(_FAMILIES)
    assert not orphans, f"queries outside known families (add to _FAMILIES): {orphans}"

    rows_only = {n for n, s in specs.items() if s.oracle is None}
    assert rows_only == set(_ROWS_ONLY_WHY), (
        "rows-only registrations and _ROWS_ONLY_WHY diverge: "
        f"unjustified={sorted(rows_only - set(_ROWS_ONLY_WHY))} "
        f"stale={sorted(set(_ROWS_ONLY_WHY) - rows_only)}"
    )

    n_oracle = sum(1 for s in specs.values() if s.oracle is not None)
    print("# COVERAGE — driver-verified operator inventory")
    print()
    print(f"{len(specs)} catalog queries, {n_oracle} with full DuckDB value")
    print("oracles (the rest are rows-only: engine-specific hashes, local")
    print("paths, or pandas byte-math with no tractable SQL mirror).")
    print("Generated from the registry by `python -m")
    print("mric_bak_etl_spark.coverage`; every row is a `queries()` entry the")
    print("driver runs. Cross-reference: SURVEY.md §2.")
    print()
    for key, title in _FAMILIES.items():
        rows = by_family.get(key, [])
        if not rows:
            continue
        print(f"## {title}")
        print()
        print("| query | oracle | summary |")
        print("|---|---|---|")
        for s in rows:
            summary = " ".join(s.doc.split())
            if len(summary) > 140:
                summary = summary[:137] + "..."
            if s.oracle is not None:
                oracle = "value-hash"
            else:
                oracle = f"rows-only — {_ROWS_ONLY_WHY[s.name]}"
            print(f"| `{s.name}` | {oracle} | {summary} |")
        print()


if __name__ == "__main__":
    main()
