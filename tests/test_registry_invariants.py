"""Registry invariants the driver's correctness gate depends on."""

from moonlink_spark.operators import PRIORITY_50, all_queries


def test_priority_50_well_formed():
    qs = all_queries()
    assert len(PRIORITY_50) == 50
    assert len(set(PRIORITY_50)) == 50
    missing = [n for n in PRIORITY_50 if n not in qs]
    assert not missing, missing
    assert list(qs)[:50] == PRIORITY_50


def test_every_query_has_category():
    for name, spec in all_queries().items():
        assert spec.category, name


def test_no_rows_only_queries_remain():
    """r4 closed the last two rows-only oracles (ivf_kmeans_train via
    integer-exact Lloyd replay, approx_sketches via exact-recount +
    in-bounds booleans): every registered query is value-hash checked."""
    rows_only = sorted(
        n for n, s in all_queries().items() if s.oracle is None
    )
    assert rows_only == []


def test_oracle_alias_hygiene():
    """Oracles must not leak un-aliased aggregate column names (the
    driver sorts columns by NAME before hashing; `sum(l_quantity)` vs
    `sum_qty` hash-mismatches even with identical values)."""
    import re

    offenders = []
    for name, spec in all_queries().items():
        if not spec.oracle:
            continue
        # crude signal: a SELECT list item like `SUM(x),` or `COUNT(*) ,`
        # with no AS before the comma/newline
        for m in re.finditer(
            r"(?i)(SUM|COUNT|AVG|MIN|MAX)\s*\([^)]*\)\s*(,|\n|$)",
            spec.oracle,
        ):
            frag = spec.oracle[max(0, m.start() - 60):m.end()]
            if re.search(r"(?i)\bAS\s+\w+\s*$", frag.rstrip(",\n ")):
                continue
            # inside larger expressions (CAST(SUM(..)) etc.) the outer
            # expression carries the alias — only flag bare top-level uses
            before = spec.oracle[:m.start()].rstrip()
            if before.endswith(("(", "+", "-", "*", "/", ",")) and not before.endswith(
                (",", "(")
            ):
                continue
            if before.endswith(("SELECT", ",")):
                offenders.append((name, m.group(0).strip()))
    assert not offenders, offenders[:10]


def test_docstrings_do_not_claim_rows_only_when_oracle_exists():
    """VERDICT r10 nit: a query module/function claiming 'rows-only'
    while the registry carries a full value-hash oracle is coverage
    drift — the doc must match the oracle status (and vice versa: a
    genuinely rows-only query must say so)."""
    import inspect

    from moonlink_spark.operators import all_queries

    offenders = []
    for name, spec in all_queries().items():
        fn_doc = (spec.fn.__doc__ or "").lower()
        mod = inspect.getmodule(spec.fn)
        mod_doc = (getattr(mod, "__doc__", "") or "").lower()
        # flag CLAIMS of rows-only registration, not historical notes
        # like "closed the r3 rows-only gap"
        if spec.oracle is not None and "registered rows-only" in fn_doc:
            offenders.append((name, "function doc claims rows-only"))
        if spec.oracle is None and "rows-only" not in fn_doc:
            offenders.append((name, "rows-only query does not say so"))
        # module docstrings describe the whole module: only flag a
        # 'registered rows-only' claim (a statement about registration)
        if spec.oracle is not None and "registered rows-only" in mod_doc:
            offenders.append((name, f"{mod.__name__} doc claims rows-only"))
    assert not offenders, offenders


def test_bench_headline_queries_are_frozen_anchored():
    """Every bench headline query must have an entry in the FROZEN
    anchor (BASELINE_FROZEN.json) — the anchor's provenance rule is
    that new bench entries get ONE first-round value appended and are
    then frozen; a headline query with no anchor entry makes the
    normalized-drift series silently blind to it. The two synthetic
    scenarios bench.py times outside HEADLINE are covered too."""
    import json
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import bench

    from moonlink_spark.operators import all_queries

    frozen = json.load(
        open(os.path.join(os.path.dirname(bench.__file__),
                          "BASELINE_FROZEN.json"))
    )["queries"]
    registry = all_queries()
    missing_from_registry = [n for n in bench.HEADLINE if n not in registry]
    assert not missing_from_registry, missing_from_registry
    timed = set(bench.HEADLINE) | {
        "ingest_merge_lifecycle", "ingest_batch_commits"
    }
    unanchored = sorted(
        n for n in timed
        if not isinstance(frozen.get(n), (int, float)) or frozen[n] <= 0
    )
    assert not unanchored, (
        f"bench-timed queries without a frozen anchor entry: {unanchored} "
        "— append their first-round median to BASELINE_FROZEN.json "
        "(and to its first_round_entries list), then never touch it again"
    )
