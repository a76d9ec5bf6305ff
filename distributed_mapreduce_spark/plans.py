"""Physical-plan inspection helpers.

The reference has no optimizer (SURVEY.md §4.1) — its plan is a fixed
scan→map→shuffle→sort→reduce pipeline. Here the plan is Catalyst's, and
these helpers let tests *assert* the optimizations happened: partial
(map-side) aggregation — the single biggest win over the reference,
which ships one ("word","1") pair per occurrence
(/root/reference/src/mrapps/wc.go:29-33) — broadcast joins, and
filter/column pushdown into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def assert_partial_agg(df: DataFrame) -> None:
    """Map-side combine present (partial_* agg before the shuffle)."""
    plan = physical_plan(df)
    assert "partial" in plan.lower(), f"no partial aggregation in plan:\n{plan}"


def assert_broadcast_join(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"no broadcast join in plan:\n{plan}"
    )


def assert_no_cartesian(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, f"cartesian product in plan:\n{plan}"


def assert_pushed_filters(df: DataFrame) -> None:
    """Some filter reached the parquet scan (predicate pushdown)."""
    plan = physical_plan(df)
    assert "PushedFilters: [" in plan and "PushedFilters: []" not in plan, (
        f"no pushed filters in plan:\n{plan}"
    )


def assert_unshuffled_scan(df: DataFrame, scan_substring: str) -> None:
    """No Exchange anywhere on the path from the scan matching
    `scan_substring` up to the plan root — i.e. that table is consumed
    shuffle-free (the big-side contract of broadcast joins: at 100 TB
    the base table must stream through, never repartition)."""
    plan = physical_plan(df, "simple")
    lines = [l for l in plan.splitlines() if l.strip() and not l.startswith("==")]

    def depth(line: str) -> int:
        i = 0
        while i < len(line) and line[i] in " :+-":
            i += 1
        return i // 3

    target = next(
        (
            i
            for i, l in enumerate(lines)
            if scan_substring in l and "Scan" in l
        ),
        None,
    )
    assert target is not None, f"no scan matching {scan_substring!r} in plan:\n{plan}"
    d = depth(lines[target])
    for i in range(target - 1, -1, -1):
        dd = depth(lines[i])
        if dd < d:  # the nearest ancestor at each shallower depth
            assert "Exchange" not in lines[i], (
                f"Exchange above the {scan_substring!r} scan:\n{plan}"
            )
            d = dd


def global_window_nodes(df: DataFrame) -> list[str]:
    """Window nodes with an EMPTY partition spec in the optimized
    logical plan. `row_number() OVER (ORDER BY …)` without PARTITION BY
    plans a single-partition window — one task sorts the entire input,
    the canonical scale-killer (sampling.global_shuffle_index exists
    precisely to avoid it). Returns the offending nodes' simpleStrings
    so the registry-wide guard (test_plans.py) can reject any query
    that sneaks one in."""
    out: list[str] = []

    def walk(node) -> None:
        if node.nodeName() in ("Window", "WindowGroupLimit") and (
            node.partitionSpec().isEmpty()
        ):
            out.append(node.simpleString(200))
        for i in range(node.children().length()):
            walk(node.children().apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return out


def assert_wholestage_codegen(df: DataFrame) -> None:
    # AQE prints codegen ids ("*(n)") only on the finalized plan, so
    # execute THIS plan (collect, not count — count builds a new plan).
    df.collect()
    plan = physical_plan(df, "simple")
    assert "*(" in plan, f"no whole-stage codegen in plan:\n{plan}"
