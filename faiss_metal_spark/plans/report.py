"""Physical-plan introspection for scale discipline.

The reference engine's 'optimizer' is a set of physical-path selections
(SURVEY §4); in Spark the equivalent discipline is making sure Catalyst
actually produced the plan you designed for: filters pushed to the
scan, small sides broadcast, no accidental extra shuffles, expressions
inside whole-stage codegen. ``explain_report`` extracts those facts
from the executed-plan string so tests can pin them — a regression that
silently turns a broadcast join into a sort-merge join at 100 TB is a
production incident, so we treat plan shape as part of correctness.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class PlanReport:
    plan: str
    n_exchanges: int          # shuffle boundaries (Exchange nodes)
    n_broadcasts: int         # BroadcastExchange / BroadcastHashJoin sides
    n_sort_merge_joins: int
    n_codegen_spans: int      # WholeStageCodegen regions
    pushed_filters: list[str]
    read_schemas: list[str]   # per-scan column pruning evidence
    has_python_stage: bool    # ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas


def explain_report(df: DataFrame) -> PlanReport:
    plan = df._jdf.queryExecution().executedPlan().toString()
    formatted = df._jdf.queryExecution().toString()
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan + formatted)
    schemas = re.findall(r"ReadSchema: ([^\n,]*)", plan + formatted)
    # shuffle exchanges only — BroadcastExchange is counted separately
    shuffles = re.findall(
        r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition|RoundRobinPartitioning)",
        plan,
    )
    codegen_ids = set(re.findall(r"WholeStageCodegen \((\d+)\)", plan)) | set(
        re.findall(r"\*\((\d+)\)", plan)
    )
    return PlanReport(
        plan=plan,
        n_exchanges=len(shuffles),
        n_broadcasts=plan.count("BroadcastExchange"),
        n_sort_merge_joins=plan.count("SortMergeJoin"),
        n_codegen_spans=len(codegen_ids),
        pushed_filters=[p for p in pushed if p.strip()],
        read_schemas=schemas,
        has_python_stage=any(
            m in plan
            for m in (
                "ArrowEvalPython",
                "MapInPandas",
                "MapInArrow",
                "FlatMapGroupsInPandas",
            )
        ),
    )


def assert_plan(
    df: DataFrame,
    max_shuffles: int | None = None,
    min_broadcasts: int | None = None,
    forbid_sort_merge_join: bool = False,
    require_pushed_filter: bool = False,
) -> PlanReport:
    """Assert structural properties of the physical plan; returns the
    report so callers can add bespoke checks."""
    r = explain_report(df)
    if max_shuffles is not None and r.n_exchanges > max_shuffles:
        raise AssertionError(
            f"plan has {r.n_exchanges} shuffles (max {max_shuffles}):\n{r.plan}"
        )
    if min_broadcasts is not None and r.n_broadcasts < min_broadcasts:
        raise AssertionError(
            f"plan has {r.n_broadcasts} broadcasts (want ≥ {min_broadcasts}):\n{r.plan}"
        )
    if forbid_sort_merge_join and r.n_sort_merge_joins:
        raise AssertionError(f"plan contains SortMergeJoin:\n{r.plan}")
    if require_pushed_filter and not r.pushed_filters:
        raise AssertionError(f"no PushedFilters reached the scan:\n{r.plan}")
    return r
