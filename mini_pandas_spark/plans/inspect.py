"""Physical-plan inspection helpers.

The engine's scale discipline (SURVEY.md §4) is encoded as *testable plan
properties*: filters reach parquet scans, dimension joins broadcast,
top-k never globally sorts, text pipelines never leave the JVM.  These
helpers read the executed plan so both the regression tests
(tests/test_plan_quality.py) and ad-hoc tuning sessions assert the same
things the same way.

The reference engine has no plans at all (eager Python loops,
SURVEY.md §3-4); this module is the observability layer Catalyst makes
possible.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The (possibly adaptive) executed physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges)."""
    plan = executed_plan(df)
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)", plan))


def broadcast_join_count(df: DataFrame) -> int:
    return executed_plan(df).count("BroadcastHashJoin") + executed_plan(df).count(
        "BroadcastNestedLoopJoin"
    )


def has_pushed_filters(df: DataFrame) -> bool:
    """True if any scan carries a non-empty PushedFilters list."""
    return bool(re.search(r"PushedFilters: \[[^\]]+\]", executed_plan(df)))


def has_cartesian_product(df: DataFrame) -> bool:
    return "CartesianProduct" in executed_plan(df)


def python_eval_nodes(df: DataFrame) -> list[str]:
    """Python evaluation operators in the plan (Batch = row-at-a-time,
    Arrow/MapInPandas = vectorized)."""
    plan = executed_plan(df)
    return re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas)", plan)


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans (wider is better: more of the
    plan fused into single JIT'd loops).

    Caveat: with AQE enabled the plan text carries codegen ids only once
    the frame's own QueryExecution has run (isFinalPlan=true) — execute
    the frame (e.g. ``df.collect()``) before calling this."""
    plan = executed_plan(df)
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    ids |= set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    return len(ids)


def uses_take_ordered(df: DataFrame) -> bool:
    """True if top-k runs as TakeOrderedAndProject (heap per task) rather
    than a global sort."""
    return "TakeOrderedAndProject" in executed_plan(df)


def iter_executed_nodes(df: DataFrame):
    """Walk every node of the EXECUTED physical plan, descending into
    AdaptiveSparkPlan's final plan — the one place scan metrics live
    after an AQE query runs.  The frame must already have been executed
    via THIS DataFrame object (a re-built or parent frame reports
    zeroed metrics)."""

    def walk(node):
        yield node
        ch = node.children()
        for i in range(ch.length()):
            yield from walk(ch.apply(i))
        try:
            yield from walk(node.finalPhysicalPlan())
        except Exception:
            pass

    yield from walk(df._jdf.queryExecution().executedPlan())


def scan_output_rows(df: DataFrame):
    """The file scan's ``numOutputRows`` metric — rows surviving
    row-group stats pruning — of an ALREADY-EXECUTED frame; the pruning
    receipt the z-order/Hilbert layout pins and stress tools read.
    Returns None if no FileSourceScan is present.

    Single-scan only (ADVICE_r10): a multi-scan plan (e.g. a join) has
    no unambiguous "the scan", and silently returning the last one
    would hand a future caller the wrong pruning receipt — raise
    loudly instead so misuse fails at the call site."""
    counts = []
    for nd in iter_executed_nodes(df):
        if "FileSourceScan" in nd.getClass().getSimpleName():
            counts.append(nd.metrics().apply("numOutputRows").value())
    if len(counts) > 1:
        raise ValueError(
            f"scan_output_rows expects a single-FileSourceScan plan, "
            f"found {len(counts)} scans ({counts}); pass a per-scan "
            f"sub-frame or walk iter_executed_nodes directly"
        )
    return counts[0] if counts else None
