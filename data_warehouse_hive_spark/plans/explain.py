"""Physical-plan inspection utilities.

"Would this plan survive a 100× scale-up?" is answered by reading the
plan, not guessing: these helpers extract the formatted plan and assert
the properties that matter at scale — filters pushed into the scan,
columns pruned, the join strategy chosen, shuffle (Exchange) counts.
Used by tests/test_plans.py to lock in plan shape, so a regression that
silently un-pushes a filter or de-broadcasts a join fails CI.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(plan: str) -> list[str]:
    """PushedFilters entries from every scan node."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schemas(plan: str) -> list[str]:
    return [m.group(1) for m in re.finditer(r"ReadSchema: (\S+)", plan)]


def count_exchanges(plan: str) -> int:
    """Number of shuffle Exchange operators (broadcast exchanges excluded).
    Matches both formatted-mode node headers '(5) Exchange' and simple-mode
    'Exchange hashpartitioning' lines."""
    formatted = len(re.findall(r"^\(\d+\) Exchange\b", plan, re.M))
    if formatted:
        return formatted
    return len(
        re.findall(
            r"\bExchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan
        )
    )


def join_strategies(plan: str) -> list[str]:
    return re.findall(
        r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)\b",
        plan,
    )


def has_whole_stage_codegen(df: DataFrame, force: bool = True) -> bool:
    """Whole-stage codegen spans show as '*(n) Op' in the simple plan.
    Under AQE the markers only appear once the plan is finalized, so the
    query is executed first (force=True) before reading the plan."""
    if force:
        # collect() (not count()) — count wraps a NEW plan; only an action
        # on this exact Dataset finalizes its own AQE plan
        df.collect()
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    return "*(" in buf.getvalue()


def uses_take_ordered(plan: str) -> bool:
    return "TakeOrderedAndProject" in plan


def executed_plan(df: DataFrame, force: bool = True) -> str:
    """The FINAL adaptive plan (after AQE re-planning), as a string.
    Static `explain` shows the initial plan; under AQE the executed shape
    — broadcast conversions, coalesced partitions, skew splits — only
    exists after an action on this exact Dataset."""
    if force:
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def node_metrics(df: DataFrame, force: bool = True) -> list[dict]:
    """Post-execution observability: walk the executed plan tree and
    return each node's runtime SQL metrics (rows output, spill sizes,
    shuffle bytes, ...) as `[{node, metrics: {name: value}}, ...]`.
    Keys are Spark's internal metric names (numOutputRows,
    shuffleRecordsWritten, spillSize, peakMemory, ...).

    This is the programmatic form of the Spark UI's SQL tab — the tool
    that answers "which operator produced 4 billion rows" or "did the
    sort spill" WITHOUT a UI, so perf regressions can be asserted in
    tests and logged from batch jobs at the cluster.
    """
    if force:
        df.collect()
    out: list[dict] = []

    def walk(node) -> None:
        metrics = {}
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            metrics[str(kv._1())] = int(kv._2().value())
        out.append({"node": node.nodeName(), "metrics": metrics})
        children = node.children()
        cit = children.iterator()
        while cit.hasNext():
            walk(cit.next())
        # adaptive wrapper nodes hide their executed subtree in
        # (final/current)PlanForMetrics-style accessors; handle the two
        # common wrappers explicitly
        name = node.nodeName()
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan())
        elif name in ("ShuffleQueryStage", "BroadcastQueryStage", "ResultQueryStage"):
            walk(node.plan())

    walk(df._jdf.queryExecution().executedPlan())
    return out


def metric_total(metrics: list[dict], node_like: str, metric: str) -> int:
    """Sum a named metric across all nodes whose name contains
    `node_like` — e.g. metric_total(m, 'Exchange', 'shuffle bytes
    written') or metric_total(m, 'HashAggregate', 'number of output
    rows')."""
    total = 0
    for entry in metrics:
        if node_like in entry["node"]:
            total += max(0, entry["metrics"].get(metric, 0))
    return total
