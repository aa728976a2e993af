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
