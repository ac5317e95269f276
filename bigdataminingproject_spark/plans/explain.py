"""Physical-plan introspection helpers.

The engine's scale posture is enforced, not hoped for: tests assert that
the plans Catalyst actually produces have the properties the 100 TB
design depends on — filters pushed into the parquet scan, pruned read
schemas, broadcast joins for dimension tables, whole-stage codegen over
the hot expressions. ``.explain`` output is the contract surface.
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


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries across all scans in the plan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema entries (column pruning evidence) for each scan."""
    plan = formatted_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (\S+)", plan)]


def broadcast_join_count(df: DataFrame) -> int:
    return formatted_plan(df).count("BroadcastHashJoin")


def shuffle_exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the (pre-AQE) plan.

    Formatted mode prints nodes as ``(N) Exchange`` with the partitioning
    on a separate ``Arguments:`` line, so count the node headers.
    """
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def has_whole_stage_codegen(df: DataFrame) -> bool:
    """True when the EXECUTED plan contains codegen'd stages. Under AQE
    the physical plan is only finalized during execution, so this runs
    the query (cheap at test scale) and inspects the final plan."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # codegen'd stages print as "*(N) Operator" in the simple plan string
    return bool(re.search(r"\*\(\d+\)", plan)) or "WholeStageCodegen" in plan


def uses_take_ordered(df: DataFrame) -> bool:
    """orderBy+limit compiled to TakeOrderedAndProject (no global sort)."""
    return "TakeOrderedAndProject" in formatted_plan(df)


def plan_report(df: DataFrame) -> dict:
    """One-call summary used by tests and tuning sessions."""
    return {
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schemas(df),
        "broadcast_joins": broadcast_join_count(df),
        "shuffles": shuffle_exchange_count(df),
        "whole_stage_codegen": has_whole_stage_codegen(df),
        "take_ordered": uses_take_ordered(df),
    }
