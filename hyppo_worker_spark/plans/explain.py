"""Physical-plan inspection helpers.

Catalyst does the optimizing; these helpers make the *verification*
of that first-class: tests assert that filters actually pushed into
the parquet scan, small dimensions actually broadcast, and the read
schema was pruned — the properties that decide whether a plan
survives a 100× scale-up.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans in the plan."""
    plan = formatted_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema entries — what each scan actually reads."""
    plan = formatted_plan(df)
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    return any(fragment in f for f in pushed_filters(df))


def scan_reads_only(df: DataFrame, table_marker: str, allowed_cols: set[str]) -> bool:
    """True if every scan whose location mentions ``table_marker``
    reads a subset of ``allowed_cols``."""
    plan = formatted_plan(df)
    ok = True
    for scan in re.split(r"\(\d+\) Scan parquet", plan)[1:]:
        head = scan.split("\n\n")[0]
        if table_marker not in head:
            continue
        m = re.search(r"ReadSchema: struct<([^>]*)>", head)
        if not m:
            continue
        cols = {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
        ok = ok and cols <= allowed_cols
    return ok


def join_strategies(df: DataFrame) -> list[str]:
    """Physical join operators in the plan, e.g. BroadcastHashJoin."""
    plan = formatted_plan(df)
    return re.findall(
        r"\(\d+\) (BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (excluding broadcast exchanges)."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange", plan))


def unpartitioned_windows(df: DataFrame) -> list[str]:
    """Window operators with NO partition spec — every input row lands
    in ONE task (WindowExec "No Partition Defined" / an
    `Exchange SinglePartition` feeder). Unbounded inputs make this a
    scale-killer, so the plan audit flags any site outside its
    documented bounded-frame whitelist (VERDICT r4 item 3 in What's
    wrong).

    Detection: in the executed-plan tree string a Window line carries
    `[functions], [partitionSpec], [orderSpec]`; specs that are empty
    are OMITTED, so the 2-group form is ambiguous — `[funcs], [part]`
    (partitioned, unordered: e.g. count over partition) vs `[funcs],
    [order]` (UNPARTITIONED). An order spec always carries a sort
    direction token (` ASC`/` DESC`), a partition spec never does —
    that token decides (verified against all three forms on Spark
    4.1; a naive group count falsely flagged q29's unordered
    partitioned count).
    """
    tree = df._jdf.queryExecution().executedPlan().toString()
    out = []
    for line in tree.splitlines():
        m = re.search(r"\bWindow (\[.*)$", line)
        if not m:
            continue
        rest = m.group(1)
        depth = 0
        groups: list[str] = []
        for ch in rest:
            if ch == "[":
                if depth == 0:
                    groups.append("")
                depth += 1
            if depth > 0:
                groups[-1] += ch
            if ch == "]":
                depth -= 1
        if len(groups) >= 3:
            continue  # [funcs], [part], [order] — partitioned
        last = groups[-1] if len(groups) == 2 else ""
        if len(groups) == 2 and not re.search(r" (ASC|DESC)\b", last):
            continue  # [funcs], [part] — partitioned, unordered
        out.append(line.strip()[:160])
    return out
