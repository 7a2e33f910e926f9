"""Physical-plan inspection — the programmatic form of `.explain("formatted")`
review. Tests use these to LOCK IN the plan properties that matter at 100 TB:
filters reaching the parquet scan, column pruning, broadcast joins on small
dims, and the absence of single-partition exchanges in anything that scales
with data size.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    explain_mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(explain_mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", physical_plan(df)):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read by each parquet scan (pruning check)."""
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", physical_plan(df)):
        cols = {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
        out.append(cols)
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastExchange" in physical_plan(df)


def count_exchanges(df: DataFrame) -> int:
    return len(re.findall(r"\bExchange\b|\(\d+\) Exchange", physical_plan(df)))


def assert_no_single_partition_exchange(df: DataFrame) -> None:
    """Fails on `Exchange SinglePartition` — the signature of a global
    window/sort bottleneck — anywhere in a plan that is supposed to scale.
    (Global sorts used only in driver-bound outputs are fine; don't call this
    on those.)"""
    plan = physical_plan(df)
    assert "SinglePartition" not in plan, f"single-partition exchange found:\n{plan[:2000]}"
