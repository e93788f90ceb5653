"""Plan inspection: assert the optimizer did what the engine relies on.

The reference trusts Polars' lazy engine blindly (SURVEY.md §4); here
the equivalent discipline is made checkable: tests assert that filters
reach the parquet scan (PushedFilters), projections prune the read
schema (ReadSchema), small joins broadcast, and hot expressions stay
inside WholeStageCodegen. These helpers parse the executed plan string
— the same thing a human reads from .explain("formatted").
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", executed_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema strings of every scan — the pruned column sets."""
    return re.findall(r"ReadSchema: (struct<[^>]*>)", executed_plan(df))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df) or "BroadcastNestedLoopJoin" in executed_plan(df)


def wholestage_codegen_ids(df: DataFrame) -> list[str]:
    return re.findall(r"WholeStageCodegen \((\d+)\)", executed_plan(df))


def partition_filters(df: DataFrame) -> list[str]:
    """PartitionFilters of every file scan — predicates resolved at
    PLANNING time against the directory/partition layout (storage-level
    pruning: unselected partitions' files are never listed or read)."""
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", executed_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out
