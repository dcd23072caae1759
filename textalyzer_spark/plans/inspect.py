"""Inspect physical plans for the properties that matter at 100 TB:
predicate pushdown, column pruning, whole-stage codegen coverage, and
broadcast-join selection. Used by tests to pin the plan shape — a
regression that silently drops pushdown should fail CI, not show up
as a 10x cost increase in production.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters reaching the parquet scan (PushedFilters: [...])."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> set[str]:
    """Columns actually read from the scan (ReadSchema) — column
    pruning means this is smaller than the table schema."""
    text = explain_str(df)
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def wholestage_codegen_ids(df: DataFrame, execute: bool = True) -> set[int]:
    """Codegen stage ids. Under AQE the pre-execution plan prints no
    codegen markers — ``execute=True`` materializes the plan first so
    the final adaptive plan (with ``*(n)`` spans) is inspected."""
    if execute:
        df.write.format("noop").mode("overwrite").save()
    text = explain_str(df, "simple")
    return {int(m) for m in re.findall(r"\*\((\d+)\)", text)}


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple") or (
        "BroadcastNestedLoopJoin" in explain_str(df, "simple")
    )
