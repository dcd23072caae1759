"""Physical-plan inspection helpers (SURVEY.md §4)."""

from textalyzer_spark.plans.inspect import (  # noqa: F401
    explain_str,
    pushed_filters,
    read_schema_columns,
    uses_broadcast_join,
    wholestage_codegen_ids,
)
