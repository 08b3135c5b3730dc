"""Physical-plan introspection helpers.

Used by tests (and interactive tuning) to assert the plans Catalyst picks
are the ones the engine is designed around: broadcast hash joins for
lexicon lookups, parquet filter pushdown + column pruning for scans, and
whole-stage codegen over the scalar pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)

def broadcast_join_count(df: DataFrame) -> int:
    return physical_plan(df).count("BroadcastHashJoin")


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section(s) of the scan nodes."""
    plan = formatted_plan(df)
    return "\n".join(l for l in plan.splitlines() if "PushedFilters" in l)


def read_schema(df: DataFrame) -> str:
    plan = formatted_plan(df)
    return "\n".join(l for l in plan.splitlines() if "ReadSchema" in l)


def codegen_stage_count(df: DataFrame) -> int:
    return physical_plan(df).count("WholeStageCodegen")
