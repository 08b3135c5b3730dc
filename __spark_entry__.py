"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (full KG pipeline over transcripts
derived from the events table, → top co-mentioned triples).
``queries``/``oracle_sql`` expose every implemented operator from
SURVEY.md §2 plus the training-data ops; each SQL-expressible one has a
DuckDB oracle with matching column names. ``kg_pipeline_triples`` is the
one non-SQL-expressible entry (pandas-UDF model kernels inside) — its
correctness gate is the pure-Python oracle in tests/ instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bionext_spark.corpus_queries import CORPUS
from bionext_spark.entry_queries import RELATIONAL


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from bionext_spark.flagship import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from bionext_spark.flagship import run_kg_pipeline

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, (fn, _sql) in {**RELATIONAL, **CORPUS}.items():
        out[name] = fn
    out["kg_pipeline_triples"] = run_kg_pipeline  # non-SQL-expressible (UDF kernels)
    return out


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (fn, sql) in {**RELATIONAL, **CORPUS}.items() if sql is not None
    }
