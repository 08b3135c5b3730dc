"""Local mirror of the driver's correctness gate: run every registered
query in Spark AND its DuckDB oracle SQL on sf0.001, compare row sets."""

from __future__ import annotations

import math

import duckdb
import pytest

from bionext_spark.corpus_queries import CORPUS
from bionext_spark.entry_queries import RELATIONAL, TABLES

SF_DIR = "/root/testdata/sf0.001"
ALL = {**RELATIONAL, **CORPUS}


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(ALL))
def test_query_matches_oracle(spark, ddb, name):
    fn, sql = ALL[name]
    sdf = fn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = ddb.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch {scols} vs {dcols}"
    got, exp = _norm_rows(scols, srows), _norm_rows(dcols, drows)
    assert len(got) == len(exp), f"{name}: row count {len(got)} vs {len(exp)}"
    assert got == exp, f"{name}: values differ; first diff: " + str(
        next((g, e) for g, e in zip(got, exp) if g != e)
    )
