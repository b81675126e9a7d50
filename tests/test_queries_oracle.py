"""Local replica of the driver's correctness gate: every queries() entry runs
in Spark AND its oracle_sql() runs in DuckDB over the same sf0.001 parquet;
row-count + column names + order-insensitive stringified values must match.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import micro_lab_ocr_spark.queries as Q

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _norm_cell(v) -> str:
    """Dtype-STRICT normalization mirroring the driver's hash: both engines
    go through pandas, and an int64 column on one side vs a float64 on the
    other (e.g. DuckDB HUGEINT→float64) must MISMATCH here exactly like it
    does at the driver gate (round-1 `w4_running_count` lesson)."""
    import numpy as np

    if v is None:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return "NULL"
        return "f:" + repr(round(float(v), 9))
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (int, np.integer)):
        return "i:" + str(int(v))
    return str(v)


def _normalize(pdf):
    cols = list(pdf.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = pdf.itertuples(index=False, name=None)
    out = sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


@pytest.mark.parametrize("name", sorted(Q.queries_dict()))
def test_query_matches_oracle(spark, ddb, name):
    spdf = Q.queries_dict()[name](spark, SF_DIR).toPandas()
    dpdf = ddb.execute(Q.oracle_sql_dict()[name]).fetch_df()

    s_cols, s_norm = _normalize(spdf)
    d_cols, d_norm = _normalize(dpdf)
    assert s_cols == d_cols, f"{name}: columns {s_cols} != {d_cols}"
    assert len(s_norm) == len(d_norm), f"{name}: rows {len(s_norm)} != {len(d_norm)}"
    mism = [(a, b) for a, b in zip(s_norm, d_norm) if a != b][:3]
    assert not mism, f"{name}: first value mismatches {mism}"
