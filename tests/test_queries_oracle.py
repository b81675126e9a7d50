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
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


@pytest.mark.parametrize("name", sorted(Q.queries_dict()))
def test_query_matches_oracle(spark, ddb, name):
    sdf = Q.queries_dict()[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    sql = Q.oracle_sql_dict()[name]
    cur = ddb.execute(sql)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()

    s_cols, s_norm = _normalize(scols, srows)
    d_cols, d_norm = _normalize(dcols, drows)
    assert s_cols == d_cols, f"{name}: columns {s_cols} != {d_cols}"
    assert len(s_norm) == len(d_norm), f"{name}: rows {len(s_norm)} != {len(d_norm)}"
    mism = [(a, b) for a, b in zip(s_norm, d_norm) if a != b][:3]
    assert not mism, f"{name}: first value mismatches {mism}"
