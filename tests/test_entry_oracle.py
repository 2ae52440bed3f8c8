"""Mimic the driver's correctness gate: run every __spark_entry__ query on
Spark and its oracle_sql on DuckDB over sf0.01, compare row count + schema
+ order-insensitive values."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, ddb, name):
    got_df = QUERIES[name](spark, SF_DIR)
    got_cols = got_df.columns
    got_rows = [tuple(r) for r in got_df.collect()]
    if name not in ORACLES:
        # rows-only check (driver's weaker path)
        assert got_rows is not None
        return
    res = ddb.sql(ORACLES[name])
    want_cols = res.columns
    want_rows = res.fetchall()
    assert sorted(got_cols) == sorted(want_cols), \
        f"{name}: column mismatch {got_cols} vs {want_cols}"
    assert len(got_rows) == len(want_rows), \
        f"{name}: row count {len(got_rows)} vs {len(want_rows)}"
    g = _normalize(got_rows, got_cols)
    w = _normalize(want_rows, want_cols)
    mismatches = [(a, b) for a, b in zip(g, w) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["doc_id", "score"]
