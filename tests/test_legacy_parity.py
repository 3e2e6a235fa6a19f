"""DuckDB parity for the retired-from-gate registry: every
legacy_queries() entry must still match its legacy_oracle_sql() twin
(row count, column names, order-insensitive 6-dp-stringified values) —
the same comparison the driver gate applies to queries(). Runs at
sf0.001 so the whole sweep stays cheap."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.6f}"
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(entrymod.legacy_queries()))
def test_legacy_query_matches_oracle(spark, duck, name):
    fn = entrymod.legacy_queries()[name]
    sql = entrymod.legacy_oracle_sql()[name]
    sdf = fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.sql(sql)
    dcols = list(res.columns)
    drows = res.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert _normalize(srows, sdf.columns) == _normalize(drows, dcols)
    assert len(srows) > 0
