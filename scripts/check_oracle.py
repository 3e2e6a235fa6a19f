"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry at sf0.01 and diff it against
oracle_sql() via DuckDB (row count, column names, order-insensitive
stringified values)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from py3dtiles_spark.session import get_spark

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(rows, cols):
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


def main(sf_dir: str = "/root/testdata/sf0.01", only: list[str] | None = None):
    # path-embedding oracles (tiling_octree's checkpoint twin) follow the
    # sf dir through this env var; the driver gate leaves it unset and
    # gets the sf0.01 default
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    spark = get_spark("oracle-check", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows "
                  f"({time.time() - t0:.1f}s)")
            continue
        try:
            res = con.sql(oracles[name])
            dcols = [c for c in res.columns]
            drows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {e}")
            continue
        ok_schema = sorted(scols) == sorted(dcols)
        sn = normalize(srows, scols)
        dn = normalize(drows, dcols)
        ok = ok_schema and sn == dn
        status = "OK  " if ok else "FAIL"
        if not ok:
            failures.append(name)
        print(f"{status} {name}: spark={len(srows)} duck={len(drows)} "
              f"schema={'=' if ok_schema else f'{sorted(scols)} vs {sorted(dcols)}'} "
              f"({time.time() - t0:.1f}s)")
        if not ok and sn != dn:
            diff_s = [r for r in sn if r not in set(dn)][:3]
            diff_d = [r for r in dn if r not in set(sn)][:3]
            print(f"     spark-only: {diff_s}")
            print(f"     duck-only:  {diff_d}")
    spark.stop()
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    raise SystemExit(main(only=only))
