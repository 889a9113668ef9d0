"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

Usage: python tools/compare.py [sf_dir] [query ...]
Compares row count, column names, and order-insensitive value hash.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from mmgraphrag_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(df, cols):
    """Sort columns by name, round floats, stringify, sort rows."""
    import pandas as pd

    df = df[sorted(cols)].copy()
    for c in df.columns:
        if df[c].dtype == "float64" or df[c].dtype == "float32":
            df[c] = df[c].round(6)
    rows = sorted(tuple(str(v) for v in row) for row in df.itertuples(index=False))
    return rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    spark = get_spark("compare")
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir).toPandas()
        if name not in os_:
            print(f"{name}: rows={len(sdf)} (no oracle)")
            continue
        odf = con.execute(os_[name]).df()
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        ok_schema = scols == ocols
        ok_rows = len(sdf) == len(odf)
        ok_vals = ok_schema and ok_rows and norm(sdf, scols) == norm(odf, ocols)
        status = "OK" if (ok_schema and ok_rows and ok_vals) else "FAIL"
        print(f"{name}: {status} spark_rows={len(sdf)} oracle_rows={len(odf)}"
              f" schema={'OK' if ok_schema else f'{scols} vs {ocols}'}")
        if status == "FAIL":
            failed.append(name)
            if ok_schema and ok_rows:
                a, b = norm(sdf, scols), norm(odf, ocols)
                diff = [x for x in a if x not in set(b)][:3]
                diff2 = [x for x in b if x not in set(a)][:3]
                print("  spark-only:", diff)
                print("  oracle-only:", diff2)
    print("FAILED:", failed or "none")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
