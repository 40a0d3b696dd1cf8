"""Drive the driver contract for a subset of gates, like the driver does.

Usage: python3 tools/drive_gates.py [gate ...]
       python3 tools/drive_gates.py --window N   (first N window gates)
Compares Spark vs DuckDB oracle at $PARITY_SF_DIR (default sf0.01):
row count, sorted-column schema, order-insensitive value hash.
"""
from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(pdf: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = []
    for row in pdf.itertuples(index=False):
        parts = []
        for v in row:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                parts.append("NULL")
            elif isinstance(v, float):
                parts.append(f"{v:.9g}")
            else:
                parts.append(str(v))
        rows.append("|".join(parts))
    rows.sort()
    h = hashlib.md5("\n".join(rows).encode()).hexdigest()
    return len(pdf), cols, h


def main() -> int:
    sf = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as e
    from hypermap_etl_spark.session import get_spark

    args = sys.argv[1:]
    qs = e.queries()
    sqls = e.oracle_sql()
    if args and args[0] == "--all":
        names = list(qs)
    elif args and args[0] == "--window":
        names = list(qs)[: int(args[1])]
    elif args:
        names = args
    else:
        names = list(qs)[:50]

    spark = get_spark("drive")
    spark.sparkContext.setLogLevel("OFF")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    n_bad = 0
    for name in names:
        try:
            spdf = qs[name](spark, sf).toPandas()
            sql = sqls.get(name)
            if sql is None:
                print(f"{name}: rows={len(spdf)} (no oracle)")
                continue
            opdf = con.execute(sql).df()
            sr, sc, sh = canon(spdf)
            orr, oc, oh = canon(opdf)
            ok = sr == orr and sc == oc and sh == oh
            if not ok:
                n_bad += 1
                print(f"{name}: FAIL rows {sr}/{orr} schema_match={sc == oc} hash_match={sh == oh}")
                if sc != oc:
                    print("  spark cols:", sc)
                    print("  oracle cols:", oc)
            else:
                print(f"{name}: ok rows={sr}")
        except Exception as ex:  # noqa: BLE001
            n_bad += 1
            print(f"{name}: ERROR {type(ex).__name__}: {str(ex)[:300]}")
    print(f"done: {len(names) - n_bad}/{len(names)} ok")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
