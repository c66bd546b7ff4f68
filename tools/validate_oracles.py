"""Local replica of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB at a given sf
dir, compare row count, schema width, and an order-insensitive value
hash (columns sorted by name, rows sorted, values stringified)."""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object and len(col) and isinstance(col.iloc[0], (bytes, bytearray)):
            df[c] = col.map(lambda b: b.hex())
        elif str(col.dtype).startswith("datetime"):
            df[c] = col.astype("datetime64[us]").astype(str)
        elif col.dtype == "float64" or col.dtype == "float32":
            df[c] = col.map(lambda v: f"{v:.9g}" if pd.notna(v) else "null")
        else:
            df[c] = col.astype(str)
    rows = ["\x01".join(r) for r in df.itertuples(index=False, name=None)]
    rows.sort()
    return hashlib.md5("\x02".join(rows).encode()).hexdigest()


def main(sf_dir: str = "/root/testdata/sf0.01", only: str | None = None):
    from __spark_entry__ import oracle_sql, queries
    from geospark.session import build_session

    spark = build_session("oracle-validate", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = queries()
    os_ = oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and only != name:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"{name}: SPARK FAIL {type(e).__name__}: {e}")
            failures.append(name)
            continue
        took = time.time() - t0
        if name not in os_:
            print(f"{name}: rows-only ({len(sdf)} rows, {took:.1f}s)")
            if len(sdf) == 0:
                failures.append(name)
            continue
        try:
            odf = con.sql(os_[name]).df()
        except Exception as e:
            print(f"{name}: ORACLE FAIL {type(e).__name__}: {e}")
            failures.append(name)
            continue
        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(map(str.lower, sdf.columns)) == sorted(map(str.lower, odf.columns))
        odf.columns = [c.lower() for c in odf.columns]
        sdf.columns = [c.lower() for c in sdf.columns]
        h1 = value_hash(sdf) if ok_cols else "x"
        h2 = value_hash(odf) if ok_cols else "y"
        status = "OK" if (ok_rows and ok_cols and h1 == h2) else "MISMATCH"
        print(
            f"{name}: {status} rows {len(sdf)}/{len(odf)} cols {list(sdf.columns)} vs {list(odf.columns)} ({took:.1f}s)"
        )
        if status != "OK":
            failures.append(name)
            if ok_cols and ok_rows:
                # show first differing rows
                a = sdf[sorted(sdf.columns)].astype(str).apply(lambda r: "|".join(r), axis=1).sort_values()
                b = odf[sorted(odf.columns)].astype(str).apply(lambda r: "|".join(r), axis=1).sort_values()
                sa, sb = set(a), set(b)
                print("   spark-only:", list(sa - sb)[:3])
                print("   oracle-only:", list(sb - sa)[:3])
    print("FAILURES:", failures or "none")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
