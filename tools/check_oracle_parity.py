"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.01, compare row count, column names, and (order-insensitively)
values. Usage: python tools/check_oracle_parity.py [name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> str:
    if len(spark_pdf) != len(duck_pdf):
        return f"ROWS {len(spark_pdf)} vs {len(duck_pdf)}"
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return f"SCHEMA {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    a, b = canon(spark_pdf), canon(duck_pdf)
    inexact = []
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            af, bf = av.astype(float), bv.astype(float)
            if not np.allclose(af, bf, atol=1e-9, rtol=0, equal_nan=True):
                bad = np.where(~np.isclose(af, bf, atol=1e-9, rtol=0))[0][:3]
                return f"VALUES col={c} rows={bad.tolist()} {av[bad]} vs {bv[bad]}"
            # the real driver hashes values — bit-inequality after the
            # query's own rounding WOULD fail there even though allclose
            # passes here
            neq = ~((af == bf) | (np.isnan(af) & np.isnan(bf)))
            if neq.any():
                inexact.append(f"{c}:{int(neq.sum())}")
        else:
            if not (av.astype(str) == bv.astype(str)).all():
                bad = np.where(av.astype(str) != bv.astype(str))[0][:3]
                return f"VALUES col={c} rows={bad.tolist()} {av[bad]} vs {bv[bad]}"
    if inexact:
        return f"OK-BUT-INEXACT[{', '.join(inexact)}]"
    return "OK"


def main() -> int:
    import __spark_entry__ as entrymod
    from pagerank_service_spark.session import get_session

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(sys.argv[1:])

    spark = get_session(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    failures = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"{name:32s} SPARK-ERROR {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name:32s} rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            if len(sdf) == 0:
                print(f"    WARNING: 0 rows")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"{name:32s} DUCKDB-ERROR {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        verdict = compare(name, sdf, ddf)
        print(f"{name:32s} {verdict} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
        if verdict != "OK":
            failures += 1
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
