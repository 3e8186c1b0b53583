"""Local replica of the driver's correctness gate: run every queries() entry
and its DuckDB oracle at a given SF, compare row count, schema-insensitive
sorted values. Usage: python tools/check_oracles.py [sf_dir] [names...]"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as E  # noqa: E402
from cie_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            s = pd.to_datetime(df[c])
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = np.round(df[c].astype(float), 6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app="oracle_check", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, os_ = E.queries(), E.oracle_sql()
    fails = []
    ran: set[str] = set()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        ran.add(name)
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            fails.append(name)
            continue
        sql = os_.get(name)
        if sql is None:
            print(f"ROWS {name}: {len(sdf)} rows (no oracle)")
            continue
        try:
            ddf = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            fails.append(name)
            continue
        if sorted(sdf.columns) != sorted(ddf.columns):
            print(f"FAIL {name}: columns {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
            fails.append(name)
            continue
        a, b = normalize(sdf), normalize(ddf)
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            fails.append(name)
            continue
        if not a.equals(b):
            neq = (a != b) & ~(a.isna() & b.isna())
            bad = neq.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())} mismatched rows of {len(a)}")
            print(" spark:", a[bad].head(3).to_dict("records"))
            print(" duck :", b[bad].head(3).to_dict("records"))
            fails.append(name)
            continue
        print(f"OK   {name}: {len(a)} rows")
    spark.stop()
    # registry↔report parity guard (r4 verdict "what's missing" #2): any
    # registered query that produced no row above is an explicit failure,
    # never a silent gap — a tail-drop must be visible in the artifact
    if not only:
        for name in qs:
            if name not in ran:
                print(f'FAIL {name}: {{"err": "not_run"}}')
                fails.append(name)
    print(f"\n{len(fails)} failures" + (f": {fails}" if fails else ""))
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
