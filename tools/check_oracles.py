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
    # registry↔report parity guard (r4 verdict "what's missing" #2): every
    # registered query must produce a visible row. The loop below prints one
    # row per visited query, so the only reachable gap is an ABNORMAL exit
    # mid-loop (KeyboardInterrupt, harness kill, non-Exception error) — the
    # finally turns the unvisited tail into explicit not_run rows instead of
    # a silently truncated report. (The driver-side tail-drop itself is
    # covered by the zz_tail_canary registry entry.)
    try:
        _check_all(spark, con, sf_dir, qs, os_, only, ran, fails)
    finally:
        if not only:
            for name in qs:
                if name not in ran:
                    print(f'FAIL {name}: {{"err": "not_run"}}')
                    fails.append(name)
    spark.stop()
    print(f"\n{len(fails)} failures" + (f": {fails}" if fails else ""))
    return 1 if fails else 0


def _check_all(spark, con, sf_dir, qs, os_, only, ran, fails) -> None:
    for name, fn in qs.items():
        if only and name not in only:
            continue
        msg, failed = _check_one(spark, con, sf_dir, name, fn, os_.get(name))
        ran.add(name)
        print(msg, flush=True)
        if failed:
            fails.append(name)


def _check_one(spark, con, sf_dir, name, fn, sql) -> tuple[str, bool]:
    try:
        sdf = fn(spark, sf_dir).toPandas()
    except Exception as e:  # noqa: BLE001
        return f"FAIL {name}: spark error {type(e).__name__}: {e}", True
    if sql is None:
        return f"ROWS {name}: {len(sdf)} rows (no oracle)", False
    try:
        ddf = con.execute(sql).df()
    except Exception as e:  # noqa: BLE001
        return f"FAIL {name}: duckdb error {type(e).__name__}: {e}", True
    if sorted(sdf.columns) != sorted(ddf.columns):
        return (
            f"FAIL {name}: columns {sorted(sdf.columns)} vs {sorted(ddf.columns)}",
            True,
        )
    a, b = normalize(sdf), normalize(ddf)
    if len(a) != len(b):
        return f"FAIL {name}: rows {len(a)} vs {len(b)}", True
    if not a.equals(b):
        neq = (a != b) & ~(a.isna() & b.isna())
        bad = neq.any(axis=1)
        return (
            f"FAIL {name}: {int(bad.sum())} mismatched rows of {len(a)}\n"
            f" spark: {a[bad].head(3).to_dict('records')}\n"
            f" duck : {b[bad].head(3).to_dict('records')}",
            True,
        )
    return f"OK   {name}: {len(a)} rows", False


if __name__ == "__main__":
    sys.exit(main())
