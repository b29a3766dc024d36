"""Local replica of the driver's differential gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
over the same parquet dir; compare row count, column set, and
order-insensitive values.  Usage:

    python scripts/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")
import __spark_entry__ as entry_mod  # noqa: E402

from graph_mining_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        else:
            df[c] = df[c].astype("string")
    return df.sort_values(list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    known = set(entry_mod.queries())
    unknown = only - known
    if unknown:
        # a typo'd filter must not report "0 failures" with zero checks run
        print(f"FAIL  unknown query name(s): {sorted(unknown)}")
        return 1
    spark = get_spark(app_name="check-oracles")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    n_fail = 0
    import time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        spark_wall = time.monotonic() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{spark_wall:.2f}s]")
            continue
        try:
            ddf = con.sql(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        a, b = normalize(sdf), normalize(ddf)
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL  {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        bad = None
        for c in a.columns:
            if pd.api.types.is_float_dtype(a[c]):
                # EXACT — the driver hashes the values; both sides round
                # to 6dp (cosine 4dp) inside the queries, so matching
                # decimals are bit-identical doubles, and a tolerance
                # here would hide exactly the divergence class (opposite
                # sides of a rounding boundary) the gate exists to catch
                ok = np.array_equal(a[c].to_numpy(), b[c].to_numpy(), equal_nan=True)
            else:
                ok = a[c].equals(b[c])
            if not ok:
                bad = c
                break
        if bad:
            diff = pd.concat([a[bad], b[bad]], axis=1, keys=["spark", "duckdb"])
            mism = diff[diff.iloc[:, 0].astype(str) != diff.iloc[:, 1].astype(str)]
            print(f"FAIL  {name}: column {bad} mismatches ({len(mism)} rows), e.g.\n{mism.head(3)}")
            n_fail += 1
        else:
            print(f"OK    {name}: {len(a)} rows [{spark_wall:.2f}s]")
    print(f"\n{n_fail} failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
