#!/usr/bin/env python3
"""Local replica of the driver's t2 DuckDB-oracle gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Mimics the driver's ASYMMETRIC read path (learned from round 1):
the Spark result parquet is read via pyarrow/pandas (decimals stay
python Decimal, int64 stays int64), while the oracle SQL runs in
DuckDB and is fetched via .df() (DECIMAL and HUGEINT become float64).
Values are then canonicalized to strings and compared — so a DECIMAL
output column ('123.40' vs '123.4') or a DuckDB integer-sum HUGEINT
('123' vs '123.0') FAILS here exactly like it fails in the driver.

Policy that keeps queries green: final output columns must be
string/bigint/double/date/timestamp/bool (never DECIMAL; wrap DuckDB
integer sums in CAST(... AS BIGINT)).
"""
import datetime
import decimal
import json
import math
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd


def canon(v):
    if v is None or v is pd.NaT:
        return "null"
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return "null"
        return repr(float(v))
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        return str(v)  # deliberately NOT normalized — mimics the driver
    if isinstance(v, pd.Timestamp):
        if v is pd.NaT:
            return "null"
        return v.isoformat()
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return datetime.datetime(v.year, v.month, v.day).isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if v is pd.NaT:
        return "null"
    try:
        if pd.isna(v):
            return "null"
    except (TypeError, ValueError):
        pass
    return str(v)


def df_rows(df):
    cols = list(df.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in df.itertuples(index=False, name=None):
        out.append(tuple(canon(row[i]) for i in order))
    return sorted(cols), sorted(out)


def spark_df(spark_dir):
    parts = sorted(Path(spark_dir).glob("*.parquet"))
    return pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])  # optional: check just these query names
    oracles = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    results = {}
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        spark_dir = Path(out_dir) / name
        if not spark_dir.exists():
            results[name] = "MISSING spark output"
            n_fail += 1
            continue
        try:
            scols, srows = df_rows(spark_df(spark_dir))
            ocols, orows = df_rows(con.execute(oracles[name]).df())
        except Exception as e:
            results[name] = f"ERROR {e}"
            n_fail += 1
            continue
        if scols != ocols:
            results[name] = f"SCHEMA spark={scols} oracle={ocols}"
            n_fail += 1
        elif len(srows) != len(orows):
            results[name] = f"ROWCOUNT spark={len(srows)} oracle={len(orows)}"
            n_fail += 1
        elif srows != orows:
            diffs = [i for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
            i = diffs[0]
            results[name] = (f"VALUES {len(diffs)}/{len(srows)} rows differ; "
                             f"first at {i}:\n  spark : {srows[i]}\n  oracle: {orows[i]}")
            n_fail += 1
        else:
            results[name] = f"OK ({len(srows)} rows)"
            n_pass += 1

    for name, res in results.items():
        mark = "PASS" if res.startswith("OK") else "FAIL"
        print(f"[{mark}] {name}: {res}")
    print(f"\n{n_pass} pass / {n_fail} fail / {len(results)} checked")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
