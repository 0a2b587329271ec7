#!/usr/bin/env python3
"""Local replica of the driver's t2 DuckDB-oracle gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the testdata
parquet tables, sorts columns by name and rows by value, and compares.
"""
import json
import math
import sys
from pathlib import Path

import duckdb


def canon(v):
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", repr(v))
    if isinstance(v, (list, tuple)):
        return ("l", tuple(canon(x) for x in v))
    import decimal
    if isinstance(v, decimal.Decimal):
        return ("d", str(v.normalize()))
    return (type(v).__name__[:1], str(v))


def table_rows(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
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
        spark_dir = Path(out_dir) / name
        if not spark_dir.exists():
            results[name] = "MISSING spark output"
            n_fail += 1
            continue
        try:
            scols, srows = table_rows(
                con, f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            ocols, orows = table_rows(con, oracles[name])
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
    print(f"\n{n_pass} pass / {n_fail} fail / {len(oracles)} with oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
