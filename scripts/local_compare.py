#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: local_compare.py <sfDir> <verifyOutDir> [query ...]

For each query dumped by graft.Verify into <verifyOutDir>/<name>/, runs
the matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over
the parquet tables in <sfDir>, then compares row count, sorted column
names, and an order-insensitive value hash (values rendered to strings,
floats rounded to 9 significant digits to absorb fp noise, rows sorted).
"""
import sys, json, glob, hashlib

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.9g}"
            elif isinstance(v, bool):
                v = str(v).lower()
            vals.append("NULL" if v is None else str(v))
        out.append("\x01".join(vals))
    out.sort()
    h = hashlib.md5()
    for line in out:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            continue  # not dumped in this (subset) run
        spark_rel = con.sql(
            "SELECT * FROM read_parquet([" +
            ",".join(f"'{f}'" for f in files) + "])")
        scols, srows = spark_rel.columns, spark_rel.fetchall()
        try:
            orel = con.sql(sql)
            ocols, orows = orel.columns, orel.fetchall()
        except Exception as e:
            print(f"{name}: ORACLE ERR {e}")
            bad += 1
            continue
        rows_ok = len(srows) == len(orows)
        schema_ok = sorted(scols) == sorted(ocols)
        hash_ok = schema_ok and canon(srows, scols) == canon(orows, ocols)
        status = "OK" if (rows_ok and schema_ok and hash_ok) else "FAIL"
        if status == "FAIL":
            bad += 1
        print(f"{name}: {status} rows={len(srows)}/{len(orows)} "
              f"schema={schema_ok} hash={hash_ok}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
