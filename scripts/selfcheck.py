#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 scripts/selfcheck.py <verify_out_dir> <sf_dir> [query ...]

For each query: run the oracle SQL in DuckDB over the sf parquet tables,
read the Spark result parquet, sort columns by name, sort rows, and
hash-compare values (round-trip via repr with float rounding).
"""
import sys, os, json, glob, hashlib

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return format(v, ".6g")
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result")
            n_fail += 1
            continue
        tbl = pq.read_table(spark_dir)
        s_cols = list(tbl.column_names)
        s_rows = [tuple(r[c] for c in s_cols) for r in tbl.to_pylist()]
        try:
            cur = con.execute(oracle[name])
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        rows_ok = len(s_rows) == len(o_rows)
        schema_ok = sorted(c.lower() for c in s_cols) == \
            sorted(c.lower() for c in o_cols)
        hash_ok = schema_ok and \
            table_hash([c.lower() for c in s_cols], s_rows) == \
            table_hash([c.lower() for c in o_cols], o_rows)
        if rows_ok and schema_ok and hash_ok:
            n_pass += 1
            print(f"pass {name} ({len(s_rows)} rows)")
        else:
            n_fail += 1
            print(f"FAIL {name}: rows {len(s_rows)}/{len(o_rows)} "
                  f"schema_ok={schema_ok} hash_ok={hash_ok} "
                  f"spark_cols={s_cols} oracle_cols={o_cols}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
