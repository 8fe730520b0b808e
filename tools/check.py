#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over the fixture tables, and
compares values column-name-sorted, order-sensitively and -insensitively.
Dev tool only — not part of the library (driver has duckdb; our engine
doesn't depend on it).
"""
import json, sys, glob, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style value hash: canonical repr
        return repr(v)
    return repr(v)

def rows_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(norm_cell(r[i]) for i in order) for r in rows]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not res_files:
            print(f"FAIL {name}: no spark result written"); n_fail += 1; continue
        try:
            spark_rel = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            scols, srows = spark_rel.columns, spark_rel.fetchall()
            duck_rel = con.sql(sql)
            dcols, drows = duck_rel.columns, duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: cols spark={sorted(scols)} duck={sorted(dcols)}"); n_fail += 1; continue
        sk, dk = rows_key(scols, srows), rows_key(dcols, drows)
        if sk == dk:
            print(f"PASS {name} ({len(srows)} rows)"); n_pass += 1
        elif sorted(sk) == sorted(dk):
            print(f"PASS* {name} ({len(srows)} rows; order differs)"); n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}")
            sset, dset = set(sk), set(dk)
            for x in list(sset - dset)[:3]:
                print(f"   spark-only: {x}")
            for x in list(dset - sset)[:3]:
                print(f"   duck-only:  {x}")
    # names declared in queries but absent from oracle: rows-only check
    import os
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in oracle:
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL {name}: no-oracle query wrote no output"); n_fail += 1; continue
        n = con.sql(f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
        if n > 0:
            print(f"PASS~ {name} ({n} rows, rows-only check)"); n_pass += 1
        else:
            print(f"FAIL {name}: no-oracle query returned 0 rows"); n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
