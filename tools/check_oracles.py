#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness compare.

Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir>

For each query in oracle_sql.json: run the SQL in DuckDB (with the sfDir
tables registered as views), load the Spark parquet result, and compare
row count, column names, and a row-order-sensitive hash of values with
columns sorted by name (mirroring the driver's documented compare).
"""
import sys, json, glob, hashlib
import duckdb

def norm(v):
    if isinstance(v, float):
        return f"{v:.9g}"
    if v is None:
        return "NULL"
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(norm(r[i]) for i in order).encode())
        h.update(b"\x1e")
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in glob.glob(f"{sf_dir}/*.parquet"):
        name = t.split("/")[-1].replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noor = 0
    for name in sorted(glob.glob(f"{out_dir}/*/") ):
        qname = name.rstrip("/").split("/")[-1]
        if qname == "_fixtures":
            continue
        spark_files = glob.glob(f"{name}/*.parquet")
        if not spark_files:
            print(f"{qname:30s} NO SPARK OUTPUT"); n_fail += 1; continue
        srel = con.execute(f"SELECT * FROM read_parquet('{name}/*.parquet')")
        scols = [d[0] for d in srel.description]
        srows = srel.fetchall()
        if qname not in oracles:
            print(f"{qname:30s} no_oracle ({len(srows)} rows)"); n_noor += 1; continue
        try:
            orel = con.execute(oracles[qname])
            ocols = [d[0] for d in orel.description]
            orows = orel.fetchall()
        except Exception as e:
            print(f"{qname:30s} ORACLE SQL ERROR: {str(e)[:160]}"); n_fail += 1; continue
        rows_ok = len(srows) == len(orows)
        cols_ok = sorted(scols) == sorted(ocols)
        hash_ok = rows_ok and cols_ok and table_hash(scols, srows) == table_hash(ocols, orows)
        if rows_ok and cols_ok and hash_ok:
            print(f"{qname:30s} OK ({len(srows)} rows)"); n_pass += 1
        else:
            print(f"{qname:30s} MISMATCH rows {len(srows)}/{len(orows)} cols_ok={cols_ok} "
                  f"scols={sorted(scols)} ocols={sorted(ocols)}")
            if rows_ok and cols_ok:
                # show first differing row
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                for i, (a, b) in enumerate(zip(srows, orows)):
                    ra = ["%s" % norm(a[j]) for j in order_s]
                    rb = ["%s" % norm(b[j]) for j in order_o]
                    if ra != rb:
                        print(f"   first diff row {i}:\n   spark:  {ra}\n   oracle: {rb}")
                        break
            n_fail += 1
    print(f"\npass={n_pass} fail={n_fail} no_oracle={n_noor}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
