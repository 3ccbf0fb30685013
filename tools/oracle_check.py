#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Mirrors the driver: registers every <sfDir>/*.parquet as a DuckDB view,
loads <outDir>/oracle_sql.json, runs each SQL, and compares against the
Spark result parquet at <outDir>/<name>/ on (row count, sorted column
names, hash of values with columns sorted by name and rows sorted).
"""
import sys, os, json, glob, hashlib
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

def type_class(t):
    """Coarse type class for driver-canonicalization compatibility.

    The driver hashes values after an arrow/pandas round-trip, where a
    DuckDB HUGEINT (e.g. sum over BIGINT) surfaces as decimal128(38,0) →
    float64 and prints '7949.0' against Spark's int64 '7949' — identical
    values, broken hash (the r3 q_docs_rollup red row). Any int-vs-float
    class mismatch between the Spark parquet schema and the oracle arrow
    schema is therefore a latent driver failure even when our own
    fetchall()-based hash passes.
    """
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t) or pa.types.is_decimal(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    if pa.types.is_struct(t):
        return "struct"
    return str(t)

def type_drift(spark_schema, oracle_schema):
    """Return [(col, spark_type, oracle_type)] where the int/float class
    differs — the representation drift the driver's hash canon cannot
    absorb. float-vs-decimal is tolerated (fractional decimals canon fine,
    judge-verified on kg_mentions.confidence)."""
    drift = []
    o_by_name = {f.name: f.type for f in oracle_schema}
    for f in spark_schema:
        ot = o_by_name.get(f.name)
        if ot is None:
            continue
        cs, co = type_class(f.type), type_class(ot)
        if cs != co and {cs, co} == {"int", "float"}:
            drift.append((f.name, str(f.type), str(ot)))
    return drift

def canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_cell(v[k])}" for k in sorted(v)) + "}"
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(canon_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode("utf-8", "surrogatepass"))
        h.update(b"\n")
    return h.hexdigest()

def read_spark(path):
    t = pq.read_table(path)
    cols = list(t.column_names)
    rows = [tuple(d[c] for c in cols) for d in t.to_pylist()]
    return cols, rows

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    ok = fail = err = 0
    for name in sorted(oracle):
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"MISSING_SPARK {name}")
            err += 1
            continue
        try:
            cur = con.execute(oracle[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            oschema = con.execute(oracle[name]).fetch_arrow_table().schema
        except Exception as e:
            print(f"ORACLE_ERR   {name}: {str(e).splitlines()[0][:160]}")
            err += 1
            continue
        scols, srows = read_spark(spark_path)
        sschema = pq.read_table(spark_path).schema
        problems = []
        for c, st, ot in type_drift(sschema, oschema):
            problems.append(f"TYPE_DRIFT {c}: spark={st} oracle={ot} (driver hash canon will diverge — CAST the oracle column)")
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema {sorted(scols)} vs {sorted(ocols)}")
        if not problems:
            hs, ho = table_hash(scols, srows), table_hash(ocols, orows)
            if hs != ho:
                problems.append("hash mismatch")
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ls = sorted("\x1f".join(canon_cell(r[i]) for i in order_s) for r in srows)
                lo = sorted("\x1f".join(canon_cell(r[i]) for i in order_o) for r in orows)
                diffs = [(a, b) for a, b in zip(ls, lo) if a != b][:3]
                for a, b in diffs:
                    problems.append(f"  spark : {a[:200]}")
                    problems.append(f"  oracle: {b[:200]}")
        if problems:
            print(f"FAIL         {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(p)
            fail += 1
        else:
            print(f"OK           {name} ({len(srows)} rows)")
            ok += 1
    print(f"\n== {ok} ok, {fail} fail, {err} err of {len(oracle)}")
    sys.exit(0 if fail == 0 and err == 0 else 1)

if __name__ == "__main__":
    main()
