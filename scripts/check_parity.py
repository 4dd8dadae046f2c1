#!/usr/bin/env python3
"""Local dev harness (driver-side python only — NOT part of the library).

Mimics the driver's correctness gate: reads the parquet dumps written by
`graft.Verify <sfDir> <outDir>`, runs each oracle_sql.json entry in DuckDB
over the same sf tables, and compares row sets (columns sorted by name,
rows sorted, values stringified with float rounding).

Usage: python3 scripts/check_parity.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(val):
    if val is None:
        return "NULL"
    if isinstance(val, float):
        # 12 significant digits: tight enough to catch the q9-class
        # rounding-tie drift (absolute 0.01 differences) that %.6g masked
        # through rounds 11-12, loose enough to ignore last-ulp libm noise
        # the driver also tolerates. Money gates are exact-integer-derived
        # since round 13 and match at full precision anyway.
        return f"{val:.12g}"
    if isinstance(val, bool):
        return str(int(val))
    if isinstance(val, (list, tuple)):
        return "[" + ",".join(canon(v) for v in val) + "]"
    return str(val)

def table_canon(tbl):
    cols = sorted(tbl.column_names)
    pydict = {c: tbl.column(c).to_pylist() for c in cols}
    rows = [tuple(canon(pydict[c][i]) for c in cols) for i in range(tbl.num_rows)]
    return cols, sorted(rows)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        spark_tbl = pq.read_table(files[0])
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({spark_tbl.num_rows} rows)"); continue
        try:
            duck_tbl = con.execute(oracles[name]).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        sc, sr = table_canon(spark_tbl)
        dc, dr = table_canon(duck_tbl)
        if sc != dc:
            print(f"FAIL {name}: schema mismatch spark={sc} duck={dc}"); n_fail += 1
        elif sr != dr:
            diff1 = [r for r in sr if r not in set(dr)][:3]
            diff2 = [r for r in dr if r not in set(sr)][:3]
            print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)} "
                  f"spark-only={diff1} duck-only={diff2}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sr)} rows"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
