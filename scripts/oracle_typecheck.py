#!/usr/bin/env python3
"""Oracle output-type audit (driver-side python only — NOT part of the library).

DuckDB widens integer aggregates silently: sum(BIGINT) -> HUGEINT,
sum(INTEGER) -> HUGEINT, integer division of HUGEINTs stays HUGEINT.
Spark has no 128-bit integer, so a HUGEINT (or DECIMAL/FLOAT) oracle
column can never hash-match the Spark result even when the values are
numerically identical — that is exactly how p3_pivot and dq10_entropy
shipped red in rounds 11-12 while `sbt test` stayed green.

This script DESCRIBEs every SparkEntry.oracleSql entry in DuckDB over the
real testdata views and fails on any output column whose type Spark
cannot produce. Run it whenever an oracle changes:

    rm -rf /tmp/vtc && sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/vtc <any_gate>"
    python3 scripts/oracle_typecheck.py /root/testdata/sf0.001 /tmp/vtc/oracle_sql.json

(The Verify run is only needed to dump oracle_sql.json; one gate is enough.)
"""
import sys, os, json, re
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Types Spark can emit through a parquet dump of a DataFrame. Anything
# else (HUGEINT, DECIMAL, FLOAT, unsigned ints, ...) will value-hash
# differently from the Spark side even when numerically equal.
ALLOWED = re.compile(
    r"^(BIGINT|INTEGER|VARCHAR|DOUBLE|BOOLEAN|DATE|TIMESTAMP(_NS| WITH TIME ZONE)?|"
    r"(BIGINT|INTEGER|VARCHAR|DOUBLE)\[\])$")


def main(sf_dir, oracle_json):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(oracle_json))
    bad = 0
    for name in sorted(oracles):
        try:
            desc = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
        except Exception as e:
            print(f"FAIL {name}: DESCRIBE error: {e}")
            bad += 1
            continue
        offenders = [(c, ty) for c, ty, *_ in desc if not ALLOWED.match(ty)]
        if offenders:
            print(f"FAIL {name}: non-Spark-hashable column types {offenders}")
            bad += 1
    print(f"\n{len(oracles) - bad} clean, {bad} flagged of {len(oracles)}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
