#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare: reads the Spark
parquet dumps + oracle_sql.json from a Verify/DriveOracle out dir, runs each
oracle SQL in DuckDB over the sf parquet tables, and compares rows, schema
(column names sorted) and a value hash. Dev tooling only."""
import sys, json, hashlib
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
                # normalize -0.0 and format consistently
                if v == 0: v = 0.0
                vals.append(repr(v))
            else:
                vals.append(str(v))
        out.append("|".join(vals))
    out.sort()
    h = hashlib.sha256()
    for line in out:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16], out

def main(sf_dir, out_dir, names=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name, sql in sorted(oracle.items()):
        if names and name not in names: continue
        try:
            spark = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            s_cols = [d[0] for d in spark.description]
            s_rows = spark.fetchall()
            duck = con.execute(sql)
            d_cols = [d[0] for d in duck.description]
            d_rows = duck.fetchall()
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            fails += 1
            continue
        ok_rows = len(s_rows) == len(d_rows)
        ok_schema = sorted(s_cols) == sorted(d_cols)
        sh, s_lines = canon(s_rows, s_cols)
        dh, d_lines = canon(d_rows, d_cols)
        ok_hash = sh == dh
        status = "OK  " if (ok_rows and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            fails += 1
        print(f"{status} {name}: rows {len(s_rows)}/{len(d_rows)} "
              f"schema {sorted(s_cols)}=={sorted(d_cols)}:{ok_schema} hash {sh}/{dh}")
        if not ok_hash and ok_rows and ok_schema:
            s_set, d_set = set(s_lines), set(d_lines)
            for x in list(s_set - d_set)[:3]: print(f"   spark-only: {x}")
            for x in list(d_set - s_set)[:3]: print(f"   duck-only:  {x}")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_oracle_check"
    names = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    main(sf, out, names)
