#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB against
the testdata parquet tables, loads the corresponding Spark result
parquet, and compares: row count, column names, and a canonical
sorted-row hash (columns sorted by name, rows sorted, values
stringified with repr for floats).

Usage: python3 tools/local_oracle.py /tmp/verify_out /root/testdata/sf0.01
"""
import json, sys, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NULL"
            return repr(v)
        return str(v)
    rows = ["\x01".join(cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort()
    return cols, rows

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_fail += 1
            continue
        wc, wr = canon(want)
        gc, gr = canon(got)
        if wc != gc:
            print(f"FAIL {name}: columns want={wc} got={gc}")
            n_fail += 1
        elif len(wr) != len(gr):
            print(f"FAIL {name}: rows want={len(wr)} got={len(gr)}")
            n_fail += 1
        elif wr != gr:
            bad = [(a, b) for a, b in zip(wr, gr) if a != b][:3]
            print(f"FAIL {name}: value mismatch ({sum(1 for a,b in zip(wr,gr) if a!=b)} rows); first: ")
            for a, b in bad:
                print(f"   want {a[:200]}")
                print(f"   got  {b[:200]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(wr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
