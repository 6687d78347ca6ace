#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run graft.Verify output
against DuckDB oracles and compare (order-insensitive, columns sorted
by name, doubles rounded to 1e-2 per FIXTURES.md).

Usage: check_oracle.py <sfdir> <verify_outdir> [query ...]
"""
import sys, os, json, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{round(v, 2):.2f}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)

def norm_table(df):
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    rows.sort()
    return cols, rows

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        spark_dir = f"{outdir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output dir"); n_fail += 1; continue
        try:
            got = pq.read_table(spark_dir).to_pandas()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}"); n_fail += 1; continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        gc, gr = norm_table(got)
        ec, er = norm_table(exp)
        if gc != ec:
            print(f"FAIL {name}: columns differ spark={gc} duckdb={ec}"); n_fail += 1; continue
        if gr != er:
            n_fail += 1
            print(f"FAIL {name}: {len(gr)} vs {len(er)} rows; first diffs:")
            sg, se = set(gr), set(er)
            for r in list(sg - se)[:3]:
                print(f"  spark-only : {r}")
            for r in list(se - sg)[:3]:
                print(f"  duckdb-only: {r}")
            continue
        n_pass += 1
        print(f"PASS {name} ({len(gr)} rows)")
    # queries with no oracle => rows-only check
    for d in sorted(os.listdir(outdir)):
        if os.path.isdir(f"{outdir}/{d}") and d not in oracles:
            if only and d not in only:
                continue
            n = pq.read_table(f"{outdir}/{d}").num_rows
            print(f"ROWS {d}: {n} rows (no oracle)")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
