#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads the Verify output
dir (parquet per query + oracle_sql.json), runs each oracle in DuckDB over
the same sf tables, and compares schema-sorted, row-sorted values exactly.

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)          # full precision
    return repr(v)

def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"MISSING  {name} (no spark output)")
            n_fail += 1
            continue
        try:
            sp = con.execute(
                f"SELECT * FROM read_parquet('{spark_path}/*.parquet')")
            sp_cols = [d[0] for d in sp.description]
            sp_rows = sp.fetchall()
            du = con.execute(sql)
            du_cols = [d[0] for d in du.description]
            du_rows = du.fetchall()
        except Exception as e:
            print(f"ERROR    {name}: {str(e)[:200]}")
            n_fail += 1
            continue
        if sorted(sp_cols) != sorted(du_cols):
            print(f"SCHEMA   {name}: spark={sorted(sp_cols)} duck={sorted(du_cols)}")
            n_fail += 1
            continue
        # The driver's hash is TYPE-sensitive (r10 lesson: DuckDB SUM(BIGINT)
        # → HUGEINT hashed differently from BIGINT despite identical values).
        # Compare declared column types per name, not just values.
        sp_types = {c: str(t) for c, t, *_ in sp.description}
        du_types = {c: str(t) for c, t, *_ in du.description}
        ty_diffs = [(c, sp_types[c], du_types[c]) for c in sp_types
                    if sp_types[c] != du_types[c]]
        if ty_diffs:
            print(f"TYPES    {name}: {ty_diffs}")
            n_fail += 1
            continue
        c1, r1 = norm_rows(sp_cols, sp_rows)
        c2, r2 = norm_rows(du_cols, du_rows)
        if len(r1) != len(r2):
            print(f"ROWS     {name}: spark={len(r1)} duck={len(r2)}")
            n_fail += 1
            continue
        diffs = [(a, b) for a, b in zip(r1, r2) if a != b]
        if diffs:
            print(f"VALUES   {name}: {len(diffs)} differing rows; first: spark={diffs[0][0]} duck={diffs[0][1]}")
            n_fail += 1
        else:
            print(f"PASS     {name} ({len(r1)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
