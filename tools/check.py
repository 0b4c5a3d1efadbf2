#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>
Reads each <outDir>/<name> parquet dir written by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
parquet tables in <sfDir>, and compares: row count, column names (sorted),
and a hash over all values with columns sorted by name and rows sorted.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: everything to string via repr-stable conversion
    def cell(v):
        if v is None or v != v:  # NaN/None
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        return str(v)
    out = df.apply(lambda c: c.map(cell))
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written layout (e.g. tools/ScaleUp sf1 output): a
            # directory of part files rather than one parquet file
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        # graft.Verify writes an _ERROR sentinel when a query throws or times
        # out — an explicit FAIL row, never silent absence (and it poisons any
        # partial parquet an uncancellable writer may have left behind)
        err_file = os.path.join(out_dir, name, "_ERROR")
        if os.path.exists(err_file):
            msg = open(err_file).read().strip()[:200]
            print(f"FAIL  {name}: _ERROR sentinel: {msg}"); n_fail += 1; continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no parquet written"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracle:
            status = "ROWS-ONLY" if len(got) > 0 else "ROWS-ONLY-EMPTY"
            print(f"{status:9s} {name}: rows={len(got)}"); n_rowsonly += 1
            continue
        try:
            want = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error {str(e)[:200]}"); n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL  {name}: rows got={len(got)} want={len(want)}"); n_fail += 1; continue
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL  {name}: cols got={sorted(got.columns)} want={sorted(want.columns)}")
            n_fail += 1; continue
        cg, cw = canon(got), canon(want)
        if cg.equals(cw):
            print(f"PASS  {name}: rows={len(got)}"); n_pass += 1
        else:
            diff = (cg != cw).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"FAIL  {name}: value mismatch in {int(diff.sum())}/{len(cg)} rows")
            for i in idx:
                print(f"      got : {cg.loc[i].to_dict()}")
                print(f"      want: {cw.loc[i].to_dict()}")
            n_fail += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
