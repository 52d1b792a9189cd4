#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only, not part
of the shipped library): reads Verify.scala's output dir, runs each oracle
SQL in DuckDB over the same parquet tables, and compares row count, schema,
and value hash (columns sorted by name, rows in result order)."""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import hashlib

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    # normalize: floats to 9 significant decimals repr, ints to int64
    out = []
    for col in df.columns:
        s = df[col]
        if pd.api.types.is_float_dtype(s):
            out.append(s.map(lambda v: f"{v:.9g}"))
        else:
            out.append(s.astype(str))
    rows = pd.concat(out, axis=1).astype(str).agg("|".join, axis=1)
    return hashlib.md5("\n".join(rows).encode()).hexdigest()

def main(sf_dir: str, out_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = pq.read_table(files[0]).to_pandas()
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}"); n_fail += 1; continue
        ok_rows = len(got) == len(want)
        ok_cols = sorted(got.columns) == sorted(want.columns)
        ok_hash = ok_rows and ok_cols and canon(got) == canon(want)
        if ok_hash:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows {len(got)}/{len(want)} cols_ok={ok_cols} ")
            if ok_rows and ok_cols and len(got):
                g = got[sorted(got.columns)]; w = want[sorted(want.columns)]
                for i in range(min(len(g), len(w))):
                    if canon(g.iloc[[i]]) != canon(w.iloc[[i]]):
                        print("  first diff row", i)
                        print("  spark:", g.iloc[i].to_dict())
                        print("  duck :", w.iloc[i].to_dict())
                        break
            else:
                print("  spark cols:", list(got.columns))
                print("  duck  cols:", list(want.columns))
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    main(sf, out)
