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

def dtype_class(s: pd.Series) -> str:
    """Coarse dtype class as the driver's hasher sees it: a float64
    oracle column stringifies '27165.0' where Spark's int64 says '27165',
    so int-vs-float drift is a real driver-side hash mismatch even when
    the %.9g float canonicalization above happens to agree."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "other"

def dtype_drift(got: pd.DataFrame, want: pd.DataFrame):
    """Columns whose dtype class differs between Spark and the oracle.
    The r15 judge root-caused q171/q173/q174: DuckDB types sum(BIGINT)
    as HUGEINT -> pandas float64, which the driver hashes differently
    from Spark's LongType. Fail loudly instead of masking it."""
    drift = []
    for col in sorted(set(got.columns) & set(want.columns)):
        g, w = dtype_class(got[col]), dtype_class(want[col])
        if g != w:
            drift.append(f"{col}: spark={g}({got[col].dtype}) "
                         f"oracle={w}({want[col].dtype})")
    return drift

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
        drift = dtype_drift(got, want) if ok_cols else []
        ok_hash = (ok_rows and ok_cols and not drift
                   and canon(got) == canon(want))
        if ok_hash:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        elif drift:
            n_fail += 1
            print(f"FAIL {name}: dtype drift (driver hash would differ)")
            for d in drift:
                print(f"  {d}")
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

def selftest():
    """Prove the gate rejects the q171 class: a deliberately uncast
    HUGEINT sum (pandas float64) against a Spark-style int64 column
    must be flagged as drift even though %.9g formatting agrees."""
    con = duckdb.connect()
    want = con.execute(
        "SELECT sum(x) AS detail FROM (VALUES (1), (2), (3)) t(x)"
    ).fetchdf()                      # HUGEINT -> float64
    got = pd.DataFrame({"detail": pd.Series([6], dtype="int64")})
    assert want["detail"].dtype == "float64", want["detail"].dtype
    assert canon(got) == canon(want), "canon alone must NOT catch this"
    drift = dtype_drift(got, want)
    assert drift, "dtype_drift must flag int-vs-float"
    print("selftest PASS: uncast HUGEINT oracle rejected:", drift[0])

if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        selftest(); sys.exit(0)
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    main(sf, out)
