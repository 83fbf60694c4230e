#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet (Spark output) and runs the
corresponding oracle SQL from <outDir>/oracle_sql.json in DuckDB with
the sf tables registered as views. Sorts columns by name, then rows,
and compares cell-by-cell (exact, after canonicalizing NaN/None).
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> list:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if v is None:
                vals.append(None)
            elif isinstance(v, float) and math.isnan(v):
                vals.append(None)
            elif hasattr(v, "tolist"):  # numpy arrays / lists
                vals.append(tuple(v.tolist()))
            elif isinstance(v, float):
                vals.append(repr(v))
            else:
                vals.append(str(v))
        rows.append(tuple(vals))
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    # big oracles (graph joins, gram matrix) spill at sf0.1; the
    # default relative .tmp dir may not be creatable from a read-only
    # cwd, so pin spill space under /tmp explicitly
    import os
    os.makedirs("/tmp/duckdb_spill", exist_ok=True)
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # Schema guard (the round-11 inverted_index class): the driver's
    # checker lexsorts ALL columns in pandas, where list/array/dict
    # cells are unhashable — any such column in ANY query output
    # (oracle-checked or rows-only) makes that query unverifiable by
    # the harness that matters, so it fails the gate here first.
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        for f in glob.glob(f"{d}/*.parquet"):
            df = pd.read_parquet(f)
            import numpy as np
            bad = [c for c in df.columns
                   if any(isinstance(v, (list, dict, set, tuple, bytes,
                                         bytearray, np.ndarray))
                          for v in df[c].dropna().head(5))]
            if bad:
                print(f"FAIL {name}: non-scalar output columns {bad}")
                n_fail += 1
            break
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        s, d = canon(spark_df), canon(duck_df)
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            n_fail += 1
        elif s != d:
            bad = next(i for i, (a, b) in enumerate(zip(s, d)) if a != b)
            print(f"FAIL {name}: first diff row {bad}:\n  spark={s[bad]}\n  duck ={d[bad]}")
            print(f"  spark cols={sorted(spark_df.columns)} duck cols={sorted(duck_df.columns)}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
    # rows-only queries (no oracle)
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name not in oracle:
            files = glob.glob(f"{d}/*.parquet")
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"ROWS {name}: {n} rows")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
