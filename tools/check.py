#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare (not shipped code).

Usage: python3 tools/check.py <sfDir> <outDir>
Reads <outDir>/<name>/ parquet (written by graft.Verify) and
<outDir>/oracle_sql.json, runs each oracle in DuckDB against the sfDir
parquet tables, and hash-compares values with columns sorted by name and
rows sorted.

CRITICAL (round-11 postmortem): the driver canonicalizes through pandas
(`rel.df()`), not `fetchall()`. The difference is not cosmetic — DuckDB
widens integer aggregates (sum over BIGINT, `//`, integer `*` chains) to
HUGEINT, which `fetchall()` yields as exact Python ints but pandas
converts to **float64**, so the driver hashes "3404.0" where this mimic
used to see "3404". That divergence made q_shard_balance print PASS here
for two rounds while the driver failed it. Both sides now fetch via
`.df()` and stringify from pandas dtypes, so any future un-CAST
aggregate output diverges HERE first.
"""
import sys, json, glob, os
import math
import duckdb
import numpy as np
import pandas as pd

def canon(df):
    """Canonicalize a pandas DataFrame the way the driver does: columns
    sorted by name, every cell stringified from its pandas dtype (floats
    via repr so 3404.0 != 3404), rows sorted."""
    cols = sorted(df.columns)
    out = []
    for _, r in df[cols].iterrows():
        vals = []
        for c in cols:
            v = r[c]
            # The driver's pandas sort_values dies on unhashable cells
            # (lists / numpy arrays) — only scalar cells are verifiable.
            if isinstance(v, (list, tuple, dict, set, np.ndarray)):
                raise TypeError(
                    f"non-scalar cell in column {c!r}: {type(v).__name__} "
                    "(driver's pandas canonicalizer cannot hash this)")
            if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
                vals.append("None")
            elif isinstance(v, (np.floating, float)):
                vals.append(repr(float(v)))
            elif isinstance(v, np.bool_):
                vals.append(str(bool(v)))
            elif isinstance(v, np.integer):
                vals.append(str(int(v)))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result"); n_fail += 1; continue
        try:
            spark_df = con.execute(f"SELECT * FROM read_parquet({files!r})").df()
        except Exception as e:
            print(f"FAIL {name}: read spark result: {e}"); n_fail += 1; continue
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        if sorted(spark_df.columns) != sorted(duck_df.columns):
            print(f"FAIL {name}: cols {sorted(spark_df.columns)} vs {sorted(duck_df.columns)}")
            n_fail += 1; continue
        try:
            a, b = canon(spark_df), canon(duck_df)
        except TypeError as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); n_fail += 1; continue
        if a != b:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(a)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
