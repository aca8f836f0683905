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

def _canon_cell(v, col):
    # The driver's pandas sort_values dies on unhashable cells
    # (lists / numpy arrays) — only scalar cells are verifiable.
    if isinstance(v, (list, tuple, dict, set, np.ndarray)):
        raise TypeError(
            f"non-scalar cell in column {col!r}: {type(v).__name__} "
            "(driver's pandas canonicalizer cannot hash this)")
    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return "None"
    if isinstance(v, (np.floating, float)):
        return repr(float(v))
    if isinstance(v, np.bool_):
        return str(bool(v))
    if isinstance(v, np.integer):
        return str(int(v))
    return str(v)

def canon(df):
    """Canonicalize a pandas DataFrame the way the driver does: columns
    sorted by name, every cell stringified from its pandas dtype (floats
    via repr so 3404.0 != 3404), rows sorted.

    Stringifies COLUMN BY COLUMN, never via df.iterrows(): iterrows
    upcasts each row Series to a common dtype, so an int64 column next
    to a float64 column renders '3404' as '3404.0' — exactly the
    HUGEINT-vs-BIGINT divergence this mimic exists to catch."""
    cols = sorted(df.columns)
    str_cols = [[_canon_cell(v, c) for v in df[c].tolist()] for c in cols]
    out = [tuple(row) for row in zip(*str_cols)] if str_cols and str_cols[0] else []
    out.sort()
    return out

def main(sf_dir, out_dir):
    # Lint first (r12 VERDICT #6): an un-CAST lossy aggregate must fail
    # the mimic before it can ever reach the driver.
    import oracle_lint
    lint_rc = oracle_lint.main(sf_dir, out_dir)
    if lint_rc:
        print("== oracle_lint FLAGGED — failing the mimic before compare ==")
        return lint_rc
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
