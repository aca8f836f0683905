#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare (not shipped code).

Usage: python3 tools/check.py <sfDir> <outDir>
Reads <outDir>/<name>/ parquet (written by graft.Verify) and
<outDir>/oracle_sql.json, runs each oracle in DuckDB against the sfDir
parquet tables, and hash-compares values with columns sorted by name and
rows sorted.
"""
import sys, json, glob, os
import duckdb

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            # The driver canonicalizes via pandas sort_values, which dies on
            # unhashable cell values (lists / numpy arrays) — round 2 shipped
            # two array-typed queries that passed here and erred there.
            # Mirror the driver: only scalar cells are verifiable.
            if isinstance(v, (list, tuple, dict, set)):
                raise TypeError(
                    f"non-scalar cell in column {cols[i]!r}: {type(v).__name__} "
                    "(driver's pandas canonicalizer cannot hash this)")
            if isinstance(v, float):
                v = repr(v)
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
            spark_rel = con.execute(f"SELECT * FROM read_parquet({files!r})")
            spark_cols = [d[0] for d in spark_rel.description]
            spark_rows = spark_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: read spark result: {e}"); n_fail += 1; continue
        try:
            duck_rel = con.execute(sql)
            duck_cols = [d[0] for d in duck_rel.description]
            duck_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: cols {sorted(spark_cols)} vs {sorted(duck_cols)}")
            n_fail += 1; continue
        try:
            a, b = canon(spark_rows, spark_cols), canon(duck_rows, duck_cols)
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
