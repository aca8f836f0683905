#!/usr/bin/env python3
"""Oracle output-type lint (r11 VERDICT #3) — dev tool, not shipped code.

Usage: python3 tools/oracle_lint.py <sfDir> <outDir-with-oracle_sql.json>

DuckDB widens integer aggregates (sum over BIGINT, `//`, integer `*`
chains) to HUGEINT, and the driver's pandas canonicalizer renders
HUGEINT/DECIMAL as float64 — so an oracle whose OUTPUT column carries
one of those types hashes "3404.0" against Spark's "3404" even when the
values are identical (the q_shard_balance failure of rounds 10-11).
Rather than regex the SQL for un-CAST aggregates, ask DuckDB itself:
DESCRIBE each oracle and flag any output column whose declared type
pandas cannot round-trip as int64/bool/str. Zero flags = no oracle can
fail the driver on types alone.

Also reports (informational) any DOUBLE output column name, so the
round(x, n) discipline stays reviewable at a glance.
"""
import sys, json, os
import duckdb

LOSSY = ("HUGEINT", "UHUGEINT", "DECIMAL")

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    flagged, doubles, errors = [], [], []
    for name, sql in sorted(oracle.items()):
        try:
            cols = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            errors.append((name, str(e).splitlines()[0]))
            continue
        for cname, ctype, *_ in cols:
            if any(ctype.upper().startswith(l) for l in LOSSY):
                flagged.append((name, cname, ctype))
            elif ctype.upper() in ("DOUBLE", "FLOAT", "REAL"):
                doubles.append((name, cname))
    for name, cname, ctype in flagged:
        print(f"FLAG {name}.{cname}: {ctype} (pandas-lossy — CAST it)")
    for name, err in errors:
        print(f"ERROR {name}: {err}")
    print(f"== {len(oracle)} oracles: {len(flagged)} lossy output columns, "
          f"{len(errors)} describe errors; "
          f"{len(doubles)} DOUBLE columns (informational) ==")
    if doubles:
        by_q = {}
        for n, c in doubles:
            by_q.setdefault(n, []).append(c)
        for n in sorted(by_q):
            print(f"  double {n}: {', '.join(by_q[n])}")
    return 1 if (flagged or errors) else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
