#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and compare against the Spark results
dumped by graft.Verify (column-name-sorted, row-sorted, exact values).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import duckdb, json, os, sys, math

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    fails = 0
    for name in sorted(oracle):
        pq = f"{outdir}/{name}"
        if not os.path.isdir(pq):
            print(f"FAIL {name}: no spark output dir")
            fails += 1
            continue
        try:
            got = canon(con.sql(f"SELECT * FROM '{pq}/*.parquet'").df())
            exp = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
            fails += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            fails += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            fails += 1
            continue
        g = got.map(cell)
        e = exp.map(cell)
        neq = (g != e)
        if neq.any().any():
            bad = neq.any(axis=1)
            idx = bad[bad].index[:3]
            print(f"FAIL {name}: {int(neq.values.sum())} cell diffs; first rows:")
            for i in idx:
                for c in got.columns:
                    if neq.at[i, c]:
                        print(f"    row {i} col {c}: spark={g.at[i, c]!r} duck={e.at[i, c]!r}")
            fails += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
    print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
