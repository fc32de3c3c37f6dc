#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet dir written by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB against the same
parquet tables, and compares row sets (column-name-sorted, row-sorted,
stringified). This is NOT part of the shipped library — it exists so oracle
mismatches surface before the driver's per-round run.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        got_rel = con.sql(f"SELECT * FROM '{d}*.parquet'")
        got_cols = [c.lower() for c in got_rel.columns]
        got = rowset(got_cols, got_rel.fetchall())
        if name not in oracle:
            n_skip += 1
            print(f"  SKIP {name}: rows={len(got)} (no oracle)")
            continue
        try:
            exp_rel = con.sql(oracle[name])
            exp_cols = [c.lower() for c in exp_rel.columns]
            exp = rowset(exp_cols, exp_rel.fetchall())
        except Exception as e:
            n_fail += 1
            print(f"  FAIL {name}: oracle SQL error: {e}")
            continue
        if sorted(got_cols) != sorted(exp_cols):
            n_fail += 1
            print(f"  FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
        elif got != exp:
            n_fail += 1
            diff = [(g, e) for g, e in zip(got, exp) if g != e][:3]
            print(f"  FAIL {name}: rows {len(got)} vs {len(exp)}; first diffs: {diff}")
        else:
            n_pass += 1
            print(f"  PASS {name}: {len(got)} rows")
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
