#!/usr/bin/env python3
"""Dev-only: compare DuckDB oracle output types against Spark parquet output
types for every query in <outDir>/oracle_sql.json. The driver hashes values
after fetching from both engines; a type divergence (HUGEINT vs BIGINT,
DECIMAL vs DOUBLE) can stringify differently even when row sets are equal.
Usage: python3 tools/audit_types.py <sfDir> <verifyOutDir>
"""
import sys, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n = 0
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name not in oracle:
            continue
        got = con.sql(f"SELECT * FROM '{d}*.parquet' LIMIT 1")
        gtypes = dict(zip([c.lower() for c in got.columns], [str(t) for t in got.types]))
        try:
            exp = con.sql(f"SELECT * FROM ({oracle[name]}) LIMIT 1")
        except Exception as e:
            print(f"{name}: oracle error {e}")
            continue
        etypes = dict(zip([c.lower() for c in exp.columns], [str(t) for t in exp.types]))
        for c in sorted(set(gtypes) | set(etypes)):
            g, e = gtypes.get(c), etypes.get(c)
            if g != e:
                n += 1
                print(f"{name}.{c}: spark={g} oracle={e}")
    print(f"== {n} type divergences")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
