#!/usr/bin/env python3
"""Time each DuckDB oracle at a given sf (dev tool): the honest
single-node columnar-engine comparison point for BENCH numbers.
Usage: python3 tools/bench_oracle.py [sfDir] [oracle_sql.json path]
"""
import json, sys, time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_r2/oracle_sql.json"
    oracle = json.loads(Path(oracle_path).read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    out, total = {}, 0.0
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            dt = time.time() - t0
        except Exception as e:
            dt = -1.0
            print(f"  {name}: ERROR {str(e)[:80]}", file=sys.stderr)
        out[name] = round(dt, 3)
        if dt > 0:
            total += dt
    print(json.dumps({"total_sec": round(total, 2), "sf": sf_dir,
                      "queries": out}))


if __name__ == "__main__":
    main()
