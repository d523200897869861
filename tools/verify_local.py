#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (dev loop only; the
shipped library is pure Scala/Spark). Usage:

    python3 tools/verify_local.py [sfDir] [outDir] [--skip-spark]

1. Runs `sbt runMain graft.Verify <sfDir> <outDir>` (unless --skip-spark).
2. For each query in oracle_sql.json: registers the testdata parquet as
   DuckDB views, runs the oracle SQL, loads the Spark result parquet,
   sorts columns by name and rows by value, and compares cell-by-cell.
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 9)
    if isinstance(v, bool):
        return v
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except Exception:
        pass
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v


def fetch_sorted(con, sql):
    cur = con.execute(sql)
    cols = [d[0].lower() for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols_sorted = [cols[i] for i in order]
    data = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    data.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return cols_sorted, data


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "/tmp/verify_out"
    if "--skip-spark" not in sys.argv:
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}'],
            cwd="/root/repo", capture_output=True, text=True)
        tail = "\n".join((r.stdout + r.stderr).splitlines()[-25:])
        if r.returncode != 0:
            print("VERIFY RUN FAILED:\n", tail)
            sys.exit(1)
        if "[verify]" in r.stdout + r.stderr:
            print("verify stderr notes:")
            for ln in (r.stdout + r.stderr).splitlines():
                if "[verify]" in ln:
                    print("  ", ln)

    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_path = f"{out_dir}/{name}"
        if not Path(spark_path).exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            ocols, orows = fetch_sorted(con, sql)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            scols, srows = fetch_sorted(
                con, f"SELECT * FROM read_parquet('{spark_path}/*.parquet')")
        except Exception as e:
            print(f"FAIL {name}: spark read error: {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns differ spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            print("  spark sample:", srows[:2])
            print("  oracle sample:", orows[:2])
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(srows, orows) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ; first:")
            print("  spark :", bad[0][0])
            print("  oracle:", bad[0][1])
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
