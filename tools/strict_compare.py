#!/usr/bin/env python3
"""Strict (no-rounding) compare of Spark verify output vs DuckDB oracle —
mimics the driver's hash-of-values gate more faithfully than
verify_local.py (which rounds floats). Usage:

    python3 tools/strict_compare.py [sfDir] [outDir]
"""
import decimal, json, sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq


def driver_norm(v):
    """Emulate the driver-side asymmetry: DuckDB's .df() turns DECIMAL
    into float64 while Spark parquet keeps Decimal objects, and cells are
    compared via their string form — so Decimal('1.30') != 1.3. We
    normalize NOTHING here on purpose: any Decimal in either side is a
    latent hash mismatch and gets flagged."""
    return repr(v)

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def oracle_type_gate(con, oracle):
    """Bind (not execute) every oracle SQL and flag any output column whose
    DuckDB type is HUGEINT/UHUGEINT/DECIMAL: pandas renders those as
    float64 on the driver side, so the driver's string hash sees `123.0`
    where Spark's parquet says `123` — a values-right/hash-red mismatch
    that fetchall()-based compares (including the loop below, which gets
    Python ints for HUGEINT) CANNOT catch. This is the exact mechanism
    that shipped q179/q183 red in round 9. Binding all oracles takes
    seconds; no data is read. Returns (n_flagged, bind_failed_names):
    a SQL that fails to BIND is counted once here and skipped by the
    main loop — executing it again would double-count the defect."""
    bad = []
    bind_failed = set()
    for name, sql in sorted(oracle.items()):
        try:
            rel = con.sql(sql)
        except Exception as e:
            bad.append((name, f"bind error: {e}"))
            bind_failed.add(name)
            continue
        hazards = [f"{c}:{t}" for c, t in zip(rel.columns, map(str, rel.types))
                   if any(h in str(t).upper()
                          for h in ("HUGEINT", "UHUGEINT", "DECIMAL"))]
        if hazards:
            bad.append((name, f"driver-hash-hazard output types: {hazards} "
                              "(CAST to BIGINT/DOUBLE in the oracle)"))
    for name, msg in bad:
        print(f"TYPEGATE FAIL {name}: {msg}")
    if not bad:
        print(f"TYPEGATE PASS: {len(oracle)} oracles, no "
              "HUGEINT/UHUGEINT/DECIMAL output columns")
    return len(bad), bind_failed


def fetch_sorted(con, sql):
    cur = con.execute(sql)
    cols = [d[0].lower() for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols_sorted = [cols[i] for i in order]
    data = [tuple(r[i] for i in order) for r in rows]
    data.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return cols_sorted, data


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_r2"
    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_fail, bind_failed = oracle_type_gate(con, oracle)
    n_pass = 0
    for name, sql in sorted(oracle.items()):
        if name in bind_failed:
            continue  # already counted by the type gate
        spark_path = f"{out_dir}/{name}"
        if not Path(spark_path).exists():
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        pfile = next(Path(spark_path).glob("*.parquet"), None)
        if pfile is not None:
            schema = pq.read_schema(str(pfile))
            decs = [f.name for f in schema if "decimal" in str(f.type)]
            if decs:
                print(f"FAIL {name}: DECIMAL columns in spark output "
                      f"(latent driver hash mismatch): {decs}")
                n_fail += 1
                continue
        try:
            ocols, orows = fetch_sorted(con, sql)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        scols, srows = fetch_sorted(
            con, f"SELECT * FROM read_parquet('{spark_path}/*.parquet')")
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            n_fail += 1; continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            n_fail += 1; continue
        bad = [(a, b) for a, b in zip(srows, orows) if a != b or repr(a) != repr(b)]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ (strict); first 2:")
            for a, b in bad[:2]:
                print("  spark :", repr(a))
                print("  oracle:", repr(b))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed (strict)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
