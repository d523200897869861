#!/usr/bin/env python3
"""Build a replica-disjoint Nx scale leg from a testdata sf dir (dev
tool; committed so scale-stress legs are reproducible across rounds —
the round-13 builder was ad-hoc and died with its /tmp dir).

Construction (PERF.md round-13 method):
  - documents xN: doc_id offset per replica; every word suffixed `_i`
    (space -> `_i ` + trailing suffix), so shingle/gram/posting
    structure is N DISJOINT copies of the 1x corpus — the
    linear-scaling reference. n_chars recomputed.
  - embeddings xN: vec_id offset per replica; the vector ROTATED by
    (i mod dim) AND, for replicas beyond the first dim (block = i//dim
    > 0), coordinate signs flipped by a hash(block,coord) pattern —
    same norm and coordinate distribution, decorrelated replicas even
    when N > dim (rotation alone has only dim distinct images), no
    artificially N-x-popular sign buckets. Block 0 is pure rotation,
    so an N<=dim leg reproduces the old construction byte-for-byte.
  - lineitem xN: disjoint order/part/supp key spaces per replica.
  - orders xN: o_orderkey offset matching lineitem's l_orderkey offset
    (and o_custkey offset), so header<->items joins stay 1:N per
    replica — the shape q149's cogroup reconcile needs at scale.
  - every other table symlinked, so canary queries (q11) see
    IDENTICAL input across legs.

Usage:
    python3 tools/build_scale.py N outDir [srcDir] [tables]
e.g.
    python3 tools/build_scale.py 100 /tmp/scale100 /root/testdata/sf0.1 documents,embeddings
"""
import os, sys
from pathlib import Path

import duckdb

ALL_TABLES = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    n = int(sys.argv[1])
    out = Path(sys.argv[2])
    src = Path(sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1")
    tables = (sys.argv[4].split(",") if len(sys.argv) > 4
              else ["documents", "embeddings"])
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")

    if "documents" in tables:
        con.execute(f"""
          COPY (
            SELECT d.doc_id + r.i * 100000000 AS doc_id,
                   replace(d.text, ' ', '_' || r.i || ' ')
                     || '_' || r.i AS text,
                   d.lang, d.source,
                   length(replace(d.text, ' ', '_' || r.i || ' ')
                     || '_' || r.i) AS n_chars
            FROM read_parquet('{src}/documents.parquet') d,
                 range({n}) r(i)
          ) TO '{out}/documents.parquet' (FORMAT PARQUET)""")
        print(f"documents x{n} written")

    if "embeddings" in tables:
        dim = con.execute(
            f"SELECT len(embedding) FROM read_parquet("
            f"'{src}/embeddings.parquet') LIMIT 1").fetchone()[0]
        con.execute(f"""
          COPY (
            SELECT e.vec_id + r.i * 100000000 AS vec_id,
                   list_transform(
                     list_concat(
                       list_slice(e.embedding, (r.i % {dim}) + 1, {dim}),
                       list_slice(e.embedding, 1, r.i % {dim})),
                     (x, j) -> CASE
                       WHEN r.i // {dim} = 0 THEN x
                       WHEN hash((r.i // {dim}) * 1000003 + j) % 2 = 0
                         THEN x ELSE -x END)
                     ::FLOAT[] AS embedding,
                   e.label
            FROM read_parquet('{src}/embeddings.parquet') e,
                 range({n}) r(i)
          ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
        print(f"embeddings x{n} written")

    # lineitem/orders are written in replica CHUNKS into a parquet
    # DIRECTORY (Spark and DuckDB both read it transparently): a
    # single 1000x COPY materializes tens of GB in the duckdb buffer
    # pool before the first byte lands — the r16 build watched it climb
    # to 78% of a 128 GB box; 100-replica chunks stream in bounded
    # memory and an interrupted build resumes at the missing chunk.
    def chunked(table: str, select_sql):
        d = out / f"{table}.parquet"
        if d.exists() and not d.is_dir():
            raise SystemExit(f"{d} exists as a file; remove it first")
        d.mkdir(exist_ok=True)
        step = min(n, 100)
        for lo in range(0, n, step):
            hi = min(n, lo + step)
            part = d / f"part-{lo:05d}.parquet"
            if part.exists():
                continue
            # COPY to a temp name and rename only on success: an
            # interrupted COPY (ENOSPC/kill — the motivating scenarios)
            # must not leave a truncated part that the exists() resume
            # check would silently treat as complete (r16 ADVICE)
            tmp = d / f"part-{lo:05d}.parquet.tmp"
            if tmp.exists():
                tmp.unlink()
            con.execute(f"""
              COPY ({select_sql(lo, hi)})
              TO '{tmp}' (FORMAT PARQUET)""")
            os.rename(tmp, part)
            print(f"{table} replicas [{lo},{hi}) written")

    if "lineitem" in tables:
        chunked("lineitem", lambda lo, hi: f"""
            SELECT l.l_orderkey + r.i * 1000000000 AS l_orderkey,
                   l.l_partkey + r.i * 10000000 AS l_partkey,
                   l.l_suppkey + r.i * 1000000 AS l_suppkey,
                   l.l_linenumber, l.l_quantity, l.l_extendedprice,
                   l.l_discount, l.l_tax, l.l_returnflag,
                   l.l_linestatus, l.l_shipdate
            FROM read_parquet('{src}/lineitem.parquet') l,
                 range({lo}, {hi}) r(i)""")
        print(f"lineitem x{n} written")

    if "orders" in tables:
        chunked("orders", lambda lo, hi: f"""
            SELECT o.o_orderkey + r.i * 1000000000 AS o_orderkey,
                   o.o_custkey + r.i * 10000000 AS o_custkey,
                   o.o_orderstatus, o.o_totalprice, o.o_orderdate,
                   o.o_orderpriority
            FROM read_parquet('{src}/orders.parquet') o,
                 range({lo}, {hi}) r(i)""")
        print(f"orders x{n} written")

    for t in ALL_TABLES:
        dst = out / f"{t}.parquet"
        if t not in tables and not dst.exists():
            os.symlink(src / f"{t}.parquet", dst)
    print(f"leg ready: {out} (x{n}: {','.join(tables)}; rest symlinked)")


if __name__ == "__main__":
    main()
