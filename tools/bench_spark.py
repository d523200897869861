#!/usr/bin/env python3
"""Isolated Spark-side bench (dev tool): the engine twin of
tools/bench_oracle.py, for settling container-noise disputes by
artifact instead of hand-run notes. Each named query is timed in its
OWN fresh JVM/SparkSession (cold scheduler state, no cross-query cache
or GC interference), `runs` times, and the MIN is reported — the same
min-of-N discipline the oracle yardstick uses.

Usage:
    python3 tools/bench_spark.py q201,q124,q187 [sfDir] [runs] [outPath]

Defaults: sfDir=/root/testdata/sf0.1, runs=3, outPath=SPARK_ISOLATED.json.
Query ids may be short ("q201") or full names. Writes JSON:
    {"sf": "...", "runs": N, "cpus": "...",
     "queries": {name: min_sec}, "all_runs": {name: [sec, ...]}}

Each run invokes `sbt -batch "runMain graft.Bench <q> 1"` — Bench's
subset+forced-repeats mode — and parses the DETAIL line, so what is
timed is exactly the bench's timed pass (steady-state warmup included
for pure queries, single protocol execution for side-effecting ones).
sbt/JVM startup is NOT counted; only Bench's own per-query timer is.
"""
import json, os, re, subprocess, sys
from pathlib import Path


def one_run(query: str, sf_dir: str, cpus: str) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=cpus)
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Bench {query} 1'],
        cwd=str(Path(__file__).resolve().parent.parent),
        env=env, capture_output=True, text=True)
    m = re.search(r'^DETAIL (\{.*\})\s*$', r.stdout, re.M)
    if not m:
        tail = "\n".join((r.stdout + r.stderr).splitlines()[-15:])
        raise RuntimeError(f"no DETAIL line for {query}:\n{tail}")
    return {k: float(v) for k, v in
            re.findall(r'"([^"]+)":([0-9.\-]+)', m.group(1))}


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    queries = [q.strip() for q in sys.argv[1].split(",") if q.strip()]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    out_path = sys.argv[4] if len(sys.argv) > 4 else "SPARK_ISOLATED.json"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    all_runs: dict = {}
    for i in range(runs):
        for q in queries:
            try:
                detail = one_run(q, sf_dir, cpus)
            except RuntimeError as e:
                print(f"RUN FAIL {q} (run {i + 1}): {e}", file=sys.stderr)
                continue
            for name, sec in detail.items():
                all_runs.setdefault(name, []).append(sec)
                print(f"run {i + 1}/{runs} {name}: {sec:.3f}s", flush=True)
    result = {
        "sf": Path(sf_dir).name,
        "runs": runs,
        "cpus": cpus,
        "queries": {n: min(v) for n, v in sorted(all_runs.items())},
        "all_runs": {n: v for n, v in sorted(all_runs.items())},
    }
    Path(out_path).write_text(json.dumps(result, indent=1))
    print(json.dumps({"isolated_min": result["queries"]}))


if __name__ == "__main__":
    main()
