#!/usr/bin/env python3
"""Condense graft.Explain output into a per-query plan-shape table
(PLAN_AUDIT.md): join strategies, exchanges, codegen spans, pushed
filters. Usage: python3 tools/plan_summary.py [plans.txt] [out.md]
"""
import re, sys
from pathlib import Path


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_plans.txt"
    out = sys.argv[2] if len(sys.argv) > 2 else "PLAN_AUDIT.md"
    text = Path(src).read_text()
    sections = re.split(r"\n=+\n== (\S+)\n=+\n", text)
    rows = []
    for i in range(1, len(sections), 2):
        name, body = sections[i], sections[i + 1]
        def n(pat):
            return len(re.findall(pat, body))
        rows.append((
            name,
            n(r"\(\d+\) BroadcastHashJoin"),
            n(r"\(\d+\) SortMergeJoin"),
            n(r"\(\d+\) BroadcastNestedLoopJoin"),
            n(r"\(\d+\) Exchange"),
            len(set(re.findall(r"codegen id : (\d+)", body))),
            n(r"PushedFilters: \[[^\]]"),
            n(r"\(\d+\) Scan parquet"),
        ))
    lines = [
        "# PLAN_AUDIT — physical plan shapes per query",
        "",
        "Generated from `graft.Explain` output by `tools/plan_summary.py`.",
        "BHJ = broadcast hash join, SMJ = sort-merge join, BNLJ = broadcast",
        "nested loop (only intentional 1-row lookups), Exch = shuffle",
        "exchanges, WSCG = whole-stage-codegen spans, PushF = scans with",
        "pushed filters.",
        "",
        "| query | BHJ | SMJ | BNLJ | Exch | WSCG | PushF | scans |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append("| " + " | ".join(str(x) for x in r) + " |")
    totals = [sum(r[i] for r in rows) for i in range(1, 8)]
    lines.append("| **total** | " + " | ".join(map(str, totals)) + " |")
    Path(out).write_text("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(rows)} queries, totals {totals}")


if __name__ == "__main__":
    main()
