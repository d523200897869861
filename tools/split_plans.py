#!/usr/bin/env python3
"""Split a graft.Explain dump into per-query plan files for the round's
before/after evidence. Usage:

    python3 tools/split_plans.py <dump.txt> <outDir> <suffix> q41 q80 ...

Writes <outDir>/<qNN>_<suffix>.txt for every requested query id
(matched as the name's leading 'qNN' token), with a one-line header
naming the dump's provenance.
"""
import re, sys
from pathlib import Path


def main():
    src, out, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    wanted = set(sys.argv[4:])
    # leading \n so a header at byte 0 still splits; duplicate headers
    # (e.g. two concatenated dumps) are an error — evidence files must
    # come from exactly one run
    text = "\n" + Path(src).read_text()
    Path(out).mkdir(parents=True, exist_ok=True)
    sections = re.split(r"\n=+\n== (\S+)\n=+\n", text)
    names = [sections[i] for i in range(1, len(sections), 2)]
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        sys.exit(f"ERROR: duplicate sections in {src}: {sorted(dupes)}")
    found = set()
    for i in range(1, len(sections), 2):
        name, body = sections[i], sections[i + 1]
        qid = name.split("_")[0]
        if qid in wanted:
            found.add(qid)
            Path(out, f"{qid}_{suffix}.txt").write_text(
                f"== {name} ({suffix}, graft.Explain sf0.001)\n{body.strip()}\n")
    missing = wanted - found
    if missing:
        print(f"WARNING: not found in dump: {sorted(missing)}")
    print(f"wrote {len(found)} plans to {out}")


if __name__ == "__main__":
    main()
