#!/usr/bin/env python
"""Per-round registry rotation rebuild (the standing policy at
registry.py): fold a round's CORRECTNESS_rN.json greens into
_DRIVER_CONFIRMED_ROUND (value = N) and regenerate the table text.

Usage:
    python scripts/rotate_registry.py CORRECTNESS_r10.json 10 [--dry-run]

- Every gate named in the CORRECTNESS file gets its latest-driver-row
  round set to N (the file only ever contains green rows; a non-green
  row would have been fixed before rotating — the script refuses to
  fold a file containing mismatches or errors so that can't slip).
- The table is regenerated grouped by round with per-round counts, so
  the next round's window (bucket 2, oldest-round-first) is readable
  at a glance.
- The policy comment block is NOT rewritten (it carries judgement, not
  state) — update its "State after round N" paragraph by hand.

--dry-run prints the regenerated table instead of writing registry.py.
"""

from __future__ import annotations

import json
import re
import sys
import textwrap

REG = "hadoop_fcfs_spark/registry.py"


def rebuild(correctness_path: str, round_no: int, dry_run: bool = False) -> dict:
    rows = json.load(open(correctness_path))
    bad = {
        n: r
        for n, r in rows.items()
        if r.get("err")
        or not (r.get("rows_match") and r.get("schema_match") and r.get("hash_match"))
    }
    if bad:
        raise SystemExit(
            f"refusing to fold: {len(bad)} non-green rows in "
            f"{correctness_path}: {sorted(bad)[:5]} ..."
        )
    txt = open(REG).read()
    start = txt.index("_DRIVER_CONFIRMED_ROUND: dict[str, int] = {")
    end = txt.index("\n}\n", start) + 3
    pairs = {
        k: int(v)
        for k, v in re.findall(r'"([a-z0-9_]+)":\s*(\d+)', txt[start:end])
    }
    for name in rows:
        pairs[name] = round_no

    from collections import defaultdict

    byround: dict[int, list[str]] = defaultdict(list)
    for n, r in pairs.items():
        byround[r].append(n)
    out = ["_DRIVER_CONFIRMED_ROUND: dict[str, int] = {"]
    for r in sorted(byround):
        names = sorted(byround[r])
        out.append(f"    # latest driver row: round {r} ({len(names)} gates)")
        body = ", ".join(f'"{n}": {r}' for n in names) + ","
        out.extend(
            textwrap.wrap(
                body, width=74, initial_indent="    ",
                subsequent_indent="    ",
            )
        )
    out.append("}\n")
    new_tbl = "\n".join(out)
    if dry_run:
        print(new_tbl)
    else:
        open(REG, "w").write(txt[:start] + new_tbl + txt[end:])
    return {r: len(v) for r, v in sorted(byround.items())}


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--dry-run"]
    if len(args) != 2:
        print(__doc__)
        raise SystemExit(2)
    counts = rebuild(args[0], int(args[1]), dry_run="--dry-run" in sys.argv)
    print(f"per-round counts after fold: {counts}", file=sys.stderr)
