"""Diff two PLANS.md snapshots (e.g. this round vs the previous
round's commit) and flag PLAN REGRESSIONS mechanically: a query whose
exchange count grew, whose join strategy degraded (BroadcastHashJoin →
SortMergeJoin / nested loop), or whose scan lost its pushed filters.

The bench catches *time* regressions but is noisy at sf0.1
(NOTES_r4's measured ±45% single-query envelope); plan shape is
deterministic, so comparing it across rounds separates "the plan got
worse" from "the host was hot". Usage:

    python tools/plan_diff.py old_PLANS.md [new_PLANS.md]
    python tools/plan_diff.py <git-rev>    # old side read from git
    # new side defaults to ./PLANS.md

Exit code 1 if any regression is found (new queries and improvements
are reported but don't fail).
"""

from __future__ import annotations

import re
import subprocess
import sys

_JOIN_RANK = {
    "-": 0,
    "BroadcastHashJoin": 1,
    "ShuffledHashJoin": 2,
    "SortMergeJoin": 3,
    "BroadcastNestedLoopJoin": 4,
    "CartesianProduct": 5,
}


def parse(text: str) -> dict[str, dict]:
    """Handles both the r4 8-column table and the r5+ 9-column table
    (a `gwin` unpartitioned-window column was inserted before
    `flags`); missing gwin reads as '-'."""
    rows = {}
    for line in text.splitlines():
        if not line.startswith("| "):
            continue
        parts = [p.strip() for p in line.strip().strip("|").split("|")]
        if len(parts) not in (8, 9):
            continue
        name, window, exch, joins, scans, widest, pushed = parts[:7]
        if window not in ("driver", "retired", "—") or not exch.isdigit():
            continue
        gwin = parts[7] if len(parts) == 9 else "-"
        flags = parts[-1]
        rows[name] = {
            "window": window,
            "exchanges": int(exch),
            "joins": tuple(sorted(joins.split(","))) if joins != "-" else (),
            "scans": int(scans),
            "widest": int(widest),
            "pushed": int(pushed),
            "gwin": gwin,
            "flags": flags.strip(),
        }
    return rows


def worst_join(joins: tuple[str, ...]) -> int:
    return max((_JOIN_RANK.get(j, 0) for j in joins), default=0)


def load_side(arg: str) -> str:
    try:
        with open(arg, encoding="utf-8") as fh:
            return fh.read()
    except OSError:
        out = subprocess.run(
            ["git", "show", f"{arg}:PLANS.md"], capture_output=True, text=True
        )
        if out.returncode != 0:
            raise SystemExit(f"cannot read {arg} as file or git rev: {out.stderr}")
        return out.stdout


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    old = parse(load_side(sys.argv[1]))
    new_path = sys.argv[2] if len(sys.argv) > 2 else "PLANS.md"
    new = parse(load_side(new_path))

    regressions = improvements = 0
    for name in sorted(set(old) & set(new)):
        o, n = old[name], new[name]
        msgs = []
        if n["exchanges"] > o["exchanges"]:
            msgs.append(f"exchanges {o['exchanges']}→{n['exchanges']}")
        if worst_join(n["joins"]) > worst_join(o["joins"]):
            msgs.append(f"joins {','.join(o['joins']) or '-'}→{','.join(n['joins']) or '-'}")
        if n["pushed"] < o["pushed"]:
            msgs.append(f"pushed filters {o['pushed']}→{n['pushed']}")
        if n["widest"] > o["widest"]:
            msgs.append(f"widest scan {o['widest']}→{n['widest']} cols")
        if n["flags"] not in ("-", "") and o["flags"] in ("-", ""):
            msgs.append(f"NEW FLAG {n['flags']}")
        if msgs:
            regressions += 1
            print(f"REGRESSION {name}: " + "; ".join(msgs))
        elif (
            n["exchanges"] < o["exchanges"]
            or worst_join(n["joins"]) < worst_join(o["joins"])
            or n["pushed"] > o["pushed"]
        ):
            improvements += 1
            print(f"improved   {name}: exch {o['exchanges']}→{n['exchanges']}")
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"new queries ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    print(
        f"\n{len(set(old) & set(new))} compared, "
        f"{regressions} regressions, {improvements} improvements"
    )
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
