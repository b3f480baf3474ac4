"""Driver-evidence coverage audit for the query registry.

The driver's per-round correctness gate verifies only the FIRST 50 entries
of ``queries()``, so a query's oracle check becomes durable evidence only
once a ``CORRECTNESS_r*.json`` row exists for it. This tool diffs the
union of all recorded driver rows against the registry and reports:

- queries with NO driver row ever (these must lead ``DRIVER_PRIORITY``),
- queries whose most recent row is older than ``--stale`` rounds,
- registered queries missing an oracle (rows-only checks), and
- whether the current first-50 window actually covers the never-checked set.

Usage::

    python tools/driver_coverage.py [--stale N] [--sla N]

Exit status is 1 when a query outside the current first-50 window has
never been driver-checked (the rotation stranded it), OR when any
query's latest driver row is more than ``--sla`` rounds old (default
6 — the freshness SLA in SURVEY.md: with a 50-slot window over a
~260-query registry, a full rotation takes 6 rounds, so 6 is the
tightest satisfiable bound; a breach means the rotation fell behind
and the NEXT round's window head is already spoken for). The --stale
listing (default 3) stays advisory — it is the rotation WORKLIST,
while --sla is the hard gate.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_rows(repo_root: str) -> dict[str, int]:
    """Latest round number with a driver row, per query name."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        for name in rows:
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--stale",
        type=int,
        default=3,
        help="flag queries whose last driver row is more than N rounds old",
    )
    ap.add_argument(
        "--sla",
        type=int,
        default=6,
        help="HARD-FAIL when any row is more than N rounds old "
        "(the freshness SLA; see SURVEY.md)",
    )
    args = ap.parse_args()

    repo_root = os.path.join(os.path.dirname(__file__), "..")
    latest = load_rows(repo_root)
    if not latest:
        print("no CORRECTNESS_r*.json files found")
        return 1
    current_round = max(latest.values())

    # Import the registry without starting Spark: queries() returns
    # callables, it does not execute them.
    import __spark_entry__ as entry

    ordered = list(entry.queries())
    oracles = set(entry.oracle_sql())
    window = ordered[:50]

    never = [n for n in ordered if n not in latest]
    stale = sorted(
        (n, latest[n])
        for n in ordered
        if n in latest and current_round - latest[n] > args.stale
    )
    no_oracle = [n for n in ordered if n not in oracles]
    stranded = [n for n in never if n not in window]

    print(f"registered queries : {len(ordered)}")
    print(f"driver rows through: r{current_round:02d} "
          f"({len(latest)} distinct queries)")
    print(f"never checked      : {len(never)}")
    for n in never:
        marker = "in current window" if n in window else "STRANDED"
        print(f"  {n}  [{marker}]")
    print(f"stale (> {args.stale} rounds): {len(stale)}")
    for n, rnd in stale:
        print(f"  {n}  (last r{rnd:02d})")
    print(f"rows-only (no oracle): {len(no_oracle)}")
    for n in no_oracle:
        print(f"  {n}")

    breached = sorted(
        (n, latest[n])
        for n in ordered
        if n in latest and current_round - latest[n] > args.sla
    )

    if stranded:
        print(
            f"\nFAIL: {len(stranded)} never-checked quer"
            f"{'y is' if len(stranded) == 1 else 'ies are'} outside the "
            "first-50 window — reorder DRIVER_PRIORITY."
        )
        return 1
    if breached:
        print(
            f"\nFAIL: {len(breached)} quer"
            f"{'y' if len(breached) == 1 else 'ies'} breach the "
            f"{args.sla}-round freshness SLA — rotate them to the head of "
            "DRIVER_PRIORITY and cap this round's additions:"
        )
        for n, rnd in breached:
            print(f"  {n}  (last r{rnd:02d})")
        return 1
    print(
        "\nOK: every never-checked query is inside the current window and "
        f"no row breaches the {args.sla}-round SLA."
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
