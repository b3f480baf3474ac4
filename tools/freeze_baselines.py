"""Freeze per-query bench baselines at FIRST LANDING.

The suite-average ratio vs the round-1 self-baseline penalises adding
honest heavy operators: every new resample-explode or unrolled-parity
audit raises the average without any existing query regressing (the
r7->r9 trend was 1.02x -> 1.41x purely by composition). The durable
gate is PER-QUERY: each query's median is frozen the first time it is
benchmarked, and later rounds compare each query against ITS OWN frozen
number (tools/bench_compare.py, ratio + noise-floor gates).

This tool extracts those first-landing medians from the committed
bench history and writes ``PERQUERY_BASELINE.json``:

- ``BENCH_r01.json .. BENCH_r0N.json`` in round order — the first
  round whose record carries a query's timing freezes it (driver
  wrappers are front-truncated, so early rounds only yield a subset);
- ``BENCH.json`` (the committed canonical run) as the fallback for
  queries whose first-landing round's record was truncated past them;
- with ``--update``, queries already frozen are NEVER overwritten —
  only queries new to the file are added (from BENCH.json). Run after
  each round's canonical bench to freeze that round's new queries.

Usage:
    python tools/freeze_baselines.py            # build from scratch
    python tools/freeze_baselines.py --update   # add new queries only
    python tools/bench_compare.py PERQUERY_BASELINE.json BENCH.json
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_compare import load_queries  # noqa: E402

OUT = "PERQUERY_BASELINE.json"


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--update", action="store_true")
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    frozen: dict[str, float] = {}
    sources: dict[str, str] = {}
    if args.update and os.path.exists(os.path.join(root, OUT)):
        with open(os.path.join(root, OUT)) as fh:
            prev = json.load(fh)
        frozen = dict(prev["queries"])
        sources = dict(prev.get("sources", {}))

    rounds = sorted(
        glob.glob(os.path.join(root, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
    )
    for path in rounds if not args.update else []:
        tag = "r%02d" % int(re.search(r"_r(\d+)", path).group(1))
        try:
            qs = load_queries(path)
        except SystemExit:
            continue
        for name, sec in qs.items():
            if name not in frozen:
                frozen[name] = sec
                sources[name] = tag
    canon = os.path.join(root, "BENCH.json")
    added = 0
    if os.path.exists(canon):
        for name, sec in load_queries(canon).items():
            if name not in frozen:
                frozen[name] = sec
                sources[name] = "canonical"
                added += 1

    with open(os.path.join(root, OUT), "w") as fh:
        json.dump(
            {
                "protocol": (
                    "per-query first-landing medians (sf0.1, local[32], "
                    "repeats=3 fast-cutoff 0.7s, noop sink); frozen at "
                    "first benchmark, never overwritten — compare with "
                    "tools/bench_compare.py ratio+floor gates"
                ),
                "queries": dict(sorted(frozen.items())),
                "sources": dict(sorted(sources.items())),
            },
            fh,
            indent=1,
        )
        fh.write("\n")
    by_src: dict[str, int] = {}
    for s in sources.values():
        by_src[s] = by_src.get(s, 0) + 1
    print(f"{OUT}: {len(frozen)} queries frozen "
          f"({added} newly added); by source: "
          + ", ".join(f"{k}={v}" for k, v in sorted(by_src.items())))


if __name__ == "__main__":
    main()
