"""Plan-quality audit over the driver registry.

Prints, for each (or the named) registry query, the physical-plan signals
that matter at scale: parquet filter pushdown + read schema width, join
strategies, WindowGroupLimit (top-k pruning), and exchange count.

Usage: python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from hds_functions_spark.plans import build_session

    spark = build_session(
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    for name, fn in entry_mod.queries().items():
        if only and name not in only:
            continue
        if name.startswith("streaming_"):
            print(f"{name:28s} (streaming — inspect via StreamingQueryProgress)")
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # keep auditing
            print(f"{name:28s} ERROR {str(e)[:80]}")
            continue
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        pushed_any = any(p.strip() for p in pushed)
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        widths = [len(s.split(",")) for s in schemas if s]
        flags = []
        if pushed_any:
            flags.append("pushdown")
        if "BroadcastHashJoin" in plan:
            flags.append(f"BHJ x{plan.count('BroadcastHashJoin')}")
        if "SortMergeJoin" in plan:
            flags.append(f"SMJ x{plan.count('SortMergeJoin')}")
        if "WindowGroupLimit" in plan:
            flags.append("WindowGroupLimit")
        flags.append(f"exchanges={plan.count('Exchange')}")
        if widths:
            flags.append(f"scan_cols={widths}")
        print(f"{name:28s} {', '.join(flags)}")


if __name__ == "__main__":
    main()
