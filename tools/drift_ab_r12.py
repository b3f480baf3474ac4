"""Same-session cold/warm A/B for the two r11 bench drifts
(events_markov_stationary 1.73x, dedup_exact_spans 1.55x — r11 verdict
item 2, the winnow_ab_r11 playbook).

Each query runs in a FRESH Spark session with the EXACT bench protocol
(no-op sink, release_operator_caches between repeats), 6 repeats, at
sf0.1. Interpretation:

- fresh-session repeats ~= the frozen baseline (markov ~3.0s, spans
  ~4.0s) while the 238-query canonical run records 5.2s/6.2s
  => the drift is SUITE-COMPOSITION (session-accumulated JVM/catalog
  state, GC pressure, and CPU contention inside a 300s 238-query
  single-session run), not a code regression.
- fresh-session repeats ~= the drifted numbers
  => the code path itself got slower; bisect.

Prints one JSON line per query with the repeat arrays; commit the
output into BASELINE.md's adjudication note.

Usage: python tools/drift_ab_r12.py [sf_dir] [queries-csv]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

QUERIES_UNDER_TEST = ["events_markov_stationary", "dedup_exact_spans"]


def run_one(name: str, sf_dir: str, repeats: int = 6) -> dict:
    from hds_functions_spark.plans import build_session

    spark = build_session(
        app_name=f"drift-ab-{name}",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "8g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    import hds_functions_spark.registry_ext  # noqa: F401

    from hds_functions_spark.caching import release_operator_caches
    from hds_functions_spark.registry import QUERIES

    spark.read.parquet(f"{sf_dir}/nation.parquet").count()  # JVM warm
    runs = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        runs.append(round(time.perf_counter() - t0, 3))
        release_operator_caches()
    spark.stop()
    return {
        "query": name,
        "sf_dir": sf_dir,
        "repeats": runs,
        "median": round(statistics.median(runs), 3),
        "min": min(runs),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = (
        sys.argv[2].split(",") if len(sys.argv) > 2 else QUERIES_UNDER_TEST
    )
    for name in names:
        print(json.dumps(run_one(name, sf_dir), separators=(",", ":")))


if __name__ == "__main__":
    main()
