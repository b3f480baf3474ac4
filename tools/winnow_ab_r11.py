"""Same-session cold/warm A/B of the session-shared winnowing-
fingerprint family (r10 verdict item 1): reproduces the EXACT bench
protocol (no-op sink + release_operator_caches between repeats) for
the three `_shared_winnow_fps` consumers, with the shared cache reset
once at the start so repeat 1 of the first member is the true cold
build.

Before the r11 `tracked_persist` ownership fix, the first consumer
(winnowing_overlap_pairs) TRACKED the shared persisted frame, so the
release between repeats unpersisted it behind the cache dict's back —
every later 'warm' run silently re-ran the whole fingerprint
extraction per scan (2-4 scans/query). The recorded r10 medians
(dedup_winnowing 5.22s, dedup_source_matrix 8.37s) are that recompute
path, NOT a one-time-build attribution. This tool demonstrates both
states: run it on the fixed code and the warm repeats collapse to the
~1s the r10 judge measured.

Usage: python tools/winnow_ab_r11.py [sf_dir]   (default sf0.1)
Prints one JSON line: per-query repeat lists, cold first repeat
included, plus the family group total of medians.
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

from hds_functions_spark.plans import build_session  # noqa: E402
import hds_functions_spark.registry_ext  # noqa: E402,F401
from hds_functions_spark.registry import QUERIES  # noqa: E402

FAMILY = [
    "dedup_winnowing",
    "dedup_winnowing_incremental",
    "dedup_source_matrix",
    "dedup_soft_weights",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from hds_functions_spark.caching import release_operator_caches
    from hds_functions_spark.registry_ext4 import reset_shared_winnow_fps

    spark = build_session(
        app_name="winnow-ab-r11",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "8g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()  # JVM warm

    reset_shared_winnow_fps(spark, sf_dir)  # true cold start
    out: dict[str, list[float]] = {}
    for name in FAMILY:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
            release_operator_caches()  # the bench's between-repeat step
        out[name] = runs
        print(f"{name}: {runs}", file=sys.stderr)

    medians = {q: statistics.median(r) for q, r in out.items()}
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "repeats": out,
                "medians": {q: round(m, 3) for q, m in medians.items()},
                "group_total_of_medians": round(sum(medians.values()), 3),
                "cold_first_repeat": out[FAMILY[0]][0],
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
