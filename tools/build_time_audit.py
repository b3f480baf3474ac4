"""Driver-side build-time inventory: time ``fn(spark, sf_dir)`` (DataFrame
construction only — py4j expression building plus any eager actions inside
the query function) for every registry query, twice, reporting the warm
(second) build. The noop execution is NOT included; this isolates the
plan-construction share of the bench number (guide §7.3: very large
expression trees make planning itself the bottleneck).

Usage: python tools/build_time_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    rest = sys.argv[1:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", rest

    from hds_functions_spark.plans import build_session
    from hds_functions_spark.registry import QUERIES, ordered_query_names
    import hds_functions_spark.registry_ext  # noqa: F401
    from hds_functions_spark.caching import release_operator_caches

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(
        app_name="build-time-audit",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "8g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    if not names:
        names = ordered_query_names()

    rows = []
    for name in names:
        fn = QUERIES[name]
        try:
            t0 = time.perf_counter()
            fn(spark, sf_dir)
            cold = time.perf_counter() - t0
            release_operator_caches()
            t0 = time.perf_counter()
            fn(spark, sf_dir)
            warm = time.perf_counter() - t0
            release_operator_caches()
            rows.append((warm, cold, name))
        except Exception as exc:
            print(f"ERROR {name}: {exc}", file=sys.stderr)
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"total warm build {total:.1f}s over {len(rows)} queries")
    for warm, cold, name in rows:
        print(f"{warm:7.3f}  (cold {cold:6.3f})  {name}")


if __name__ == "__main__":
    main()
