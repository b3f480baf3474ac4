"""Dump ``.explain('formatted')`` for named registry queries to files.

Writes ``plans/$PLANS_ROUND/<query>_<tag>.txt`` (default r17) for each named query (or every
registry query with --all). Used to commit the before/after physical
plans the optimization round's claims are checked against.

Usage: python tools/dump_plans.py <tag> [sf_dir] query [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")


def main() -> None:
    tag = sys.argv[1]
    rest = sys.argv[2:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", rest

    from hds_functions_spark.plans import build_session
    from hds_functions_spark.registry import QUERIES
    import hds_functions_spark.registry_ext  # noqa: F401

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(
        app_name="dump-plans",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "8g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("PLANS_ROUND", "r17"))
    os.makedirs(out_dir, exist_ok=True)

    from hds_functions_spark.caching import release_operator_caches

    for name in names:
        fn = QUERIES[name]
        try:
            import contextlib
            import io

            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            plan = buf.getvalue()
        except Exception as exc:  # keep going; surface which query failed
            plan = f"ERROR building plan: {exc}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
        release_operator_caches()


if __name__ == "__main__":
    main()
