"""Per-query empirical profile: run one registry query with the UI on and
dump the job/stage breakdown from the UI REST API (guide §1/§7.1 — decide
whether the time is shuffle, compute, Python, scheduling or planning).

For each named query (run once, noop sink, same session config as bench.py):
- wall-clock seconds, number of Spark jobs and stages
- per-stage: name, task count, total task time, shuffle read/write bytes,
  input bytes — sorted by task time
- the gap between wall-clock and summed task time / parallelism, which at
  sf0.1 is mostly driver-side planning + scheduling.

Usage: python tools/profile_query.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, ".")


def rest(port: int, path: str):
    url = f"http://localhost:{port}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    rest_args = sys.argv[1:]
    if rest_args and os.path.isdir(rest_args[0]):
        sf_dir, names = rest_args[0], rest_args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", rest_args

    from hds_functions_spark.plans import build_session
    from hds_functions_spark.registry import QUERIES
    import hds_functions_spark.registry_ext  # noqa: F401
    from hds_functions_spark.caching import release_operator_caches

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(
        app_name="profile-query",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "8g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])
    app_id = spark.sparkContext.applicationId

    # JVM/codegen warm-up like bench.py
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    repeats = int(os.environ.get("PROFILE_REPEATS", "2"))
    for name in names:
        fn = QUERIES[name]
        for rep in range(repeats):
            jobs_before = {j["jobId"] for j in rest(port, f"applications/{app_id}/jobs")}
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t_build = time.perf_counter() - t0
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            release_operator_caches()
            spark.sparkContext.setJobDescription(None)
            if rep < repeats - 1:
                continue  # profile only the warm (last) repeat
            jobs = [
                j for j in rest(port, f"applications/{app_id}/jobs")
                if j["jobId"] not in jobs_before
            ]
            stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
            stages = []
            for sid in stage_ids:
                try:
                    for att in rest(port, f"applications/{app_id}/stages/{sid}"):
                        stages.append(att)
                except Exception:
                    pass
            tot_task = sum(s.get("executorRunTime", 0) for s in stages) / 1e3
            print(f"\n=== {name}: wall {wall:.2f}s (build {t_build:.2f}s), "
                  f"{len(jobs)} jobs, {len(stages)} stages, "
                  f"sum task-time {tot_task:.1f}s ===")
            stages.sort(key=lambda s: -s.get("executorRunTime", 0))
            for s in stages[:14]:
                nm = s.get("name", "?")[:80]
                print(
                    f"  stage {s['stageId']:>4} {s.get('status','?'):>9} "
                    f"tasks={s.get('numCompleteTasks',0):>3} "
                    f"run={s.get('executorRunTime',0)/1e3:6.2f}s "
                    f"in={s.get('inputBytes',0)>>10:>7}K "
                    f"sr={s.get('shuffleReadBytes',0)>>10:>6}K "
                    f"sw={s.get('shuffleWriteBytes',0)>>10:>6}K "
                    f"py?{'BatchEval' in nm or 'ArrowEval' in nm or 'MapInPandas' in nm or 'FlatMapGroups' in nm}  {nm}"
                )


if __name__ == "__main__":
    main()
