"""Plan-quality audit over the driver registry.

Prints, for each (or the named) registry query, the physical-plan signals
that matter at scale: parquet filter pushdown + read schema width, join
strategies, WindowGroupLimit (top-k pruning), and exchange count.

Usage: python tools/explain_audit.py [sf_dir] [query ...]
       python tools/explain_audit.py --scale-gate [sf_dir]

``--scale-gate`` verifies the size-gated join strategy of the dedup
re-attach joins: with ``autoBroadcastJoinThreshold=-1`` (simulating a
corpus-sized signature/vector table) the plans must contain NO broadcast
join; with the default threshold the small local tables should broadcast.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")


#: queries whose joins must degrade gracefully to shuffle joins when the
#: per-document side is too big to broadcast, with the number of
#: EXPLICIT broadcast hints each is allowed to keep under threshold=-1
#: (every allowed hint must be a provably data-size-INDEPENDENT side:
#: a dimension table, the benchmark query suite, or a 1-row stats frame)
_SCALE_GATED = {
    "dedup_minhash_pairs": 0,
    "dedup_embedding": 0,
    # the 25-row nation dim broadcast is correct at ANY fact size
    "analytics_top_orders": 1,
    "cluster_semantic_dedup": 0,
    # round 6: the incremental probe's signature re-attach joins and the
    # BM25 postings/stats joins must fall back to shuffle joins when the
    # corpus-sized side cannot broadcast
    "dedup_incremental": 0,
    # the explicit query-terms broadcast is correct at any CORPUS size —
    # the benchmark query set is bounded by the suite, not the data (the
    # corpus-sized postings/df sides must still fall back, and do)
    "retrieval_bm25": 1,
    # round 7: seed/essential/theta/query-terms are all query-suite-
    # bounded; the CANDIDATE side carries no hint (grows with df of the
    # seed terms) and must fall back. 5, not 4: the seed-hits subtree
    # (and its broadcast(seed) join) appears twice in the physical plan
    # — once under cand_seed, once under the theta partial scores
    "retrieval_bm25_pruned": (5, 1),
    # wedge/closure joins carry no hints at all (min_small=0: nothing
    # SHOULD broadcast — both sides are edge-scale); the minhash edge
    # build re-attach is size-gated upstream
    "graph_triangles": (0, 0),
    # pair metadata (|sets|^2 rows, sets = a dimension column) twice +
    # per-set sizes twice — group-cardinality-bounded, like a dim table
    "sketch_theta_ops": 4,
    # the 1-row global min/max range frame
    "sketch_histogram_quantiles": 1,
    "dedup_winnowing": 0,
    # round 9: the one allowed DSIR hint is the log-ratio table — at
    # most `buckets` (a CONSTANT) rows regardless of corpus size; the
    # 1-row totals ride BroadcastNestedLoopJoins (not counted here);
    # the raw-pool scoring join and the doc re-attach must fall back
    "select_dsir_weights": 1,
    "select_dsir_topk": 1,
    "pipeline_dsir_curation": 1,
    # the incremental probe carries NO hints: the corpus semi-join, the
    # candidate confirms and the doc re-attaches all degrade to shuffle
    "dedup_exact_spans_incremental": 0,
    # the broadcast(queries) side rides a BroadcastNestedLoopJoin
    # (inequality condition), so zero BHJs either way
    "similarity_pq_adc_knn": (0, 0),
    # the one hint is broadcast(exact) — suite-bounded (queries x k)
    "similarity_pq_recall": 1,
    # five stat-table joins, all unhinted (vocabulary-bounded but
    # data-DEPENDENT, so they must be size-gated by the planner)
    "text_kn_trigram_logprob": 0,
}


def scale_gate_audit(sf_dir: str) -> int:
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
    queries = entry_mod.queries()
    failures = 0
    default_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    for name, spec in _SCALE_GATED.items():
        allowed_big, min_small = spec if isinstance(spec, tuple) else (spec, 1)
        # big-corpus simulation: nothing is broadcast-able
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan_big = (
                queries[name](spark, sf_dir)
                ._jdf.queryExecution().executedPlan().toString()
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", default_thr)
        plan_small = (
            queries[name](spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString()
        )
        big_bhj = plan_big.count("BroadcastHashJoin")
        small_bhj = plan_small.count("BroadcastHashJoin")
        ok = big_bhj <= allowed_big and small_bhj >= min_small
        failures += 0 if ok else 1
        print(
            f"{name:28s} threshold=-1: BHJ x{big_bhj} (allowed {allowed_big}),"
            f" default: BHJ x{small_bhj} -> {'PASS' if ok else 'FAIL'}"
        )
    print("scale gate:", "ALL PASS" if not failures else f"{failures} FAILURES")
    return failures


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--scale-gate":
        sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
        sys.exit(1 if scale_gate_audit(sf_dir) else 0)
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
