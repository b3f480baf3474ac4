"""Round-15 scale rows.

A) 16x pipeline_video_curation: wall + total shuffle for the whole
   synthesize -> MJPEG frame decode -> two-tier dedup -> card DAG on a
   16x-replicated documents corpus. Decode is Arrow-batched per-clip
   Python (the dominant cost), so the expectation is executor-linear
   wall and signature-sized (never pixel-sized) shuffle.

B) 16x pipeline_caption_curation: the cross-modal pair gate — image
   decode + canonical agg + pair join + card. Caption scoring is pure
   JVM expressions, so the Python cost is the image decode alone;
   shuffle is signatures + one double per pair.

C) 16x multimodal_video_dedup_incremental: the continuous-ingest twin
   — batch decode + key-sized probes against the standing frame index.

D) 16x pipeline_audio_curation: synthesis + downmix + one-parse
   signatures + two tiers; PCM bytes never shuffle.

E) 16x pipeline_multimodal_shards: caption gate -> pack_sequences ->
   per-shard manifest; the window is bounded per shard key.

Usage: python tools/scaleup_r15.py [sf_dir] [parts]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scaleup_r14 import _run, replicate_docs_16x  # noqa: E402


def part(spark, sf_dir, ui, app_id, tmp16, qname):
    import hds_functions_spark.registry_ext  # noqa: F401
    from hds_functions_spark.registry import QUERIES

    print(f"== {qname}, 1x vs 16x ==", flush=True)
    for label, d in (("1x ", sf_dir), ("16x", tmp16)):
        _run(
            spark, ui, app_id, f"{qname} {label}",
            lambda d=d: QUERIES[qname](spark, d),
            lambda df: len(df.collect()),
        )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    parts = (sys.argv[2] if len(sys.argv) > 2 else "ABCDE").upper()

    from hds_functions_spark.plans import build_session

    spark = build_session(
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "12g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    tmp16 = "/tmp/hds_r15_docs_16x"
    if not os.path.exists(f"{tmp16}/documents.parquet"):
        n = replicate_docs_16x(spark, sf_dir, tmp16)
        print(f"replicated documents 16x: {n} rows at {tmp16}", flush=True)
    if "A" in parts:
        part(spark, sf_dir, ui, app_id, tmp16, "pipeline_video_curation")
    if "B" in parts:
        part(spark, sf_dir, ui, app_id, tmp16, "pipeline_caption_curation")
    if "C" in parts:
        part(spark, sf_dir, ui, app_id, tmp16,
             "multimodal_video_dedup_incremental")
    if "D" in parts:
        part(spark, sf_dir, ui, app_id, tmp16, "pipeline_audio_curation")
    if "E" in parts:
        part(spark, sf_dir, ui, app_id, tmp16, "pipeline_multimodal_shards")
    spark.stop()


if __name__ == "__main__":
    main()
