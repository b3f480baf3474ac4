"""Round-16 scale rows.

A) 16x pipeline_url_curation: the WARC-fed URL curation capstone —
   executor-side WARC write, binaryFile walk, codegen canonicalize,
   literal-array blocklist (no join), WindowGroupLimit cap, per-TLD
   card. Expectation: wall linear in records; shuffle carries the
   canonical projection (fixed-width keys + chars), never raw pages
   twice; the cap output is constant (28 domains x cap).

B) 16x web_url_canonicalize + web_domain_caps: the pure-JVM family
   legs — one codegen projection + combinable groupBys. Expectation:
   near-linear wall, domain-cardinality-bound shuffle (flat MBs).

C) 16x dedup_paragraph_pairs at CONSTANT duplicate rate: the registry
   protocol's boilerplate groups are doc_id % G; replicating doc_ids
   16x into the SAME G groups would grow every group 16x and the
   boiler pair count ~256x — a property of the synthetic protocol
   (denser duplication), not of the operator. The honest scale
   question is "16x corpus, same dup rate", so this part rebuilds the
   paragraph frame with G scaled 16x (same expected group size) and
   runs the SAME minhash_pairs_subdoc engine + rollup. Expectation:
   pair-bound runtime ~linear in candidates; signature-sized shuffle.

D) 16x multimodal_image_jpeg_progressive: Arrow-batched progressive
   decode (multi-scan entropy walk) — Python-decode-bound, executor-
   linear wall, 1 row in -> 1 row out, no shuffle growth.

Usage: python tools/scaleup_r16.py [sf_dir] [parts]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scaleup_r14 import _run, replicate_docs_16x  # noqa: E402


def _query_part(spark, sf_dir, ui, app_id, tmp16, qname):
    import hds_functions_spark.registry_ext  # noqa: F401
    from hds_functions_spark.registry import QUERIES

    print(f"== {qname}, 1x vs 16x ==", flush=True)
    for label, d in (("1x ", sf_dir), ("16x", tmp16)):
        _run(
            spark, ui, app_id, f"{qname} {label}",
            lambda d=d: QUERIES[qname](spark, d),
            lambda df: len(df.collect()),
        )


def part_c(spark, sf_dir, ui, app_id, tmp16):
    """Paragraph near-dedup at constant dup rate: groups G scale with
    the corpus so expected group size (and per-group pair count) stays
    fixed; only the NUMBER of duplicate groups grows."""
    from pyspark.sql import functions as F

    import hds_functions_spark.registry_ext  # noqa: F401
    from hds_functions_spark.registry_subdoc import (
        _MH_BANDS,
        _MH_NUM_HASHES,
        _MH_SHINGLE,
        _PP_MIN_J,
        _PP_STRIDE,
        _PP_WIN,
    )
    from hds_functions_spark.operators.dedup import minhash_pairs_subdoc

    print("== dedup_paragraph_pairs (constant dup rate), 1x vs 16x ==",
          flush=True)

    def run(d, groups):
        docs = spark.read.parquet(f"{d}/documents.parquet").select(
            "doc_id", "text"
        )
        dcol = F.col("doc_id")
        boiler = F.concat(
            F.lit("promo code "),
            F.expr(f"(doc_id DIV {groups}) % 3").cast("string"),
            F.lit(" "),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), F.lit(9)),
                    lambda k: F.concat(
                        F.lit("w"),
                        (((dcol % groups) * 13 + k * 7) % 99991).cast(
                            "string"
                        ),
                    ),
                ),
                " ",
            ),
        )
        paras = docs.select(
            "doc_id",
            F.posexplode(
                F.array(
                    F.substring("text", 1, _PP_WIN),
                    F.substring("text", _PP_WIN + 1, _PP_WIN),
                    boiler,
                )
            ).alias("para_pos", "para"),
        )
        # ids reach 16x shifts of 10M: raise the stride contract bound
        # is unnecessary (pos < 3), but doc ids must stay < 2^63/stride
        pairs = minhash_pairs_subdoc(
            paras,
            para_stride=_PP_STRIDE,
            num_hashes=_MH_NUM_HASHES,
            shingle_size=_MH_SHINGLE,
            bands=_MH_BANDS,
            min_jaccard=_PP_MIN_J,
        )
        return pairs.groupBy("doc_a", "doc_b").agg(
            F.count(F.lit(1)).alias("n_para_pairs")
        )

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    for label, d, groups in (
        ("1x ", sf_dir, max(1, n_docs // 42)),
        ("16x", tmp16, max(1, 16 * n_docs // 42)),
    ):
        _run(
            spark, ui, app_id,
            f"paragraph_pairs {label} (G={groups})",
            lambda d=d, g=groups: run(d, g),
            lambda df: len(df.collect()),
        )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    parts = (sys.argv[2] if len(sys.argv) > 2 else "ABCD").upper()

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

    tmp16 = "/tmp/hds_r16_docs_16x"
    if not os.path.exists(f"{tmp16}/documents.parquet"):
        n = replicate_docs_16x(spark, sf_dir, tmp16)
        print(f"replicated documents 16x: {n} rows at {tmp16}", flush=True)
    if "A" in parts:
        _query_part(spark, sf_dir, ui, app_id, tmp16, "pipeline_url_curation")
    if "B" in parts:
        _query_part(spark, sf_dir, ui, app_id, tmp16, "web_url_canonicalize")
        _query_part(spark, sf_dir, ui, app_id, tmp16, "web_domain_caps")
    if "C" in parts:
        part_c(spark, sf_dir, ui, app_id, tmp16)
    if "D" in parts:
        _query_part(spark, sf_dir, ui, app_id, tmp16,
                    "multimodal_image_jpeg_progressive")
    spark.stop()


if __name__ == "__main__":
    main()
