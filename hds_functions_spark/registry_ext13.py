"""Extension-layer query registry, part 13 (round-15).

Same contract as ``registry_ext.py``: every query has a DuckDB oracle
generated from the SAME constants so both sides compute identical
values by construction. This batch lands the r14 verdict's two
remaining extension gaps:

**pipeline_video_curation** — the video twin of
``pipeline_image_curation`` (registry_ext12): an MJPEG AVI corpus is
container-walked and every frame decoded ONCE through the real
pure-stdlib baseline-JPEG codec, exact-deduped on the decoded-pixel
md5 (frame granularity — duplicated footage across clips), near-deduped
on the perceptual DCT hash over the surviving canonicals, and rolled
into a per-source curated-footage card. The oracle replays every stage
closed-form from the AVI synthesis protocol (frame content is fully
determined by the block-ramp triple ``(w8, h8, af)``, so the exact
tier's md5 groups equal the protocol's triples, and the perceptual
hash is recomputed bit-for-bit per DISTINCT triple with the embedded
fixed-point DCT table — the registry_ext12 machinery at frame rather
than image granularity).

**pipeline_caption_curation** — the cross-modal (text+image) pair
gate: each document's text plays the alt-text/caption for its paired
image (the registry_ext12 mixed-container corpus), and a LAION-style
filter composes the image-signature family (decodability, dims,
aspect, exact-dup canonicality) with the text-quality family
(:func:`functions.text.add_quality_score`) into per-source acceptance
cards. Pixels never shuffle — the pair join carries only fixed-width
signatures and the caption's quality score.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    _register,
    _stable_dir_tag,
    _t,
)

# Direct `import hds_functions_spark.registry_extN` must see every
# upstream ORACLES/QUERIES entry this module reads at import time:
# pull the chain head, which registers all earlier ext modules before
# this body continues. Via the normal chain import this resolves to
# the already-in-progress module in sys.modules (PEP 328 circular
# import), a no-op.
from . import registry_ext  # noqa: E402,F401
from .registry_ext import _duck_quality_sql  # noqa: E402
from .registry_ext12 import (  # noqa: E402
    _duck_image_sig_ctes,
    _image_corpus,
    _image_corpus_of,
)


# --- video curation pipeline --------------------------------------------------

#: frame-id packing: fid = doc_id * 8 + frame_index (the AVI protocol
#: caps clips at 6 frames < 8, so the packing is collision-free and
#: order-preserving — canonical-by-min(fid) prefers earlier clips,
#: then earlier frames, exactly like the image pipeline's img_id)
_VC_FID_STRIDE = 8


def _duck_video_sig_ctes() -> str:
    """The shared CTE chain ``vb -> vfr -> ... -> vsig`` replaying every
    per-frame signature closed-form from the MJPEG AVI synthesis
    protocol (media_codecs.synthesize_mjpeg_avi): clip shape from the
    md5 digest bytes (w8/h8 in 1..4, 1..6 frames), frame f's decoded
    content a block-ramp starting at ``af = (d3 + f) % 256`` — the
    DC-exact protocol makes the decode LOSSLESS, so pixel sums and
    hashes are protocol-computable. The perceptual hash is recomputed
    bit-for-bit per DISTINCT content triple ``(w8, h8, af)`` (frame
    content is a pure function of the triple, so hashing each triple
    once and joining back is exact — and keeps the oracle's DCT work
    bounded by the triple space, <= 4*4*256 rows, not the frame
    count). The 2-D DCT is two integer matmuls against the exact
    fixed-point cosine table (media_codecs._PHASH_T) embedded
    verbatim — the registry_ext12 block-family machinery with
    ``d3 -> af`` and dims ``(8*w8, 8*h8)``."""
    from .operators.media_codecs import _PHASH_GRID, _PHASH_KEEP, _PHASH_T

    rows = ",\n    ".join(
        ", ".join(
            f"({u}, {x}, {_PHASH_T[u][x]})" for x in range(_PHASH_GRID)
        )
        for u in range(_PHASH_KEEP)
    )
    g = _PHASH_GRID
    # lattice point (i, j) samples source pixel (y, x) = ((i*h)//32,
    # (j*w)//32); its block index is (y//8)*w8 + x//8, and nested floor
    # divisions compose: ((i*8*h8)//32)//8 == (i*h8)//32
    bk = f"(((i.i * h8) // {g}) * w8 + ((j.j * w8) // {g}))"
    # split-range ramp sum over nb = w8*h8 blocks starting at af, each
    # block contributing 192 * luma (64 px * 3 RGB bytes)
    ramp = """
192 * (
CASE WHEN af + nb <= 256
     THEN nb * af + nb * (nb - 1) // 2
     ELSE (af + 255) * (256 - af) // 2
          + (nb + af - 256) * (nb + af - 257) // 2
END)"""
    return f"""
vb AS (
  SELECT doc_id, source,
         1 + ('0x' || substr(md5(text), 1, 2))::INTEGER % 4 AS w8,
         1 + ('0x' || substr(md5(text), 3, 2))::INTEGER % 4 AS h8,
         ('0x' || substr(md5(text), 7, 2))::INTEGER AS d3,
         1 + ('0x' || substr(md5(text), 21, 2))::INTEGER % 6 AS nf
  FROM documents
), vfr AS (
  SELECT doc_id, source, w8, h8, nf, f.f AS frame_index,
         doc_id * {_VC_FID_STRIDE} + f.f AS fid,
         (d3 + f.f) % 256 AS af, w8 * h8 AS nb
  FROM vb, LATERAL (SELECT unnest(generate_series(0, nf - 1)) AS f) f
), vtrip AS (
  SELECT DISTINCT w8, h8, af FROM vfr
), vt AS (
  SELECT * FROM (VALUES
    {rows}) AS q(u, x, tv)
), vgl AS (
  SELECT w8, h8, af, i.i AS i, j.j AS j,
         3 * ((af + {bk}) % 256) AS s
  FROM vtrip, range(0, {g}) i(i), range(0, {g}) j(j)
), vr AS (
  SELECT vgl.w8, vgl.h8, vgl.af, vgl.i, tv.u AS v,
         sum(vgl.s * tv.tv) AS rv
  FROM vgl JOIN vt tv ON tv.x = vgl.j GROUP BY 1, 2, 3, 4, 5
), vc AS (
  SELECT vr.w8, vr.h8, vr.af, tu.u AS u, vr.v,
         CAST(sum(vr.rv * tu.tv) AS BIGINT) AS cv
  FROM vr JOIN vt tu ON tu.x = vr.i GROUP BY 1, 2, 3, 4, 5
), vtot AS (
  SELECT w8, h8, af,
         sum(CASE WHEN u = 0 AND v = 0 THEN 0 ELSE cv END) AS total
  FROM vc GROUP BY 1, 2, 3
), vbits AS (
  SELECT vc.w8, vc.h8, vc.af, u * {_PHASH_KEEP} + v AS idx,
         CASE WHEN cv * 63 > total THEN 1 ELSE 0 END AS bit
  FROM vc JOIN vtot USING (w8, h8, af) WHERE NOT (u = 0 AND v = 0)
), vph AS (
  SELECT w8, h8, af,
         CAST(sum(CASE WHEN idx >= 32 THEN bit::BIGINT << (idx - 32)
                  ELSE 0 END) AS BIGINT) AS phash_hi,
         CAST(sum(CASE WHEN idx < 32 THEN bit::BIGINT << idx
                  ELSE 0 END) AS BIGINT) AS phash_lo
  FROM vbits GROUP BY 1, 2, 3
), vsig AS (
  SELECT vfr.fid, vfr.doc_id, vfr.source,
         8 * vfr.w8 AS w, 8 * vfr.h8 AS h,
         vfr.w8 || ':' || vfr.h8 || ':' || vfr.af AS exact_key,
         CAST({ramp} AS BIGINT) AS pixel_sum,
         vph.phash_hi, vph.phash_lo
  FROM vfr JOIN vph USING (w8, h8, af)
)"""


def _duck_video_curation_sql() -> str:
    """Tiering + per-source card over :func:`_duck_video_sig_ctes` —
    textually parallel to registry_ext12's image card so the two
    capstones cannot drift apart in semantics."""
    return f"""
WITH {_duck_video_sig_ctes()},
vex AS (
  SELECT exact_key, min(fid) AS exact_canon FROM vsig GROUP BY 1
), vs2 AS (
  SELECT vsig.*, vex.exact_canon FROM vsig JOIN vex USING (exact_key)
), vpm AS (
  SELECT phash_hi, phash_lo, min(fid) AS ph_canon
  FROM vs2 WHERE fid = exact_canon GROUP BY 1, 2
), vverd AS (
  SELECT vs2.source, vs2.doc_id, vs2.pixel_sum, 3 * vs2.w * vs2.h AS px,
         CASE WHEN vs2.fid <> vs2.exact_canon THEN 'exact_dup'
              WHEN vs2.fid <> vpm.ph_canon THEN 'phash_dup'
              ELSE 'curated' END AS verdict
  FROM vs2 LEFT JOIN vpm
    ON vs2.phash_hi = vpm.phash_hi AND vs2.phash_lo = vpm.phash_lo
)
SELECT source,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_clips,
       CAST(count(*) AS BIGINT) AS n_frames,
       CAST(sum(CASE WHEN verdict = 'exact_dup' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_exact_dups,
       CAST(sum(CASE WHEN verdict = 'phash_dup' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_phash_dups,
       CAST(sum(CASE WHEN verdict = 'curated' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_curated,
       CAST(count(DISTINCT CASE WHEN verdict = 'curated' THEN doc_id END)
            AS BIGINT) AS n_curated_clips,
       CAST(sum(CASE WHEN verdict = 'curated' THEN px ELSE 0 END)
            AS BIGINT) AS curated_pixel_bytes,
       CAST(sum(CASE WHEN verdict = 'curated' THEN pixel_sum ELSE 0 END)
            AS BIGINT) AS curated_pixel_sum
FROM vverd GROUP BY 1
"""


@_register("pipeline_video_curation", None)  # oracle attached below
def pipeline_video_curation(spark, sf_dir):
    """Video curation END TO END — the r14 verdict's missing capstone,
    composing the registered video families the way registry_ext12's
    pipeline does for images: an MJPEG AVI corpus is container-walked
    and every frame decoded ONCE through the real pure-stdlib baseline
    JPEG codec (operators/multimodal.py:video_frame_signatures — RIFF
    '00dc' chunk walk, Huffman + dequantize + IDCT per frame),
    exact-deduped on the decoded-pixel md5 at FRAME granularity
    (duplicated footage across clips — the multimodal_video_dedup
    signal), near-deduped on the perceptual DCT hash over the
    surviving exact canonicals (brightness-shifted footage the exact
    tier misses), and rolled into one curated-footage card per source
    (clip/frame counts per verdict tier + curated pixel mass + the
    pixel_sum content checksum, so a decode corruption anywhere
    surfaces as a value mismatch, not just a count).

    Plan shape at 100 TB: synthesis and decode are Arrow-batched
    ``mapInPandas``, executor-linear over clips, and pixels NEVER
    leave that stage — only fixed-width per-frame signatures shuffle
    (plan-gated: no Exchange carries a payload column). Each dedup
    tier is one map-side-combinable groupBy (the 32-char md5 key,
    then the two phash longs) plus a signature-sized equi-join back;
    no windows, no pairwise frame comparison, no driver round-trip.
    The signature frame is persisted because THREE branches (exact
    canonical agg, verdict join, canonical-phash agg) read it and the
    upstream stage is Python-side decode work (the SCALE.md part D
    persist-vs-ReusedExchange rule)."""
    from .caching import tracked_persist
    from .operators.multimodal import (
        synthesize_media_payloads,
        video_frame_signatures,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    sig = tracked_persist(
        video_frame_signatures(
            synthesize_media_payloads(docs, "avi")
        ).withColumn(
            "fid",
            F.col("doc_id") * _VC_FID_STRIDE + F.col("frame_index"),
        )
    )
    ex = sig.groupBy("frame_md5").agg(F.min("fid").alias("exact_canon"))
    s2 = sig.join(ex, on="frame_md5")
    pm = (
        s2.filter(F.col("fid") == F.col("exact_canon"))
        .groupBy("phash_hi", "phash_lo")
        .agg(F.min("fid").alias("ph_canon"))
    )
    verdict = (
        F.when(F.col("fid") != F.col("exact_canon"), F.lit("exact_dup"))
        .when(F.col("fid") != F.col("ph_canon"), F.lit("phash_dup"))
        .otherwise(F.lit("curated"))
    )
    tiered = s2.join(pm, on=["phash_hi", "phash_lo"], how="left").withColumn(
        "verdict", verdict
    )
    curated = F.col("verdict") == "curated"
    return (
        tiered.join(docs.select("doc_id", "source"), on="doc_id")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_clips"),
            F.count(F.lit(1)).cast("long").alias("n_frames"),
            F.sum((F.col("verdict") == "exact_dup").cast("long")).alias(
                "n_exact_dups"
            ),
            F.sum((F.col("verdict") == "phash_dup").cast("long")).alias(
                "n_phash_dups"
            ),
            F.sum(curated.cast("long")).alias("n_curated"),
            F.countDistinct(F.when(curated, F.col("doc_id")))
            .cast("long")
            .alias("n_curated_clips"),
            F.sum(
                F.when(curated, 3 * F.col("width") * F.col("height"))
                .otherwise(0)
                .cast("long")
            ).alias("curated_pixel_bytes"),
            F.sum(F.when(curated, F.col("pixel_sum")).otherwise(0)).alias(
                "curated_pixel_sum"
            ),
        )
    )


ORACLES["pipeline_video_curation"] = _duck_video_curation_sql()


# --- incremental (continuous-ingest) video dedup ------------------------------

#: batch selector: CLIPS with doc_id % 13 < 2 are "newly ingested"
#: (the image twin's 2-residue convention at clip granularity — a
#: nightly batch is new CLIPS, so the natural delta unit is the clip;
#: every frame of a batch clip probes the standing FRAME index)
_VCI_BATCH_MOD = 13
_VCI_BATCH_RESIDUES = 2


def _duck_video_incremental_sql() -> str:
    """The nightly video-ingest report, closed-form over the SAME
    frame-sig CTEs as the curation oracle (shared builder — the two
    cannot drift): batch clips' frames probe the standing index's
    exact content keys, then the standing CANONICAL phash set, then
    dedup among themselves. Standing-first verdicts (an immutable
    persisted index's semantics) — the registry_ext12 incremental
    tiering re-spelled over frames."""
    return f"""
WITH {_duck_video_sig_ctes()},
vib AS (SELECT * FROM vsig
        WHERE doc_id % {_VCI_BATCH_MOD} < {_VCI_BATCH_RESIDUES}),
vist AS (SELECT * FROM vsig
         WHERE doc_id % {_VCI_BATCH_MOD} >= {_VCI_BATCH_RESIDUES}),
vistk AS (SELECT DISTINCT exact_key FROM vist),
vistc AS (SELECT exact_key, min(fid) AS c FROM vist GROUP BY 1),
vistph AS (
  SELECT DISTINCT s.phash_hi, s.phash_lo
  FROM vist s JOIN vistc ON s.exact_key = vistc.exact_key
                        AND s.fid = vistc.c),
vibex AS (SELECT exact_key, min(fid) AS bc FROM vib GROUP BY 1),
vibj AS (
  SELECT vib.*, (vistk.exact_key IS NOT NULL) AS hit_sk, vibex.bc
  FROM vib LEFT JOIN vistk USING (exact_key) JOIN vibex USING (exact_key)),
vibph AS (
  SELECT phash_hi, phash_lo, min(fid) AS pc
  FROM vibj WHERE NOT hit_sk AND fid = bc GROUP BY 1, 2),
viverd AS (
  SELECT vibj.source,
         CASE WHEN vibj.hit_sk THEN 'exact_dup_standing'
              WHEN vibj.fid <> vibj.bc THEN 'exact_dup_batch'
              WHEN vistph.phash_hi IS NOT NULL THEN 'phash_dup'
              WHEN vibj.fid <> vibph.pc THEN 'phash_dup'
              ELSE 'novel' END AS verdict
  FROM vibj
  LEFT JOIN vistph
    ON vibj.phash_hi = vistph.phash_hi AND vibj.phash_lo = vistph.phash_lo
  LEFT JOIN vibph
    ON vibj.phash_hi = vibph.phash_hi AND vibj.phash_lo = vibph.phash_lo)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_batch_frames,
       CAST(sum(CASE WHEN verdict = 'exact_dup_standing' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_exact_dup_standing,
       CAST(sum(CASE WHEN verdict = 'exact_dup_batch' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_exact_dup_batch,
       CAST(sum(CASE WHEN verdict = 'phash_dup' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_phash_dup,
       CAST(sum(CASE WHEN verdict = 'novel' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel
FROM viverd GROUP BY 1
"""


@_register("multimodal_video_dedup_incremental", None)  # oracle below
def multimodal_video_dedup_incremental(spark, sf_dir):
    """Continuous-ingest video dedup — the incremental twin of
    pipeline_video_curation's two tiers, completing the operational
    shape for the last media family (images got theirs in
    registry_ext12): a nightly batch of new CLIPS (doc_id % 13 < 2
    plays the delta) decodes once and its FRAMES probe a STANDING
    frame-signature index instead of re-deduping the corpus. The probe
    IS :func:`operators.multimodal.image_ingest_verdicts` — the
    verdict operator is signature-schema generic (an exact key plus
    two phash longs), so the video path reuses it verbatim with the
    frame md5 as the exact key and fid as the row id; one operator,
    two modalities, pinned by both oracles. Output: the per-source
    ingest report (exact-vs-standing / exact-in-batch / perceptual /
    novel frame counts).

    At 100 TB the standing index is persisted frame signatures
    (~90 B/frame); each night's work is batch-decode plus key-sized
    joins — standing pixels are never re-decoded, standing x standing
    work never repeated (index rebuilt in-query only because the
    registry gate needs a self-contained plan). Oracle: the SAME
    frame-sig CTE builder as the curation pipeline's, with the
    registry_ext12 standing-first tiering over frames."""
    from .caching import tracked_persist
    from .operators.multimodal import (
        image_ingest_verdicts,
        synthesize_media_payloads,
        video_frame_signatures,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    # persist: the index legs (keys, canonicals, canonical phashes) and
    # the batch probes all branch off this one decode (the ext12 rule)
    sig = tracked_persist(
        video_frame_signatures(synthesize_media_payloads(docs, "avi"))
        .withColumn(
            "fid", F.col("doc_id") * _VC_FID_STRIDE + F.col("frame_index")
        )
        .withColumnRenamed("frame_md5", "pixel_md5")
    )
    is_batch = F.col("doc_id") % _VCI_BATCH_MOD < _VCI_BATCH_RESIDUES
    tiered = image_ingest_verdicts(
        sig.filter(is_batch), sig.filter(~is_batch), id_col="fid"
    )

    def n_of(v):
        return F.sum((F.col("verdict") == v).cast("long"))

    return (
        tiered.join(docs.select("doc_id", "source"), on="doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_batch_frames"),
            n_of("exact_dup_standing").alias("n_exact_dup_standing"),
            n_of("exact_dup_batch").alias("n_exact_dup_batch"),
            n_of("phash_dup").alias("n_phash_dup"),
            n_of("novel").alias("n_novel"),
        )
    )


ORACLES["multimodal_video_dedup_incremental"] = _duck_video_incremental_sql()


# --- cross-modal caption curation ---------------------------------------------

#: caption gates (the LAION-style pair filter): dims floor, aspect
#: ceiling, quality floor — constants shared by the Spark plan and the
#: oracle SQL below so the two cannot drift
_CC_MIN_DIM = 8
_CC_MAX_ASPECT = 4
_CC_MIN_QUALITY = 0.5


def _duck_caption_curation_sql() -> str:
    """The pair gate closed-form: the registry_ext12 image-signature
    CTEs (shared builder — the image capstones and this one cannot
    drift) supply per-image dims + the protocol exact key; the
    text-quality oracle (shared with ``text_quality``) supplies the
    caption score; verdict precedence mirrors the Spark plan."""
    return f"""
WITH {_duck_image_sig_ctes()},
cap_ex AS (
  SELECT exact_key, min(img_id) AS exact_canon FROM sig GROUP BY 1
), cap_base AS (
  SELECT sig.*, cap_ex.exact_canon, sig.img_id // 2 AS doc_id
  FROM sig JOIN cap_ex USING (exact_key)
  WHERE sig.img_id % 2 = 0
), cap_q AS (
  SELECT doc_id, quality_score FROM ({_duck_quality_sql()})
), cap_verd AS (
  SELECT b.doc_id, b.source, b.w, b.h, q.quality_score,
         CASE WHEN b.img_id <> b.exact_canon THEN 'dup_image'
              WHEN b.w < {_CC_MIN_DIM} OR b.h < {_CC_MIN_DIM}
                   THEN 'small_image'
              WHEN greatest(b.w, b.h) > {_CC_MAX_ASPECT} * least(b.w, b.h)
                   THEN 'extreme_aspect'
              WHEN q.quality_score < {_CC_MIN_QUALITY}
                   THEN 'low_quality_caption'
              ELSE 'accepted' END AS verdict
  FROM cap_base b JOIN cap_q q USING (doc_id)
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(CASE WHEN verdict = 'dup_image' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dup_image,
       CAST(sum(CASE WHEN verdict = 'small_image' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_small_image,
       CAST(sum(CASE WHEN verdict = 'extreme_aspect' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_extreme_aspect,
       CAST(sum(CASE WHEN verdict = 'low_quality_caption' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_low_quality,
       CAST(sum(CASE WHEN verdict = 'accepted' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_accepted,
       CAST(sum(CASE WHEN verdict = 'accepted' THEN quality_score
                ELSE 0 END) AS DOUBLE) AS accepted_quality_sum,
       CAST(sum(CASE WHEN verdict = 'accepted' THEN 3 * w * h
                ELSE 0 END) AS BIGINT) AS accepted_pixel_bytes
FROM cap_verd GROUP BY 1
"""


def _caption_pairs(spark, sf_dir):
    """The verdict-tagged doc/image pair frame (one row per base image,
    columns incl. ``text``, ``source``, dims, ``quality_score``,
    ``verdict``) — shared by the caption card and the multimodal
    shard-packing capstone so the gate cannot drift between them."""
    from .caching import tracked_persist
    from .functions.text import add_quality_score
    from .operators.multimodal import image_signatures

    docs, corpus = _image_corpus(spark, sf_dir)
    sig = tracked_persist(
        image_signatures(corpus).filter(F.col("pixel_md5").isNotNull())
    )
    ex = sig.groupBy("pixel_md5").agg(F.min("img_id").alias("exact_canon"))
    base = (
        sig.filter(F.col("img_id") % 2 == 0)
        .join(ex, on="pixel_md5")
        .withColumn("doc_id", F.shiftright(F.col("img_id"), 1))
    )
    captions = add_quality_score(docs).select(
        "doc_id", "source", "text", "quality_score"
    )
    w, h = F.col("width"), F.col("height")
    verdict = (
        F.when(F.col("img_id") != F.col("exact_canon"), F.lit("dup_image"))
        .when((w < _CC_MIN_DIM) | (h < _CC_MIN_DIM), F.lit("small_image"))
        .when(
            F.greatest(w, h) > _CC_MAX_ASPECT * F.least(w, h),
            F.lit("extreme_aspect"),
        )
        .when(
            F.col("quality_score") < _CC_MIN_QUALITY,
            F.lit("low_quality_caption"),
        )
        .otherwise(F.lit("accepted"))
    )
    return base.join(captions, on="doc_id").withColumn("verdict", verdict)


@_register("pipeline_caption_curation", None)  # oracle attached below
def pipeline_caption_curation(spark, sf_dir):
    """Cross-modal (text+image) PAIR curation — the LAION-style
    alt-text filter the r14 verdict called out, joining the
    image-signature family with the text-quality family over paired
    doc/image ids: each document's text plays the caption for its
    base image (img_id = 2*doc_id in the registry_ext12 mixed-container
    corpus), the image leg gates on exact-dup canonicality (computed
    over the FULL corpus including the protocol re-encodes, so a
    re-containered twin elsewhere in the corpus disqualifies a pair),
    dims floor, and aspect ceiling, and the caption leg gates on the
    heuristic quality score (functions/text.py:add_quality_score, the
    ``text_quality`` oracle reused verbatim). One verdict per pair
    (first failing gate wins: dup_image -> small_image ->
    extreme_aspect -> low_quality_caption -> accepted), rolled into a
    per-source acceptance card with the accepted quality mass and
    pixel volume.

    Plan shape at 100 TB: decode is Arrow-batched ``mapInPandas`` and
    pixels never shuffle (plan-gated) — the pair join moves only
    fixed-width signatures and one double per caption; the caption
    scores are pure JVM expressions (zero Python); the canonical
    aggregate is one combinable groupBy on the 32-char key; the final
    card is one combinable groupBy on source. The signature frame is
    persisted because two branches (canonical agg, pair join) read the
    Python-side decode (SCALE.md part D rule)."""
    pairs = _caption_pairs(spark, sf_dir)
    w, h = F.col("width"), F.col("height")
    accepted = F.col("verdict") == "accepted"

    def n_of(v):
        return F.sum((F.col("verdict") == v).cast("long"))

    return pairs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        n_of("dup_image").alias("n_dup_image"),
        n_of("small_image").alias("n_small_image"),
        n_of("extreme_aspect").alias("n_extreme_aspect"),
        n_of("low_quality_caption").alias("n_low_quality"),
        n_of("accepted").alias("n_accepted"),
        F.sum(F.when(accepted, F.col("quality_score")).otherwise(0.0)).alias(
            "accepted_quality_sum"
        ),
        F.sum(F.when(accepted, 3 * w * h).otherwise(0).cast("long")).alias(
            "accepted_pixel_bytes"
        ),
    )


ORACLES["pipeline_caption_curation"] = _duck_caption_curation_sql()


# --- audio curation pipeline ---------------------------------------------------

#: docs with doc_id % 5 == 2 ALSO ship a DOWNMIXED re-encode of their
#: clip (operators/multimodal.py:audio_downmix): for stereo clips the
#: channel fold changes every PCM byte (defeats the exact tier) while
#: the banded-energy perceptual hash is invariant by construction —
#: the transform the perceptual tier exists to catch; for mono clips
#: the fold is the identity and the re-encode lands in the exact tier
_AC_DOWNMIX_MOD = 5
#: clip-id packing: base clip = doc_id*2, downmix re-encode = doc_id*2+1
_AC_AUD_STRIDE = 2


def _audio_coalesce_target(docs) -> int:
    """Partition target for the base+downmix union's coalesce: the
    image-corpus rule (``max(defaultParallelism, seed splits)``). The
    floor keeps a production seed that already arrives in thousands of
    splits at its own granularity — a bare ``defaultParallelism`` would
    cap the expensive Python parse stage at core count and inflate
    per-task memory (r16 verdict item 2 / ADVICE). Locally the seed is
    1 split, so the target stays defaultParallelism, identical to the
    r16 behaviour."""
    sc = docs.sparkSession.sparkContext
    return max(sc.defaultParallelism, docs.rdd.getNumPartitions())


def _duck_audio_curation_sql() -> str:
    """The per-source audio curation card closed-form: PCM content is a
    pure function of the wav_tones protocol (registry_ext11's machinery)
    and downmixing folds channels into the sample values, so the corpus
    is replayed with EFFECTIVE tables — eff_ch/eff_amps describe the
    re-encoded bytes (downmix of stereo = 1 channel of 2*amp samples),
    while the mono-fold table ``mamps = ch * amps`` is downmix-INVARIANT
    (that invariance IS the perceptual tier's claim). The exact tier
    groups (rate, eff_ch, frames, eff_amps, pers) — injective for the
    byte stream, so it equals Spark's (rate, channels, pcm_md5) groups —
    and the 56-bit hash is recomputed integer-exactly per DISTINCT
    mono-content key, bounded by content diversity, not corpus size."""
    amp_pos = [2 * ((9 + s) % 16) + 1 for s in range(8)]
    per_pos = [2 * ((s * 2 + 3) % 16) + 1 for s in range(8)]
    amps = ",\n          ".join(
        f"256 + ('0x' || substr(md5(text), {p}, 2))::INTEGER * 16"
        for p in amp_pos
    )
    pers = ",\n          ".join(
        f"1 << (('0x' || substr(md5(text), {p}, 2))::INTEGER % 4)"
        for p in per_pos
    )
    return f"""
WITH aub AS (
  SELECT doc_id, source,
         ([8000,16000,22050,44100,48000])[
             ('0x' || substr(md5(text), 11, 2))::INTEGER % 5 + 1] AS rate,
         1 + ('0x' || substr(md5(text), 13, 2))::INTEGER % 2 AS ch,
         512 + (('0x' || substr(md5(text), 15, 2))::INTEGER * 256
                + ('0x' || substr(md5(text), 17, 2))::INTEGER) % 512
             AS frames,
         [{amps}] AS amps,
         [{pers}] AS pers
  FROM documents
), auc AS (
  SELECT doc_id * {_AC_AUD_STRIDE} AS aud_id, doc_id, source, rate, frames,
         ch AS eff_ch, amps AS eff_amps, pers,
         list_transform(amps, a -> a * ch) AS mamps
  FROM aub
  UNION ALL
  SELECT doc_id * {_AC_AUD_STRIDE} + 1, doc_id, source, rate, frames,
         1, list_transform(amps, a -> a * ch), pers,
         list_transform(amps, a -> a * ch)
  FROM aub WHERE doc_id % {_AC_DOWNMIX_MOD} = 2
), aukeys AS (
  SELECT *,
         rate || ':' || eff_ch || ':' || frames || ':'
              || array_to_string(eff_amps, ',') || ':'
              || array_to_string(pers, ',') AS exact_key,
         frames || '|' || array_to_string(mamps, ',') || '|'
                || array_to_string(pers, ',') AS ckey
  FROM auc
), aucont AS (
  SELECT DISTINCT ckey, frames, mamps, pers FROM aukeys
), ausmp AS (
  SELECT ckey, frames, t.i AS i,
         CASE WHEN ((t.i // pers[(t.i * 8) // frames + 1]) % 2) = 0
              THEN mamps[(t.i * 8) // frames + 1]
              ELSE -mamps[(t.i * 8) // frames + 1] END AS mono
  FROM aucont CROSS JOIN range(0, 1024) t(i)
  WHERE t.i < frames
), ausb AS (
  SELECT ckey, (i * 9) // frames AS f, bb.b AS band,
         CAST(sum(mono * (1 - 2 * ((i >> bb.b) & 1))) AS BIGINT) AS s
  FROM ausmp CROSS JOIN range(0, 8) bb(b)
  GROUP BY 1, 2, 3
), auen AS (
  SELECT ckey, f, band, s * s AS e FROM ausb
), aubits AS (
  SELECT a.ckey, (a.f - 1) * 7 + a.band AS idx,
         CASE WHEN a.e - nb.e - pf.e + pb.e > 0 THEN 1 ELSE 0 END AS bit
  FROM auen a
  JOIN auen nb ON nb.ckey = a.ckey AND nb.f = a.f
              AND nb.band = a.band + 1
  JOIN auen pf ON pf.ckey = a.ckey AND pf.f = a.f - 1
              AND pf.band = a.band
  JOIN auen pb ON pb.ckey = a.ckey AND pb.f = a.f - 1
              AND pb.band = a.band + 1
  WHERE a.f >= 1 AND a.band <= 6
), auph AS (
  SELECT ckey, CAST(sum(bit::BIGINT << idx) AS BIGINT) AS aphash
  FROM aubits GROUP BY 1
), ausig AS (
  SELECT k.aud_id, k.doc_id, k.source, k.rate, k.frames, k.exact_key,
         auph.aphash
  FROM aukeys k JOIN auph USING (ckey)
), auex AS (
  SELECT exact_key, min(aud_id) AS exact_canon FROM ausig GROUP BY 1
), aus2 AS (
  SELECT ausig.*, auex.exact_canon FROM ausig JOIN auex USING (exact_key)
), aupm AS (
  SELECT rate, aphash, min(aud_id) AS ph_canon
  FROM aus2 WHERE aud_id = exact_canon GROUP BY 1, 2
), auverd AS (
  SELECT aus2.source, aus2.frames, aus2.rate,
         CASE WHEN aus2.aud_id <> aus2.exact_canon THEN 'exact_dup'
              WHEN aus2.aud_id <> aupm.ph_canon THEN 'phash_dup'
              ELSE 'curated' END AS verdict
  FROM aus2 LEFT JOIN aupm
    ON aus2.rate = aupm.rate AND aus2.aphash = aupm.aphash
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_clips,
       CAST(sum(CASE WHEN verdict = 'exact_dup' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_exact_dups,
       CAST(sum(CASE WHEN verdict = 'phash_dup' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_phash_dups,
       CAST(sum(CASE WHEN verdict = 'curated' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_curated,
       CAST(sum(CASE WHEN verdict = 'curated' THEN frames ELSE 0 END)
            AS BIGINT) AS curated_frames,
       CAST(sum(CASE WHEN verdict = 'curated'
                THEN (frames * 1000) // rate ELSE 0 END)
            AS BIGINT) AS curated_duration_ms
FROM auverd GROUP BY 1
"""


@_register("pipeline_audio_curation", None)  # oracle attached below
def pipeline_audio_curation(spark, sf_dir):
    """Audio curation END TO END — the last media family's capstone,
    completing the image/video/caption set: a rich-content WAV corpus
    (wav_tones clips, plus DOWNMIX re-encodes for doc_id % 5 == 2 —
    the channel fold that flips every PCM byte of a stereo clip while
    the perceptual fingerprint is invariant by construction) is parsed
    ONCE by :func:`operators.multimodal.audio_curation_signatures`
    (RIFF walk -> exact pcm md5 + 56-bit banded-energy hash from the
    SAME parsed bytes), exact-deduped on (rate, channels, pcm_md5),
    near-deduped on (rate, aphash) over the surviving exact canonicals
    — catching exactly the downmixed-stereo re-encodes plus any
    protocol hash coincidences — and rolled into a per-source curated-
    audio card (tier counts + curated frame/duration mass).

    Plan shape at 100 TB: synthesis, downmix and parse are
    Arrow-batched ``mapInPandas``, executor-linear over clips; PCM
    bytes never shuffle (plan-gated) — each tier is one map-side-
    combinable groupBy on fixed-width keys plus a signature-sized
    equi-join back. The signature frame is persisted (three branches
    over Python-stage work, the SCALE.md part D rule). Oracle: the
    registry_ext11 Walsh-band machinery over EFFECTIVE post-downmix
    tables, hashed once per distinct mono-content key."""
    from .caching import tracked_persist
    from .operators.multimodal import (
        audio_curation_signatures,
        audio_downmix,
        synthesize_media_payloads,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    base = synthesize_media_payloads(docs, "wav_tones")
    dn = audio_downmix(
        base.filter(F.col("doc_id") % _AC_DOWNMIX_MOD == 2)
    )
    corpus = (
        base.select(
            (F.col("doc_id") * _AC_AUD_STRIDE).alias("aud_id"), "payload"
        )
        .unionByName(
            dn.select(
                (F.col("doc_id") * _AC_AUD_STRIDE + 1).alias("aud_id"),
                "payload",
            )
        )
        # undo the 2-way union partition blow-up before the signature
        # crossing (the image-corpus coalesce rule; narrow, no shuffle).
        # The target carries the seed's own split count as a FLOOR
        # (max(), exactly like _image_corpus_of): a production corpus
        # arriving in thousands of splits keeps its granularity through
        # the expensive Python parse instead of being capped at
        # defaultParallelism tasks (r16 verdict item 2).
        .coalesce(_audio_coalesce_target(docs))
    )
    sig = tracked_persist(audio_curation_signatures(corpus))
    ex = sig.groupBy("sample_rate", "n_channels", "pcm_md5").agg(
        F.min("aud_id").alias("exact_canon")
    )
    s2 = sig.join(ex, on=["sample_rate", "n_channels", "pcm_md5"])
    pm = (
        s2.filter(F.col("aud_id") == F.col("exact_canon"))
        .groupBy("sample_rate", "aphash")
        .agg(F.min("aud_id").alias("ph_canon"))
    )
    verdict = (
        F.when(F.col("aud_id") != F.col("exact_canon"), F.lit("exact_dup"))
        .when(F.col("aud_id") != F.col("ph_canon"), F.lit("phash_dup"))
        .otherwise(F.lit("curated"))
    )
    tiered = (
        s2.join(pm, on=["sample_rate", "aphash"], how="left")
        .withColumn("verdict", verdict)
        .withColumn("doc_id", F.shiftright(F.col("aud_id"), 1))
    )
    curated = F.col("verdict") == "curated"
    return (
        tiered.join(docs.select("doc_id", "source"), on="doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clips"),
            F.sum((F.col("verdict") == "exact_dup").cast("long")).alias(
                "n_exact_dups"
            ),
            F.sum((F.col("verdict") == "phash_dup").cast("long")).alias(
                "n_phash_dups"
            ),
            F.sum(curated.cast("long")).alias("n_curated"),
            F.sum(
                F.when(curated, F.col("n_frames")).otherwise(0).cast("long")
            ).alias("curated_frames"),
            F.sum(
                F.when(
                    curated,
                    F.expr(
                        "(CAST(n_frames AS BIGINT) * 1000) DIV sample_rate"
                    ),
                ).otherwise(0)
            ).alias("curated_duration_ms"),
        )
    )


ORACLES["pipeline_audio_curation"] = _duck_audio_curation_sql()


# --- streaming media ingest ----------------------------------------------------

#: the image incremental's batch selector (registry_ext12), reused so
#: the streaming twin probes exactly the images the batch twin calls
#: "newly ingested"
_SMI_BATCH_MOD = 13
_SMI_BATCH_RESIDUES = 2


def _duck_streaming_ingest_sql() -> str:
    """Per-image standing-only verdicts closed-form over the SHARED
    image-sig CTE builder: the streaming probe is per-row against a
    FROZEN index (no batch-internal tier — micro-batch boundaries are
    an execution detail, so only micro-batch-INVARIANT verdicts are
    streamable; within-ingest dedup is the batch twin's job), which
    makes the drained sink equal this batch SQL row for row."""
    return f"""
WITH {_duck_image_sig_ctes()},
smi_st AS (SELECT * FROM sig
           WHERE img_id % {_SMI_BATCH_MOD} >= {_SMI_BATCH_RESIDUES}),
smi_stk AS (SELECT DISTINCT exact_key FROM smi_st),
smi_stc AS (SELECT exact_key, min(img_id) AS c FROM smi_st GROUP BY 1),
smi_stph AS (
  SELECT DISTINCT s.phash_hi, s.phash_lo
  FROM smi_st s JOIN smi_stc ON s.exact_key = smi_stc.exact_key
                            AND s.img_id = smi_stc.c),
smi_b AS (SELECT * FROM sig
          WHERE img_id % {_SMI_BATCH_MOD} < {_SMI_BATCH_RESIDUES})
SELECT b.img_id,
       CASE WHEN smi_stk.exact_key IS NOT NULL THEN 'exact_dup_standing'
            WHEN smi_stph.phash_hi IS NOT NULL THEN 'phash_dup_standing'
            ELSE 'novel' END AS verdict
FROM smi_b b
LEFT JOIN smi_stk USING (exact_key)
LEFT JOIN smi_stph
  ON b.phash_hi = smi_stph.phash_hi AND b.phash_lo = smi_stph.phash_lo
"""


@_register("streaming_image_ingest", None)  # oracle attached below
def streaming_image_ingest(spark, sf_dir):
    """Media ingest as a STREAM — the streaming twin completing the
    media family next to the dedup/bloom/sessions/PQ streaming twins:
    document batches arrive as a file stream, each micro-batch
    synthesizes its images, decodes them ONCE (batch-residue images
    only — the filter runs before the decode), and probes a standing
    signature index built and persisted ONCE outside the stream,
    appending per-image verdicts to a durable parquet sink with
    checkpointed exactly-once resume (stream_ops.stream_score_batches).

    Only the STANDING-side tiers are probed (exact key hit, then
    canonical-phash hit, else novel): a batch-internal tier would make
    verdicts depend on micro-batch boundaries — an execution detail —
    so it stays with the batch twin (multimodal_image_dedup_incremental)
    by design; the probe is per-row against a frozen index, which is
    exactly the invariance stream_score_batches' contract demands, and
    what makes the drained sink equal the batch SQL oracle row for row.

    At 100 TB the standing signature index is ~60 B/image persisted
    once; each micro-batch's work is its own decode plus two key-sized
    hash joins — no state store at all (the index is a static frame,
    not streaming state)."""
    import shutil
    import tempfile

    from .caching import tracked_persist
    from .operators.multimodal import image_signatures
    from .streaming.stream_ops import (
        read_parquet_stream,
        stream_score_batches,
    )

    # seed docs only — do NOT call _image_corpus here: its second return
    # value (the full corpus) would be discarded unexecuted, but building
    # it still pays the widen probe (a throwaway physical-plan compile of
    # the whole subtree) on the driver (ADVICE r16)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")

    def _is_batch_img(img_id):
        return img_id % _SMI_BATCH_MOD < _SMI_BATCH_RESIDUES

    # push the residue split BELOW the synthesis (img_pred): the
    # dominant cost of the corpus builder is the PNG/JPEG ENCODE, and
    # img_id is a pure function of (doc_id, branch variant), so the
    # standing side never synthesizes (or decodes, or persists) the
    # batch residues — previously it synthesized everything and
    # filtered finished payloads (profiled: an 88 s-task-time 160-task
    # stage per side at sf0.1)
    standing = tracked_persist(
        image_signatures(
            _image_corpus_of(docs, img_pred=lambda i: ~_is_batch_img(i))
        ).filter(F.col("pixel_md5").isNotNull())
    )
    st_keys = standing.select("pixel_md5").distinct().withColumn(
        "_hit_sk", F.lit(True)
    )
    st_canon = standing.groupBy("pixel_md5").agg(F.min("img_id").alias("_c"))
    st_ph = (
        standing.join(st_canon, on="pixel_md5")
        .filter(F.col("img_id") == F.col("_c"))
        .select("phash_hi", "phash_lo")
        .distinct()
        .withColumn("_hit_ph", F.lit(True))
    )

    tag = _stable_dir_tag(sf_dir)
    base = f"{tempfile.gettempdir()}/hds_media_stream_{tag}"
    # deterministic replay: wipe sink + checkpoint so every invocation
    # reprocesses the full (finite) stream from scratch
    shutil.rmtree(base, ignore_errors=True)

    stream = read_parquet_stream(
        spark, f"{sf_dir}/documents.parquet"
    ).select("doc_id", "text")

    def probe(batch_docs):
        # same img_pred push-down as the standing side: each
        # micro-batch synthesizes ONLY its batch-residue images
        bsig = image_signatures(
            _image_corpus_of(batch_docs, img_pred=_is_batch_img)
        ).filter(F.col("pixel_md5").isNotNull())
        verdict = (
            F.when(F.col("_hit_sk"), F.lit("exact_dup_standing"))
            .when(F.col("_hit_ph"), F.lit("phash_dup_standing"))
            .otherwise(F.lit("novel"))
        )
        return (
            bsig.join(st_keys, on="pixel_md5", how="left")
            .join(st_ph, on=["phash_hi", "phash_lo"], how="left")
            .withColumn("_hit_sk", F.coalesce(F.col("_hit_sk"), F.lit(False)))
            .withColumn("_hit_ph", F.coalesce(F.col("_hit_ph"), F.lit(False)))
            .select("img_id", verdict.alias("verdict"))
        )

    return stream_score_batches(
        stream,
        probe,
        path=f"{base}/sink",
        checkpoint_dir=f"{base}/ckpt",
        state_partitions=8,
    ).select("img_id", "verdict")


ORACLES["streaming_image_ingest"] = _duck_streaming_ingest_sql()


# --- incremental (continuous-ingest) audio dedup -------------------------------

#: batch selector: clips with aud_id % 13 < 2 are "newly ingested" —
#: AUD (not doc) granularity, deliberately: a base clip and its downmix
#: re-encode share a doc_id and would otherwise always land in the SAME
#: split, making the exact-vs-standing leg protocol-unreachable (the
#: ext12 selector-granularity lesson, re-learned at audio); consecutive
#: aud_ids straddle the residue boundary, so mono pairs exercise both
#: exact legs and stereo pairs both perceptual legs
_ACI_BATCH_MOD = 13
_ACI_BATCH_RESIDUES = 2


def _duck_audio_incremental_sql() -> str:
    """The nightly audio-ingest report, closed-form over the SAME
    effective-table corpus replay as the curation oracle (shared
    constants — the two cannot drift): batch clips probe the standing
    index's exact keys ((rate, ch, content)), then the standing
    CANONICAL perceptual set ((rate, aphash)), then dedup among
    themselves. Standing-first verdicts, the registry_ext12 tiering."""
    base = _duck_audio_curation_sql()
    # reuse the curation oracle's CTE chain up to ausig verbatim, then
    # swap the tail for the standing-first incremental tiering
    head, _ = base.split("), auex AS (", 1)
    return head + f"""),
acib AS (SELECT * FROM ausig
         WHERE aud_id % {_ACI_BATCH_MOD} < {_ACI_BATCH_RESIDUES}),
acist AS (SELECT * FROM ausig
          WHERE aud_id % {_ACI_BATCH_MOD} >= {_ACI_BATCH_RESIDUES}),
acistk AS (SELECT DISTINCT exact_key FROM acist),
acistc AS (SELECT exact_key, min(aud_id) AS c FROM acist GROUP BY 1),
acistph AS (
  SELECT DISTINCT s.rate, s.aphash
  FROM acist s JOIN acistc ON s.exact_key = acistc.exact_key
                          AND s.aud_id = acistc.c),
acibex AS (SELECT exact_key, min(aud_id) AS bc FROM acib GROUP BY 1),
acibj AS (
  SELECT acib.*, (acistk.exact_key IS NOT NULL) AS hit_sk, acibex.bc
  FROM acib LEFT JOIN acistk USING (exact_key)
  JOIN acibex USING (exact_key)),
acibph AS (
  SELECT rate, aphash, min(aud_id) AS pc
  FROM acibj WHERE NOT hit_sk AND aud_id = bc GROUP BY 1, 2),
aciverd AS (
  SELECT acibj.source,
         CASE WHEN acibj.hit_sk THEN 'exact_dup_standing'
              WHEN acibj.aud_id <> acibj.bc THEN 'exact_dup_batch'
              WHEN acistph.rate IS NOT NULL THEN 'phash_dup'
              WHEN acibj.aud_id <> acibph.pc THEN 'phash_dup'
              ELSE 'novel' END AS verdict
  FROM acibj
  LEFT JOIN acistph
    ON acibj.rate = acistph.rate AND acibj.aphash = acistph.aphash
  LEFT JOIN acibph
    ON acibj.rate = acibph.rate AND acibj.aphash = acibph.aphash)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_batch_clips,
       CAST(sum(CASE WHEN verdict = 'exact_dup_standing' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_exact_dup_standing,
       CAST(sum(CASE WHEN verdict = 'exact_dup_batch' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_exact_dup_batch,
       CAST(sum(CASE WHEN verdict = 'phash_dup' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_phash_dup,
       CAST(sum(CASE WHEN verdict = 'novel' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel
FROM aciverd GROUP BY 1
"""


@_register("multimodal_audio_dedup_incremental", None)  # oracle below
def multimodal_audio_dedup_incremental(spark, sf_dir):
    """Continuous-ingest audio dedup — the incremental twin of
    pipeline_audio_curation's two tiers, completing the operational
    shape for ALL THREE media families (images r14, video r15, audio
    here): a nightly batch of new clips (aud_id % 13 < 2 plays the
    delta, over the SAME corpus-plus-downmixes the curation pipeline
    defines) probes a STANDING signature index by exact content key,
    then canonical perceptual key, then dedups among itself (batch
    selector at CLIP granularity — aud_id % 13 < 2 — so base/downmix
    pairs straddle the split and every verdict class is reachable).
    The probe IS :func:`operators.multimodal.image_ingest_verdicts` a third
    time: the operator is signature-schema generic, so the audio keys
    map onto it verbatim — exact key = 'rate:ch:' || pcm_md5 in the
    md5 slot, perceptual key = (rate, aphash) in the two phash slots —
    one operator, three modalities, each pinned by its own closed-form
    oracle. Output: the per-source ingest report.

    At 100 TB the standing index is ~50 B/clip persisted once; each
    night's work is batch-parse plus key-sized joins (index rebuilt
    in-query only because the registry gate needs a self-contained
    plan). Oracle: the curation oracle's CTE chain verbatim up to the
    per-clip signature frame, then the ext12 standing-first tiering."""
    from .caching import tracked_persist
    from .operators.multimodal import (
        audio_curation_signatures,
        audio_downmix,
        image_ingest_verdicts,
        synthesize_media_payloads,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    base = synthesize_media_payloads(docs, "wav_tones")
    dn = audio_downmix(base.filter(F.col("doc_id") % _AC_DOWNMIX_MOD == 2))
    corpus = base.select(
        (F.col("doc_id") * _AC_AUD_STRIDE).alias("aud_id"), "payload"
    ).unionByName(
        dn.select(
            (F.col("doc_id") * _AC_AUD_STRIDE + 1).alias("aud_id"), "payload"
        )
    ).coalesce(_audio_coalesce_target(docs))  # seed-split floor, see
    # _audio_coalesce_target: never below the input's own granularity
    sig = tracked_persist(
        audio_curation_signatures(corpus).select(
            "aud_id",
            F.concat_ws(
                ":",
                F.col("sample_rate"),
                F.col("n_channels"),
                F.col("pcm_md5"),
            ).alias("pixel_md5"),
            F.col("sample_rate").cast("long").alias("phash_hi"),
            F.col("aphash").alias("phash_lo"),
        )
    )
    is_batch = F.col("aud_id") % _ACI_BATCH_MOD < _ACI_BATCH_RESIDUES
    tiered = image_ingest_verdicts(
        sig.filter(is_batch), sig.filter(~is_batch), id_col="aud_id"
    ).withColumn("doc_id", F.shiftright(F.col("aud_id"), 1))

    def n_of(v):
        return F.sum((F.col("verdict") == v).cast("long"))

    return (
        tiered.join(docs.select("doc_id", "source"), on="doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_batch_clips"),
            n_of("exact_dup_standing").alias("n_exact_dup_standing"),
            n_of("exact_dup_batch").alias("n_exact_dup_batch"),
            n_of("phash_dup").alias("n_phash_dup"),
            n_of("novel").alias("n_novel"),
        )
    )


ORACLES["multimodal_audio_dedup_incremental"] = _duck_audio_incremental_sql()


# --- multimodal training-shard manifest ----------------------------------------

#: packing constants, fixed (not auto-derived) so the DuckDB oracle can
#: replicate the sharding — library callers get data-derived sharding
_MS_BUDGET = 2048
_MS_SHARDS = 16


def _duck_multimodal_shards_sql() -> str:
    """The shard manifest closed-form: the caption oracle's pair CTEs
    (shared builder) filtered to accepted, token counts from the shared
    tokenizer expression, the pack_sequences hash-shard + cumulative
    layout, then one manifest row per shard."""
    from .registry_ext import _DUCK_TOKENS, _duck_bucket

    head, _ = _duck_caption_curation_sql().split("\nSELECT source,", 1)
    return head + f""",
ms_tok AS (
  SELECT doc_id, len({_DUCK_TOKENS}) AS n_tokens FROM documents
), ms_acc AS (
  SELECT v.doc_id, v.w, v.h, t.n_tokens,
         ({_duck_bucket('v.doc_id', '')} % {_MS_SHARDS}) AS shard
  FROM cap_verd v JOIN ms_tok t USING (doc_id)
  WHERE v.verdict = 'accepted'
), ms_cum AS (
  SELECT *, sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
             ROWS UNBOUNDED PRECEDING) AS tokens_through
  FROM ms_acc
)
SELECT shard,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST((max(tokens_through) + {_MS_BUDGET} - 1) // {_MS_BUDGET}
            AS BIGINT) AS n_seqs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(3 * w * h) AS BIGINT) AS total_pixel_bytes
FROM ms_cum GROUP BY 1
"""


@_register("pipeline_multimodal_shards", None)  # oracle attached below
def pipeline_multimodal_shards(spark, sf_dir):
    """The training-data ENDGAME composition: curated cross-modal pairs
    packed into token-budget training shards, emitting the per-shard
    manifest a downstream tokenizer/loader consumes. The accepted pairs
    come from the SAME verdict-tagged frame as pipeline_caption_curation
    (one builder — the gate cannot drift between the card and the
    manifest), then :func:`operators.packing.pack_sequences` lays each
    shard's captions end-to-end on a virtual token tape (deterministic
    id-hash sharding, cut every ``_MS_BUDGET`` tokens — placement is a
    pure function of ids and token counts, so re-runs and
    repartitioning cannot move a pair between sequences). Manifest per
    shard: pair
    count, sequence count (ceil of the tape length), token mass, and
    the pixel payload volume the loader will fetch.

    Plan shape at 100 TB: everything after the caption gate is one
    window over the shard key (bounded per-task work via the shard
    count; the library default derives n_shards from total tokens so a
    fixed count never pins 1/n of the corpus on one sort task) plus one
    combinable groupBy — pixels and payloads never enter the plan at
    all, only token counts and dims ride along. Oracle: the caption
    oracle's pair CTEs verbatim + the pack_sequences layout SQL."""
    from .operators.packing import pack_sequences

    pairs = _caption_pairs(spark, sf_dir).filter(
        F.col("verdict") == "accepted"
    )
    packed = pack_sequences(
        pairs, budget=_MS_BUDGET, n_shards=_MS_SHARDS
    )
    return packed.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.ceil(
            (F.max(F.col("seq_id") * _MS_BUDGET + F.col("seq_offset")
                   + F.col("n_tokens")))
            / F.lit(_MS_BUDGET)
        ).cast("long").alias("n_seqs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum(3 * F.col("width") * F.col("height")).cast("long").alias(
            "total_pixel_bytes"
        ),
    )


ORACLES["pipeline_multimodal_shards"] = _duck_multimodal_shards_sql()

from . import registry_web  # noqa: E402,F401  (URL/domain family, r16)
from . import registry_subdoc  # noqa: E402,F401  (paragraph dedup, r16)
