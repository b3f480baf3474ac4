"""Extension-layer query registry, part 11 (round-13).

Same contract as ``registry_ext.py``: every query has a DuckDB oracle
generated from the SAME constants so both sides compute identical
values by construction. This batch closes the r12 verdict's frontier
items:

1. **Perceptual audio fingerprint** — audio's pHash tier (the exact
   tier is ``multimodal_audio_dedup``'s PCM md5): a 56-bit
   banded-energy sign hash (Haitsma & Kalker 2002) computed through
   the real RIFF/PCM walk, integer-exact end to end so the oracle
   replays every bit from the synthesis protocol.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401  (used by later queries)

from .registry import ORACLES, QUERIES, _register, _t  # noqa: F401


# --- perceptual audio fingerprint ------------------------------------------


def _duck_audio_phash_cte() -> str:
    """Mirror of synthesize_wav_tones + media_codecs.audio_phash56: the
    PCM samples come closed-form from the md5 synthesis protocol
    (segment amplitude/half-period tables as per-doc lists), the Walsh
    band correlations are integer sums grouped by (time segment, band),
    and the 56 hash bits are the signs of the Haitsma-Kalker
    double-differences of the squared correlations — pure bigint
    arithmetic, bit-identical by construction (|S| <= 8672 * 1024 so
    S^2 < 2^48, comfortably BIGINT). Byte k of md5(seed) is hex substr
    position 2k+1; segment s uses amp byte (9+s) % 16 and half-period
    byte (s*2+3) % 16, matching the Python protocol exactly."""
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
WITH b AS (
  SELECT doc_id,
         ([8000,16000,22050,44100,48000])[
             ('0x' || substr(md5(text), 11, 2))::INTEGER % 5 + 1] AS rate,
         1 + ('0x' || substr(md5(text), 13, 2))::INTEGER % 2 AS ch,
         512 + (('0x' || substr(md5(text), 15, 2))::INTEGER * 256
                + ('0x' || substr(md5(text), 17, 2))::INTEGER) % 512
             AS frames,
         [{amps}] AS amps,
         [{pers}] AS pers
  FROM documents
), smp AS (
  SELECT doc_id, frames,
         t.i AS i,
         ch * (CASE WHEN ((t.i // pers[(t.i * 8) // frames + 1]) % 2) = 0
                    THEN amps[(t.i * 8) // frames + 1]
                    ELSE -amps[(t.i * 8) // frames + 1] END) AS mono
  FROM b CROSS JOIN range(0, 1024) t(i)
  WHERE t.i < frames
), sb AS (
  SELECT doc_id, (i * 9) // frames AS f, bb.b AS band,
         CAST(sum(mono * (1 - 2 * ((i >> bb.b) & 1))) AS BIGINT) AS s
  FROM smp CROSS JOIN range(0, 8) bb(b)
  GROUP BY 1, 2, 3
), en AS (
  SELECT doc_id, f, band, s * s AS e FROM sb
), bits AS (
  SELECT a.doc_id, (a.f - 1) * 7 + a.band AS idx,
         CASE WHEN a.e - ab.e - pf.e + pb.e > 0 THEN 1 ELSE 0 END AS bit
  FROM en a
  JOIN en ab ON ab.doc_id = a.doc_id AND ab.f = a.f
            AND ab.band = a.band + 1
  JOIN en pf ON pf.doc_id = a.doc_id AND pf.f = a.f - 1
            AND pf.band = a.band
  JOIN en pb ON pb.doc_id = a.doc_id AND pb.f = a.f - 1
            AND pb.band = a.band + 1
  WHERE a.f >= 1 AND a.band <= 6
), ph AS (
  SELECT doc_id, CAST(sum(bit::BIGINT << idx) AS BIGINT) AS aphash
  FROM bits GROUP BY 1
)
{{select}}
"""


@_register(
    "multimodal_audio_phash",
    _duck_audio_phash_cte().format(select="""
SELECT b.doc_id, CAST(b.rate AS INTEGER) AS sample_rate,
       CAST(b.ch AS INTEGER) AS n_channels,
       CAST(b.frames AS INTEGER) AS n_frames, ph.aphash
FROM ph JOIN b USING (doc_id)"""),
)
def multimodal_audio_phash(spark, sf_dir):
    """Per-clip PERCEPTUAL audio fingerprint through the real decode
    path — audio's pHash tier, closing the r12 verdict's named gap
    (multimodal_audio_dedup's exact PCM md5 dies on one re-encode;
    these 56 banded-energy sign bits survive uniform gain, +/-1-LSB
    dither, and mono folds — pinned by unit test). The oracle
    recomputes every bit integer-exactly from the synthesis protocol
    (rich wav_tones content: 8 seed-derived amplitude/period segments —
    the constant-amplitude 'wav' fixture is spectrally degenerate and
    would hash identically everywhere). Zero shuffle: 1 row in ->
    1 row out, Arrow-batched. See operators/media_codecs.py:
    audio_phash56 and operators/multimodal.py:audio_phash."""
    from .operators.multimodal import audio_phash, synthesize_media_payloads

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return audio_phash(synthesize_media_payloads(docs, "wav_tones"))
