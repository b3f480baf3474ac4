"""Media codecs: PPM/BMP image parse+encode, PCM WAV parse+encode.

These back the ``decoder='real'`` paths in :mod:`multimodal`. The hot
inner computations (pixel synthesis, nearest-neighbour gather, RMS) are
numpy-vectorized; pure-stdlib loop fallbacks keep the module importable
with zero non-stdlib dependencies, so the real codec path runs in any
environment. Formats covered:

- **PPM** (netpbm): binary ``P6`` and ascii ``P3``, comment- and
  whitespace-tolerant header parsing; nearest-neighbour resize re-encoding
  to ``P6``.
- **BMP**: ``BITMAPINFOHEADER`` (the 40-byte header written by effectively
  every producer), 8/24/32 bpp, top-down or bottom-up.
- **WAV**: RIFF chunk walk (tolerates extra chunks before ``data``),
  PCM16 only, exact integer RMS.

Also provides deterministic fixture *synthesis* (image/audio payloads
derived from a seed string via md5) whose observable properties —
dimensions, byte sizes, durations, RMS, pixel checksums — are mirrorable
in ANSI SQL, which is what lets the registry run the real codecs under the
DuckDB correctness gate: synthesize -> encode -> parse must land exactly
on the SQL-predicted values.

The synthesis rules are fixed protocol (changing them breaks the oracles):

- ``w = 1 + d0 % 64``, ``h = 1 + d1 % 64`` (``d_i`` = byte i of
  ``md5(seed)``); format = PPM if ``d2`` even else BMP.
- image pixel byte ``j`` (row-major RGB, top-down) = ``(d3 + j) % 256``.
- WAV: rate = ``[8000,16000,22050,44100,48000][d5 % 5]``, channels =
  ``1 + d6 % 2``, frames = ``200 + (d7*256 + d8) % 800``, every sample
  alternates ``+A, -A`` with ``A = d9 * 128`` (so RMS == A exactly and
  ``rms_q8 = A // 128 = d9``).
- y4m video (C444): ``w = 1 + d0 % 32``, ``h = 1 + d1 % 32``, fps =
  ``[10,24,25,30][d4 % 4]``, ``n_frames = 1 + d10 % 6``; byte ``j`` of
  frame ``f`` = ``(d3 + f + j) % 256`` (so per-frame byte sums have an
  O(1) closed form the video oracle computes in SQL).
"""

from __future__ import annotations

import hashlib
import math
import struct
import zlib
from array import array

try:  # numpy ships with the Arrow/pandas stack; loops below are the fallback
    import numpy as np
except ImportError:  # pragma: no cover - numpy is present in any pyspark env
    np = None

__all__ = [
    "WAV_RATES",
    "Y4M_RATES",
    "synthesize_image",
    "synthesize_ppm",
    "synthesize_bmp",
    "synthesize_png",
    "synthesize_wav",
    "synthesize_y4m",
    "parse_image",
    "parse_png",
    "parse_wav",
    "parse_y4m",
    "resize_ppm_nearest",
    "ppm_pixel_data",
    "bmp_pixel_data",
    "png_pixel_data",
    "image_pixel_data",
    "ahash64",
    "ahash64_from_pixels",
]

WAV_RATES = [8000, 16000, 22050, 44100, 48000]


# --- synthesis (deterministic, SQL-mirrorable) ---------------------------

def _dims(seed: str) -> tuple[int, int, bytes]:
    d = hashlib.md5(seed.encode("utf-8")).digest()
    return 1 + d[0] % 64, 1 + d[1] % 64, d


def synthesize_ppm(seed: str) -> bytes:
    """Deterministic P6 image: dims and pixel pattern from md5(seed)."""
    w, h, d = _dims(seed)
    header = b"P6\n" + f"{w} {h}\n".encode() + b"255\n"
    if np is not None:
        pixels = ((d[3] + np.arange(w * h * 3)) % 256).astype(np.uint8).tobytes()
    else:
        pixels = bytes((d[3] + j) % 256 for j in range(w * h * 3))
    return header + pixels


def synthesize_bmp(seed: str) -> bytes:
    """Deterministic 24bpp bottom-up BMP with the same pixel pattern as the
    PPM synth (pattern index is top-down row-major RGB)."""
    w, h, d = _dims(seed)
    stride = (3 * w + 3) // 4 * 4
    data_size = stride * h
    file_header = struct.pack("<2sIHHI", b"BM", 54 + data_size, 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    if np is not None:
        rgb = ((d[3] + np.arange(h * w * 3)) % 256).astype(np.uint8)
        bgr = rgb.reshape(h, w, 3)[:, :, ::-1]  # BMP stores BGR
        padded = np.zeros((h, stride), dtype=np.uint8)
        padded[:, : 3 * w] = bgr.reshape(h, 3 * w)
        return file_header + info_header + padded[::-1].tobytes()  # bottom-up
    rows = []
    for y_out in range(h - 1, -1, -1):  # bottom-up storage, top-down pattern
        row = bytearray()
        for x in range(w):
            base = (y_out * w + x) * 3
            r, g, b = ((d[3] + base + c) % 256 for c in range(3))
            row += bytes((b, g, r))  # BMP stores BGR
        row += b"\x00" * (stride - 3 * w)
        rows.append(bytes(row))
    return file_header + info_header + b"".join(rows)


def synthesize_image(seed: str) -> bytes:
    """PPM if md5 byte 2 is even, BMP otherwise — exercises format sniffing."""
    d2 = hashlib.md5(seed.encode("utf-8")).digest()[2]
    return synthesize_ppm(seed) if d2 % 2 == 0 else synthesize_bmp(seed)


def synthesize_wav(seed: str) -> bytes:
    """Deterministic PCM16 WAV; every sample is +A/-A alternating per frame
    so the true RMS is exactly A (see module docstring for the rules)."""
    d = hashlib.md5(seed.encode("utf-8")).digest()
    rate = WAV_RATES[d[5] % len(WAV_RATES)]
    channels = 1 + d[6] % 2
    frames = 200 + (d[7] * 256 + d[8]) % 800
    amp = d[9] * 128
    if np is not None:
        vals = np.where(np.arange(frames) % 2 == 0, amp, -amp)
        data = np.repeat(vals, channels).astype("<i2").tobytes()
    else:
        samples = array("h")
        for i in range(frames):
            v = amp if i % 2 == 0 else -amp
            samples.extend([v] * channels)
        data = samples.tobytes()
    block_align = channels * 2
    header = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF",
        36 + len(data),
        b"WAVE",
        b"fmt ",
        16,
        1,  # PCM
        channels,
        rate,
        rate * block_align,
        block_align,
        16,
        b"data",
        len(data),
    )
    return header + data


# --- PNG (real zlib inflate + filter reconstruction) ---------------------

def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _png_filter_row(ftype: int, row: bytes, prev: bytes, bpp: int) -> bytes:
    """Apply PNG filter ``ftype`` to a raw scanline (encoder side).
    ``prev`` is the RAW previous scanline (zeros for the first row).

    Unlike the decoder's unfilter (whose Sub/Average/Paeth recurrences
    consume their own OUTPUT and are inherently sequential), the encoder
    predicts from raw neighbour bytes only, so every filter vectorizes:
    the numpy path shifts the row/prev arrays and subtracts whole lanes.
    """
    n = len(row)
    if ftype == 0:
        return bytes(row)
    if np is not None:
        x = np.frombuffer(row, dtype=np.uint8).astype(np.int16)
        b = np.frombuffer(prev, dtype=np.uint8).astype(np.int16)
        a = np.zeros(n, dtype=np.int16)
        a[bpp:] = x[:-bpp]
        if ftype == 1:  # Sub
            pred = a
        elif ftype == 2:  # Up
            pred = b
        elif ftype == 3:  # Average
            pred = (a + b) // 2
        else:  # Paeth
            c = np.zeros(n, dtype=np.int16)
            c[bpp:] = b[:-bpp]
            pa, pb, pc = np.abs(b - c), np.abs(a - c), np.abs(a + b - 2 * c)
            pred = np.where(
                (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
            )
        return ((x - pred) & 0xFF).astype(np.uint8).tobytes()
    out = bytearray(n)
    for i in range(n):
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        if ftype == 1:  # Sub
            out[i] = (row[i] - a) & 0xFF
        elif ftype == 2:  # Up
            out[i] = (row[i] - b) & 0xFF
        elif ftype == 3:  # Average
            out[i] = (row[i] - (a + b) // 2) & 0xFF
        else:  # Paeth
            c = prev[i - bpp] if i >= bpp else 0
            pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - c - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            out[i] = (row[i] - pred) & 0xFF
    return bytes(out)


def synthesize_png(seed: str) -> bytes:
    """Deterministic 8-bit truecolor PNG with the SAME dims and ramp
    pixel pattern as the PPM/BMP synthesis (``w = 1 + d0 % 64``,
    ``h = 1 + d1 % 64``, pixel byte ``j`` = ``(d3 + j) % 256`` top-down
    row-major RGB) — so every pixel-level oracle (ahash lattice, byte
    sums) carries over unchanged across containers. Each scanline uses
    filter type ``(d4 + row) % 5``, cycling through all five PNG filters
    so a decoder that mis-handles any of Sub/Up/Average/Paeth produces
    wrong pixels and fails the content checks, not just a header test.
    """
    w, h, d = _dims(seed)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # RGB8, no interlace
    stride = 3 * w
    if np is not None:
        raw = ((d[3] + np.arange(h * stride)) % 256).astype(np.uint8)
        rows = raw.reshape(h, stride)
    else:
        rows = [
            bytes((d[3] + y * stride + i) % 256 for i in range(stride))
            for y in range(h)
        ]
    filtered = bytearray()
    prev = bytes(stride)
    for y in range(h):
        row = bytes(rows[y])
        ftype = (d[4] + y) % 5
        filtered.append(ftype)
        filtered += _png_filter_row(ftype, row, prev, 3)
        prev = row
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(filtered), 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, w: int, h: int, bpp: int) -> bytes | None:
    """Reverse per-scanline filtering -> raw pixel bytes (decoder side).
    ``raw`` is the inflated IDAT stream: h * (1 + w*bpp) bytes. The
    recurrences are sequential per row, but rows are short (<=64 px in
    the fixtures) and the whole decode runs inside an Arrow batch."""
    stride = w * bpp
    if len(raw) < h * (1 + stride):
        return None
    out = bytearray(h * stride)
    prev = bytes(stride)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        # numpy pays off only on real-world-sized rows: at fixture widths
        # (<=192 bytes) array setup costs more than the byte loop saves
        if np is not None and ftype in (1, 2) and stride >= 1024:
            lv = np.frombuffer(bytes(line), dtype=np.uint8)
            if ftype == 1:
                # Sub's left-neighbour recurrence is a per-lane running
                # sum: cumsum each of the bpp byte lanes mod 256
                lanes = lv.reshape(w, bpp).astype(np.uint64)
                line = bytearray(
                    (lanes.cumsum(axis=0) % 256)
                    .astype(np.uint8)
                    .tobytes()
                )
            else:  # Up: whole-row add of the previous scanline
                pv = np.frombuffer(prev, dtype=np.uint8)
                line = bytearray(
                    ((lv.astype(np.int16) + pv) & 0xFF)
                    .astype(np.uint8)
                    .tobytes()
                )
        elif ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - c - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            return None  # unknown filter type: corrupt
        out[y * stride : (y + 1) * stride] = line
        prev = bytes(line)
    return bytes(out)


#: PNG color type -> (mode, samples per pixel); 8-bit depth only.
_PNG_COLOR_TYPES = {0: ("L", 1), 2: ("RGB", 3), 6: ("RGBA", 4)}


def _png_decode(payload: bytes) -> tuple[int, int, str, int, bytes] | None:
    """Full PNG decode -> (w, h, mode, bpp, raw pixel bytes) or None.

    Real decoder: signature + chunk walk with CRC verification, IDAT
    concatenation, zlib inflate, and filter reconstruction. Supports
    8-bit greyscale / truecolor / truecolor+alpha, non-interlaced (the
    overwhelming majority of real-world PNGs; Adam7 and palette/16-bit
    variants are rejected as unsupported, not half-parsed).
    """
    p = bytes(payload)
    if len(p) < 8 or p[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, n = 8, len(p)
    ihdr = None
    idat = bytearray()
    while pos + 12 <= n:
        (length,) = struct.unpack_from(">I", p, pos)
        if pos + 12 + length > n:
            return None  # truncated chunk
        ctype = p[pos + 4 : pos + 8]
        body = p[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", p, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            return None  # corrupt chunk
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or len(ihdr) < 13 or not idat:
        return None
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        return None
    mode_bpp = _PNG_COLOR_TYPES.get(color)
    if mode_bpp is None or w <= 0 or h <= 0:
        return None
    mode, bpp = mode_bpp
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    pixels = _png_unfilter(raw, w, h, bpp)
    if pixels is None:
        return None
    return w, h, mode, bpp, pixels


def parse_png(payload: bytes | None) -> dict | None:
    """PNG payload -> ``{"width", "height", "mode", "format"}`` via the
    FULL decode (inflate + unfilter — a corrupt body rejects even when
    the header reads clean), or None."""
    if not payload:
        return None
    decoded = _png_decode(payload)
    if decoded is None:
        return None
    w, h, mode, _bpp, _pixels = decoded
    return {"width": w, "height": h, "mode": mode, "format": "png"}


def png_pixel_data(payload: bytes) -> tuple[int, int, bytes] | None:
    """PNG payload -> (width, height, top-down raw RGB bytes), or None.
    Greyscale replicates to RGB; alpha is dropped — same RGB surface as
    the PPM/BMP decoders, so perceptual hashes agree across containers."""
    decoded = _png_decode(bytes(payload))
    if decoded is None:
        return None
    w, h, mode, bpp, pixels = decoded
    if mode == "RGB":
        return w, h, pixels
    if np is not None:
        px = np.frombuffer(pixels, dtype=np.uint8).reshape(-1, bpp)
        rgb = np.repeat(px, 3, axis=1) if mode == "L" else px[:, :3]
        return w, h, rgb.tobytes()
    out = bytearray()
    for i in range(0, len(pixels), bpp):
        if mode == "L":
            out += pixels[i : i + 1] * 3
        else:
            out += pixels[i : i + 3]
    return w, h, bytes(out)


# --- parsing -------------------------------------------------------------

def _ppm_header(payload: bytes) -> tuple[int, int, int, int] | None:
    """Parse a P6/P3 header -> (width, height, maxval, data_offset).
    Whitespace- and comment-tolerant per the netpbm spec."""
    if len(payload) < 2 or payload[:2] not in (b"P6", b"P3"):
        return None
    pos, fields = 2, []
    n = len(payload)
    while len(fields) < 3 and pos < n:
        c = payload[pos]
        if c in b" \t\r\n":
            pos += 1
        elif c == ord("#"):
            while pos < n and payload[pos] != ord("\n"):
                pos += 1
        elif chr(c).isdigit():
            start = pos
            while pos < n and chr(payload[pos]).isdigit():
                pos += 1
            fields.append(int(payload[start:pos]))
        else:
            return None
    if len(fields) < 3 or pos >= n:
        return None
    return fields[0], fields[1], fields[2], pos + 1  # single ws after maxval


def parse_image(payload: bytes | None) -> dict | None:
    """Sniff + parse a PPM or BMP payload.

    Returns ``{"width", "height", "mode", "format"}`` or None if the payload
    is not a supported image (callers emit a null row — robust-by-default
    for corpus-scale data where some payloads are always corrupt).
    """
    if not payload:
        return None
    p = bytes(payload)
    if p[:2] in (b"P6", b"P3"):
        head = _ppm_header(p)
        if head is None:
            return None
        w, h, maxval, _ = head
        if w <= 0 or h <= 0 or maxval <= 0:
            return None
        return {"width": w, "height": h, "mode": "RGB", "format": "ppm"}
    if p[:2] == b"BM" and len(p) >= 54:
        w, h = struct.unpack_from("<ii", p, 18)
        bpp = struct.unpack_from("<H", p, 28)[0]
        mode = {8: "L", 24: "RGB", 32: "RGBA"}.get(bpp)
        if w <= 0 or h == 0 or mode is None:
            return None
        return {"width": w, "height": abs(h), "mode": mode, "format": "bmp"}
    if p[:8] == b"\x89PNG\r\n\x1a\n":
        return parse_png(p)
    return None


def ppm_pixel_data(payload: bytes) -> tuple[int, int, bytes] | None:
    """P6 payload -> (width, height, raw RGB bytes), or None."""
    p = bytes(payload)
    if p[:2] != b"P6":
        return None
    head = _ppm_header(p)
    if head is None:
        return None
    w, h, _maxval, off = head
    pixels = p[off : off + w * h * 3]
    if len(pixels) < w * h * 3:
        return None
    return w, h, pixels


def resize_ppm_nearest(
    payload: bytes | None, target_w: int, target_h: int
) -> bytes | None:
    """Nearest-neighbour resize of a P6 image, re-encoded as P6.

    ``src = (x * w // W, y * h // H)`` — the floor mapping, mirrorable in
    integer SQL. Returns None for non-P6/corrupt payloads.
    """
    if not payload:
        return None
    parsed = ppm_pixel_data(payload)
    if parsed is None:
        return None
    w, h, pixels = parsed
    header = b"P6\n" + f"{target_w} {target_h}\n".encode() + b"255\n"
    if np is not None:
        src = np.frombuffer(pixels, dtype=np.uint8)[: w * h * 3].reshape(h, w, 3)
        sy = np.arange(target_h) * h // target_h
        sx = np.arange(target_w) * w // target_w
        return header + src[sy][:, sx].tobytes()
    out = bytearray()
    for y in range(target_h):
        sy = y * h // target_h
        row_base = sy * w
        for x in range(target_w):
            sx = x * w // target_w
            base = (row_base + sx) * 3
            out += pixels[base : base + 3]
    return header + bytes(out)


def parse_wav(payload: bytes | None) -> dict | None:
    """RIFF/WAVE chunk walk -> sample_rate, n_channels, duration_ms, rms_q8.

    PCM16 only; RMS is sqrt(mean(sample^2)) over every sample (all
    channels), rounded then quantised ``// 128`` to 8 bits. Returns None
    for non-WAV/corrupt/unsupported payloads.
    """
    if not payload:
        return None
    p = bytes(payload)
    if len(p) < 44 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return None
    pos, n = 12, len(p)
    rate = channels = bits = None
    data = None
    while pos + 8 <= n:
        cid = p[pos : pos + 4]
        size = struct.unpack_from("<I", p, pos + 4)[0]
        body = p[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and size >= 16:
            fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt != 1:  # PCM only
                return None
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if rate is None or channels is None or data is None or bits != 16:
        return None
    usable = len(data) - len(data) % 2
    if np is not None:
        samples = np.frombuffer(data[:usable], dtype="<i2").astype(np.int64)
        n_samples = len(samples)
        # int64 sum of s^2 is exact up to ~8.6e9 samples (>> any one payload)
        mean_sq = float((samples * samples).sum()) / n_samples if n_samples else 0.0
    else:
        samples = array("h")
        samples.frombytes(data[:usable])
        n_samples = len(samples)
        mean_sq = sum(s * s for s in samples) / n_samples if n_samples else 0.0
    n_frames = n_samples // channels if channels else 0
    duration_ms = n_frames * 1000 // rate if rate else 0
    if n_samples:
        rms_q8 = min(255, int(round(math.sqrt(mean_sq))) // 128)
    else:
        rms_q8 = 0
    return {
        "sample_rate": rate,
        "n_channels": channels,
        "duration_ms": duration_ms,
        "rms_q8": rms_q8,
    }


# --- video (YUV4MPEG2 / y4m) ---------------------------------------------

#: Frame rates the y4m synthesizer draws from (F<rate>:1 header tag).
Y4M_RATES = [10, 24, 25, 30]


def synthesize_y4m(seed: str) -> bytes:
    """Deterministic uncompressed YUV4MPEG2 clip (planar C444).

    Protocol (fixed — the video oracle mirrors it in SQL): with ``d_i`` =
    byte i of ``md5(seed)``: ``w = 1 + d0 % 32``, ``h = 1 + d1 % 32``,
    fps = ``Y4M_RATES[d4 % 4]`` (denominator 1), ``n_frames = 1 + d10 %
    6``; byte ``j`` of frame ``f``'s raw C444 plane data (length
    ``3*w*h``) = ``(d3 + f + j) % 256``.
    """
    d = hashlib.md5(seed.encode("utf-8")).digest()
    w, h = 1 + d[0] % 32, 1 + d[1] % 32
    fps = Y4M_RATES[d[4] % len(Y4M_RATES)]
    n_frames = 1 + d[10] % 6
    parts = [f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C444\n".encode("ascii")]
    frame_len = 3 * w * h
    for f in range(n_frames):
        parts.append(b"FRAME\n")
        if np is not None:
            parts.append(
                ((d[3] + f + np.arange(frame_len)) % 256)
                .astype(np.uint8)
                .tobytes()
            )
        else:
            parts.append(bytes((d[3] + f + j) % 256 for j in range(frame_len)))
    return b"".join(parts)


def parse_y4m(payload: bytes | None) -> dict | None:
    """Parse a YUV4MPEG2 stream header and index its frames.

    Returns ``{width, height, fps_num, fps_den, colorspace, frame_size,
    n_frames, frame_spans}`` (``frame_spans`` = [(start, end), ...] byte
    offsets of each frame's raw plane data) or ``None`` for non-y4m /
    truncated / unsupported payloads. Tolerates unknown header and
    per-frame parameter tags (the spec allows both). Colorspaces: C444
    (``3*w*h`` bytes/frame), C422 (``2*w*h``), C420* (``w*h*3//2`` — the
    y4m default when the tag is absent), Cmono (``w*h``).
    """
    if not payload:
        return None
    p = bytes(payload)
    if not p.startswith(b"YUV4MPEG2"):
        return None
    nl = p.find(b"\n")
    if nl < 0:
        return None
    w = h = None
    num, den = 25, 1
    cs = b"420jpeg"
    for tag in p[9:nl].split(b" "):
        if not tag:
            continue
        k, v = tag[:1], tag[1:]
        try:
            if k == b"W":
                w = int(v)
            elif k == b"H":
                h = int(v)
            elif k == b"F":
                num, den = (int(x) for x in v.split(b":"))
            elif k == b"C":
                cs = v
        except ValueError:
            return None
    if not w or not h or w < 0 or h < 0 or num <= 0 or den <= 0:
        return None
    if cs.startswith(b"444"):
        frame_size = 3 * w * h
    elif cs.startswith(b"422"):
        frame_size = 2 * w * h
    elif cs.startswith(b"420"):
        frame_size = w * h * 3 // 2
    elif cs.startswith(b"mono"):
        frame_size = w * h
    else:
        return None
    spans = []
    pos, n = nl + 1, len(p)
    while pos < n:
        fnl = p.find(b"\n", pos)
        if fnl < 0 or not p[pos : pos + 5] == b"FRAME":
            return None  # stream corrupt mid-way: reject, don't half-parse
        start = fnl + 1
        if start + frame_size > n:
            return None  # truncated final frame
        spans.append((start, start + frame_size))
        pos = start + frame_size
    if not spans:
        return None
    return {
        "width": w,
        "height": h,
        "fps_num": num,
        "fps_den": den,
        "colorspace": cs.decode("ascii", "replace"),
        "frame_size": frame_size,
        "n_frames": len(spans),
        "frame_spans": spans,
    }


def bmp_pixel_data(payload: bytes) -> tuple[int, int, bytes] | None:
    """24bpp BMP payload -> (width, height, top-down raw RGB bytes), or
    None for anything else. Handles bottom-up (positive height) and
    top-down (negative height) storage and row-stride padding;
    numpy-vectorized like the other codecs."""
    p = bytes(payload)
    if p[:2] != b"BM" or len(p) < 54:
        return None
    off = struct.unpack_from("<I", p, 10)[0]
    w = struct.unpack_from("<i", p, 18)[0]
    h = struct.unpack_from("<i", p, 22)[0]
    bpp = struct.unpack_from("<H", p, 28)[0]
    if bpp != 24 or w <= 0 or h == 0:
        return None
    top_down = h < 0
    h = abs(h)
    stride = (3 * w + 3) // 4 * 4
    if len(p) < off + stride * h:
        return None
    if np is not None:
        rows = np.frombuffer(
            p, dtype=np.uint8, count=stride * h, offset=off
        ).reshape(h, stride)
        bgr = rows[:, : 3 * w].reshape(h, w, 3)
        if not top_down:
            bgr = bgr[::-1]
        return w, h, bgr[:, :, ::-1].tobytes()
    out = bytearray()
    rng = range(h) if top_down else range(h - 1, -1, -1)
    for y in rng:
        base = off + y * stride
        for x in range(w):
            b0 = base + 3 * x
            out += bytes((p[b0 + 2], p[b0 + 1], p[b0]))
    return w, h, bytes(out)


def image_pixel_data(payload: bytes | None) -> tuple[int, int, bytes] | None:
    """Sniff the container and return (width, height, top-down RGB bytes)
    for P6 PPM or 24bpp BMP payloads; None for anything else."""
    if not payload:
        return None
    p = bytes(payload)
    if p[:2] == b"P6":
        return ppm_pixel_data(p)
    if p[:2] == b"BM":
        return bmp_pixel_data(p)
    if p[:8] == b"\x89PNG\r\n\x1a\n":
        return png_pixel_data(p)
    return None


def ahash64(
    payload: bytes | None, grid: int = 8
) -> tuple[int, int, int, int] | None:
    """Perceptual average-hash of a decodable image: sample a grid x grid
    pixel lattice with the SAME floor mapping as resize_ppm_nearest
    (``src = (i * h // grid, j * w // grid)`` — integer, SQL-mirrorable),
    take per-sample RGB sums, and set bit ``i*grid + j`` when the sample
    is STRICTLY above the grid mean (``s * grid^2 > total``). Identical
    content hashes identically across containers (PPM and BMP decode to
    the same pixels); small pixel edits flip few bits, so Hamming
    distance measures visual similarity.

    Returns (width, height, hash_hi32, hash_lo32) or None if the payload
    is not a decodable image. Split halves keep each value in signed-64
    range for engines without unsigned ints.
    """
    parsed = image_pixel_data(payload)
    if parsed is None:
        return None
    w, h, pixels = parsed
    return ahash64_from_pixels(w, h, pixels, grid)


def ahash64_from_pixels(
    w: int, h: int, pixels: bytes, grid: int = 8
) -> tuple[int, int, int, int]:
    """:func:`ahash64` core over already-decoded top-down RGB bytes —
    lets single-pass audits hash without re-decoding the container."""
    n = grid * grid
    if np is not None:
        px = (
            np.frombuffer(pixels, dtype=np.uint8)[: w * h * 3]
            .astype(np.int64)
            .reshape(h, w, 3)
        )
        sy = (np.arange(grid) * h) // grid
        sx = (np.arange(grid) * w) // grid
        s = px[sy][:, sx].sum(axis=2).flatten()
        total = int(s.sum())
        val = 0
        for idx in range(n):
            if int(s[idx]) * n > total:
                val |= 1 << idx
    else:
        sums = []
        for i in range(grid):
            for j in range(grid):
                base = ((i * h // grid) * w + (j * w // grid)) * 3
                sums.append(
                    pixels[base] + pixels[base + 1] + pixels[base + 2]
                )
        total = sum(sums)
        val = 0
        for idx, sv in enumerate(sums):
            if sv * n > total:
                val |= 1 << idx
    return w, h, (val >> 32) & 0xFFFFFFFF, val & 0xFFFFFFFF
