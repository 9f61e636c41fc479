"""Deterministic, dependency-free toy audio codecs.

The sandbox has no real audio libraries (no soundfile/librosa/ffmpeg), so
the synthetic clips table (FIXTURES.md §1) stores PCM-derived payloads in
three deterministic "codecs" whose decode path is pure numpy.  The
Spark-side plumbing — binary column, mapInPandas batch decode, schema,
partitioning — is real; only the bitstream format is a stand-in.  A real
deployment would swap :func:`decode` for a soundfile/ffmpeg call with the
same signature (documented stub point).

Codecs
------
pcm_s16le  raw little-endian int16 PCM (lossless)
flac       zlib-compressed s16le (lossless stand-in for FLAC)
opus       8-bit mu-law companding (lossy stand-in; SQNR ~ 35-40 dB for
           the synthetic signal, above the 30 dB allclose gate)
wav        REAL RIFF/WAVE container (PCM fmt 1, mono, 16-bit) — a genuine
           on-disk audio format, parsed/emitted with stdlib ``struct``.
           The encoder writes the canonical 44-byte header; the decoder
           is a full chunk walker (accepts extra chunks, word-aligned
           sizes, and truncated data chunks — it decodes the samples
           actually present, like real readers do).

All functions operate on float32 PCM in [-1, 1].
Reference-parity note: the reference has no audio path at all; the
decoded-PCM SNR>=30dB allclose + transcript equality invariant comes from
the driver mandate (BASELINE.json input_hint).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MU = 255.0  # mu-law compression parameter (ITU-T G.711 uses mu=255)

CODECS = ("pcm_s16le", "flac", "opus", "wav")

WAV_HEADER_BYTES = 44  # canonical RIFF+fmt+data header emitted by encode()


# --- float <-> int16 -------------------------------------------------------

def _f32_to_s16(pcm: np.ndarray) -> np.ndarray:
    x = np.clip(pcm, -1.0, 1.0)
    return np.round(x * 32767.0).astype("<i2")


def _s16_to_f32(raw: np.ndarray) -> np.ndarray:
    return (raw.astype(np.float32) / 32767.0).astype(np.float32)


# --- mu-law ----------------------------------------------------------------

def _mulaw_encode(pcm: np.ndarray) -> np.ndarray:
    x = np.clip(pcm, -1.0, 1.0)
    y = np.sign(x) * np.log1p(MU * np.abs(x)) / np.log1p(MU)
    return np.round((y + 1.0) * 127.5).astype(np.uint8)


def _mulaw_decode(raw: np.ndarray) -> np.ndarray:
    y = raw.astype(np.float32) / 127.5 - 1.0
    x = np.sign(y) * (np.expm1(np.abs(y) * np.log1p(MU))) / MU
    return x.astype(np.float32)


# --- RIFF/WAVE ---------------------------------------------------------------

def _wav_encode(pcm: np.ndarray, sr_hz: int) -> bytes:
    """Canonical 44-byte-header mono 16-bit PCM WAV file."""
    data = _f32_to_s16(pcm).tobytes()
    return b"".join(
        (
            b"RIFF",
            struct.pack("<I", 36 + len(data)),
            b"WAVE",
            b"fmt ",
            # fmt size, audio_format=1 (PCM), channels=1, sr, byte_rate,
            # block_align, bits_per_sample
            struct.pack("<IHHIIHH", 16, 1, 1, sr_hz, sr_hz * 2, 2, 16),
            b"data",
            struct.pack("<I", len(data)),
            data,
        )
    )


def wav_parse(payload: bytes) -> tuple[bytes, int]:
    """RIFF/WAVE chunk walker -> (available s16le data bytes, sr_hz).

    Accepts non-canonical files (extra chunks, odd-size word alignment).
    A data chunk whose declared size exceeds the bytes present yields the
    bytes actually present — truncated files decode to a SHORTER signal
    (which the dur_ms check then flags) rather than erroring, matching
    how real wav readers behave.  Raises ValueError on malformed headers
    or unsupported layouts (non-PCM, multichannel, non-16-bit).
    """
    if len(payload) < 12 or payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("wav decode failed: not a RIFF/WAVE stream")
    pos, sr = 12, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if cid == b"fmt ":
            if size < 16 or pos + 8 + 16 > len(payload):
                raise ValueError("wav decode failed: short fmt chunk")
            fmt, ch, sr_, _rate, _align, bits = struct.unpack_from(
                "<HHIIHH", payload, pos + 8
            )
            if fmt != 1 or ch != 1 or bits != 16:
                raise ValueError(
                    f"wav decode failed: unsupported layout fmt={fmt} ch={ch} bits={bits}"
                )
            sr = int(sr_)
        elif cid == b"data":
            if sr is None:
                raise ValueError("wav decode failed: data before fmt chunk")
            return payload[pos + 8 : pos + 8 + size], sr
        pos += 8 + size + (size & 1)  # chunk bodies are word-aligned
    raise ValueError("wav decode failed: no data chunk")


def wav_sample_rate(payload: bytes) -> int:
    """Sample rate from the fmt chunk (header-only parse)."""
    return wav_parse(payload)[1]


# --- BMP (image container) ---------------------------------------------------
#
# Second REAL on-disk format behind the multimodal decode seam (the wav
# playbook applied to images): 24-bit uncompressed Windows BMP
# (BITMAPFILEHEADER + BITMAPINFOHEADER + bottom-up BGR rows padded to 4
# bytes), parsed/emitted with stdlib ``struct`` only.  The reference has
# no image path; this proves the checks/multimodal.py kernel registry
# with a genuine image format the sandbox CAN decode (PIL-free).

BMP_HEADER_BYTES = 54  # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)


def bmp_encode(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB array -> 24-bit BI_RGB BMP bytes (bottom-up)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"bmp encode expects (h, w, 3) RGB, got {pixels.shape}")
    h, w = int(pixels.shape[0]), int(pixels.shape[1])
    stride = (w * 3 + 3) & ~3
    rows = []
    pad = b"\x00" * (stride - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up row order
        rows.append(pixels[y, :, ::-1].astype(np.uint8).tobytes() + pad)  # BGR
    data = b"".join(rows)
    return b"".join(
        (
            b"BM",
            struct.pack("<IHHI", BMP_HEADER_BYTES + len(data), 0, 0, BMP_HEADER_BYTES),
            # DIB: size, width, height (+ = bottom-up), planes, bpp,
            # compression (0 = BI_RGB), image size, x/y ppm, palette counts
            struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0),
            data,
        )
    )


def bmp_parse(payload: bytes) -> tuple[int, int, np.ndarray]:
    """BMP bytes -> (declared_width, declared_height, pixels).

    Returns the COMPLETE rows actually present as an (rows_avail, w, 3)
    uint8 RGB array in top-down order — a truncated pixel region decodes
    to fewer rows (which the declared-vs-actual check then flags) rather
    than erroring, mirroring :func:`wav_parse`.  Supports bottom-up
    (height > 0) and top-down (height < 0) row order.  Raises ValueError
    on malformed headers or unsupported layouts (palette / RLE / !=24bpp).
    """
    if len(payload) < BMP_HEADER_BYTES or payload[0:2] != b"BM":
        raise ValueError("bmp decode failed: not a BM stream")
    (data_offset,) = struct.unpack_from("<I", payload, 10)
    dib_size, w, h_signed = struct.unpack_from("<Iii", payload, 14)
    if dib_size < 40:
        raise ValueError(f"bmp decode failed: short DIB header ({dib_size})")
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"bmp decode failed: unsupported layout planes={planes} "
            f"bpp={bpp} compression={compression}"
        )
    if w <= 0 or h_signed == 0 or data_offset < BMP_HEADER_BYTES:
        raise ValueError(
            f"bmp decode failed: bad geometry w={w} h={h_signed} offset={data_offset}"
        )
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3
    body = payload[data_offset:]
    rows_avail = min(h, len(body) // stride)
    if rows_avail == 0:
        return w, h, np.zeros((0, w, 3), dtype=np.uint8)
    raw = np.frombuffer(body[: rows_avail * stride], dtype=np.uint8).reshape(
        rows_avail, stride
    )
    bgr = raw[:, : w * 3].reshape(rows_avail, w, 3)
    rgb = bgr[:, :, ::-1]
    if h_signed > 0:  # bottom-up storage -> flip to top-down
        rgb = rgb[::-1]
    return w, h, np.ascontiguousarray(rgb)


def bmp_luma(pixels: np.ndarray) -> np.ndarray:
    """Rec. 601 luma in [0, 1] from (h, w, 3) uint8 RGB."""
    p = pixels.astype(np.float64)
    return (0.299 * p[..., 0] + 0.587 * p[..., 1] + 0.114 * p[..., 2]) / 255.0


# --- PNG (image container) ---------------------------------------------------
#
# Third REAL on-disk format behind the multimodal decode seam: 8-bit RGB
# PNG (color type 2, no interlace) emitted and parsed with stdlib
# ``struct`` + ``zlib`` only.  Unlike BMP this is a genuinely *coded*
# image format — chunked container with CRCs, DEFLATE-compressed scanline
# stream, and per-row predictive filters (None/Sub/Up/Average/Paeth) that
# the decoder must reconstruct — so the kernel-registry contract is
# proven against real compression, not just raw pixel walking.

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_PNG_BPP = 3  # bytes per pixel (8-bit RGB)


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec §9.4), vectorized over a scanline."""
    a16 = a.astype(np.int16)
    b16 = b.astype(np.int16)
    c16 = c.astype(np.int16)
    p = a16 + b16 - c16
    pa, pb, pc = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def _png_filter_row(
    ftype: int, row: np.ndarray, prev: np.ndarray
) -> np.ndarray:
    """Forward-filter one raw scanline (encode side)."""
    a = np.concatenate([np.zeros(_PNG_BPP, np.uint8), row[:-_PNG_BPP]])
    c = np.concatenate([np.zeros(_PNG_BPP, np.uint8), prev[:-_PNG_BPP]])
    if ftype == 0:
        return row
    if ftype == 1:
        return (row.astype(np.int16) - a).astype(np.uint8)
    if ftype == 2:
        return (row.astype(np.int16) - prev).astype(np.uint8)
    if ftype == 3:
        return (
            row.astype(np.int16) - ((a.astype(np.int16) + prev) // 2)
        ).astype(np.uint8)
    if ftype == 4:
        return (row.astype(np.int16) - _paeth(a, prev, c)).astype(np.uint8)
    raise ValueError(f"png filter type {ftype} out of range")


def _png_unfilter_row(
    ftype: int, filt: np.ndarray, prev: np.ndarray
) -> np.ndarray:
    """Reconstruct one scanline from its filtered bytes (decode side).
    Sub/Average/Paeth depend on the just-reconstructed left pixel, so
    they run per-pixel-column; rows are short and synth images small."""
    if ftype == 0:
        return filt.copy()
    if ftype == 2:
        return (filt.astype(np.int16) + prev).astype(np.uint8)
    out = np.zeros_like(filt)
    n = len(filt)
    for i in range(n):
        a = int(out[i - _PNG_BPP]) if i >= _PNG_BPP else 0
        b = int(prev[i])
        if ftype == 1:
            pred = a
        elif ftype == 3:
            pred = (a + b) // 2
        elif ftype == 4:
            c = int(prev[i - _PNG_BPP]) if i >= _PNG_BPP else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
        else:
            raise ValueError(f"png decode failed: filter type {ftype} out of range")
        out[i] = (int(filt[i]) + pred) & 0xFF
    return out


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray, rows_present: int | None = None) -> bytes:
    """(h, w, 3) uint8 RGB array -> 8-bit RGB PNG bytes.

    Each scanline uses filter ``y % 5`` so every reconstruction path
    (None/Sub/Up/Average/Paeth) is exercised by round-trip tests.

    ``rows_present`` (tests only) compresses just the first k scanlines
    while declaring the full height in IHDR — a DETERMINISTIC truncated
    image (the decoder finds exactly k complete rows), unlike cutting
    the zlib stream at a byte offset, which lands mid-row
    unpredictably.
    """
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"png encode expects (h, w, 3) RGB, got {pixels.shape}")
    h, w = int(pixels.shape[0]), int(pixels.shape[1])
    k = h if rows_present is None else min(rows_present, h)
    flat = pixels.astype(np.uint8).reshape(h, w * _PNG_BPP)
    prev = np.zeros(w * _PNG_BPP, np.uint8)
    lines = []
    for y in range(k):
        ftype = y % 5
        lines.append(bytes([ftype]) + _png_filter_row(ftype, flat[y], prev).tobytes())
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return b"".join(
        (
            PNG_SIGNATURE,
            _png_chunk(b"IHDR", ihdr),
            _png_chunk(b"IDAT", zlib.compress(b"".join(lines), 6)),
            _png_chunk(b"IEND", b""),
        )
    )


def png_parse(payload: bytes) -> tuple[int, int, np.ndarray]:
    """PNG bytes -> (declared_width, declared_height, pixels).

    Full chunk walker: verifies the signature and each complete chunk's
    CRC (corruption raises ValueError), skips ancillary chunks,
    concatenates IDAT, inflates tolerantly, and reconstructs the
    per-row filters.  The COMPLETE scanlines actually present come back
    as an (rows_avail, w, 3) uint8 RGB array in top-down order — a
    truncated payload (container cut mid-chunk, or a short scanline
    stream) decodes to fewer rows rather than erroring, mirroring
    :func:`wav_parse` / :func:`bmp_parse`.  Raises ValueError on a bad
    signature, malformed/CRC-corrupt chunks, or unsupported layouts
    (bit depth != 8, color type != RGB, interlaced).
    """
    if len(payload) < len(PNG_SIGNATURE) + 25 or not payload.startswith(
        PNG_SIGNATURE
    ):
        raise ValueError("png decode failed: not a PNG stream")
    pos = len(PNG_SIGNATURE)
    w = h = None
    idat = []
    while pos + 8 <= len(payload):
        clen, ctype = struct.unpack_from(">I4s", payload, pos)
        end = pos + 8 + clen + 4
        if end > len(payload):  # container truncated mid-chunk
            break
        data = payload[pos + 8 : pos + 8 + clen]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + clen)
        if crc != (zlib.crc32(ctype + data) & 0xFFFFFFFF):
            raise ValueError(
                f"png decode failed: CRC mismatch in {ctype!r} chunk"
            )
        if ctype == b"IHDR":
            if clen != 13:
                raise ValueError(f"png decode failed: IHDR length {clen} != 13")
            w, h, depth, ctype_col, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if (depth, ctype_col, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "png decode failed: unsupported layout "
                    f"depth={depth} color={ctype_col} interlace={interlace}"
                )
            if w <= 0 or h <= 0:
                raise ValueError(f"png decode failed: bad geometry {w}x{h}")
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos = end
    if w is None:
        raise ValueError("png decode failed: missing IHDR")
    d = zlib.decompressobj()
    raw = b""
    try:
        raw = d.decompress(b"".join(idat))
        raw += d.flush()
    except zlib.error:
        pass  # truncated DEFLATE stream: keep the scanlines inflated so far
    stride = 1 + w * _PNG_BPP
    rows_avail = min(h, len(raw) // stride)
    if rows_avail == 0:
        return w, h, np.zeros((0, w, 3), dtype=np.uint8)
    buf = np.frombuffer(raw[: rows_avail * stride], dtype=np.uint8).reshape(
        rows_avail, stride
    )
    prev = np.zeros(w * _PNG_BPP, np.uint8)
    out = np.zeros((rows_avail, w * _PNG_BPP), np.uint8)
    for y in range(rows_avail):
        out[y] = _png_unfilter_row(int(buf[y, 0]), buf[y, 1:], prev)
        prev = out[y]
    return w, h, out.reshape(rows_avail, w, 3)


def image_parse(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Format-sniffing image decode: dispatch on the container's magic
    bytes (``BM`` -> :func:`bmp_parse`, PNG signature ->
    :func:`png_parse`) so callers handle mixed image tiers without
    trusting metadata columns.  Raises ValueError for unknown formats.
    """
    if payload.startswith(PNG_SIGNATURE[:4]):
        return png_parse(payload)
    if payload[0:2] == b"BM":
        return bmp_parse(payload)
    raise ValueError("image decode failed: unknown container format")


# --- public API -------------------------------------------------------------

def encode(pcm: np.ndarray, codec: str, sr_hz: int | None = None) -> bytes:
    """float32 PCM in [-1,1] -> payload bytes for `codec`.

    ``sr_hz`` is required for container formats that store it (wav) and
    ignored for raw/companded streams.
    """
    if codec == "pcm_s16le":
        return _f32_to_s16(pcm).tobytes()
    if codec == "flac":
        return zlib.compress(_f32_to_s16(pcm).tobytes(), level=1)
    if codec == "opus":
        return _mulaw_encode(pcm).tobytes()
    if codec == "wav":
        if sr_hz is None:
            raise ValueError("wav encode requires sr_hz")
        return _wav_encode(pcm, sr_hz)
    raise ValueError(f"unknown codec: {codec}")


def decode(payload: bytes, codec: str) -> np.ndarray:
    """payload bytes -> float32 PCM in [-1,1].

    Raises ValueError on unknown codec or undecodable payload (e.g. a
    truncated flac stream); the mapInPandas validator catches this and
    emits a violation row rather than failing the task.
    """
    if codec == "pcm_s16le":
        n = len(payload) - (len(payload) % 2)
        return _s16_to_f32(np.frombuffer(payload[:n], dtype="<i2"))
    if codec == "flac":
        try:
            raw = zlib.decompress(payload)
        except zlib.error as e:  # truncated / corrupted stream
            raise ValueError(f"flac decode failed: {e}") from e
        return _s16_to_f32(np.frombuffer(raw, dtype="<i2"))
    if codec == "opus":
        return _mulaw_decode(np.frombuffer(payload, dtype=np.uint8))
    if codec == "wav":
        data, _sr = wav_parse(payload)  # ValueError on malformed header
        n = len(data) - (len(data) % 2)
        return _s16_to_f32(np.frombuffer(data[:n], dtype="<i2"))
    raise ValueError(f"unknown codec: {codec}")


def num_samples(payload: bytes, codec: str) -> int:
    """Decoded sample count without a full decode where possible."""
    if codec == "pcm_s16le":
        return len(payload) // 2
    if codec == "opus":
        return len(payload)
    if codec == "flac":
        return len(zlib.decompress(payload)) // 2
    if codec == "wav":
        return len(wav_parse(payload)[0]) // 2
    raise ValueError(f"unknown codec: {codec}")


def snr_db(reference: np.ndarray, decoded: np.ndarray) -> float:
    """Signal-to-noise ratio of `decoded` against `reference`, in dB.

    Returns -inf when lengths differ (treated as maximal mismatch) and
    +inf for an exact match.
    """
    if reference.shape != decoded.shape or reference.size == 0:
        return float("-inf")
    noise = np.sum((reference.astype(np.float64) - decoded.astype(np.float64)) ** 2)
    if noise == 0.0:
        return float("inf")
    sig = np.sum(reference.astype(np.float64) ** 2)
    if sig == 0.0:
        return float("-inf")
    return float(10.0 * np.log10(sig / noise))
