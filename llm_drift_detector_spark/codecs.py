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

All functions operate on float32 PCM in [-1, 1].
Reference-parity note: the reference has no audio path at all; the
decoded-PCM SNR>=30dB allclose + transcript equality invariant comes from
the driver mandate (BASELINE.json input_hint).
"""

from __future__ import annotations

import zlib

import numpy as np

MU = 255.0  # mu-law compression parameter (ITU-T G.711 uses mu=255)

CODECS = ("pcm_s16le", "flac", "opus")


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


# --- public API -------------------------------------------------------------

def encode(pcm: np.ndarray, codec: str) -> bytes:
    """float32 PCM in [-1,1] -> payload bytes for `codec`."""
    if codec == "pcm_s16le":
        return _f32_to_s16(pcm).tobytes()
    if codec == "flac":
        return zlib.compress(_f32_to_s16(pcm).tobytes(), level=1)
    if codec == "opus":
        return _mulaw_encode(pcm).tobytes()
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
    raise ValueError(f"unknown codec: {codec}")


def num_samples(payload: bytes, codec: str) -> int:
    """Decoded sample count without a full decode where possible."""
    if codec == "pcm_s16le":
        return len(payload) // 2
    if codec == "opus":
        return len(payload)
    if codec == "flac":
        return len(zlib.decompress(payload)) // 2
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
