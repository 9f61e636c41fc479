"""Toy codec round-trip and SNR-gate properties (FIXTURES.md §5.1)."""

import numpy as np
import pytest

from llm_drift_detector_spark import codecs
from llm_drift_detector_spark.config import SNR_DB_MIN
from llm_drift_detector_spark.synth.clips import make_pcm


@pytest.mark.parametrize("codec", codecs.CODECS)
@pytest.mark.parametrize("i", [0, 1, 99])
def test_roundtrip_snr_above_gate(codec, i):
    pcm = make_pcm(42, i, 16000, 1600)
    payload = codecs.encode(pcm, codec, sr_hz=16000)
    out = codecs.decode(payload, codec)
    assert out.shape == pcm.shape
    assert codecs.snr_db(pcm, out) >= SNR_DB_MIN + 3  # headroom over gate


@pytest.mark.parametrize("codec", ["pcm_s16le", "flac", "wav"])
def test_lossless_codecs_bit_exact_after_quantization(codec):
    pcm = make_pcm(42, 5, 8000, 800)
    once = codecs.decode(codecs.encode(pcm, codec, sr_hz=8000), codec)
    twice = codecs.decode(codecs.encode(once, codec, sr_hz=8000), codec)
    assert np.array_equal(once, twice)


def test_num_samples_matches_decode():
    pcm = make_pcm(42, 7, 22050, 2205)
    for codec in codecs.CODECS:
        payload = codecs.encode(pcm, codec, sr_hz=22050)
        assert codecs.num_samples(payload, codec) == len(
            codecs.decode(payload, codec)
        )


def test_truncated_flac_raises():
    pcm = make_pcm(42, 3, 16000, 1600)
    payload = codecs.encode(pcm, "flac")
    with pytest.raises(ValueError):
        codecs.decode(payload[: len(payload) // 2], "flac")


def test_highbyte_corruption_breaks_snr_gate():
    """The snr_allclose injection (synth i%2000==19) must land below 30 dB."""
    pcm = make_pcm(42, 19, 16000, 1600)
    payload = bytearray(codecs.encode(pcm, "pcm_s16le"))
    for off in range(1, len(payload), 40):
        payload[off] ^= 0x55
    out = codecs.decode(bytes(payload), "pcm_s16le")
    assert codecs.snr_db(pcm, out) < SNR_DB_MIN - 3


def test_snr_length_mismatch_is_neg_inf():
    a = np.ones(10, dtype=np.float32)
    assert codecs.snr_db(a, a[:5]) == float("-inf")
    assert codecs.snr_db(a, a) == float("inf")


def test_wav_container_layout_and_sample_rate():
    """wav is a REAL RIFF/WAVE file: canonical 44-byte header, sr stored."""
    pcm = make_pcm(42, 11, 22050, 2205)
    payload = codecs.encode(pcm, "wav", sr_hz=22050)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    assert payload[36:40] == b"data"
    assert len(payload) == codecs.WAV_HEADER_BYTES + 2 * len(pcm)
    assert codecs.wav_sample_rate(payload) == 22050


def test_wav_truncated_decodes_available_samples():
    """Truncation mid-data-chunk yields a SHORTER decode (dur check's
    job to flag), matching real wav readers — unlike flac which raises."""
    pcm = make_pcm(42, 13, 16000, 1600)
    payload = codecs.encode(pcm, "wav", sr_hz=16000)
    out = codecs.decode(payload[: int(len(payload) * 0.6)], "wav")
    assert 0 < len(out) < len(pcm)
    np.testing.assert_array_equal(
        out, codecs.decode(payload, "wav")[: len(out)]
    )


def test_wav_malformed_and_unsupported_raise():
    pcm = make_pcm(42, 17, 8000, 800)
    payload = codecs.encode(pcm, "wav", sr_hz=8000)
    with pytest.raises(ValueError):
        codecs.decode(b"JUNK" + payload[4:], "wav")
    with pytest.raises(ValueError):
        codecs.decode(payload[:30], "wav")  # truncated inside fmt chunk
    stereo = bytearray(payload)
    stereo[22] = 2  # channels=2 -> unsupported layout
    with pytest.raises(ValueError):
        codecs.decode(bytes(stereo), "wav")


def test_wav_chunk_walker_skips_extra_chunks():
    """Non-canonical wav (extra LIST chunk before data) still decodes —
    the decoder is a chunk walker, not a fixed-offset reader."""
    import struct

    pcm = make_pcm(42, 19, 16000, 1600)
    payload = codecs.encode(pcm, "wav", sr_hz=16000)
    noncanon = (
        payload[:36] + b"LIST" + struct.pack("<I", 4) + b"INFO" + payload[36:]
    )
    np.testing.assert_array_equal(
        codecs.decode(noncanon, "wav"), codecs.decode(payload, "wav")
    )
    assert codecs.num_samples(noncanon, "wav") == len(pcm)
