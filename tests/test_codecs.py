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
    payload = codecs.encode(pcm, codec)
    out = codecs.decode(payload, codec)
    assert out.shape == pcm.shape
    assert codecs.snr_db(pcm, out) >= SNR_DB_MIN + 3  # headroom over gate


@pytest.mark.parametrize("codec", ["pcm_s16le", "flac"])
def test_lossless_codecs_bit_exact_after_quantization(codec):
    pcm = make_pcm(42, 5, 8000, 800)
    once = codecs.decode(codecs.encode(pcm, codec), codec)
    twice = codecs.decode(codecs.encode(once, codec), codec)
    assert np.array_equal(once, twice)


def test_num_samples_matches_decode():
    pcm = make_pcm(42, 7, 22050, 2205)
    for codec in codecs.CODECS:
        payload = codecs.encode(pcm, codec)
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
