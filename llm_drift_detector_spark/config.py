"""Engine configuration defaults.

Thresholds mirror the reference's ``config/default_config.py:104-134``
(drift_detection section): ks p<0.05, js>0.2, wasserstein>0.1,
t_test p<0.05, embedding cosine>0.15, min_samples 10.  Graft additions
(PSI threshold, audio constraint parameters) come from the driver mandate
(BASELINE.json north_star): sr_hz domain, codec whitelist, SNR >= 30 dB.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# --- drift thresholds (reference config/default_config.py:126-134) ---
KS_P_THRESHOLD = 0.05         # drift iff p < 0.05; score = 1 - p
JS_THRESHOLD = 0.20           # drift iff JS divergence > 0.2
WASSERSTEIN_THRESHOLD = 0.10  # on range-normalized distance
T_TEST_P_THRESHOLD = 0.05     # Welch; score = 1 - p
EMBEDDING_THRESHOLD = 0.15    # weighted embedding drift score
PSI_THRESHOLD = 0.20          # graft addition (BASELINE.json)
LEXICAL_THRESHOLD = 0.10      # detector-level default (base.py:91)
MIN_SAMPLES = 10              # per-detector gate (detectors/base.py:145)

EPS = 1e-10                   # epsilon guard (distribution.py:293-300)

# detector-level result thresholds (detectors/base.py:91 default 0.1;
# embedding override default_config.py:117)
DISTRIBUTION_DETECTOR_THRESHOLD = 0.1
EMBEDDING_DETECTOR_THRESHOLD = 0.15

# default method weights for the combined distribution score
# (reference default_config.py drift_detection.distribution.methods)
DISTRIBUTION_METHODS = {
    # name: (threshold, weight)
    "ks_test": (KS_P_THRESHOLD, 1.0),
    "js_divergence": (JS_THRESHOLD, 1.0),
    "wasserstein": (WASSERSTEIN_THRESHOLD, 1.0),
    "t_test": (T_TEST_P_THRESHOLD, 0.5),
    "psi": (PSI_THRESHOLD, 1.0),
}

# --- audio payload constraints (BASELINE.json input_hint) ---
SR_HZ_DOMAIN = (8000, 16000, 22050, 44100, 48000)
CODEC_WHITELIST = ("pcm_s16le", "flac", "opus", "wav")
SNR_DB_MIN = 30.0             # decoded-PCM allclose criterion
DUR_MS_TOLERANCE = 1          # |dur_ms - samples*1000/sr| <= 1 ms

# --- audio quality gates (opt-in check, not a reference invariant) ---
MAX_SILENCE_RATIO = 0.9       # clip is mostly silence
MAX_CLIPPING_RATIO = 0.01     # >1% samples at full scale
MIN_RMS = 1e-4                # effectively-empty recording

# --- scale knobs ---
DEFAULT_SHUFFLE_PARTITIONS = 32
SALT_BUCKETS = 32             # salt factor for clip_id repartitioning
ARROW_MAX_RECORDS_PER_BATCH = 2048  # bound bytes-payload batch memory
HISTOGRAM_MAX_BINS = 512      # cap Rice-rule bins at scale


@dataclass(frozen=True)
class StatsMode:
    """Exact vs sketch switch (SURVEY.md §4.2.3).

    exact   — `percentile(...)` / full-sort ECDF KS; oracle parity at <= sf0.1
    sketch  — `approx_percentile(...)` / binned-ECDF KS; the 10^12-row path
    """

    exact: bool = True
    approx_percentile_accuracy: int = 10000
    ecdf_bins: int = 4096  # binned-ECDF resolution for sketch-mode KS/EMD


EXACT = StatsMode(exact=True)
SKETCH = StatsMode(exact=False)


@dataclass(frozen=True)
class EngineConfig:
    stats_mode: StatsMode = field(default_factory=lambda: EXACT)
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS
    salt_buckets: int = SALT_BUCKETS
    min_samples: int = MIN_SAMPLES
