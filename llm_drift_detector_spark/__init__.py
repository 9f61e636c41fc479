"""llm_drift_detector_spark — a from-scratch PySpark-native validation &
drift-detection engine.

Re-expresses the statistical-comparator semantics of the reference repo
``Amarjit0511/llm-drift-detector`` (see /root/repo/SURVEY.md) as native
Spark DataFrame plans and Arrow-vectorized pandas UDFs, applied to an
audio clip + transcript table at web scale:

    clips(clip_id string, bytes binary, sr_hz int, dur_ms int,
          codec string, transcript string)

Sub-packages
------------
checks/    schema & constraint validation (stats profile, uniqueness,
           referential integrity, domain, audio payload invariants)
drift/     two-sample statistical comparators (KS, JS, PSI, Wasserstein,
           Welch-t, embedding centroid/MMD, lexical/style, rolling z-score)
pipeline/  run orchestration: violations/metrics/verdicts sinks,
           per-partition checkpoint + resume
synth/     deterministic synthetic clips/transcripts generator (FIXTURES.md)
textops/   training-data-pipeline extras: dedup, similarity search,
           text quality/language-id/fingerprinting

Design rules (SURVEY.md §4, §7):
- DataFrame/SQL first; Catalyst does pushdown/pruning/join selection.
- Python only inside Arrow-batched pandas UDFs (mapInPandas) — never
  per-row Python in the hot path.
- Dual stat modes: exact (oracle parity at small SF) and sketch
  (approx_percentile / binned ECDF) for the 10^12-row target.
"""

__version__ = "0.1.0"
