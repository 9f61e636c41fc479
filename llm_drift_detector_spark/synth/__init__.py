from .clips import (  # noqa: F401
    SynthParams,
    ensure_synth,
    expected_violations,
    generate_clips,
    generate_transcripts,
    synth_dir_for,
)
