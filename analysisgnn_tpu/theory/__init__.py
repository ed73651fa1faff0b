from analysisgnn_tpu.theory.tonal import (
    Interval,
    lof_of,
    step_alter_of_lof,
    pitch_name_to_step_alter,
    step_alter_to_pitch_name,
    transpose_step_alter,
    transpose_pitch_name,
    transpose_key_name,
    interval_semitones,
    chord_to_interval_vector,
)
from analysisgnn_tpu.theory.encoders import (
    PitchEncoder,
    KeySignatureEncoder,
    CadenceEncoder,
)

__all__ = [
    "Interval",
    "lof_of",
    "step_alter_of_lof",
    "pitch_name_to_step_alter",
    "step_alter_to_pitch_name",
    "transpose_step_alter",
    "transpose_pitch_name",
    "transpose_key_name",
    "interval_semitones",
    "chord_to_interval_vector",
    "PitchEncoder",
    "KeySignatureEncoder",
    "CadenceEncoder",
]
