from analysisgnn_tpu.data.note_array import NOTE_ARRAY_DTYPE, make_note_array, synthetic_score
from analysisgnn_tpu.data.graph_build import build_score_graph, ScoreGraphArrays
from analysisgnn_tpu.data.features import select_features

__all__ = [
    "NOTE_ARRAY_DTYPE",
    "make_note_array",
    "synthetic_score",
    "build_score_graph",
    "ScoreGraphArrays",
    "select_features",
]
