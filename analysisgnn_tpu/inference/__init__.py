from analysisgnn_tpu.inference.predict import (
    predict_score,
    onsetwise_smooth,
    export_predictions_csv,
    export_roman_numerals_to_musicxml,
)

__all__ = [
    "predict_score",
    "onsetwise_smooth",
    "export_predictions_csv",
    "export_roman_numerals_to_musicxml",
]
