from analysisgnn_tpu.models.analysis import AnalysisGNN
from analysisgnn_tpu.models.encoders import HybridGNN, HybridHGT, MetricalGNN

__all__ = ["AnalysisGNN", "HybridGNN", "HybridHGT", "MetricalGNN"]
