from raisr_tpu.model.loader import load_model, FilterBank, RaisrModel
from raisr_tpu.model.gaussian import gaussian_weights, GAUSSIAN_11x11

__all__ = [
    "load_model",
    "FilterBank",
    "RaisrModel",
    "gaussian_weights",
    "GAUSSIAN_11x11",
]
