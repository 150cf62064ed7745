from .projections import TiltSeriesProjector
from .reconstruction import ramp_filter, wbp_reconstruct

__all__ = ["TiltSeriesProjector", "ramp_filter", "wbp_reconstruct"]
