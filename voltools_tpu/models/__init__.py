from .projections import TiltSeriesProjector

__all__ = ["TiltSeriesProjector"]
