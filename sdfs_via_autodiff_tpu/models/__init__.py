from .ssy import SSY, ssy_loglinear_factory
from .gcy import GCY, gcy_loglinear_factory

__all__ = ["SSY", "GCY", "ssy_loglinear_factory", "gcy_loglinear_factory"]
