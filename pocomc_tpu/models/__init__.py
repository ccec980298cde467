from .flow import Flow
from .geometry import Geometry, fit_geometry_jax
from .student import fit_mvstud
