"""Statistical testing utilities (analog of mitsuba.python.chi2)."""
from .chi2 import ChiSquareTest, SphericalDomain, PlanarDomain  # noqa: F401
