"""Core math & type layer of the TPU-native renderer."""
from . import math, warp, frame, ray, transform, spectrum, rng, records, fresnel, distr  # noqa: F401
from .frame import Frame  # noqa: F401
from .ray import Ray, BBox, ray_bbox_intersect, spawn_ray  # noqa: F401
from .transform import Transform  # noqa: F401
from .records import (SurfaceInteraction, MediumInteraction, PositionSample,  # noqa: F401
                      DirectionSample)
from .rng import Sampler  # noqa: F401
