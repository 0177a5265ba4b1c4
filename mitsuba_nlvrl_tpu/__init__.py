"""mitsuba_nlvrl_tpu — a TPU-native differentiable renderer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
Mitsuba-2 NLVRL fork (non-linear virtual ray lights, volumetric photon
mapping, path/volpath tracing), redesigned wavefront-first for TPU:
masked ``lax.while_loop`` megakernels, SoA scenes, counter-based RNG,
``shard_map`` scale-out, end-to-end ``jax.grad``.
"""
from . import core  # noqa: F401
from .scene.builder import build_scene  # noqa: F401
from .render import render, render_pass  # noqa: F401

__version__ = "0.1.0"
