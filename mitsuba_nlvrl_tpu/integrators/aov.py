"""AOV + moment integrators.

Analogs of the reference src/integrators/aov.cpp and moment.cpp:
  * aov: renders geometric feature channels (depth / sh_normal / position /
    uv / prim_index / shape_index) selected by the integrator prop
    ``aovs`` (first spec; e.g. "nn:sh_normal"), packed into RGB.
  * moment: renders the nested integrator's radiance SQUARED — accumulated
    alongside a normal render this yields the per-pixel variance the
    golden-image z-test consumes (reference test_renders.py:56-60).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.ray import Ray
from ..core.rng import Sampler
from ..ops import intersect as isect
from . import get_integrator


def sample_aov(scene, meta, sampler: Sampler, ray: Ray, active=None,
               diff: bool = False, aux=None):
    N = ray.o.shape[0]
    spec = meta.iprop('aovs', 'dd.y:depth')
    kind = spec.split(':')[-1].strip()
    si = isect.ray_intersect(scene, ray)
    if kind == 'depth':
        v = jnp.where(si.valid, si.t, 0.0)
        out = jnp.repeat(v[:, None], 3, axis=1)
    elif kind in ('sh_normal', 'nn'):
        out = jnp.where(si.valid[:, None], si.sh_frame.n, 0.0)
    elif kind in ('geo_normal', 'ng'):
        out = jnp.where(si.valid[:, None], si.n, 0.0)
    elif kind in ('position', 'p'):
        out = jnp.where(si.valid[:, None], si.p, 0.0)
    elif kind == 'uv':
        out = jnp.concatenate([si.uv, jnp.zeros((N, 1))], axis=-1)
        out = jnp.where(si.valid[:, None], out, 0.0)
    elif kind in ('prim_index', 'shape_index'):
        idx = si.prim_index if kind == 'prim_index' else si.shape_idx
        out = jnp.repeat(idx[:, None].astype(jnp.float32), 3, axis=1)
    else:
        raise KeyError(f"unknown aov '{kind}'")
    return out, si.valid, sampler


def _nested(meta, default='path'):
    """Resolve a wrapped <integrator> prop (frozen to tuples by the scene
    builder) into (sample_fn, meta-with-nested-props)."""
    v = meta.iprop('integrator', default)
    if isinstance(v, str):
        name, props = v, ()
    elif isinstance(v, tuple):
        d = dict(v)
        name = d.pop('type', default)
        props = tuple(sorted(d.items()))
    else:
        name, props = default, ()
    import dataclasses
    meta2 = dataclasses.replace(meta, integrator=name,
                                integrator_props=props)
    return get_integrator(name), meta2


def sample_moment(scene, meta, sampler: Sampler, ray: Ray, active=None,
                  diff: bool = False, aux=None):
    inner, meta2 = _nested(meta)
    L, valid, sampler = inner(scene, meta2, sampler, ray, active, diff=diff,
                              aux=aux)
    return L * L, valid, sampler


def sample_stokes(scene, meta, sampler: Sampler, ray: Ray, active=None,
                  diff: bool = False, aux=None):
    """Stokes-vector integrator (reference src/integrators/stokes.cpp):
    runs the POLARIZED variant of the nested integrator and emits one
    Stokes component image selected by the ``component`` prop (0 = S0
    radiance, 1-3 = S1/S2/S3), already rotated into the sensor frame
    (stokes.cpp:95-118). The polarized path variant exists for the ``path``
    family; other nested integrators fall back to unpolarized transport
    (S0 = radiance, S1..S3 = 0), like nesting them in a non-polarized
    reference build."""
    from . import path_polarized
    _, meta2 = _nested(meta)
    comp = int(meta.iprop('component', 0))
    if meta2.integrator == 'path':
        if getattr(meta2, 'spectral', False):
            # *_spectral_polarized: hero-wavelength Mueller transport
            from . import path_spectral_polarized
            stokes, valid, sampler = path_spectral_polarized.sample_full(
                scene, meta2, sampler, ray, active, diff=diff, aux=aux)
        else:
            stokes, valid, sampler = path_polarized.sample_full(
                scene, meta2, sampler, ray, active, diff=diff, aux=aux)
        return stokes[:, :, comp], valid, sampler
    inner = get_integrator(meta2.integrator)
    L, valid, sampler = inner(scene, meta2, sampler, ray, active, diff=diff,
                              aux=aux)
    if comp != 0:
        L = jnp.zeros_like(L)
    return L, valid, sampler
