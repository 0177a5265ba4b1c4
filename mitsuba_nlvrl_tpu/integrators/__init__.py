"""Integrator registry.

Analog of the reference integrator plugin family (SURVEY §2.2): each
integrator exposes ``sample(scene, meta, sampler, ray, active, diff, aux)``
over a ray wavefront; two-pass integrators (photonmapper / vrl) also expose
``preprocess(scene, meta, key) -> aux`` (photon/VRL maps), the analog of
Integrator::preprocess (integrator.h:41).
"""
from __future__ import annotations

from . import path as _path
from . import direct as _direct
from . import depth as _depth

_REGISTRY = {
    'path': _path.sample,
    'direct': _direct.sample,
    'depth': _depth.sample,
}
_PREPROCESS = {}


def register(name, fn, preprocess=None):
    _REGISTRY[name] = fn
    if preprocess is not None:
        _PREPROCESS[name] = preprocess


def _ensure(name: str):
    if name in _REGISTRY:
        return
    if name in ('volpath', 'volpathmis'):
        from . import volpath as _volpath
        _REGISTRY['volpath'] = _volpath.sample
        _REGISTRY['volpathmis'] = _volpath.sample
    elif name in ('vrl', 'photonmapper', 'photonmap'):
        from . import vrl as _vrl
        from . import photonmapper as _pm
        _REGISTRY['vrl'] = _vrl.sample
        _PREPROCESS['vrl'] = _vrl.preprocess
        _REGISTRY['photonmapper'] = _pm.sample
        _PREPROCESS['photonmapper'] = _pm.preprocess
        # legacy scene files use the 0.6-era name "photonmap"
        _REGISTRY['photonmap'] = _pm.sample
        _PREPROCESS['photonmap'] = _pm.preprocess
    elif name in ('aov', 'moment', 'stokes'):
        from . import aov as _aov
        _REGISTRY['aov'] = _aov.sample_aov
        _REGISTRY['moment'] = _aov.sample_moment
        _REGISTRY['stokes'] = _aov.sample_stokes


def get_integrator(name: str):
    _ensure(name)
    if name not in _REGISTRY:
        raise KeyError(f"unknown integrator '{name}'")
    return _REGISTRY[name]


def get_preprocess(name: str):
    """Returns the preprocess fn or None."""
    _ensure(name)
    return _PREPROCESS.get(name)
