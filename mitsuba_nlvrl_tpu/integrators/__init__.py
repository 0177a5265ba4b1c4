"""Integrator registry.

Analog of the reference integrator plugin family (SURVEY §2.2): each
integrator exposes ``sample(scene, meta, sampler, ray, active) ->
(spectrum, valid, sampler)`` over a ray wavefront.
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


def register(name, fn):
    _REGISTRY[name] = fn


def get_integrator(name: str):
    if name not in _REGISTRY:
        # late imports for integrators with heavier deps
        if name in ('volpath', 'volpathmis'):
            from . import volpath as _volpath
            _REGISTRY['volpath'] = _volpath.sample
            _REGISTRY['volpathmis'] = _volpath.sample
        elif name in ('vrl', 'photonmapper'):
            from . import vrl as _vrl
            from . import photonmapper as _pm
            _REGISTRY['vrl'] = _vrl.sample
            _REGISTRY['photonmapper'] = _pm.sample
        elif name in ('aov', 'moment'):
            from . import aov as _aov
            _REGISTRY['aov'] = _aov.sample_aov
            _REGISTRY['moment'] = _aov.sample_moment
    if name not in _REGISTRY:
        raise KeyError(f"unknown integrator '{name}'")
    return _REGISTRY[name]
