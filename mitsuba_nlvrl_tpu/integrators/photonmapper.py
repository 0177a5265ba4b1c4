"""Photon mapping integrator (surface + volumetric photon maps).

TPU-native analog of the reference ``photonmapper`` plugin
(src/integrators/photonmapper/photonmapper.cpp): same two-pass structure
as the VRL integrator but ALL volume transport comes from volume photons
(deposited at every medium scatter, photonmapper.cpp:198-241) gathered at
stratified points along the (possibly bent) camera ray — no VRLs.
"""
from __future__ import annotations

from functools import partial

from . import vrl as vrl_mod


def preprocess(scene, meta, key):
    return vrl_mod.preprocess(scene, meta, key, vp_all_scatters=True)


sample = vrl_mod.make_sample(use_vrls=False)
