"""API-surface tests: traverse/ParameterMap, optimizers, chi2 harness, CLI."""
import subprocess
import sys
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scenes import cornell_box
from mitsuba_nlvrl_tpu import build_scene


def test_traverse_parameter_map():
    from mitsuba_nlvrl_tpu import autodiff as ad
    scene, meta = build_scene(cornell_box(spp=1, res=8))
    pm = ad.traverse(scene)
    assert 'bsdfs.params' in pm.keys()
    ref = np.asarray(pm['bsdfs.params'])
    pm['bsdfs.params'] = ref * 0.5
    assert np.allclose(np.asarray(pm.scene.bsdfs.params), ref * 0.5)


def test_optimizer_descends_loss():
    """Adam on bsdf albedo should reduce an L2 loss toward a target render
    (the reference's inverse-rendering smoke test)."""
    from mitsuba_nlvrl_tpu import autodiff as ad
    scene, meta = build_scene(cornell_box(spp=1, res=8))
    pm = ad.traverse(scene).keep(['bsdfs.params'])

    target = ad.render(scene, meta, spp=1, seed=3)

    # perturb albedo, optimize back
    params0 = {'bsdfs.params': pm['bsdfs.params'] * 0.3}
    opt = ad.Adam(pm, lr=0.05)
    opt.params = dict(params0)

    def loss_fn(params):
        img = ad.render(scene, meta, params=params, pmap=pm, spp=1, seed=3)
        return jnp.mean((img - target) ** 2)

    loss_grad = jax.jit(jax.value_and_grad(loss_fn))
    l0, g = loss_grad(opt.params)
    for _ in range(8):
        opt.step(g)
        l1, g = loss_grad(opt.params)
    assert float(l1) < float(l0), (float(l0), float(l1))


@pytest.mark.parametrize('name', ['cosine', 'sphere', 'beckmann'])
def test_chi2_warps(name):
    from mitsuba_nlvrl_tpu.testing import ChiSquareTest, SphericalDomain
    from mitsuba_nlvrl_tpu.core import warp

    if name == 'cosine':
        sf = warp.square_to_cosine_hemisphere
        pf = warp.square_to_cosine_hemisphere_pdf
    elif name == 'sphere':
        sf = warp.square_to_uniform_sphere
        pf = lambda d: jnp.full(d.shape[:-1], warp.square_to_uniform_sphere_pdf(d))
    else:
        sf = lambda u: warp.square_to_beckmann(u, 0.3)
        pf = lambda d: warp.square_to_beckmann_pdf(d, 0.3)
    test = ChiSquareTest(SphericalDomain(), sf, pf, sample_count=400_000,
                         res=32)
    assert test.run(0.005), test.messages


def test_chi2_hg_phase():
    from mitsuba_nlvrl_tpu.testing import ChiSquareTest, SphericalDomain
    from mitsuba_nlvrl_tpu import phase as phase_mod
    import mitsuba_nlvrl_tpu.scene.types as T
    from mitsuba_nlvrl_tpu.scene.types import MediumTable

    g = -0.4
    med = MediumTable(
        type=jnp.zeros((1,), jnp.int32),
        phase_type=jnp.asarray([T.PHASE_TYPES['hg']], jnp.int32),
        params=jnp.zeros((1, T.MEDIUM_NPARAM)).at[0, T.M_PHASE_G].set(g),
        grid_sigma_t=jnp.zeros((1, 1, 1)),
        grid_albedo=jnp.zeros((1, 1, 1, 3)),
        grid_medium=jnp.asarray(-1), nl_ior=jnp.ones((1,)),
        nl_medium=jnp.asarray(-1))

    class S:
        media = med

    class M:
        phase_types = (T.PHASE_TYPES['hg'],)

    wi_dir = jnp.asarray([0.0, 0.0, 1.0])

    def sf(u):
        N = u.shape[0]
        wi = jnp.tile(wi_dir[None], (N, 1))
        wo, _ = phase_mod.sample(S, M, jnp.zeros((N,), jnp.int32), wi, u,
                                 jnp.ones((N,), bool))
        return wo

    def pf(d):
        N = d.shape[0]
        wi = jnp.tile(wi_dir[None], (N, 1))
        return phase_mod.eval(S, M, jnp.zeros((N,), jnp.int32), wi, d,
                              jnp.ones((N,), bool))

    from mitsuba_nlvrl_tpu.testing import ChiSquareTest, SphericalDomain
    test = ChiSquareTest(SphericalDomain(), sf, pf, sample_count=400_000,
                         res=32)
    assert test.run(0.005), test.messages


def test_chi2_bsdf_roughconductor():
    """Chi2 on roughconductor sampling vs pdf (the reference's per-bsdf
    chi2 gate, e.g. test_diffuse.py:41-53)."""
    from mitsuba_nlvrl_tpu.testing import ChiSquareTest, SphericalDomain
    from mitsuba_nlvrl_tpu import bsdf as bsdf_mod
    from mitsuba_nlvrl_tpu.core import math as mm

    code, flags, p = bsdf_mod.pack_params({'type': 'roughconductor',
                                           'alpha': 0.3})
    P1 = jnp.asarray([p], jnp.float32)
    wi_dir = mm.normalize(jnp.asarray([0.3, 0.2, 0.9]))

    def sf(u):
        N = u.shape[0]
        P = jnp.tile(P1, (N, 1))
        wi = jnp.tile(wi_dir[None], (N, 1))
        bs, w = bsdf_mod._roughconductor_sample(P, wi, None, u, 0)
        # rejected samples (pdf 0) -> NaN, dropped by the harness
        return jnp.where((bs.pdf > 0)[:, None], bs.wo, jnp.nan)

    def pf(d):
        N = d.shape[0]
        P = jnp.tile(P1, (N, 1))
        wi = jnp.tile(wi_dir[None], (N, 1))
        return bsdf_mod._roughconductor_pdf(P, wi, d)

    test = ChiSquareTest(SphericalDomain(), sf, pf, sample_count=400_000,
                         res=32)
    assert test.run(0.002), test.messages


def test_cli_renders(tmp_path):
    out = tmp_path / 'out.exr'
    png = tmp_path / 'out.png'
    env = dict(os.environ, JAX_PLATFORMS='cpu', PYTHONPATH='/root/repo')
    r = subprocess.run(
        [sys.executable, '-c',
         'import jax; jax.config.update("jax_platforms", "cpu");'
         'from mitsuba_nlvrl_tpu.__main__ import main; main()',
         '/root/reference/data/cbox/cbox.xml', '-o', str(out),
         '-s', '1', '--res', '24x24', '--png', str(png)],
        capture_output=True, text=True, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists() and png.exists()
    from mitsuba_nlvrl_tpu.utils.io import read_exr
    img, _ = read_exr(str(out))
    assert img.shape == (24, 24, 3) and np.isfinite(img).all()
