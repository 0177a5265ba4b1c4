"""Differentiable rendering tests: gradients vs finite differences
(the BASELINE.json grad-allclose gate, analog of the reference's
gpu_autodiff render tests)."""
import jax
import jax.numpy as jnp
import numpy as np

from scenes import cornell_box
from mitsuba_nlvrl_tpu import build_scene
from mitsuba_nlvrl_tpu.parallel.render_dist import render_wavefront
from mitsuba_nlvrl_tpu.integrators.common import film_sample_positions


def _loss_of_params(scene, meta, pos, key):
    def loss_fn(params):
        sc = scene._replace(bsdfs=scene.bsdfs._replace(params=params))
        L = render_wavefront(sc, meta, pos, key, diff=True)
        return jnp.mean(L)
    return loss_fn


def test_grad_matches_finite_difference():
    scene, meta = build_scene(cornell_box(spp=1, res=12))
    key = jax.random.PRNGKey(5)
    pos, _ = film_sample_positions(meta, key)
    loss_fn = _loss_of_params(scene, meta, pos, key)
    params = scene.bsdfs.params
    g = np.asarray(jax.grad(loss_fn)(params))
    assert np.isfinite(g).all()

    # finite differences on a few albedo entries (same RNG -> same paths,
    # derivative only through throughput)
    rng = np.random.default_rng(0)
    checked = 0
    for b in range(min(params.shape[0], 4)):
        for c in range(3):
            if abs(g[b, c]) < 1e-6:
                continue
            eps = 1e-2
            p_np = np.asarray(params)
            pp = p_np.copy(); pp[b, c] += eps
            pm = p_np.copy(); pm[b, c] -= eps
            fd = (float(loss_fn(jnp.asarray(pp)))
                  - float(loss_fn(jnp.asarray(pm)))) / (2 * eps)
            assert abs(fd - g[b, c]) < 0.15 * max(abs(fd), abs(g[b, c]), 1e-4), \
                (b, c, fd, g[b, c])
            checked += 1
    assert checked >= 2


def test_grad_emitter_radiance():
    """d(image)/d(emitter radiance) must be positive and linear."""
    scene, meta = build_scene(cornell_box(spp=1, res=12))
    key = jax.random.PRNGKey(2)
    pos, _ = film_sample_positions(meta, key)

    def loss_fn(eparams):
        sc = scene._replace(emitters=scene.emitters._replace(params=eparams))
        return jnp.mean(render_wavefront(sc, meta, pos, key, diff=True))

    ep = scene.emitters.params
    g = np.asarray(jax.grad(loss_fn)(ep))
    assert np.isfinite(g).all()
    assert g[0, 0:3].sum() > 0
    # linearity in radiance: loss(2L) = 2 * loss(L)
    l1 = float(loss_fn(ep))
    l2 = float(loss_fn(ep * 2.0))
    assert abs(l2 - 2 * l1) < 1e-4 * max(1.0, l2)


def test_sharded_render_matches_single_device():
    """DP-sharded wavefront must reproduce the single-device image."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    scene, meta = build_scene(cornell_box(spp=1, res=16))
    key = jax.random.PRNGKey(1)
    pos, _ = film_sample_positions(meta, key)
    L_single = np.asarray(render_wavefront(scene, meta, pos, key))

    devs = jax.devices()
    mesh = Mesh(np.asarray(devs), ('dp',))
    shard = NamedSharding(mesh, P('dp', None))
    pos_sh = jax.device_put(pos, shard)
    scene_r = jax.device_put(scene, NamedSharding(mesh, P()))
    L_sharded = np.asarray(jax.jit(
        lambda s, p, k: render_wavefront(s, meta, p, k))(scene_r, pos_sh, key))
    assert np.allclose(L_single, L_sharded, atol=2e-5), \
        np.abs(L_single - L_sharded).max()


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge
    ge.dryrun_multichip(len(jax.devices()))


def test_grad_medium_sigma_t_volpath():
    """Medium-parameter gradients through volpath delta tracking
    (SURVEY §7: grad FD-allclose for medium params; the reference's
    gpu_autodiff differentiates throughputs with detached decisions).
    Perturbing sigma_t must move BOTH params and the majorant consistently
    — the estimator's weights are built from their ratio."""
    from mitsuba_nlvrl_tpu.scene.types import M_SIGMA_T, M_MAJORANT

    med = {'type': 'homogeneous', 'sigma_t': 0.4, 'albedo': 0.7}
    scene, meta = build_scene(cornell_box(
        spp=1, res=10, integrator={'type': 'volpath', 'max_depth': 5},
        medium=med))
    def loss_of(s, key):
        pos, _ = film_sample_positions(meta, key)
        P = scene.media.params
        P = P.at[0, M_SIGMA_T:M_SIGMA_T + 3].set(s)
        P = P.at[0, M_MAJORANT:M_MAJORANT + 3].set(s)
        sc = scene._replace(media=scene.media._replace(params=P))
        L = render_wavefront(sc, meta, pos, key, diff=True)
        return jnp.mean(L)

    s0 = 0.4
    eps = 2e-2
    gf = jax.jit(jax.grad(loss_of))
    lf = jax.jit(loss_of)
    # both AD and FD are STOCHASTIC estimates (spp=1): compare their means
    # over paired seeds and gate on the paired-difference standard error
    # (a single seed can disagree by several sigma legitimately)
    diffs, ads = [], []
    for k in range(6):
        kk = jax.random.PRNGKey(100 + k)
        g = float(gf(jnp.float32(s0), kk))
        fd = (float(lf(jnp.float32(s0 + eps), kk))
              - float(lf(jnp.float32(s0 - eps), kk))) / (2 * eps)
        assert np.isfinite(g) and np.isfinite(fd)
        ads.append(g)
        diffs.append(g - fd)
    sem = np.std(diffs) / np.sqrt(len(diffs))
    assert abs(np.mean(diffs)) < 3.0 * sem + 0.01, (np.mean(diffs), sem, ads)


def test_grad_heterogeneous_grid_density():
    """Inverse volume rendering: d(render)/d(grid_sigma_t voxels) through
    the supervoxel delta tracker matches finite differences (the majorant
    grid stays a fixed bound — valid while densities stay below it)."""
    from mitsuba_nlvrl_tpu.scene.vol_io import VolumeGrid
    zz, yy, xx = np.meshgrid(*[np.linspace(-1, 1, 8)] * 3, indexing='ij')
    g = (0.3 + 0.5 * np.exp(-2.0 * (xx ** 2 + yy ** 2 + zz ** 2))
         ).astype(np.float32)
    vg = VolumeGrid(data=g[..., None], bbox_min=np.float32([-0.95] * 3),
                    bbox_max=np.float32([0.95] * 3))
    med = {'type': 'heterogeneous',
           'sigma_t': {'type': 'gridvolume', '_grid': vg},
           'albedo': 0.8, 'scale': 1.0}
    scene, meta = build_scene(cornell_box(
        spp=1, res=8, integrator={'type': 'volpath', 'max_depth': 4},
        medium=med))
    key = jax.random.PRNGKey(3)
    pos, _ = film_sample_positions(meta, key)

    def loss_of(grid):
        # NOTE: _replace keeps grid_sup (fixed majorant bound) AND the
        # stale packed copy — fine here because diff=True routes every
        # density eval through grid_sigma_t itself (medium._sigma_grid_eval)
        sc = scene._replace(media=scene.media._replace(grid_sigma_t=grid))
        return jnp.mean(render_wavefront(sc, meta, pos, key, diff=True))

    G0 = scene.media.grid_sigma_t
    gr = np.asarray(jax.grad(loss_of)(G0))
    assert np.isfinite(gr).all()
    assert np.abs(gr).sum() > 1e-4, "no gradient signal"
    iz, iy, ix = np.unravel_index(np.abs(gr).argmax(), gr.shape)
    eps = 0.05
    Gp = np.asarray(G0).copy(); Gp[iz, iy, ix] += eps
    Gm = np.asarray(G0).copy(); Gm[iz, iy, ix] -= eps
    fd = (float(loss_of(jnp.asarray(Gp)))
          - float(loss_of(jnp.asarray(Gm)))) / (2 * eps)
    ad = gr[iz, iy, ix]
    assert abs(fd - ad) < 0.15 * max(abs(fd), abs(ad), 1e-4), (fd, ad)


def test_render_torch_bridge():
    """render_torch (reference autodiff.py:381-460): the torch.autograd
    bridge's backward must agree with the native jax gradient."""
    import torch
    from mitsuba_nlvrl_tpu import autodiff as ad

    scene, meta = build_scene(cornell_box(spp=1, res=8))
    fn = ad.render_torch(scene, meta, spp=1, seed=4,
                         param_keys=['bsdfs.params'])
    t = fn.initial_values[0].clone().requires_grad_(True)
    img = fn(t)
    assert img.shape[-1] == 3 and torch.isfinite(img).all()
    loss = img.mean()
    loss.backward()
    g_torch = t.grad.numpy()

    pm = ad.traverse(scene).keep(['bsdfs.params'])
    g_jax = np.asarray(jax.grad(
        lambda p: jnp.mean(ad.render(scene, meta,
                                     params={'bsdfs.params': p},
                                     pmap=pm, spp=1, seed=4)))(
        scene.bsdfs.params))
    assert np.allclose(g_torch, g_jax, rtol=1e-4, atol=1e-6)


def test_unbiased_mode_decorrelates_gradients():
    """render(unbiased=True) (reference autodiff.py:177-190): a jointly
    differentiated objective E[I^2] picks up per-sample variance when the
    same samples drive value and derivative — the biased gradient of
    0.5*mean(I^2) w.r.t. an emitter scale k estimates mean(X_s^2) (X = the
    1-spp sample), while the true value is mean(E[X]^2). Unbiased mode
    decorrelates the two passes and must match the truth."""
    from mitsuba_nlvrl_tpu import autodiff as ad

    # res sets the statistical power: the drift is a mean over pixels
    # (coherent) while the per-seed noise averages down as 1/sqrt(pixels)
    scene, meta = build_scene(cornell_box(spp=1, res=16))
    P0 = scene.emitters.params
    rad_mask = jnp.zeros_like(P0).at[:, 0:3].set(1.0)

    # loss over the LOWER half of the film only: the directly visible
    # emitter pixels are near-deterministic (huge truth, no bias), while
    # the floor region is all 1-spp path noise — exactly where the
    # correlated estimator's E[X^2] drift lives
    def make_loss(unbiased, seed):
        def loss(c):
            P = P0 * (1.0 + c * rad_mask)
            img = ad.render(scene, meta, params={'emitters.params': P},
                            spp=(1, 1) if unbiased else 1, seed=seed,
                            unbiased=unbiased)
            return 0.5 * jnp.mean(img[8:] ** 2)
        return loss

    # truth: image is linear in the emitter scale, so
    # d(0.5 mean(E[I]^2))/dc at c=0 = mean(E[I]^2); estimate E[I] at
    # higher spp (residual 1/spp variance inflates it slightly — the
    # biased estimator's drift is ~Var(X), far larger at spp=1)
    hi = ad.render(scene, meta, params={'emitters.params': P0}, spp=48,
                   seed=999)
    truth = float(jnp.mean(hi[8:] ** 2))

    gb, gu = [], []
    gbf = jax.jit(jax.grad(make_loss(False, 0)))   # seed via closure: rebuild
    for i in range(16):
        gb.append(float(jax.grad(make_loss(False, 100 + i))(
            jnp.float32(0.0))))
        gu.append(float(jax.grad(make_loss(True, 100 + i))(
            jnp.float32(0.0))))
    mb, mu = np.mean(gb), np.mean(gu)
    sb = np.std(gb) / np.sqrt(len(gb))
    su = np.std(gu) / np.sqrt(len(gu))
    # biased mode demonstrably drifts above the truth (per-sample second
    # moment >= squared mean, strictly at 1 spp noise levels)
    assert mb - truth > 3.0 * sb, (mb, truth, sb)
    # unbiased mode agrees with the truth within noise
    assert abs(mu - truth) < 4.0 * su + 0.05 * truth, (mu, truth, su)
