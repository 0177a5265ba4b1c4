"""Fused delta-tracking medium sampler (medium.sample_real_interaction)
and its supervoxel/DDA machinery. References: librender/medium.cpp:39-74
(one-majorant-event sampling), volpath.cpp:123-133 (the null/real split
whose factors the fused walk telescopes)."""
import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr

from golden_scenes import load_anchor
from mitsuba_nlvrl_tpu import build_scene
from mitsuba_nlvrl_tpu import medium as med
from mitsuba_nlvrl_tpu.core.ray import Ray
from mitsuba_nlvrl_tpu.core.rng import Sampler


def _hetvol():
    return build_scene(load_anchor('hetvol'))


def _rays(N, seed=0):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(np.stack([rng.uniform(-0.45, 0.45, N),
                              np.full(N, -2.0),
                              rng.uniform(-0.18, 0.18, N)], -1), jnp.float32)
    d = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (N, 1))
    return Ray(o, d, jnp.zeros(N), jnp.full(N, jnp.inf))


def test_constant_field_collision_rate_exact():
    """On a constant-density grid the real-collision probability is
    analytic: 1 - exp(-sigma_t * L)."""
    scene, meta = _hetvol()
    g = jnp.full(scene.media.grid_sigma_t.shape, 0.002, jnp.float32)
    sup = jnp.full(scene.media.grid_sup.shape, 0.002, jnp.float32)
    from mitsuba_nlvrl_tpu.medium import with_sigma_grid
    scene = scene._replace(media=with_sigma_grid(scene.media, g))
    N = 400_000
    ray = _rays(N)
    smp = Sampler.make(jr.PRNGKey(1), N)
    mi, w, smp = med.sample_real_interaction(
        scene, meta, ray, smp, jnp.zeros(N, jnp.int32),
        jnp.zeros(N, jnp.int32), jnp.ones(N, bool))
    found = float(np.asarray(mi.valid).mean())
    expect = 1.0 - np.exp(-0.002 * 100.0 * 1.0)     # sigma=0.2, L=1
    assert abs(found - expect) < 4.0 * np.sqrt(expect / N), (found, expect)
    # escape weights are exactly 1 for gray media
    esc_w = np.asarray(w)[~np.asarray(mi.valid)]
    assert np.allclose(esc_w, 1.0, atol=1e-4)


def test_supervoxel_weights_telescope_to_one():
    """Gray media: every real collision's weight times its local majorant
    is exactly 1 (the telescoped factors cancel), and the majorant grid
    bounds the trilinear field everywhere."""
    scene, meta = _hetvol()
    N = 100_000
    ray = _rays(N)
    smp = Sampler.make(jr.PRNGKey(2), N)
    mi, w, smp = med.sample_real_interaction(
        scene, meta, ray, smp, jnp.zeros(N, jnp.int32),
        jnp.zeros(N, jnp.int32), jnp.ones(N, bool))
    found = np.asarray(mi.valid)
    c = (np.asarray(w)[:, 0]
         * np.asarray(mi.combined_extinction)[:, 0])[found]
    assert np.abs(c - 1.0).max() < 1e-3
    # sampled sigma_t never exceeds the local majorant it was drawn from
    st = np.asarray(mi.sigma_t)[:, 0][found]
    mj = np.asarray(mi.combined_extinction)[:, 0][found]
    assert (st <= mj + 1e-4).all()


def test_supervoxel_majorant_bounds_field():
    """Block-max supervoxels (builder._supervoxel_max) bound the
    trilinear density everywhere, including across block borders."""
    scene, meta = _hetvol()
    N = 200_000
    rng = np.random.default_rng(5)
    lo = np.array([-0.5, -0.5, -0.1953125])
    hi = np.array([0.5, 0.5, 0.1953125])
    p = jnp.asarray(rng.uniform(lo, hi, (N, 3)), jnp.float32)
    midx = jnp.zeros(N, jnp.int32)
    _, _, sig = med.get_scattering_coefficients(
        scene, meta, midx, p, jnp.ones(N, bool))
    bidx = med.block_index_of(scene, meta, midx, p)
    maj, mj = med._block_majorant(scene, meta, midx, bidx,
                                  jnp.zeros(N, jnp.int32))
    assert (np.asarray(sig)[:, 0] <= np.asarray(mj) + 1e-5).all()


def test_fused_matches_outer_loop_estimator():
    """The fused walk reproduces the one-step sample_interaction + outer
    null-loop formulation (the pre-fusion volpath structure): identical
    real-collision rate on the hetvol grid to MC precision."""
    scene, meta = _hetvol()
    N = 200_000
    ray = _rays(N)
    smp = Sampler.make(jr.PRNGKey(1), N)
    mi, w, smp = med.sample_real_interaction(
        scene, meta, ray, smp, jnp.zeros(N, jnp.int32),
        jnp.zeros(N, jnp.int32), jnp.ones(N, bool))
    fused_rate = float(np.asarray(mi.valid).mean())

    ch = jnp.zeros(N, jnp.int32)
    midx = jnp.zeros(N, jnp.int32)
    key = jr.PRNGKey(9)
    active = jnp.ones(N, bool)
    found = jnp.zeros(N, bool)
    t_cur = jnp.zeros(N)
    for it in range(400):
        r = Ray(ray.o, ray.d, t_cur, jnp.full(N, jnp.inf))
        k1 = jr.fold_in(key, it)
        u = jr.uniform(k1, (N,))
        mi1, mint = med.sample_interaction(scene, meta, r, u, ch, midx,
                                           active)
        active = active & mi1.valid
        u2 = jr.uniform(jr.fold_in(k1, 7), (N,))
        p_real = mi1.sigma_t[:, 0] / jnp.maximum(
            mi1.combined_extinction[:, 0], 1e-30)
        real = active & (u2 < p_real)
        found = found | real
        active = active & ~real
        t_cur = jnp.where(active, mi1.t, t_cur)
        if not bool(active.any()):
            break
    outer_rate = float(found.mean())
    # two independent unbiased estimators of the same rate
    sigma = np.sqrt(outer_rate * (1 - outer_rate) / N)
    assert abs(fused_rate - outer_rate) < 5 * sigma * np.sqrt(2), \
        (fused_rate, outer_rate)


def test_empty_space_leap_exact_transmittance():
    """Distance-field empty-space leaping (builder._corner_pack slot-9
    encoding + medium._majorant_walk leap branch): on a SPARSE grid (two
    small blobs in opposite corners of a 64^3 volume, Chebyshev block
    distances up to ~5) the ratio-tracked transmittance along rays that
    cross the vacuum must still equal the numeric line integral of the
    trilinear field — the leap may only skip regions that are exactly
    zero everywhere (the dilated supB occupancy guarantees it)."""
    from mitsuba_nlvrl_tpu.scene.vol_io import VolumeGrid
    from mitsuba_nlvrl_tpu.core import transform as tr

    g = np.zeros((64, 64, 64), np.float32)
    zz, yy, xx = np.meshgrid(*[np.arange(64)] * 3, indexing='ij')
    g += 2.0 * np.exp(-0.08 * ((xx - 7) ** 2 + (yy - 8) ** 2
                               + (zz - 6) ** 2))
    g += 1.5 * np.exp(-0.06 * ((xx - 56) ** 2 + (yy - 55) ** 2
                               + (zz - 57) ** 2))
    g[g < 1e-3] = 0.0
    vg = VolumeGrid(data=g[..., None],
                    bbox_min=np.float32([-1, -1, -1]),
                    bbox_max=np.float32([1, 1, 1]))
    desc = {
        'integrator': {'type': 'volpath', 'max_depth': 4},
        'sensor': {'type': 'perspective', 'fov': 45.0,
                   'to_world': tr.look_at((0, 0, -4), (0, 0, 0),
                                          (0, 1, 0)),
                   'film': {'width': 4, 'height': 4,
                            'rfilter': {'type': 'box'}},
                   'sampler': {'type': 'independent', 'sample_count': 1}},
        'shapes': [{'type': 'cube', 'bsdf': {'type': 'null'},
                    'interior': {'type': 'heterogeneous',
                                 'sigma_t': {'type': 'gridvolume',
                                             '_grid': vg},
                                 'albedo': 0.9, 'scale': 1.0}}],
        'emitters': [{'type': 'constant', 'radiance': (1.0, 1.0, 1.0)}],
    }
    scene, meta = build_scene(desc)
    # leap distances actually present in the packed rows
    p8 = np.asarray(scene.media.grid_sigma_p8)
    assert p8[:, 9].min() <= -3.0, 'expected Chebyshev leaps >= 3'

    # rays through the diagonal (both blobs + long vacuum) and off-axis
    K = 8
    t0 = np.linspace(0.05, 0.95, K, dtype=np.float32)
    o = np.stack([np.full(K, -0.99), t0 * 2.0 - 1.0,
                  np.full(K, -0.99)], -1)
    d = np.tile(np.float32([[1.0, 0.0, 1.0]]) / np.sqrt(2.0), (K, 1))
    o = np.concatenate([o, np.float32([[-0.99, -0.85, -0.99]])])
    d = np.concatenate([d, np.float32([[1.0, 0.9, 1.0]])
                        / np.linalg.norm([1.0, 0.9, 1.0])])
    N = o.shape[0]
    seg = jnp.full((N,), 4.0)

    # numeric reference: trapezoid over the exact trilinear field
    ts = np.linspace(0.0, 4.0, 4001, dtype=np.float32)
    pts = (o[:, None, :] + d[:, None, :] * ts[None, :, None])
    dens = med._sigma_grid_eval(scene, jnp.float32([-1, -1, -1]),
                                jnp.float32([1, 1, 1]),
                                jnp.asarray(pts.reshape(-1, 3)))
    dens = np.asarray(dens).reshape(N, -1)
    # np.trapezoid is NumPy >= 2.0 only; fall back to trapz on 1.x
    _trap = getattr(np, 'trapezoid', None) or np.trapz
    tau = _trap(dens, ts, axis=1)
    tr_ref = np.exp(-tau)

    # many independent samples per ray: tile lanes, few jit dispatches
    T = 96
    ot = jnp.asarray(np.repeat(o, T, axis=0))
    dt = jnp.asarray(np.repeat(d, T, axis=0))
    segt = jnp.full((N * T,), 4.0)
    mid = jnp.zeros((N * T,), jnp.int32)

    @jax.jit
    def one(k):
        smp = Sampler.make(k, N * T)
        trv, _ = med.segment_tr(scene, meta, smp, ot, dt, segt, mid,
                                mid, jnp.ones((N * T,), bool))
        return trv[:, 0]

    R = 16
    runs = np.stack([np.asarray(one(jr.PRNGKey(50 + r)))
                     for r in range(R)]).reshape(R, N, T)
    tr_mc = runs.mean(axis=(0, 2))
    se = runs.std(axis=(0, 2)) / np.sqrt(R * T)
    # unbiasedness gate at 5 sigma (+ small floor for the exact lanes)
    assert (np.abs(tr_mc - tr_ref) < 5.0 * se + 0.005).all(), \
        (tr_mc, tr_ref, se)


def test_packed_row_bounds_cover_face_confined_intervals():
    """Regression (round-4 advisor finding): the packed rows (slots 8/9)
    are addressed by the trilinear BASE voxel floor(rel*D-0.5), which for
    a probe just inside a supervoxel's low face lies in the PREVIOUS
    block. The packed bounds must therefore be 2-voxel dilated/eroded —
    a 1-voxel window reports bmaj=0 over intervals containing sharp
    density just inside the face, biasing delta tracking and making the
    ratio-tracking control exceed the true density."""
    scene, meta = _hetvol()
    Dz, Dy, Dx = scene.media.grid_sigma_t.shape      # (50, 128, 128)
    g = np.zeros((Dz, Dy, Dx), np.float32)
    g[:, :, 9:] = 1.0          # sharp step ONE voxel inside block 1 (k=8)
    from mitsuba_nlvrl_tpu.medium import with_sigma_grid
    scene = scene._replace(media=with_sigma_grid(scene.media, jnp.asarray(g)))

    from mitsuba_nlvrl_tpu.scene.types import M_BBOX_MIN, M_BBOX_MAX
    P = np.asarray(scene.media.params)[0]
    lo = jnp.asarray(P[M_BBOX_MIN:M_BBOX_MIN + 3])[None]
    hi = jnp.asarray(P[M_BBOX_MAX:M_BBOX_MAX + 3])[None]
    ext = np.asarray(hi - lo)[0]

    def world(fx, fy, fz):
        # world point whose voxel coordinate rel*D - 0.5 equals (fx,fy,fz)
        rel = (np.array([fx, fy, fz]) + 0.5) / np.array([Dx, Dy, Dz])
        return jnp.asarray((np.asarray(lo)[0] + rel * ext)[None],
                           np.float32)

    midx = jnp.zeros(1, jnp.int32)
    # probe = a DDA-interval midpoint at voxel coord x=8.3: base voxel 7,
    # block 0. The interval it represents can reach x<=8.6 (see
    # _corner_pack docstring), where the trilinear density is 0.6.
    _, bmaj, bmin, ok = med._row_eval(scene, meta, midx, lo, hi,
                                      world(8.3, 20.0, 20.0))
    assert ok
    dens_in_interval, _, _, _ = med._row_eval(scene, meta, midx, lo, hi,
                                              world(8.6, 20.0, 20.0))
    d = float(np.asarray(dens_in_interval)[0])
    assert d > 0.5, d                     # the sharp feature is there
    assert float(np.asarray(bmaj)[0]) >= d, (float(np.asarray(bmaj)[0]), d)

    # mirrored case for the control: density 1 everywhere EXCEPT a dip
    # one voxel inside the face — the eroded min addressed from block 0
    # must not exceed the true density inside the interval
    g2 = np.ones((Dz, Dy, Dx), np.float32)
    g2[:, :, 9:] = 0.0
    scene2 = scene._replace(media=with_sigma_grid(scene.media,
                                                  jnp.asarray(g2)))
    _, _, bmin2, ok2 = med._row_eval(scene2, meta, midx, lo, hi,
                                     world(8.3, 20.0, 20.0))
    dens2, _, _, _ = med._row_eval(scene2, meta, midx, lo, hi,
                                   world(8.6, 20.0, 20.0))
    assert ok2
    assert float(np.asarray(bmin2)[0]) <= float(np.asarray(dens2)[0]) + 1e-6


def test_leap_distance_sound_for_boundary_base_voxels():
    """Leap-encoding soundness (advisor round-4 medium finding): the walk
    addresses packed rows by the trilinear BASE voxel floor(rel*D-0.5),
    which for a face-confined interval can belong to the LOWER-neighbor
    block of the block the interval actually lies in. The stored leap
    distance -slot9 must therefore be valid for EVERY candidate block
    (own block, and the +1-neighbor blocks on axes where the voxel is
    last of its block): stored <= Chebyshev distance(candidate, nearest
    occupied block). A single occupied corner voxel makes the old
    own-block encoding overstate the distance by 1 for boundary rows."""
    from mitsuba_nlvrl_tpu.scene.builder import _corner_pack, \
        _supervoxel_max
    k = 2
    D = 8
    g = np.zeros((D, D, D), np.float32)
    g[D - 1, D - 1, D - 1] = 1.0
    packed = _corner_pack(g, sup_k=k).reshape(D, D, D, 10)

    # reference occupancy/distance field over blocks (wide supB window —
    # matches what _corner_pack leaps over)
    occ = _supervoxel_max(g, k, dilate=1, dilate_hi=2) > 0
    S = occ.shape[0]
    occ_idx = np.argwhere(occ)

    def cheb_dist(b):
        if occ[tuple(b)]:
            return 0
        return int(np.min(np.max(np.abs(occ_idx - b), axis=1)))

    viol = []
    for z in range(D):
        for y in range(D):
            for x in range(D):
                if packed[z, y, x, 8] > 0.0:
                    continue                      # not a vacuum row
                stored = -packed[z, y, x, 9]
                assert stored >= 0.0
                cands = []
                for vz in (z, min(z + 1, D - 1)):
                    for vy in (y, min(y + 1, D - 1)):
                        for vx in (x, min(x + 1, D - 1)):
                            cands.append((vz // k, vy // k, vx // k))
                for b in set(cands):
                    if stored > cheb_dist(np.array(b)) + 1e-6:
                        viol.append(((z, y, x), b, stored,
                                     cheb_dist(np.array(b))))
    assert not viol, viol[:5]
    # and the encoding is still useful: some far vacuum row leaps > 1
    far = -packed[0, 0, 0, 9]
    assert far >= 2.0, far
