"""Sample generators: independent / stratified / multijitter / ldsampler /
orthogonal.

TPU-native analogs of the reference sampler plugins (src/samplers/*.cpp).
The wavefront design keeps the bounce-loop dimensions on the counter-based
threefry stream (core/rng.py); the *film position* dimension — where
stratification matters most — is generated here per pass:

  independent  — pure jitter (independent.cpp)
  stratified   — per-pixel permuted strata over spp (stratified.cpp)
  multijitter  — Kensler correlated multi-jitter (multijitter.cpp)
  ldsampler    — scrambled (0,2)-sequence: van der Corput + Sobol' dim 2
                 (ldsampler.cpp)
  orthogonal   — orthogonal-array strata; falls back to multijitter
                 (orthogonal.cpp's OA construction needs prime spp)

All return (N, 2) offsets in [0,1)^2 for pass index p of spp.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _hash_u32(x: jnp.ndarray, seed) -> jnp.ndarray:
    """Wang-style integer hash, uint32."""
    x = x.astype(jnp.uint32) ^ jnp.uint32(seed)
    x = (x ^ jnp.uint32(61)) ^ (x >> 16)
    x = x * jnp.uint32(9)
    x = x ^ (x >> 4)
    x = x * jnp.uint32(0x27d4eb2d)
    x = x ^ (x >> 15)
    return x


def _vdc_u32(i):
    """Van der Corput radical inverse base 2 (bit reverse), traced."""
    i = jnp.uint32(i)
    i = ((i & jnp.uint32(0x55555555)) << 1) | ((i & jnp.uint32(0xAAAAAAAA)) >> 1)
    i = ((i & jnp.uint32(0x33333333)) << 2) | ((i & jnp.uint32(0xCCCCCCCC)) >> 2)
    i = ((i & jnp.uint32(0x0F0F0F0F)) << 4) | ((i & jnp.uint32(0xF0F0F0F0)) >> 4)
    i = ((i & jnp.uint32(0x00FF00FF)) << 8) | ((i & jnp.uint32(0xFF00FF00)) >> 8)
    return (i << 16) | (i >> 16)


def _sobol2_u32(i):
    """Second dimension of the (0,2)-sequence, traced (scalar OR array
    pass indices — the regeneration path carries one per lane)."""
    i = jnp.asarray(i, jnp.uint32)

    def body(k, carry):
        i, v, r = carry
        r = jnp.where((i & 1) > 0, r ^ v, r)
        return i >> 1, v ^ (v >> 1), r

    _, _, r = jax.lax.fori_loop(
        0, 32, body, (i, jnp.full_like(i, jnp.uint32(1 << 31)),
                      jnp.zeros_like(i)))
    return r


def _cmj_permute(i, l, p):
    """Kensler's in-place hash permutation over [0, l) (reference
    permute_kensler, include/mitsuba/core/random.h:229-270): a bijective
    masked-xorshift/odd-multiply mix on the power-of-two superset domain,
    cycle-walked until the value lands in range. ``l`` must be a python
    int (the walk bound is static: worst case pow2(l) - l + 1 rounds,
    random.h:241-245)."""
    l = int(l)
    if l <= 1:
        return jnp.zeros_like(jnp.asarray(i, jnp.uint32))
    w = l - 1
    w |= w >> 1
    w |= w >> 2
    w |= w >> 4
    w |= w >> 8
    w |= w >> 16
    wj = jnp.uint32(w)
    lj = jnp.uint32(l)

    def mix(x):
        x ^= p
        x = (x * jnp.uint32(0xe170893d)) & jnp.uint32(0xFFFFFFFF)
        x ^= p >> 16
        x ^= (x & wj) >> 4
        x ^= p >> 8
        x = (x * jnp.uint32(0x0929eb3f)) & jnp.uint32(0xFFFFFFFF)
        x ^= p >> 23
        x ^= (x & wj) >> 1
        x = (x * (jnp.uint32(1) | (p >> 27))) & jnp.uint32(0xFFFFFFFF)
        x = (x * jnp.uint32(0x6935fa69)) & jnp.uint32(0xFFFFFFFF)
        x ^= (x & wj) >> 11
        x = (x * jnp.uint32(0x74dcb303)) & jnp.uint32(0xFFFFFFFF)
        x ^= (x & wj) >> 2
        x = (x * jnp.uint32(0x9e501cc3)) & jnp.uint32(0xFFFFFFFF)
        x ^= (x & wj) >> 2
        x = (x * jnp.uint32(0xc860a3df)) & jnp.uint32(0xFFFFFFFF)
        x &= wj
        x ^= x >> 5
        return x

    x = mix(jnp.asarray(i, jnp.uint32))
    # cycle-walk out-of-range values back into [0, l). The mix is a
    # bijection on [0, w+1) so the walk terminates in at most (w+1)-l
    # re-applications — but unrolling that bound blows up the graph for
    # spp just above a power of two (513 -> 512 rounds). A masked
    # while_loop keeps the graph one round deep; the carry is integer-
    # only so the loop is transparent to autodiff.
    def _cond(c):
        x, it = c
        return jnp.any(x >= lj) & (it < jnp.uint32((w + 1) - l + 1))

    def _body(c):
        x, it = c
        return jnp.where(x >= lj, mix(x), x), it + jnp.uint32(1)

    x, _ = jax.lax.while_loop(_cond, _body, (x, jnp.uint32(0)))
    return ((x + p) % lj).astype(jnp.uint32)


def _cmj_randfloat(i, p):
    x = i.astype(jnp.uint32) ^ p
    x ^= x >> 17
    x ^= x >> 10
    x = (x * jnp.uint32(0xb36534e5)) & jnp.uint32(0xFFFFFFFF)
    x ^= x >> 12
    x ^= x >> 21
    x = (x * jnp.uint32(0x93fc4795)) & jnp.uint32(0xFFFFFFFF)
    x ^= jnp.uint32(0xdf6e307f)
    x ^= x >> 17
    x = (x * (jnp.uint32(1) | (p >> 18))) & jnp.uint32(0xFFFFFFFF)
    return x.astype(jnp.float32) * (1.0 / 4294967808.0)


REGEN_SAMPLERS = ('independent', 'ldsampler')


def lane_jitter(sampler_type: str, pass_lane: jnp.ndarray,
                pix_lane: jnp.ndarray) -> jnp.ndarray:
    """Per-lane film jitter for the REGENERATION scheduler
    (integrators/regen.py): each lane carries its own (pass, pixel)
    pair, so the jitter must be a pure elementwise function of both —
    the refill-time camera ray and the splat-time reconstruction then
    recompute the SAME offsets. Supports the decomposable samplers only
    (REGEN_SAMPLERS); render() falls back to the banded path otherwise.

    ldsampler: the same scrambled (0,2)-sequence construction as
    film_jitter (van der Corput + Sobol' dim 2 over the pass index,
    per-pixel XOR scramble) with the GLOBAL pixel index as the scramble
    lane. independent: counter-hash uniforms of (pass, pixel)."""
    pl = pass_lane.astype(jnp.uint32)
    px = pix_lane.astype(jnp.uint32)
    if sampler_type == 'ldsampler':
        vx = _vdc_u32(pl)
        vy = _sobol2_u32(pl)
        sx = _hash_u32(px, 0x1234567)
        sy = _hash_u32(px, 0x89abcdf)
        x = ((vx ^ sx).astype(jnp.float32)) / 4294967296.0
        y = ((vy ^ sy).astype(jnp.float32)) / 4294967296.0
        return jnp.stack([x, y], axis=-1)
    h = _hash_u32(px ^ (pl * jnp.uint32(0x9e3779b9)), 0x51ed2701)
    x = _hash_u32(h, 0x68bc21eb).astype(jnp.float32) / 4294967296.0
    y = _hash_u32(h, 0x02e5be93).astype(jnp.float32) / 4294967296.0
    return jnp.stack([x, y], axis=-1)


def lane_uniform2(pass_lane, pix_lane, salt: int) -> jnp.ndarray:
    """Auxiliary per-lane 2D uniforms (aperture samples) on the same
    decomposable (pass, pixel) stream, independent of lane_jitter."""
    pl = pass_lane.astype(jnp.uint32)
    px = pix_lane.astype(jnp.uint32)
    h = _hash_u32(px ^ (pl * jnp.uint32(0x9e3779b9)), salt)
    x = _hash_u32(h, 0x7feb352d).astype(jnp.float32) / 4294967296.0
    y = _hash_u32(h, 0x846ca68b).astype(jnp.float32) / 4294967296.0
    return jnp.stack([x, y], axis=-1)


def film_jitter(sampler_type: str, key, pass_idx: int, spp: int, N: int):
    """Per-pixel 2D sample offset for this pass (pixel index = lane)."""
    lanes = jnp.arange(N, dtype=jnp.uint32)
    if sampler_type in ('independent',) or spp <= 1:
        return jax.random.uniform(key, (N, 2), jnp.float32)

    if sampler_type == 'ldsampler':
        vx = _vdc_u32(pass_idx)
        vy = _sobol2_u32(pass_idx)
        sx = _hash_u32(lanes, 0x1234567)
        sy = _hash_u32(lanes, 0x89abcdf)
        x = ((vx ^ sx).astype(jnp.float32)) / 4294967296.0
        y = ((vy ^ sy).astype(jnp.float32)) / 4294967296.0
        return jnp.stack([x, y], axis=-1)

    if sampler_type in ('stratified',):
        # square-ish strata grid; per-pixel permuted stratum index
        import math
        a = int(math.sqrt(spp))
        while spp % a:
            a -= 1
        b = spp // a
        perm = _hash_u32(lanes, 977 + 13)
        s = (jnp.uint32(pass_idx) + perm) % jnp.uint32(spp)  # noqa: traced ok
        sx = (s % a).astype(jnp.float32)
        sy = (s // a).astype(jnp.float32)
        u = jax.random.uniform(key, (N, 2), jnp.float32)
        return jnp.stack([(sx + u[:, 0]) / a, (sy + u[:, 1]) / b], axis=-1)

    if sampler_type == 'orthogonal':
        # Bose orthogonal-array construction (Jarosz et al. 2019;
        # reference src/samplers/orthogonal.cpp:186-219): r = smallest
        # prime with r^2 >= spp, sample index permuted over r^2, mapped to
        # the (a_i0, a_i1) grid; dim 0 strata from a_i0 (sub from a_i1),
        # dim 1 swapped — every 2D projection is CMJ-stratified and both
        # 1D projections hit all r^2 strata.
        def _is_prime(x):
            return x >= 2 and all(x % k for k in range(2, int(x**0.5) + 1))
        r = 2
        while r * r < spp or not _is_prime(r):
            r += 1
        r_u = jnp.uint32(r)
        n2 = r * r
        p = _hash_u32(lanes, 0x51633e2d)
        i = _cmj_permute(jnp.broadcast_to(jnp.uint32(pass_idx), (N,))
                         % jnp.uint32(n2), n2, p)
        a0 = i // r_u
        a1 = i % r_u
        u = jax.random.uniform(key, (N, 2), jnp.float32)

        def bose(a_ij, a_ik, j, jit):
            st = _cmj_permute(a_ij, r,
                              p * jnp.uint32((j + 1) * 0x51633e2d))
            sub = _cmj_permute(a_ik, r,
                               p * jnp.uint32((j + 1) * 0x68bc21eb))
            return (st.astype(jnp.float32)
                    + (sub.astype(jnp.float32) + jit) / r) / r
        return jnp.stack([bose(a0, a1, 0, u[:, 0]),
                          bose(a1, a0, 1, u[:, 1])], axis=-1)

    if sampler_type in ('multijitter', 'orthogonal'):
        import math
        mm = int(math.sqrt(spp))
        while spp % mm:
            mm -= 1
        nn = spp // mm
        p = _hash_u32(lanes, 0x51633e2d)
        s = _cmj_permute(jnp.broadcast_to(jnp.uint32(pass_idx), (N,))
                         % jnp.uint32(spp), spp, p * jnp.uint32(0x51633e2d))
        sx = _cmj_permute(s % mm, mm, p * jnp.uint32(0x68bc21eb))
        sy = _cmj_permute(s // mm, nn, p * jnp.uint32(0x02e5be93))
        jx = _cmj_randfloat(s, p * jnp.uint32(0x967a889b))
        jy = _cmj_randfloat(s, p * jnp.uint32(0x368cc8b7))
        x = ((s % mm).astype(jnp.float32) + (sy.astype(jnp.float32) + jx)
             / nn) / mm
        y = ((s // mm).astype(jnp.float32) + (sx.astype(jnp.float32) + jy)
             / mm) / nn
        return jnp.stack([x % 1.0, y % 1.0], axis=-1)

    return jax.random.uniform(key, (N, 2), jnp.float32)
