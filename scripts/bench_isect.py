"""Microbenchmark: dense triangle sweep vs BVH-iteration primitives on TPU.

Measures (a) the dense O(N x T) Moller-Trumbore sweep at several triangle
counts, (b) the cost of one wavefront BVH-traversal iteration's primitive
ops (packed node-row gather + stack scatter/gather), to locate the
dense-vs-traversal crossover before building the real traversal.
"""
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')
import jax
import jax.numpy as jnp

from mitsuba_nlvrl_tpu.core.ray import Ray
from mitsuba_nlvrl_tpu.ops.intersect import _scan_tris


def timeit(fn, *args, n=10):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.time() - t0) / n


def _mesh_tris(subdiv):
    """A real SURFACE (icosphere) — BVHs are built for geometric locality;
    random triangle soup is their pathological worst case."""
    from mitsuba_nlvrl_tpu.scene.builder import _icosphere_mesh
    m_ = _icosphere_mesh(subdiv)
    v = m_.vertices[m_.faces]               # (T, 3, 3)
    return (v[:, 0], v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])


def main():
    rng = np.random.default_rng(0)
    for N in (32768, 131072):
        # camera-like rays: origins on a sphere of radius 3, pointed at
        # jittered targets near the origin
        o_np = rng.normal(size=(N, 3)).astype(np.float32)
        o_np = 3.0 * o_np / np.linalg.norm(o_np, axis=-1, keepdims=True)
        tgt = rng.uniform(-0.7, 0.7, (N, 3)).astype(np.float32)
        d_np = tgt - o_np
        d_np /= np.linalg.norm(d_np, axis=-1, keepdims=True)
        o = jnp.asarray(o_np)
        d = jnp.asarray(d_np)
        ray = Ray(o, d, jnp.zeros((N,)), jnp.full((N,), np.inf))
        print(f"N={N}")
        for subdiv in (4, 5, 6, 7):
            v0n, e1n, e2n = _mesh_tris(subdiv)
            T = len(v0n)
            v0 = jnp.asarray(v0n)
            e1 = jnp.asarray(e1n)
            e2 = jnp.asarray(e2n)

            @jax.jit
            def dense(o_, d_):
                r = Ray(o_, d_, jnp.zeros((N,)), jnp.full((N,), np.inf))
                t, i, u, v, _ = _scan_tris(r, v0, e1, e2, False,
                                           jnp.full((N,), np.inf))
                return t
            dt = timeit(dense, o, d)
            print(f"  dense T={T:7d}: {dt*1e3:8.2f} ms "
                  f"({N/dt/1e6:7.2f} Mrays/s)", flush=True)
            from mitsuba_nlvrl_tpu.ops import bvh4 as bvh4_mod
            import numpy as _np
            b4 = bvh4_mod.build(_np.asarray(v0), _np.asarray(e1),
                                _np.asarray(e2))

            @jax.jit
            def trav(o_, d_):
                t, i, u, v = bvh4_mod.traverse(
                    b4, o_, d_, jnp.zeros((N,)), jnp.full((N,), np.inf))
                return t
            dt4 = timeit(trav, o, d)
            print(f"  bvh4  T={T:7d}: {dt4*1e3:8.2f} ms "
                  f"({N/dt4/1e6:7.2f} Mrays/s)  "
                  f"[{dt/dt4:5.2f}x vs dense]", flush=True)
            from mitsuba_nlvrl_tpu.ops import isect_clusters as ic
            from mitsuba_nlvrl_tpu.ops import bvh as bvh_mod
            b_bin = bvh_mod._build_numpy(_np.asarray(v0), _np.asarray(e1),
                                         _np.asarray(e2))
            ordn = b_bin.order
            cl = ic.build(_np.asarray(v0)[ordn], _np.asarray(e1)[ordn],
                          _np.asarray(e2)[ordn])

            @jax.jit
            def sweep(o_, d_):
                t, i, u, v = ic.traverse(
                    cl, o_, d_, jnp.zeros((N,)), jnp.full((N,), np.inf))
                return t
            dtc = timeit(sweep, o, d)
            print(f"  clust T={T:7d}: {dtc*1e3:8.2f} ms "
                  f"({N/dtc/1e6:7.2f} Mrays/s)  "
                  f"[{dt/dtc:5.2f}x vs dense]", flush=True)

        # one BVH4-style iteration: packed row gather + AABB tests + stack ops
        M = 65536
        nodes = jnp.asarray(rng.uniform(-1, 1, (M, 32)).astype(np.float32))

        @jax.jit
        def bvh_iter_sim(cur, stack, sp, best):
            def body(c, _):
                cur, stack, sp, best = c
                row = nodes[cur]                      # (N, 32) row gather
                # 4 child AABB slab tests
                hits = []
                tns = []
                for k in range(4):
                    lo = row[:, k*6:k*6+3]
                    hi = row[:, k*6+3:k*6+6]
                    t0 = (lo - o) * (1.0 / d)
                    t1 = (hi - o) * (1.0 / d)
                    tn = jnp.max(jnp.minimum(t0, t1), -1)
                    tf = jnp.min(jnp.maximum(t0, t1), -1)
                    hits.append((tn <= tf) & (tn < best))
                    tns.append(tn)
                child = row[:, 24:28].astype(jnp.int32)
                nhit = sum(h.astype(jnp.int32) for h in hits)
                # push one far child, advance to one near child
                lane = jnp.arange(N)
                far = jnp.where(hits[1], child[:, 1], child[:, 2])
                stack = stack.at[lane, jnp.minimum(sp, 47)].set(far)
                sp = jnp.minimum(sp + (nhit > 1), 47)
                nxt = jnp.where(hits[0], child[:, 0], child[:, 3])
                pop = nhit == 0
                sp = jnp.where(pop, jnp.maximum(sp - 1, 0), sp)
                popped = stack[lane, sp]
                cur = jnp.where(pop, popped, nxt) % M
                best = best + 1e-9 * tns[0]
                return (cur, stack, sp, best), None
            c, _ = jax.lax.scan(body, (cur, stack, sp, best), None, length=32)
            return c[3]

        cur = jnp.zeros((N,), jnp.int32)
        stack = jnp.zeros((N, 48), jnp.int32)
        sp = jnp.zeros((N,), jnp.int32)
        best = jnp.full((N,), np.inf)
        dt = timeit(bvh_iter_sim, cur, stack, sp, best) / 32
        print(f"  bvh4-iteration: {dt*1e3:8.3f} ms/iter "
              f"(50 iters -> {50*dt*1e3:7.1f} ms)", flush=True)


if __name__ == '__main__':
    main()
