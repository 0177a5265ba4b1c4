"""Microbenchmark: trilinear-grid gather strategies on the TPU.

The heterogeneous-medium collision loops do a trilinear grid lookup
(8 dynamic gathers) per iteration per lane. This measures:
  1. 8x separate 1-element gathers (current _grid_lookup)
  2. one gather of (1,8) corner-packed rows
  3. one (N,K) batched gather (lookahead shape)
  4. the full _grid_lookup as used today
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '/root/repo')


def timeit(fn, *args, n=20):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.time() - t0) / n


def main():
    D = (50, 128, 128)
    grid = jnp.asarray(np.random.rand(*D).astype(np.float32))
    gflat = grid.ravel()
    corner = jnp.stack([jnp.roll(grid, (-dz, -dy, -dx), (0, 1, 2))
                        for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)],
                       axis=-1)  # (Dz,Dy,Dx,8)
    for N in (32768, 262144):
        key = jax.random.PRNGKey(0)
        z = jax.random.randint(key, (N,), 0, D[0] - 1)
        y = jax.random.randint(key, (N,), 0, D[1] - 1)
        x = jax.random.randint(key, (N,), 0, D[2] - 1)

        @jax.jit
        def eight_gathers(z, y, x):
            s = 0.0
            for dz in (0, 1):
                for dy in (0, 1):
                    for dx in (0, 1):
                        s = s + grid[z + dz, y + dy, x + dx]
            return s

        @jax.jit
        def packed_gather(z, y, x):
            rows = corner[z, y, x]          # (N, 8)
            return rows.sum(-1)

        @jax.jit
        def flat_packed(z, y, x):
            idx = (z * D[1] + y) * D[2] + x
            rows = corner.reshape(-1, 8)[idx]
            return rows.sum(-1)

        @jax.jit
        def one_gather(z, y, x):
            idx = (z * D[1] + y) * D[2] + x
            return gflat[idx]

        K = 8

        @jax.jit
        def batched(z, y, x):
            zz = (z[:, None] + jnp.arange(K)) % (D[0] - 1)
            idx = (zz * D[1] + y[:, None]) * D[2] + x[:, None]
            return gflat[idx].sum(-1)

        from mitsuba_nlvrl_tpu.medium import _grid_lookup
        lo = jnp.zeros(3)
        hi = jnp.ones(3)
        p = jax.random.uniform(key, (N, 3))

        @jax.jit
        def trilerp(p):
            return _grid_lookup(grid, lo, hi, p)

        print(f"N={N}")
        print(f"  one 1-elem gather   : {timeit(one_gather, z, y, x)*1e3:8.3f} ms")
        print(f"  8x 1-elem gathers   : {timeit(eight_gathers, z, y, x)*1e3:8.3f} ms")
        print(f"  packed (1,8) gather : {timeit(packed_gather, z, y, x)*1e3:8.3f} ms")
        print(f"  flat packed (N,8)   : {timeit(flat_packed, z, y, x)*1e3:8.3f} ms")
        print(f"  batched (N,8) elems : {timeit(batched, z, y, x)*1e3:8.3f} ms")
        print(f"  full trilinear      : {timeit(trilerp, p)*1e3:8.3f} ms", flush=True)


if __name__ == '__main__':
    main()
