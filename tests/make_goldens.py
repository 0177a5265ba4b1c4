"""Generate the self-golden mean + variance images for the anchor suite.

Run once (CPU, ~15-25 min) and commit the EXRs:

    PYTHONPATH= JAX_PLATFORMS=cpu python tests/make_goldens.py [name ...]

For each anchor this renders K independent seeds at SPP_SEED samples and
stores the across-seed mean and the per-SAMPLE variance estimate
``spp * Var(seed means)`` — the quantities the z-test consumes
(reference scheme: test_renders.py:63-80, where the moment integrator
provides the same per-sample variance).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
jax.config.update('jax_platforms', 'cpu')

import numpy as np

from golden_scenes import ANCHORS, GOLDEN_DIR, render_anchor

K_SEEDS = int(os.environ.get('MNT_GOLDEN_SEEDS', 8))
SPP_SEED = int(os.environ.get('MNT_GOLDEN_SPP', 4))


def main(names):
    from mitsuba_nlvrl_tpu.utils.io import write_exr
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in names:
        t0 = time.time()
        imgs = np.stack([render_anchor(name, spp=SPP_SEED, seed=1000 + s)
                         for s in range(K_SEEDS)])
        mean = imgs.mean(0)
        # per-sample variance: each seed-mean has var sigma^2/SPP_SEED
        var = imgs.var(0, ddof=1) * SPP_SEED
        write_exr(os.path.join(GOLDEN_DIR, f'{name}.exr'), mean)
        write_exr(os.path.join(GOLDEN_DIR, f'{name}.var.exr'), var)
        np.savez(os.path.join(GOLDEN_DIR, f'{name}.meta.npz'),
                 spp_total=K_SEEDS * SPP_SEED, spp_seed=SPP_SEED,
                 k_seeds=K_SEEDS)
        print(f"{name:20s} mean={mean.mean():.5f} "
              f"var~={np.median(var):.5f} ({time.time() - t0:.0f}s)")


if __name__ == '__main__':
    main(sys.argv[1:] or list(ANCHORS))
