"""Find the best TPU band size for the hetvol volpath config."""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')

from mitsuba_nlvrl_tpu.scene.xml import load_file
from mitsuba_nlvrl_tpu import build_scene
from mitsuba_nlvrl_tpu.render import _render_band


def main():
    desc = load_file('/root/reference/data/hetvol/hetvol.xml')
    scene, meta = build_scene(desc)
    key = jax.random.PRNGKey(0)
    for rows in (42, 85, 170, 341, 576):
        L, _, nrays = _render_band(scene, meta, key, jnp.uint32(0), rows,
                                   'volpath', None, jnp.uint32(0))
        L.block_until_ready()
        ts = []
        for i in range(3):
            t0 = time.time()
            L, _, nrays = _render_band(scene, meta,
                                       jax.random.fold_in(key, i),
                                       jnp.uint32(100), rows, 'volpath',
                                       None, jnp.uint32(1))
            L.block_until_ready()
            ts.append(time.time() - t0)
        best = min(ts)
        r = float(nrays)
        print(f"rows={rows:4d} lanes={rows*768:7d} {best*7.3:.0f}"
              f" run={best:6.3f}s rays={r/1e6:5.2f}M"
              f" -> {r/best/1e6:6.3f} Mrays/s"
              f"  ({rows*768/best/1e6:5.2f} Mcamrays/s)", flush=True)


if __name__ == '__main__':
    main()
