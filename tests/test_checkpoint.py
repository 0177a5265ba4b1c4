"""Checkpoint/resume (utils/checkpoint.py): a resumed render must equal an
uninterrupted one bit-for-bit."""
import numpy as np

from scenes import cornell_box
from mitsuba_nlvrl_tpu import build_scene, render


def test_checkpoint_resume_identical(tmp_path):
    from mitsuba_nlvrl_tpu.utils.checkpoint import render_with_checkpoints
    scene, meta = build_scene(cornell_box(spp=4, res=12))
    full = np.asarray(render(scene, meta, spp=4, seed=5))

    ck = str(tmp_path / 'ck')
    # run only the first 2 passes (checkpoint every 2), then "resume"
    img1 = render_with_checkpoints(scene, meta, seed=5, spp=2,
                                   ckpt_path=ck, ckpt_every=2)
    # resume to the full 4 passes
    img2 = np.asarray(render_with_checkpoints(scene, meta, seed=5, spp=4,
                                              ckpt_path=ck, ckpt_every=2))
    assert np.allclose(img2, full, atol=1e-6), np.abs(img2 - full).max()
