"""Postprocess stats dump parity (vrl.cpp:734-749) and the leveled
logger (logger.h)."""
import numpy as np
import pytest

from scenes import cornell_box


def test_map_stats_dump():
    from mitsuba_nlvrl_tpu import build_scene
    from mitsuba_nlvrl_tpu.render import preprocess
    from mitsuba_nlvrl_tpu.integrators.lighttrace import (map_stats,
                                                          log_map_stats)
    desc = cornell_box(spp=2, res=16, integrator={
        'type': 'photonmapper', 'global_photons': 2048,
        'volume_photons': 256})
    scene, meta = build_scene(desc)
    maps = preprocess(scene, meta, seed=0)
    s = map_stats(maps)
    assert s['surface_photons'] > 100
    assert s['global_map_bytes'] > 0
    assert 'vrl_count' in s and 'trunc_paths' in s
    lines = []
    log_map_stats(maps, printer=lines.append)
    assert any('surface photons' in ln for ln in lines)


def test_logger_levels(capsys):
    from mitsuba_nlvrl_tpu.utils import logger as lg
    lg.set_log_level(lg.Warn)
    lg.Log(lg.Info, "hidden %d", 1)
    lg.Log(lg.Warn, "shown %d", 2)
    cap = capsys.readouterr()
    assert 'hidden' not in cap.out + cap.err
    assert 'shown 2' in cap.err
    with pytest.raises(RuntimeError):
        lg.Log(lg.Error, "boom")
    lg.set_log_level(lg.Info)
