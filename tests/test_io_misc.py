"""Bitmap IO formats beyond EXR/PNG (reference src/libcore/bitmap.cpp
read/write_pfm, read/write_ppm, RGBE codec) and the AnimatedTransform
keyframe interpolator (transform.h:364)."""
import numpy as np

from mitsuba_nlvrl_tpu.utils.io import (write_pfm, read_pfm, write_ppm,
                                        read_ppm, write_rgbe, read_rgbe)
from mitsuba_nlvrl_tpu.core import transform as tr


def test_pfm_roundtrip(tmp_path):
    img = np.random.RandomState(0).rand(13, 17, 3).astype(np.float32) * 4.0
    p = str(tmp_path / 'a.pfm')
    write_pfm(p, img)
    np.testing.assert_allclose(read_pfm(p), img)


def test_pfm_gray_roundtrip(tmp_path):
    img = np.random.RandomState(2).rand(9, 5).astype(np.float32)
    p = str(tmp_path / 'g.pfm')
    write_pfm(p, img)
    np.testing.assert_allclose(read_pfm(p), img)


def test_ppm_roundtrip(tmp_path):
    u8 = (np.random.RandomState(1).rand(5, 7, 3) * 255).astype(np.uint8)
    p = str(tmp_path / 'a.ppm')
    write_ppm(p, u8)
    assert (read_ppm(p) == u8).all()


def test_rgbe_roundtrip(tmp_path):
    img = np.random.RandomState(3).rand(8, 16, 3).astype(np.float32) * 100.0
    p = str(tmp_path / 'a.hdr')
    write_rgbe(p, img)
    back = read_rgbe(p)
    # shared-exponent format: ~1/256 relative precision per pixel max-channel
    assert np.abs(back - img).max() / img.max() < 0.01


def test_animated_transform():
    at = tr.AnimatedTransform()
    at.append(0.0, tr.rotate((0, 0, 1), 0.0))
    at.append(1.0, tr.rotate((0, 0, 1), 90.0) @ tr.translate((2, 0, 0)))
    mid = np.asarray(at.eval(0.5).m)
    ref = np.asarray(tr.rotate((0, 0, 1), 45.0).m)
    # slerp hits the halfway rotation exactly (not a matrix lerp)
    np.testing.assert_allclose(mid[:3, :3], ref[:3, :3], atol=1e-5)
    # translation lerps: kf1 trans = R90 @ (2,0,0) = (0,2,0)
    np.testing.assert_allclose(mid[:3, 3], [0, 1, 0], atol=1e-6)
    # clamped past the last keyframe
    end = np.asarray(at.eval(5.0).m)
    np.testing.assert_allclose(
        end, np.asarray((tr.rotate((0, 0, 1), 90.0)
                         @ tr.translate((2, 0, 0))).m), atol=1e-6)


def test_animated_transform_constant():
    const = tr.AnimatedTransform(tr.translate((1, 2, 3)))
    np.testing.assert_allclose(np.asarray(const.eval(0.7).m)[:3, 3],
                               [1, 2, 3])


def test_animated_transform_with_scale():
    at = tr.AnimatedTransform()
    at.append(0.0, tr.scale((1, 1, 1)))
    at.append(1.0, tr.scale((3, 3, 3)))
    mid = np.asarray(at.eval(0.5).m)
    np.testing.assert_allclose(np.diag(mid)[:3], 2.0, atol=1e-6)


def test_resample_roundtrip_and_invariants():
    """Bitmap resampling (reference Resampler / Bitmap::resample,
    rfilter.h:107-214): constant images stay constant under any filter,
    box downsampling averages exactly, smooth signals survive an
    up/down round trip, and boundary modes differ only near edges."""
    import numpy as np
    from mitsuba_nlvrl_tpu.utils.io import resample_image

    # constants are reproduced exactly (weights are normalized per row)
    const = np.full((13, 17, 3), 0.7, np.float32)
    for f in ('box', 'tent', 'gaussian', 'mitchell', 'catmullrom',
              'lanczos'):
        out = resample_image(const, (29, 7), rfilter=f)
        assert out.shape == (7, 29, 3)
        assert np.allclose(out, 0.7, atol=1e-5), f

    # box 2x downsample = 2x2 block average
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(16, 24)).astype(np.float32)
    down = resample_image(img, (12, 8), rfilter='box')
    blocks = img.reshape(8, 2, 12, 2).mean((1, 3))
    assert np.allclose(down, blocks, atol=1e-5)

    # smooth signal round trip (up 2x then back) stays close
    y, x = np.meshgrid(np.linspace(0, 1, 32), np.linspace(0, 1, 48),
                       indexing='ij')
    smooth = (0.5 + 0.4 * np.sin(4 * x) * np.cos(3 * y)).astype(np.float32)
    up = resample_image(smooth, (96, 64), rfilter='lanczos')
    back = resample_image(up, (48, 32), rfilter='lanczos')
    assert np.abs(back - smooth)[2:-2, 2:-2].max() < 5e-3

    # wrap vs clamp only differ near the border
    a = resample_image(img, (48, 32), rfilter='lanczos', boundary='clamp')
    b = resample_image(img, (48, 32), rfilter='lanczos', boundary='wrap')
    assert np.abs(a[8:-8, 8:-8] - b[8:-8, 8:-8]).max() < 1e-6
    assert np.abs(a - b).max() > 1e-4
