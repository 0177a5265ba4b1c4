"""EXR viewer (the mtsgui analog, reference src/mtsgui + src/libui):
server endpoints, layer grouping, tonemapping, pixel inspector."""
import json
import urllib.request

import numpy as np
import pytest

from mitsuba_nlvrl_tpu import viewer
from mitsuba_nlvrl_tpu.utils.io import write_exr


@pytest.fixture
def exr(tmp_path):
    img = np.zeros((6, 8, 3), np.float32)
    img[:, :, 0] = np.linspace(0, 4, 8)[None, :]
    img[2, 3] = [1.25, 2.5, 0.5]
    p = str(tmp_path / 'view.exr')
    write_exr(p, img)
    return p, img


def _get(port, path):
    with urllib.request.urlopen(f'http://127.0.0.1:{port}/{path}',
                                timeout=10) as r:
        return r.status, r.headers.get('Content-Type'), r.read()


def test_server_endpoints(exr):
    path, img = exr
    srv, _ = viewer.serve([path])
    port = srv.server_address[1]
    try:
        st, ct, body = _get(port, '')
        assert st == 200 and 'html' in ct and b'exposure' in body
        st, ct, body = _get(port, 'meta')
        meta = json.loads(body)
        assert meta['files'][0]['w'] == 8 and meta['files'][0]['h'] == 6
        assert meta['files'][0]['layers'] == ['rgb']
        st, ct, body = _get(port, 'img?file=0&exposure=0&tm=srgb')
        assert st == 200 and ct == 'image/png'
        assert body.startswith(b'\x89PNG')
        # pixel inspector returns the raw float values
        st, ct, body = _get(port, 'value?file=0&x=3&y=2')
        np.testing.assert_allclose(json.loads(body)['rgb'],
                                   [1.25, 2.5, 0.5], atol=1e-6)
    finally:
        srv.shutdown()


def test_layer_grouping():
    names = ['R', 'G', 'B', 'stokes.S1.R', 'stokes.S1.G', 'stokes.S1.B',
             'depth.Y']
    groups = viewer._layers(names)
    assert set(groups) == {'rgb', 'stokes.S1', 'depth'}


def test_tonemap_modes(exr):
    _, img = exr
    srgb = viewer.tonemap(img, 0.0, 'srgb')
    lin = viewer.tonemap(img, 0.0, 'linear')
    fc = viewer.tonemap(img, 0.0, 'false')
    assert srgb.dtype == np.uint8 and srgb.shape == img.shape
    # +1 f-stop doubles linear output below clip
    one = viewer.tonemap(np.full((1, 1, 3), 0.2, np.float32), 1.0, 'linear')
    base = viewer.tonemap(np.full((1, 1, 3), 0.2, np.float32), 0.0, 'linear')
    assert abs(int(one[0, 0, 0]) - 2 * int(base[0, 0, 0])) <= 1
    assert fc.shape == img.shape
