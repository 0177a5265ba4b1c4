"""3D / attribute texture family: grid3d, constant3d, mesh_attribute
(reference src/textures/{grid3d,constant3d,mesh_attribute}.cpp) plus PLY
vertex-color parsing. These textures complete the reference's surface
texture inventory; grid3d evaluates a trilinearly interpolated volume at
the world-space hit position mapped through the inverse to_world
transform (grid3d.cpp:254-293)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba_nlvrl_tpu import build_scene
from mitsuba_nlvrl_tpu import texture as tex_mod


def _floor_scene(reflectance, extra_shape=None):
    shapes = [{'type': 'rectangle',
               'bsdf': {'type': 'diffuse', 'reflectance': reflectance}}]
    if extra_shape:
        shapes.append(extra_shape)
    return {
        'shapes': shapes,
        'emitters': [{'type': 'constant', 'radiance': 1.0}],
        'sensor': {'type': 'perspective', 'fov': 45.0,
                   'film': {'width': 8, 'height': 8}},
        'integrator': {'type': 'direct'},
    }


def test_constant3d():
    scene, meta = build_scene(_floor_scene(
        {'type': 'constant3d', 'value': [0.2, 0.4, 0.8]}))
    out = tex_mod.eval(scene, jnp.zeros(4, jnp.int32),
                       jnp.zeros((4, 2)), p_world=jnp.zeros((4, 3)))
    np.testing.assert_allclose(np.asarray(out),
                               np.tile([0.2, 0.4, 0.8], (4, 1)), atol=1e-6)


def test_grid3d_trilinear():
    # gradient along x over the unit cube: value(x) = x at voxel centers
    res = 4
    xs = (np.arange(res) + 0.5) / res
    grid = np.broadcast_to(xs[None, None, :, None],
                           (res, res, res, 1)).astype(np.float32)
    scene, meta = build_scene(_floor_scene(
        {'type': 'grid3d', 'grid': grid,
         'bbox_min': (0, 0, 0), 'bbox_max': (1, 1, 1)}))
    assert meta.has_3d_textures
    # query points well inside the cube: trilerp of a linear field is exact
    pts = np.array([[0.5, 0.5, 0.5], [0.25, 0.5, 0.5], [0.8, 0.2, 0.3]],
                   np.float32)
    out = np.asarray(tex_mod.eval(
        scene, jnp.zeros(len(pts), jnp.int32), jnp.zeros((len(pts), 2)),
        p_world=jnp.asarray(pts)))
    np.testing.assert_allclose(out[:, 0], pts[:, 0], atol=1e-5)
    # outside the cube -> zero (grid3d.cpp: zero outside the bbox)
    out2 = np.asarray(tex_mod.eval(
        scene, jnp.zeros(1, jnp.int32), jnp.zeros((1, 2)),
        p_world=jnp.asarray([[2.0, 0.5, 0.5]])))
    np.testing.assert_allclose(out2, 0.0, atol=1e-6)


def test_grid3d_renders(tmp_path):
    # a black->white x-gradient on the floor must show up in a render
    res = 8
    xs = (np.arange(res) + 0.5) / res
    grid = np.broadcast_to(xs[None, None, :, None],
                           (res, res, res, 1)).astype(np.float32)
    from mitsuba_nlvrl_tpu import render
    from mitsuba_nlvrl_tpu.core import transform as tr
    desc = _floor_scene({'type': 'grid3d', 'grid': grid,
                         'bbox_min': (-2, -2, -2), 'bbox_max': (2, 2, 2)})
    desc['sensor']['to_world'] = tr.look_at((0, 0, 4), (0, 0, 0), (0, 1, 0))
    scene, meta = build_scene(desc)
    img = np.asarray(render(scene, meta, spp=16, seed=3))
    assert np.isfinite(img).all()
    # right half of the image sees larger x -> brighter
    assert img[:, 5:].mean() > img[:, :3].mean() + 0.01


PLY_COLORED = """ply
format ascii 1.0
element vertex 4
property float x
property float y
property float z
property uchar red
property uchar green
property uchar blue
element face 2
property list uchar int vertex_indices
end_header
-1 -1 0 255 0 0
1 -1 0 0 255 0
1 1 0 0 0 255
-1 1 0 255 255 255
3 0 1 2
3 0 2 3
"""


def test_ply_vertex_colors(tmp_path):
    p = tmp_path / 'colored.ply'
    p.write_text(PLY_COLORED)
    from mitsuba_nlvrl_tpu.scene.mesh_io import load_ply
    mesh = load_ply(str(p))
    assert mesh.colors is not None
    np.testing.assert_allclose(mesh.colors[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(mesh.colors[3], [1, 1, 1], atol=1e-6)


def test_mesh_attribute_interpolation(tmp_path):
    p = tmp_path / 'colored.ply'
    p.write_text(PLY_COLORED)
    desc = _floor_scene(None)
    desc['shapes'] = [{'type': 'ply', 'filename': str(p),
                       'bsdf': {'type': 'diffuse', 'reflectance':
                                {'type': 'mesh_attribute',
                                 'name': 'vertex_color'}}}]
    scene, meta = build_scene(desc)
    assert meta.has_attr_textures
    # rays straight down onto known points of the quad
    from mitsuba_nlvrl_tpu.core.records import SurfaceInteraction
    from mitsuba_nlvrl_tpu.ops import intersect as isect
    from mitsuba_nlvrl_tpu.core.ray import Ray
    o = np.array([[-0.99, -0.99, 1.0],    # ~vertex 0 -> red
                  [0.0, 0.0, 1.0],        # center of edge v0-v2 mix
                  [-0.99, 0.99, 1.0]],    # ~vertex 3 -> white
                 np.float32)
    d = np.tile([0.0, 0.0, -1.0], (3, 1)).astype(np.float32)
    ray = Ray(o=jnp.asarray(o), d=jnp.asarray(d),
              mint=jnp.zeros(3), maxt=jnp.full(3, 1e9))
    pi = isect.intersect_preliminary(scene, ray)
    si = isect.compute_si(scene, ray, pi)
    attr = np.asarray(tex_mod.vertex_attr(scene, si))
    assert np.asarray(si.valid).all()
    np.testing.assert_allclose(attr[0], [1, 0, 0], atol=0.05)
    np.testing.assert_allclose(attr[2], [1, 1, 1], atol=0.05)
    # center lies on the shared edge v0-v2: average of red and blue
    np.testing.assert_allclose(attr[1], [0.5, 0, 0.5], atol=0.05)
