"""Blender mesh converter (reference src/shapes/blender.cpp): per-loop
arrays -> MeshData with material filtering, smooth/flat shading, v-flipped
uvs, and /255 vertex colors."""
import numpy as np

from mitsuba_nlvrl_tpu import build_scene, render
from mitsuba_nlvrl_tpu.scene.mesh_io import load_blender


def _quad_props(**over):
    # two triangles over 4 verts; poly 0 smooth, poly 1 flat
    props = {
        'type': 'blender',
        'verts': [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
        'vert_normals': [[0, 0, 1]] * 4,
        'loops': [0, 1, 2, 0, 2, 3],
        'loop_tris': [[0, 1, 2], [3, 4, 5]],
        'loop_tri_polys': [0, 1],
        'poly_smooth': [True, False],
        'poly_mat': [0, 0],
        'uvs': [[0, 0], [1, 0], [1, 1], [0, 0], [1, 1], [0, 1]],
        'cols': [[255, 0, 0, 255], [0, 255, 0, 255], [0, 0, 255, 255],
                 [255, 0, 0, 255], [0, 0, 255, 255], [255, 255, 255, 255]],
    }
    props.update(over)
    return props


def test_basic_conversion():
    mesh = load_blender(_quad_props())
    assert mesh.faces.shape == (2, 3)
    assert mesh.vertices.shape == (6, 3)
    # smooth triangle uses vertex normals, flat one the face normal —
    # both are +z here
    np.testing.assert_allclose(mesh.normals, [[0, 0, 1]] * 6, atol=1e-6)
    # v flipped (blender.cpp:249)
    np.testing.assert_allclose(mesh.uvs[0], [0, 1], atol=1e-6)
    # uchar colors scaled to [0,1]
    np.testing.assert_allclose(mesh.colors[0], [1, 0, 0], atol=1e-6)


def test_material_filter():
    mesh = load_blender(_quad_props(poly_mat=[0, 1], mat_nr=1))
    assert mesh.faces.shape == (1, 3)   # only the flat poly kept


def test_degenerate_flat_dropped():
    # make the flat triangle degenerate (all corners equal)
    p = _quad_props(loops=[0, 1, 2, 0, 0, 0])
    mesh = load_blender(p)
    assert mesh.faces.shape == (1, 3)


def test_renders_in_scene():
    desc = {
        'shapes': [dict(_quad_props(),
                        bsdf={'type': 'diffuse', 'reflectance': 0.8})],
        'emitters': [{'type': 'constant', 'radiance': 1.0}],
        'sensor': {'type': 'perspective',
                   'film': {'width': 8, 'height': 8}},
        'integrator': {'type': 'direct'},
    }
    scene, meta = build_scene(desc)
    img = np.asarray(render(scene, meta, spp=8, seed=2))
    assert np.isfinite(img).all() and img.max() > 0
