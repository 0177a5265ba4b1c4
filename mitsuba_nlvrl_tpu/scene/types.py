"""SoA scene representation.

The TPU-native replacement for the reference's object graph (Scene owning
Shape/BSDF/Emitter/Medium plugin pointers, src/librender/scene.cpp): the
whole scene is flattened at build time into structure-of-arrays device
tensors indexed by integer type codes. Per-lane C++ virtual dispatch becomes
masked evaluation over the small set of types present in the scene
(SceneMeta records which, statically, so jit specializes).

SceneData is a pytree — differentiable scene parameters (BSDF albedos,
emitter radiance, medium coefficients, ...) are just leaves, so jax.grad
flows through the renderer without a separate ParameterMap (the analog of
the reference's python traverse()/ParameterMap, src/python/python/util.py:14).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

from ..core.transform import Transform

# --- type codes -------------------------------------------------------------

BSDF_TYPES = {
    'diffuse': 0, 'conductor': 1, 'dielectric': 2, 'thindielectric': 3,
    'null': 4, 'roughconductor': 5, 'roughdielectric': 6, 'plastic': 7,
    'roughplastic': 8, 'blendbsdf': 9, 'mask': 10, 'twosided': 11,
    'normalmap': 12, 'bumpmap': 13, 'polarizer': 14, 'measured': 15,
    'retarder': 16, 'circular': 17, 'pplastic': 18,
    'measured_polarized': 19,
}

EMITTER_TYPES = {
    'area': 0, 'point': 1, 'constant': 2, 'directional': 3, 'spot': 4,
    'envmap': 5, 'projector': 6,
}

MEDIUM_TYPES = {'homogeneous': 0, 'heterogeneous': 1, 'nonlinear': 2}

PHASE_TYPES = {'isotropic': 0, 'hg': 1}

SENSOR_TYPES = {'perspective': 0, 'thinlens': 1, 'radiancemeter': 2,
                'irradiancemeter': 3}

RFILTER_TYPES = {'box': 0, 'tent': 1, 'gaussian': 2, 'mitchell': 3,
                 'catmullrom': 4, 'lanczos': 5}

# BSDF flag bits (analog of reference BSDFFlags, bsdf.h:280)
F_DELTA = 1
F_NULL = 2
F_TRANSMISSION = 4
F_SMOOTH = 8          # has a non-delta lobe
F_TWOSIDED = 16
F_MASK = 32           # opacity-masked wrapper (params[14] = opacity)

BSDF_NPARAM = 20
EMITTER_NPARAM = 28
MEDIUM_NPARAM = 28

# medium param layout offsets
M_SIGMA_T = 0       # [0:3]
M_ALBEDO = 3        # [3:6]
M_SCALE = 6
M_PHASE_G = 7
M_BBOX_MIN = 8      # [8:11]
M_BBOX_MAX = 11     # [11:14]
M_MAJORANT = 14     # [14:17]
M_NL_TOP_IOR = 17
M_NL_BOT_IOR = 18
M_NL_RES = 19       # [19:22] voxel resolution (as float)
M_NL_FROM_BOTTOM = 22


class Geometry(NamedTuple):
    """All triangles of the scene, pre-transformed to world space with
    Möller-Trumbore precomputation (v0, e1=v1-v0, e2=v2-v0)."""
    v0: jnp.ndarray        # (T, 3)
    e1: jnp.ndarray        # (T, 3)
    e2: jnp.ndarray        # (T, 3)
    n0: jnp.ndarray        # (T, 3) shading normals at corners
    n1: jnp.ndarray
    n2: jnp.ndarray
    uv0: jnp.ndarray       # (T, 2)
    uv1: jnp.ndarray
    uv2: jnp.ndarray
    shape_idx: jnp.ndarray  # (T,) int32
    # analytic spheres
    sph_center: jnp.ndarray     # (S, 3)
    sph_radius: jnp.ndarray     # (S,)
    sph_shape_idx: jnp.ndarray  # (S,) int32
    # per-corner vertex colors, present only when a mesh carries them
    # (mesh_attribute textures, src/textures/mesh_attribute.cpp)
    c0: jnp.ndarray = ()        # (T, 3)
    c1: jnp.ndarray = ()
    c2: jnp.ndarray = ()


class BVH(NamedTuple):
    """Flattened LBVH over triangles (see ops/bvh.py). Leaf nodes reference
    a contiguous range of the reordered triangle array."""
    node_lo: jnp.ndarray      # (N, 3) aabb min
    node_hi: jnp.ndarray      # (N, 3) aabb max
    node_left: jnp.ndarray    # (N,) int32: left child or tri offset (leaf)
    node_right: jnp.ndarray   # (N,) int32: right child or tri count (leaf)
    node_leaf: jnp.ndarray    # (N,) bool


class ShapeTable(NamedTuple):
    bsdf_idx: jnp.ndarray        # (Sh,) int32
    emitter_idx: jnp.ndarray     # (Sh,) int32, -1 = not emissive
    int_medium: jnp.ndarray      # (Sh,) int32, -1 = none
    ext_medium: jnp.ndarray      # (Sh,) int32, -1 = none


class BSDFTable(NamedTuple):
    type: jnp.ndarray      # (B,) int32
    flags: jnp.ndarray     # (B,) int32
    params: jnp.ndarray    # (B, BSDF_NPARAM) float32


class EmitterTable(NamedTuple):
    type: jnp.ndarray       # (E,) int32
    params: jnp.ndarray     # (E, EMITTER_NPARAM) float32
    shape_idx: jnp.ndarray  # (E,) int32; -1 for shapeless emitters
    # area-emitter triangle sampling: global concatenated per-emitter tables
    tri_offset: jnp.ndarray  # (E,) int32 into em_tri arrays
    tri_count: jnp.ndarray   # (E,) int32
    em_tri_idx: jnp.ndarray  # (TE,) int32 triangle ids
    em_tri_cdf: jnp.ndarray  # (TE,) float32, per-emitter normalized cdf
    em_area: jnp.ndarray     # (E,) float32 total emitter area
    # environment map (at most one per scene; (1,1,3) dummy when absent)
    env_map: jnp.ndarray       # (He, We, 3) radiance texels
    # Hierarchical2D warp over luminance*sin(theta) (envmap.cpp:67,123):
    # mip-pyramid sample warping of the bilinear interpolant
    env_warp: 'distr2d.Hierarchical2D'
    env_to_world: 'Transform'  # emitter-to-world rotation
    env_scale: jnp.ndarray     # ()
    # spectral-variant SPDs (emitter.SPEC_* kinds; RGB transport ignores)
    spec_kind: jnp.ndarray     # (E,) int32
    spec_param: jnp.ndarray    # (E,) float32 — blackbody T / table row
    spec_scale: jnp.ndarray    # (E,) float32
    spec_table: jnp.ndarray    # (max(1, n_spd), 95) tabulated SPDs


class MediumTable(NamedTuple):
    type: jnp.ndarray       # (M,) int32
    phase_type: jnp.ndarray  # (M,) int32
    params: jnp.ndarray     # (M, MEDIUM_NPARAM) float32
    # heterogeneous grids: round-1 supports one sigma_t grid + one albedo grid
    grid_sigma_t: jnp.ndarray   # (Dz, Dy, Dx) float32 (1,1,1 dummy if unused)
    grid_albedo: jnp.ndarray    # (Az, Ay, Ax, 3) float32
    grid_medium: jnp.ndarray    # () int32 which medium uses the grid (-1 none)
    # nonlinear IOR voxel grid (one per scene, round 1)
    nl_ior: jnp.ndarray         # (Rz*Ry*Rx,) float32 flat ior grid (dummy if unused)
    nl_medium: jnp.ndarray      # () int32 which medium is nonlinear (-1 none)
    # supervoxel block-max of grid_sigma_t (dilated by 1 voxel so trilinear
    # taps across block borders stay bounded) — local majorants for
    # empty-space-skipping delta tracking ((1,1,1) ones when unused).
    # Defaults to None for hand-built tables (treated as absent).
    grid_sup: Optional[jnp.ndarray] = None
    # eroded supervoxel block-min of grid_sigma_t: the residual-ratio-
    # tracking control (None / (1,1,1) zeros when unused)
    grid_sup_min: Optional[jnp.ndarray] = None
    # corner-packed copy of grid_sigma_t: row i = the 8 cell corners
    # [dz*4+dy*2+dx] of voxel i (edge-clamped). ONE row-gather fetches a
    # whole trilinear footprint — 8 separate dynamic gathers cost ~8x more
    # on TPU (measured ~10ns/element, scripts/bench_gather.py). Slots
    # 8/9 carry the block max/min. None when the grid is absent or too
    # large to duplicate.
    grid_sigma_p8: Optional[jnp.ndarray] = None  # (Dz*Dy*Dx, 10) float32


TEXTURE_TYPES = {'bitmap': 0, 'checkerboard': 1, 'constant': 2,
                 'grid3d': 3, 'constant3d': 4, 'mesh_attribute': 5}
TEX_NPARAM = 24


class TextureTable(NamedTuple):
    """Textures for spatially varying BSDF parameters (reference
    src/textures/{bitmap,checkerboard,grid3d,mesh_attribute}.cpp). Bitmaps
    are stacked padded to the largest resolution; checkerboard params:
    color0[0:3], color1[3:6], uv scale [6:8]; grid3d: vol slot p[0] +
    world-to-unit-cube 3x4 transform p[8:20]; constant3d: value p[0:3]."""
    type: jnp.ndarray       # (Tx,) int32
    params: jnp.ndarray     # (Tx, TEX_NPARAM)
    data: jnp.ndarray       # (Tx, Hmax, Wmax, 3) float32
    size: jnp.ndarray       # (Tx, 2) int32 (H, W) actual
    # 3D volumes for grid3d textures, padded to the largest resolution
    vol: jnp.ndarray = ()        # (Tv, Dm, Hm, Wm, 3) float32
    vol_size: jnp.ndarray = ()   # (Tv, 3) int32 (D, H, W) actual


class SensorData(NamedTuple):
    to_world: Transform
    tan_fov_x: jnp.ndarray   # () tan(fov_x / 2)
    tan_fov_y: jnp.ndarray   # ()
    near_clip: jnp.ndarray
    far_clip: jnp.ndarray
    aperture_radius: jnp.ndarray  # thinlens
    focus_distance: jnp.ndarray


class SceneData(NamedTuple):
    geo: Geometry
    bvh: Optional[BVH]
    shapes: ShapeTable
    bsdfs: BSDFTable
    emitters: EmitterTable
    media: MediumTable
    textures: 'TextureTable'
    sensor: SensorData
    bbox_lo: jnp.ndarray     # (3,)
    bbox_hi: jnp.ndarray     # (3,)
    bsphere_c: jnp.ndarray   # (3,)
    bsphere_r: jnp.ndarray   # ()
    # measured-BSDF warp tables, one MeasuredData per material
    # (bsdf/measured.py); static facts live in SceneMeta.measured_meta
    measured: Tuple = ()
    # measured polarized pBRDF grids, one MeasuredPolData per material
    # (bsdf/measured_pol.py); row params[0] holds the slot index
    measured_pol: Tuple = ()
    # named-conductor complex-IOR curves on the CIE grid (C, 2, CIE_SAMPLES)
    # for per-wavelength Fresnel in spectral variants; bsdf param slot 13
    # holds the row id + 1. (1, 2, K) zeros dummy when unused.
    conductor_spd: jnp.ndarray = ()
    # cluster-sweep traversal arrays for TPU (ops/isect_clusters.py);
    # None for small scenes where the dense sweep wins
    clusters: Optional[object] = None


@dataclass(frozen=True)
class FilmMeta:
    width: int = 256
    height: int = 256
    rfilter: str = 'gaussian'
    filter_radius: float = 2.0
    crop_offset: Tuple[int, int] = (0, 0)
    crop_size: Optional[Tuple[int, int]] = None


@dataclass(frozen=True)
class SceneMeta:
    """Static (hashable) scene facts used for jit specialization."""
    n_tris: int = 0
    n_spheres: int = 0
    n_shapes: int = 0
    n_bsdfs: int = 0
    n_emitters: int = 0
    n_media: int = 0
    bsdf_types: Tuple[int, ...] = ()          # distinct codes present
    emitter_types: Tuple[int, ...] = ()
    medium_types: Tuple[int, ...] = ()        # per-medium-slot type codes
    phase_types: Tuple[int, ...] = ()         # distinct phase codes present
    sensor_type: int = 0
    film: FilmMeta = field(default_factory=FilmMeta)
    sampler: str = 'independent'
    spp: int = 16
    integrator: str = 'path'
    integrator_props: Tuple[Tuple[str, object], ...] = ()
    has_bvh: bool = False
    has_media: bool = False
    has_textures: bool = False
    has_3d_textures: bool = False    # grid3d rows present (eval needs p)
    has_attr_textures: bool = False  # mesh_attribute rows + vertex colors
    has_param_textures: bool = False  # alpha/specular/plastic-diffuse maps
    camera_medium: int = -1    # medium the camera starts in (-1 vacuum)
    spectral: bool = False     # hero-wavelength spectral transport variant
    has_conductor_spd: bool = False  # tabulated eta/k curves present
    measured_meta: Tuple = ()  # per-measured-material MeasuredMeta

    def iprop(self, name, default=None):
        for k, v in self.integrator_props:
            if k == name:
                return v
        return default
