"""Textured alpha-cutout traversal (foliage-style ALPHA_MASK geometry).

Reference emulates any-hit alpha testing by re-intersecting through
transparent regions (Shaders/RaytracingHelpers.hlsli:17-44 +
ShadingHelpers.hlsli IsOpaque with base-color-alpha lookups)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_pbrt.models.material import ALPHA_MASK, make_table
from tpu_pbrt.models.mesh import build_geometry
from tpu_pbrt.models.scene import make_scene
from tpu_pbrt.ops import tracer as tracer_mod
from tpu_pbrt.ops.vec import Vec3


def cutout_texture(n=16):
    """Opaque texture with a transparent hole in the left half
    (u < 0.5 -> alpha 0, else alpha 255)."""
    img = np.full((n, n, 4), 255, np.uint8)
    img[:, : n // 2, 3] = 0
    return img


@pytest.fixture(scope="module")
def cutout_scene():
    # front quad (z=0) with the cutout texture; back quad (z=2) opaque red
    def quad(z, m):
        return {
            "positions": np.asarray(
                [[-1, -1, z], [1, -1, z], [1, 1, z], [-1, 1, z]], np.float32),
            "normals": np.tile(np.asarray([[0, 0, -1]], np.float32), (4, 1)),
            "uv0": np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32),
            "indices": np.asarray([[0, 1, 2], [0, 2, 3]], np.int32),
            "material": m,
        }

    geom = build_geometry([quad(0.0, 0), quad(2.0, 1)])
    table = make_table([
        {"base_color": [1, 1, 1, 1], "alpha_mode": ALPHA_MASK,
         "alpha_cutoff": 0.5, "texture_index": [0, -1, -1, -1, -1, -1, -1]},
        {"base_color": [1, 0, 0, 1]},
    ])
    tex = [cutout_texture()]
    scene = make_scene(geom, table, textures=tex, texture_srgb=[False])
    tracer = tracer_mod.build_for_scene(scene, textures=tex,
                                        texture_srgb=[False])
    return scene, tracer


def _rays(xs):
    n = len(xs)
    o = Vec3(jnp.asarray(xs, jnp.float32), jnp.zeros(n), jnp.full((n,), -5.0))
    d = Vec3(jnp.zeros(n), jnp.zeros(n), jnp.ones(n))
    return o, d


def test_alpha_test_flag_set(cutout_scene):
    _, tracer = cutout_scene
    assert tracer.alpha_test


def test_closest_hit_pierces_cutout(cutout_scene):
    _, tracer = cutout_scene
    # x < 0 maps to u < 0.5 (transparent); x > 0 is opaque
    o, d = _rays([-0.5, 0.5])
    hit = tracer.closest_hit(o, d, jnp.zeros(2), jnp.full((2,), jnp.inf))
    t = np.asarray(hit.t)
    assert abs(t[0] - 7.0) < 1e-3, t   # through the hole -> back quad (z=2)
    assert abs(t[1] - 5.0) < 1e-3, t   # opaque half -> front quad (z=0)
    tri = np.asarray(hit.tri)
    assert tri[0] >= 2 and tri[1] < 2  # back quad tris are 2,3


def test_shadow_ray_through_cutout(cutout_scene):
    _, tracer = cutout_scene
    o, d = _rays([-0.5, 0.5])
    # shadow segment ending before the back quad
    occ = np.asarray(tracer.any_hit(o, d, jnp.zeros(2), jnp.full((2,), 6.0)))
    assert not occ[0]   # hole: unoccluded
    assert occ[1]       # opaque half occludes


def test_miss_stays_miss(cutout_scene):
    _, tracer = cutout_scene
    o = Vec3(jnp.asarray([5.0]), jnp.zeros(1), jnp.full((1,), -5.0))
    d = Vec3(jnp.zeros(1), jnp.zeros(1), jnp.ones(1))
    hit = tracer.closest_hit(o, d, jnp.zeros(1), jnp.full((1,), jnp.inf))
    assert not bool(np.asarray(hit.mask)[0])
