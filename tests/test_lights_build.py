"""Light-table build + environment sampling quality.

Covers the two light-quality parity items: bilinear environment texture
sampling (reference: Shaders/ShadingHelpers.hlsli:11-30 — hardware linear
sampler) and emissive-texture power integration for triangle lights
(reference: Shaders/LightPreparation.hlsl:88-127)."""

import numpy as np
import jax.numpy as jnp

from tpu_pbrt.models.material import make_table
from tpu_pbrt.models.mesh import build_geometry
from tpu_pbrt.models.scene import (
    collect_emissive_lights, environment_radiance, make_environment,
)
from tpu_pbrt.ops.vec import Vec3


def _dirs(n=64, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2]))


def test_env_bilinear_constant_texture_exact():
    tex = np.full((8, 16, 3), 0.625, np.float32)
    env = make_environment(texture=tex)
    out = environment_radiance(env, _dirs())
    for c in (out.x, out.y, out.z):
        np.testing.assert_allclose(np.asarray(c), 0.625, rtol=1e-6)


def test_env_bilinear_interpolates_between_texels():
    # one bright column in an otherwise black map: bilinear must produce
    # intermediate values for directions that land between texel centers
    tex = np.zeros((4, 32, 3), np.float32)
    tex[:, 7] = 1.0
    env = make_environment(texture=tex)
    h, w = 4, 32
    # sweep directions whose u spans texels 6..8 at the equator
    us = np.linspace(6.0 / w, 9.0 / w, 64).astype(np.float32)
    phi = (us * 2.0 - 1.0) * np.pi
    d = Vec3(jnp.asarray(np.sin(phi)), jnp.zeros(64), jnp.asarray(np.cos(phi)))
    vals = np.asarray(environment_radiance(env, d).x)
    assert vals.max() > 0.9
    # fractional values exist (nearest-neighbor would be only {0, 1})
    frac = (vals > 0.05) & (vals < 0.95)
    assert frac.sum() >= 8


def _quad_light_geometry():
    quad = {
        "positions": np.asarray(
            [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32),
        "normals": np.tile(np.asarray([[0, 0, 1]], np.float32), (4, 1)),
        "uv0": np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32),
        "indices": np.asarray([[0, 1, 2], [0, 2, 3]], np.int32),
        "material": 0,
    }
    return build_geometry([quad])


def test_emissive_texture_scales_power():
    geom = _quad_light_geometry()
    table = make_table([{
        "emissive_color": [2.0, 2.0, 2.0],
        "texture_index": [-1, 0, -1, -1, -1, -1, -1],  # emissive slot
    }])
    # left half black, right half white (linear flag: no sRGB decode)
    tex = np.zeros((8, 8, 3), np.uint8)
    tex[:, 4:] = 255
    lit = collect_emissive_lights(geom, table, textures=[tex],
                                  texture_srgb=[False])
    flat = collect_emissive_lights(geom, table)
    assert int(lit.count) == 2 and int(flat.count) == 2
    ratio = float(np.asarray(lit.power).sum() / np.asarray(flat.power).sum())
    assert 0.35 < ratio < 0.65  # ~half the map is black
    # per-triangle radiance reflects each triangle's own UV coverage
    assert not np.allclose(np.asarray(lit.radiance), np.asarray(flat.radiance))


def test_emissive_texture_srgb_decode():
    geom = _quad_light_geometry()
    table = make_table([{
        "emissive_color": [1.0, 1.0, 1.0],
        "texture_index": [-1, 0, -1, -1, -1, -1, -1],
    }])
    tex = np.full((4, 4, 3), 128, np.uint8)  # 0.502 sRGB -> ~0.2158 linear
    srgb = collect_emissive_lights(geom, table, textures=[tex],
                                   texture_srgb=[True])
    lin = collect_emissive_lights(geom, table, textures=[tex],
                                  texture_srgb=[False])
    r_srgb = float(np.asarray(srgb.radiance)[0, 0])
    r_lin = float(np.asarray(lin.radiance)[0, 0])
    assert abs(r_srgb - 0.2158) < 0.01
    assert abs(r_lin - 128.0 / 255.0) < 0.01
