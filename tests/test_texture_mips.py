"""Mip-chain atlas + trilinear LOD sampling (the hardware-sampler mip path:
reference Shaders/ShadingHelpers.hlsli:53-157 Sample<T> through linear-mip
samplers, Shaders/MipmapGeneration.hlsl for chain build)."""

import numpy as np
import jax.numpy as jnp

from tpu_pbrt.ops import texture as tex_mod


def checker(n=32, c0=0.0, c1=1.0, cell=1):
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    v = ((xx // cell + yy // cell) % 2).astype(np.float32) * (c1 - c0) + c0
    img = np.stack([v, v, v, np.ones_like(v)], -1)
    return img


def test_atlas_packs_full_mip_chain():
    atlas = tex_mod.build_atlas([checker(16), checker(8)])
    lv = np.asarray(atlas.levels).reshape(2, tex_mod.MAX_LEVELS, 3)
    # level sizes halve down to 1x1, then clamp
    assert tuple(lv[0, 0, 1:]) == (16, 16)
    assert tuple(lv[0, 1, 1:]) == (8, 8)
    assert tuple(lv[0, 4, 1:]) == (1, 1)
    assert tuple(lv[0, 12, 1:]) == (1, 1)
    # every level's span fits inside the texel pool
    n = np.asarray(atlas.texels).shape[0]
    assert all(o + w * h <= n for o, w, h in lv.reshape(-1, 3))
    # desc level-0 row agrees with levels[0]
    d = np.asarray(atlas.desc)
    assert d[1, 0] == lv[1, 0, 0] and d[1, 1] == 8


def test_lod0_matches_bilinear():
    atlas = tex_mod.build_atlas([checker(16)])
    ti = jnp.zeros((64,), jnp.int32)
    u = jnp.linspace(0.05, 0.95, 64)
    v = jnp.linspace(0.9, 0.1, 64)
    rgb_b, a_b = tex_mod.sample_bilinear(atlas, ti, u, v)
    rgb_l, a_l = tex_mod.sample_lod(atlas, ti, u, v, jnp.zeros((64,)))
    np.testing.assert_allclose(np.asarray(rgb_l.x), np.asarray(rgb_b.x),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(a_l), np.asarray(a_b), atol=1e-6)


def test_high_lod_converges_to_mean():
    atlas = tex_mod.build_atlas([checker(16)])   # mean = 0.5
    ti = jnp.zeros((16,), jnp.int32)
    u = jnp.linspace(0.1, 0.9, 16)
    v = jnp.linspace(0.1, 0.9, 16)
    rgb, _ = tex_mod.sample_lod(atlas, ti, u, v, jnp.full((16,), 12.0))
    # atol: the atlas stores RGBA8 (1/255 quantization — matches the
    # reference's u8/BC texture precision)
    np.testing.assert_allclose(np.asarray(rgb.x), 0.5, atol=3e-3)


def test_fractional_lod_interpolates_between_levels():
    # level 0 = checker (point values 0/1), level 1 = flat 0.5
    atlas = tex_mod.build_atlas([checker(16)])
    ti = jnp.zeros((2,), jnp.int32)
    # texel centers so bilinear at level 0 returns the exact texel value
    u = jnp.asarray([0.5 / 16 + 0.0, 0.5 / 16 + 1.0 / 16])
    v = jnp.asarray([0.5 / 16, 0.5 / 16])
    r0, _ = tex_mod.sample_lod(atlas, ti, u, v, jnp.zeros((2,)))
    rh, _ = tex_mod.sample_lod(atlas, ti, u, v, jnp.full((2,), 0.5))
    r1, _ = tex_mod.sample_lod(atlas, ti, u, v, jnp.ones((2,)))
    v0 = np.asarray(r0.x)
    vh = np.asarray(rh.x)
    v1 = np.asarray(r1.x)
    # atol: RGBA8 atlas quantization (1/255)
    np.testing.assert_allclose(v1, 0.5, atol=3e-3)
    np.testing.assert_allclose(vh, 0.5 * (v0 + v1), atol=3e-3)


def test_cone_spread_mips_through_renderer():
    """A distant checkered floor with cone_spread on renders the checker's
    mean; with mips off the same pixels alias (spread of sampled values)."""
    import jax

    from tpu_pbrt.models.material import make_table
    from tpu_pbrt.models.mesh import build_geometry
    from tpu_pbrt.models.scene import make_scene
    from tpu_pbrt.ops import shade_table, tracer as tracer_mod
    from tpu_pbrt.ops.vec import Vec3

    quad = {
        "positions": np.asarray(
            [[-50, 0, -50], [50, 0, -50], [50, 0, 50], [-50, 0, 50]],
            np.float32),
        "normals": np.tile(np.asarray([[0, 1, 0]], np.float32), (4, 1)),
        "uv0": np.asarray([[0, 0], [100, 0], [100, 100], [0, 100]],
                          np.float32),
        "indices": np.asarray([[0, 1, 2], [0, 2, 3]], np.int32),
        "material": 0,
    }
    geom = build_geometry([quad])
    table = make_table([{
        "base_color": [1.0, 1.0, 1.0, 1.0],
        "texture_index": [0, -1, -1, -1, -1, -1, -1],
    }])
    imgs = [np.asarray(checker(32, cell=4) * 255, np.uint8)]
    scene = make_scene(geom, table, textures=imgs, texture_srgb=[False])
    tracer = tracer_mod.build_for_scene(scene, textures=imgs,
                                        texture_srgb=[False])

    # grazing rays from a low camera far across the floor: each pixel's
    # footprint covers many checker cells
    n = 128
    o = Vec3(jnp.zeros(n), jnp.full((n,), 0.5), jnp.zeros(n))
    tgt_x = jnp.linspace(20.0, 40.0, n)
    # z off any texel-row boundary (an exact integer v blends two opposite
    # checker rows to 0.5 for every sample)
    d = Vec3(tgt_x, jnp.zeros(n) - 0.5, jnp.full((n,), 30.27))
    norm = jnp.sqrt(d.x ** 2 + d.y ** 2 + d.z ** 2)
    d = Vec3(d.x / norm, d.y / norm, d.z / norm)

    @jax.jit
    def fetch(spread):
        hit = tracer.closest_hit(o, d, jnp.zeros(n), jnp.full((n,), jnp.inf))
        fp = spread * hit.t
        attrs = shade_table.fetch(tracer.shade_table,
                                  jnp.maximum(hit.tri, 0), o, d)
        return shade_table.apply_textures(
            tracer.atlas, attrs, footprint=fp).base_color.x

    # spread sized to the test's own sample spacing (~0.16 m at t~43):
    # the footprint must cover the distance between neighboring samples
    lod = np.asarray(fetch(jnp.full((n,), 8e-3)))
    raw = np.asarray(fetch(jnp.zeros((n,))))
    # mips: values hug the checker mean; level 0: full-range aliasing
    assert lod.std() < 0.1, lod.std()
    assert raw.std() > 0.3, raw.std()
    np.testing.assert_allclose(lod.mean(), 0.5, atol=0.1)
