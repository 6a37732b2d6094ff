"""Texture atlas + bilinear sampling — software samplers for material maps.

The reference samples 7 material texture slots through hardware samplers and
bindless heaps (reference: Shaders/ShadingHelpers.hlsli:53-157 `Sample<T>`,
Source/Material.ixx:23-33 texture map slots, Source/TextureHelpers.ixx
loaders). TPUs have no samplers, so (SURVEY.md §7 hard part #4):

  * every texture (any size) is packed into ONE flat f32 array `texels`
    (RGBA interleaved) plus a per-texture descriptor table (offset, width,
    height) — the bindless heap equivalent;
  * sampling = address math + 4 gathers from the flat array per channel
    block (bilinear), wrap/clamp handled in math;
  * texture indices ride the packed shade table, so a material's base-color
    lookup costs one descriptor row plus the texel gathers.

Gathers are the expensive op on TPU (~5 ms per 2M-lane row gather), so
texture lookups are opt-in per scene: scenes without textures pay nothing
(the tracer's `textured` flag is static under jit).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from .vec import Vec3

WRAP_REPEAT = 0
WRAP_CLAMP = 1

# fixed mip-descriptor depth: covers 4096x4096 (level 12 = 1x1); deeper
# chains clamp to the last built level
MAX_LEVELS = 13


class TextureAtlas(NamedTuple):
    texels: jnp.ndarray   # (N, 4) f32 linear-light RGBA, all textures+mips
    desc: jnp.ndarray     # (T, 4) f32: offset, width, height, wrap (level 0)
    levels: jnp.ndarray   # (T*MAX_LEVELS, 3) f32: offset, width, height


def build_atlas(images: list[np.ndarray], srgb: list[bool] | None = None,
                wrap: int = WRAP_REPEAT, mips: bool = True) -> TextureAtlas:
    """images: list of (H, W, 4) uint8 or float arrays.

    Each texture's full box-filtered mip pyramid is packed after its level 0
    (the MipmapGeneration.hlsl analogue runs at atlas build on the host);
    `levels` is the flattened per-texture per-level descriptor table the
    trilinear sampler gathers from."""
    from ..utils.texture_io import build_mip_chain

    texels = []
    desc = []
    levels = []
    offset = 0
    for i, img in enumerate(images):
        arr = np.asarray(img)
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 255.0
            if srgb and srgb[i]:
                rgb = np.where(arr[..., :3] <= 0.04045, arr[..., :3] / 12.92,
                               ((arr[..., :3] + 0.055) / 1.055) ** 2.4)
                arr = np.concatenate([rgb, arr[..., 3:]], -1)
        if arr.shape[-1] == 3:
            arr = np.concatenate(
                [arr, np.ones((*arr.shape[:-1], 1), np.float32)], -1)
        chain = (build_mip_chain(arr, MAX_LEVELS) if mips
                 else [arr.astype(np.float32)])
        h, w = arr.shape[:2]
        desc.append([offset, w, h, wrap])
        lv = []
        for m in chain:
            mh, mw = m.shape[:2]
            lv.append([offset, mw, mh])
            texels.append(m.reshape(-1, 4).astype(np.float32))
            offset += mh * mw
        while len(lv) < MAX_LEVELS:   # clamp: repeat the coarsest level
            lv.append(lv[-1])
        levels.append(lv[:MAX_LEVELS])
    if not texels:
        texels = [np.zeros((1, 4), np.float32)]
        desc = [[0, 1, 1, wrap]]
        levels = [[[0, 1, 1]] * MAX_LEVELS]
    return TextureAtlas(
        texels=jnp.asarray(np.concatenate(texels)),
        desc=jnp.asarray(np.asarray(desc, np.float32)),
        levels=jnp.asarray(
            np.asarray(levels, np.float32).reshape(-1, 3)),
    )


def sample_bilinear(atlas: TextureAtlas, tex_index: jnp.ndarray,
                    u: jnp.ndarray, v: jnp.ndarray):
    """Bilinear RGBA sample; tex_index (R,) i32 (>=0; caller masks).
    Returns (rgb: Vec3, alpha: (R,))."""
    d = atlas.desc[jnp.maximum(tex_index, 0)]  # (R, 4) row gather
    off = d[:, 0]
    w = d[:, 1]
    h = d[:, 2]
    wrap = d[:, 3]

    def address(coord, size):
        repeat = coord - jnp.floor(coord)
        clamp = jnp.clip(coord, 0.0, 1.0)
        c = jnp.where(wrap == WRAP_REPEAT, repeat, clamp)
        return c * size - 0.5

    x = address(u, w)
    y = address(v, h)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def wrap_i(i, size):
        rep = jnp.mod(i, size)
        clp = jnp.clip(i, 0.0, size - 1.0)
        return jnp.where(wrap == WRAP_REPEAT, rep, clp)

    texels = atlas.texels

    def tap(xi, yi):
        idx = (off + wrap_i(yi, h) * w + wrap_i(xi, w)).astype(jnp.int32)
        t = texels[idx]  # (R, 4) wide row gather
        return t

    t00 = tap(x0, y0)
    t01 = tap(x0 + 1, y0)
    t10 = tap(x0, y0 + 1)
    t11 = tap(x0 + 1, y0 + 1)
    wx = fx[:, None]
    wy = fy[:, None]
    t = (t00 * (1 - wx) * (1 - wy) + t01 * wx * (1 - wy)
         + t10 * (1 - wx) * wy + t11 * wx * wy)
    return Vec3(t[:, 0], t[:, 1], t[:, 2]), t[:, 3]


def _bilinear_tap(texels, off, w, h, wrap, u, v):
    """One bilinear fetch against an explicit level descriptor."""
    def address(coord, size):
        repeat = coord - jnp.floor(coord)
        clamp = jnp.clip(coord, 0.0, 1.0)
        c = jnp.where(wrap == WRAP_REPEAT, repeat, clamp)
        return c * size - 0.5

    x = address(u, w)
    y = address(v, h)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def wrap_i(i, size):
        rep = jnp.mod(i, size)
        clp = jnp.clip(i, 0.0, size - 1.0)
        return jnp.where(wrap == WRAP_REPEAT, rep, clp)

    def tap(xi, yi):
        idx = (off + wrap_i(yi, h) * w + wrap_i(xi, w)).astype(jnp.int32)
        return texels[idx]

    t00 = tap(x0, y0)
    t01 = tap(x0 + 1, y0)
    t10 = tap(x0, y0 + 1)
    t11 = tap(x0 + 1, y0 + 1)
    wx = fx[:, None]
    wy = fy[:, None]
    return (t00 * (1 - wx) * (1 - wy) + t01 * wx * (1 - wy)
            + t10 * (1 - wx) * wy + t11 * wx * wy)


def sample_lod(atlas: TextureAtlas, tex_index: jnp.ndarray,
               u: jnp.ndarray, v: jnp.ndarray, lod: jnp.ndarray):
    """Trilinear sample at a per-lane mip level (hardware SampleLevel
    analogue; reference samples material maps through a linear-mip sampler,
    Shaders/ShadingHelpers.hlsli:53-157). lod in levels; clamped to the
    chain. 8 texel gathers + 2 descriptor gathers."""
    ti = jnp.maximum(tex_index, 0)
    wrap = atlas.desc[ti][:, 3]
    lod = jnp.clip(lod, 0.0, MAX_LEVELS - 1.0)
    l0 = jnp.floor(lod)
    fl = (lod - l0)[:, None]
    base = ti * MAX_LEVELS + l0.astype(jnp.int32)
    d0 = atlas.levels[base]
    d1 = atlas.levels[jnp.minimum(base + 1, ti * MAX_LEVELS + MAX_LEVELS - 1)]
    texels = atlas.texels
    t0 = _bilinear_tap(texels, d0[:, 0], d0[:, 1], d0[:, 2], wrap, u, v)
    t1 = _bilinear_tap(texels, d1[:, 0], d1[:, 1], d1[:, 2], wrap, u, v)
    t = t0 * (1.0 - fl) + t1 * fl
    return Vec3(t[:, 0], t[:, 1], t[:, 2]), t[:, 3]


def sample_nearest(atlas: TextureAtlas, tex_index: jnp.ndarray,
                   u: jnp.ndarray, v: jnp.ndarray):
    """Nearest sample (1 gather) — the cheap path for alpha tests."""
    d = atlas.desc[jnp.maximum(tex_index, 0)]
    off = d[:, 0]
    w = d[:, 1]
    h = d[:, 2]
    ur = u - jnp.floor(u)
    vr = v - jnp.floor(v)
    xi = jnp.clip(jnp.floor(ur * w), 0, w - 1)
    yi = jnp.clip(jnp.floor(vr * h), 0, h - 1)
    idx = (off + yi * w + xi).astype(jnp.int32)
    t = atlas.texels[idx]
    return Vec3(t[:, 0], t[:, 1], t[:, 2]), t[:, 3]
