"""Texture atlas + bilinear sampling — software samplers for material maps.

The reference samples 7 material texture slots through hardware samplers and
bindless heaps (reference: Shaders/ShadingHelpers.hlsli:53-157 `Sample<T>`,
Source/Material.ixx:23-33 texture map slots, Source/TextureHelpers.ixx
loaders). TPUs have no samplers, so (SURVEY.md §7 hard part #4):

  * every texture (any size) is packed into ONE flat QUAD-ROW array: per
    texel position one (4,) uint32 row [p00, p10, p01, p11] — the texel
    AND its wrap-resolved 2x2 neighborhood, each RGBA8-packed in a u32 —
    plus a per-texture descriptor table (offset, width, height,
    wrap|srgb<<1). The bindless-heap equivalent;
  * a full bilinear tap is then ONE 16-byte row gather + in-register
    unpack/lerp (gathers are the expensive op on TPU: ~7 ms per 2M-lane
    scalar gather and rising with row width — the previous 4-f32-texel
    layout needed four row gathers per tap, 8 per trilinear sample);
  * sRGB textures store sRGB-encoded u8 (decoded after unpack), so the
    u8 quantization matches the source precision — the reference's
    BC-compressed textures are coarser than this;
  * texture indices ride the packed shade table, so a material's
    base-color lookup costs one descriptor row plus one quad row.

Texture lookups are opt-in per scene: scenes without textures pay nothing
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
    texels: jnp.ndarray   # (N, 4) u32 quad rows [p00,p10,p01,p11], RGBA8
    desc: jnp.ndarray     # (T, 4) f32: offset, width, height, wrap|srgb<<1
    levels: jnp.ndarray   # (T*MAX_LEVELS, 3) f32: offset, width, height


def _pack_level_quads(m: np.ndarray, wrap: int, srgb: bool) -> np.ndarray:
    """(H, W, 4) f32 LINEAR level -> (H*W, 4) u32 quad rows. sRGB levels
    re-encode before u8 quantization (decode happens after unpack)."""
    from ..native import pack_level_quads as native_pack

    rows = native_pack(m, wrap == WRAP_REPEAT, srgb)
    if rows is not None:
        return rows
    rgb = np.clip(m[..., :3], 0.0, 1.0)
    if srgb:
        rgb = np.where(rgb <= 0.0031308, rgb * 12.92,
                       1.055 * rgb ** (1.0 / 2.4) - 0.055)
    q = np.clip(np.round(
        np.concatenate([rgb, np.clip(m[..., 3:], 0, 1)], -1) * 255.0),
        0, 255).astype(np.uint32)
    packed = (q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16)
              | (q[..., 3] << 24))                         # (H, W)
    h, w = packed.shape
    if wrap == WRAP_REPEAT:
        x1 = (np.arange(w) + 1) % w
        y1 = (np.arange(h) + 1) % h
    else:
        x1 = np.minimum(np.arange(w) + 1, w - 1)
        y1 = np.minimum(np.arange(h) + 1, h - 1)
    return np.stack([packed, packed[:, x1], packed[y1, :],
                     packed[y1][:, x1]], -1).reshape(-1, 4)


def _unpack(q: jnp.ndarray, srgb: jnp.ndarray) -> jnp.ndarray:
    """(R,) u32 RGBA8 -> (R, 4) f32 linear (sRGB decode where flagged)."""
    r = (q & 0xFF).astype(jnp.float32) / 255.0
    g = ((q >> 8) & 0xFF).astype(jnp.float32) / 255.0
    b = ((q >> 16) & 0xFF).astype(jnp.float32) / 255.0
    a = ((q >> 24) & 0xFF).astype(jnp.float32) / 255.0
    rgb = jnp.stack([r, g, b], -1)
    lin = jnp.where(rgb <= 0.04045, rgb / 12.92,
                    ((rgb + 0.055) / 1.055) ** 2.4)
    rgb = jnp.where(srgb[:, None], lin, rgb)
    return jnp.concatenate([rgb, a[:, None]], -1)


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
        is_srgb = bool(srgb[i]) if srgb else False
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 255.0
            if is_srgb:
                rgb = np.where(arr[..., :3] <= 0.04045, arr[..., :3] / 12.92,
                               ((arr[..., :3] + 0.055) / 1.055) ** 2.4)
                arr = np.concatenate([rgb, arr[..., 3:]], -1)
        if arr.shape[-1] == 3:
            arr = np.concatenate(
                [arr, np.ones((*arr.shape[:-1], 1), np.float32)], -1)
        chain = (build_mip_chain(arr, MAX_LEVELS) if mips
                 else [arr.astype(np.float32)])
        h, w = arr.shape[:2]
        desc.append([offset, w, h, wrap | (2 if is_srgb else 0)])
        lv = []
        for m in chain:
            mh, mw = m.shape[:2]
            lv.append([offset, mw, mh])
            texels.append(_pack_level_quads(m, wrap, is_srgb))
            offset += mh * mw
        while len(lv) < MAX_LEVELS:   # clamp: repeat the coarsest level
            lv.append(lv[-1])
        levels.append(lv[:MAX_LEVELS])
    if not texels:
        texels = [np.zeros((1, 4), np.uint32)]
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
    Returns (rgb: Vec3, alpha: (R,)). ONE quad-row gather."""
    d = atlas.desc[jnp.maximum(tex_index, 0)]  # (R, 4) row gather
    wrap = jnp.mod(d[:, 3], 2.0)
    srgb = d[:, 3] >= 2.0
    t = _bilinear_tap(atlas.texels, d[:, 0], d[:, 1], d[:, 2], wrap, srgb,
                      u, v)
    return Vec3(t[:, 0], t[:, 1], t[:, 2]), t[:, 3]


def _bilinear_tap(texels, off, w, h, wrap, srgb, u, v):
    """One bilinear fetch against an explicit level descriptor: a single
    quad-row gather (the 2x2 neighborhood is baked per texel at build)."""
    def address(coord, size):
        repeat = coord - jnp.floor(coord)
        clamp = jnp.clip(coord, 0.0, 1.0)
        c = jnp.where(wrap == WRAP_REPEAT, repeat, clamp)
        x = c * size - 0.5
        # CLAMP: keep the base texel in range so the baked edge-clamped
        # neighbor reproduces clamp-bilinear exactly; REPEAT wraps below.
        return jnp.where(wrap == WRAP_REPEAT, x,
                         jnp.clip(x, 0.0, size - 1.0))

    x = address(u, w)
    y = address(v, h)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    xi = jnp.where(wrap == WRAP_REPEAT, jnp.mod(x0, w), x0)
    yi = jnp.where(wrap == WRAP_REPEAT, jnp.mod(y0, h), y0)
    idx = (off + yi * w + xi).astype(jnp.int32)
    rows = texels[idx]                          # (R, 4) u32 — ONE gather
    t00 = _unpack(rows[:, 0], srgb)
    t10 = _unpack(rows[:, 1], srgb)
    t01 = _unpack(rows[:, 2], srgb)
    t11 = _unpack(rows[:, 3], srgb)
    wx = fx[:, None]
    wy = fy[:, None]
    return (t00 * (1 - wx) * (1 - wy) + t10 * wx * (1 - wy)
            + t01 * (1 - wx) * wy + t11 * wx * wy)


def sample_lod(atlas: TextureAtlas, tex_index: jnp.ndarray,
               u: jnp.ndarray, v: jnp.ndarray, lod: jnp.ndarray):
    """Trilinear sample at a per-lane mip level (hardware SampleLevel
    analogue; reference samples material maps through a linear-mip sampler,
    Shaders/ShadingHelpers.hlsli:53-157). lod in levels; clamped to the
    chain. 2 quad-row gathers + 3 descriptor gathers."""
    ti = jnp.maximum(tex_index, 0)
    flags = atlas.desc[ti][:, 3]
    wrap = jnp.mod(flags, 2.0)
    srgb = flags >= 2.0
    lod = jnp.clip(lod, 0.0, MAX_LEVELS - 1.0)
    l0 = jnp.floor(lod)
    fl = (lod - l0)[:, None]
    base = ti * MAX_LEVELS + l0.astype(jnp.int32)
    d0 = atlas.levels[base]
    d1 = atlas.levels[jnp.minimum(base + 1, ti * MAX_LEVELS + MAX_LEVELS - 1)]
    texels = atlas.texels
    t0 = _bilinear_tap(texels, d0[:, 0], d0[:, 1], d0[:, 2], wrap, srgb,
                       u, v)
    t1 = _bilinear_tap(texels, d1[:, 0], d1[:, 1], d1[:, 2], wrap, srgb,
                       u, v)
    t = t0 * (1.0 - fl) + t1 * fl
    return Vec3(t[:, 0], t[:, 1], t[:, 2]), t[:, 3]


def sample_nearest(atlas: TextureAtlas, tex_index: jnp.ndarray,
                   u: jnp.ndarray, v: jnp.ndarray):
    """Nearest sample (1 gather) — the cheap path for alpha tests."""
    d = atlas.desc[jnp.maximum(tex_index, 0)]
    off = d[:, 0]
    w = d[:, 1]
    h = d[:, 2]
    srgb = d[:, 3] >= 2.0
    ur = u - jnp.floor(u)
    vr = v - jnp.floor(v)
    xi = jnp.clip(jnp.floor(ur * w), 0, w - 1)
    yi = jnp.clip(jnp.floor(vr * h), 0, h - 1)
    idx = (off + yi * w + xi).astype(jnp.int32)
    t = _unpack(atlas.texels[idx][:, 0], srgb)
    return Vec3(t[:, 0], t[:, 1], t[:, 2]), t[:, 3]
