"""Physically-based bloom: 13-tap Karis-average downsample pyramid + 9-tap
tent upsample + weighted merge.

Mirror of the reference bloom (reference: Shaders/Bloom.hlsl:33-116,
Source/Bloom.ixx:85-131 — 5 mip levels, Karis average on mip 0 to kill
fireflies, tent radius 5e-3, final merge input*(1-s)+blur*s). Image-space
stencils map directly to TPU vector ops.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import math as pmath

NUM_MIPS = 5
DEFAULT_STRENGTH = 0.05  # reference default (MyAppData.h:305-330)


def _sample_bilinear(img, u, v):
    """Bilinear at normalized coords; u/v are (h', w') grids."""
    h, w = img.shape[:2]
    x = jnp.clip(u * w - 0.5, 0.0, w - 1.001)
    y = jnp.clip(v * h - 0.5, 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    return (
        img[y0, x0] * (1 - fx) * (1 - fy)
        + img[y0, x0 + 1] * fx * (1 - fy)
        + img[y0 + 1, x0] * (1 - fx) * fy
        + img[y0 + 1, x0 + 1] * fx * fy
    )


def _grid(h, w):
    v, u = jnp.meshgrid(
        (jnp.arange(h, dtype=jnp.float32) + 0.5) / h,
        (jnp.arange(w, dtype=jnp.float32) + 0.5) / w,
        indexing="ij",
    )
    return u, v


def _downsample13(img: jnp.ndarray, karis: bool) -> jnp.ndarray:
    """13-tap (4 corner quads + center cross) downsample to half res
    (Bloom.hlsl downsample kernel; Karis weighting on the first mip)."""
    h, w = img.shape[:2]
    oh, ow = max(h // 2, 1), max(w // 2, 1)
    u, v = _grid(oh, ow)
    du, dv = 1.0 / w, 1.0 / h

    def tap(ou, ov):
        return _sample_bilinear(img, u + ou * du, v + ov * dv)

    # quads (each a bilinear tap at half-texel offsets) + center weights
    a = tap(-2, -2); b = tap(0, -2); c = tap(2, -2)
    d = tap(-2, 0); e = tap(0, 0); f = tap(2, 0)
    g = tap(-2, 2); hh = tap(0, 2); i = tap(2, 2)
    j = tap(-1, -1); k = tap(1, -1); l = tap(-1, 1); m = tap(1, 1)

    if karis:
        def kw(x):
            return 1.0 / (1.0 + pmath.luminance(x))[..., None]
        g0 = (a + b + d + e) * 0.25
        g1 = (b + c + e + f) * 0.25
        g2 = (d + e + g + hh) * 0.25
        g3 = (e + f + hh + i) * 0.25
        g4 = (j + k + l + m) * 0.25
        w0, w1, w2, w3, w4 = kw(g0), kw(g1), kw(g2), kw(g3), kw(g4)
        out = (g0 * w0 + g1 * w1 + g2 * w2 + g3 * w3) * 0.125 + g4 * w4 * 0.5
        wsum = (w0 + w1 + w2 + w3) * 0.125 + w4 * 0.5
        return out / jnp.maximum(wsum, 1e-8)
    center = e * 0.125
    corners = (a + c + g + i) * 0.03125
    edges = (b + d + f + hh) * 0.0625
    inner = (j + k + l + m) * 0.125
    return center + corners + edges + inner


def _upsample_tent(img: jnp.ndarray, oh: int, ow: int, radius: float) -> jnp.ndarray:
    """9-tap tent-filter upsample (Bloom.hlsl upsample kernel)."""
    u, v = _grid(oh, ow)

    def tap(ou, ov, wgt):
        return _sample_bilinear(img, u + ou * radius, v + ov * radius) * wgt

    return (
        tap(-1, -1, 1 / 16) + tap(0, -1, 2 / 16) + tap(1, -1, 1 / 16)
        + tap(-1, 0, 2 / 16) + tap(0, 0, 4 / 16) + tap(1, 0, 2 / 16)
        + tap(-1, 1, 1 / 16) + tap(0, 1, 2 / 16) + tap(1, 1, 1 / 16)
    )


def apply(img: jnp.ndarray, strength: float = DEFAULT_STRENGTH,
          radius: float = 5e-3, mips: int = NUM_MIPS) -> jnp.ndarray:
    """Bloom: build pyramid, collapse with tent upsamples, blend
    input*(1-s) + blur*s (Bloom.ixx:85-131)."""
    levels = [img]
    x = img
    for i in range(mips):
        x = _downsample13(x, karis=(i == 0))
        levels.append(x)

    blur = levels[-1]
    for i in range(mips - 1, 0, -1):
        target = levels[i]
        blur = target + _upsample_tent(blur, target.shape[0], target.shape[1], radius)
    blur = _upsample_tent(blur, img.shape[0], img.shape[1], radius)
    return img * (1.0 - strength) + blur * strength
