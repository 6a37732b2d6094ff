"""Physically-based bloom: 13-tap Karis-average downsample pyramid + 9-tap
tent upsample + weighted merge.

Mirror of the reference bloom (reference: Shaders/Bloom.hlsl:33-116,
Source/Bloom.ixx:85-131 — 5 mip levels, Karis average on mip 0 to kill
fireflies, tent radius 5e-3, final merge input*(1-s)+blur*s).

TPU form: the original coordinate-grid bilinear taps lowered to ELEMENT
gathers (~110 of them across the pyramid — profiled at ~0.9 s/frame at
1080p, 21% of the whole App graph). Every tap here is re-expressed
gather-free:

  * downsample taps sit at exact half-texel offsets of the 2x grid, so
    each is the mean of a 2x2 block at constant integer offsets —
    pad + strided slices, pure vector ops;
  * upsampling separates into a bilinear RESIZE (separable row/column
    takes with static index vectors — two coarse row-gathers instead of
    h*w element gathers) followed by the 9 tent taps as constant
    fractional SHIFTS (pad + slice blends with scalar weights).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import math as pmath

NUM_MIPS = 5
DEFAULT_STRENGTH = 0.05  # reference default (MyAppData.h:305-330)


def _downsample13(img: jnp.ndarray, karis: bool) -> jnp.ndarray:
    """13-tap (4 corner quads + center cross) downsample to half res
    (Bloom.hlsl downsample kernel; Karis weighting on the first mip).
    Each tap = the 2x2 mean at a constant texel offset (strided slices)."""
    h, w = img.shape[:2]
    oh, ow = max(h // 2, 1), max(w // 2, 1)
    # pad so offsets in [-2, +3] index validly (edge = coordinate clamp)
    p = jnp.pad(img, ((2, 4), (2, 4), (0, 0)), mode="edge")

    def tap(ou, ov):
        # contiguous slice + pairwise-sum pooling: a stride-2 slice along
        # the lane axis lowers to per-element gathers (~17 ms each at
        # 1080p on v5e) while this reshape-sum pool measures ~0.5 ms
        ys, xs = 2 + ov, 2 + ou
        s = p[ys:ys + 2 * oh, xs:xs + 2 * ow]
        s = s.reshape(2 * oh, ow, 2, s.shape[-1]).sum(2)
        s = s.reshape(oh, 2, ow, s.shape[-1]).sum(1)
        return 0.25 * s

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


def _upsample2x(img: jnp.ndarray, rows: bool = True,
                cols: bool = True) -> jnp.ndarray:
    """Exact 2x bilinear upsample, fully gather-free: each output pair is a
    constant (0.25, 0.75) blend of neighbors (half-texel grid alignment,
    identical to the bilinear resize at ratio exactly 2), realized as
    shift + stack + reshape. A `take` along the 128-wide lane axis lowers
    to per-element gathers (~12.5 ms each at 1080p — profiled as the top
    bloom/TAA cost); this form is pure vector memory ops."""
    from .denoise import _shift2d

    if rows:
        prev = _shift2d(img, -1, 0)
        nxt = _shift2d(img, 1, 0)
        even = 0.25 * prev + 0.75 * img
        odd = 0.75 * img + 0.25 * nxt
        img = jnp.stack([even, odd], axis=1).reshape(
            (img.shape[0] * 2,) + img.shape[1:])
    if cols:
        prev = _shift2d(img, 0, -1)
        nxt = _shift2d(img, 0, 1)
        even = 0.25 * prev + 0.75 * img
        odd = 0.75 * img + 0.25 * nxt
        img = jnp.stack([even, odd], axis=2).reshape(
            img.shape[:1] + (img.shape[1] * 2,) + img.shape[2:])
    return img


def _near_doubling(target: int, size: int) -> bool:
    """Can `size` reach `target` by 2x doublings plus a <=1 texel fixup?"""
    if target < size:
        return False
    while size < target - 1:
        size *= 2
    return abs(target - size) <= 1


def _resize_bilinear(img: jnp.ndarray, oh: int, ow: int) -> jnp.ndarray:
    """Bilinear resize. Production ratios (TAA upscale at SR 0.5/0.25 and
    every bloom pyramid level) take the gather-free exact-2x doubling
    path (with a <=1 row/col edge fixup for odd levels); anything else
    falls back to the separable take-based form."""
    h, w = img.shape[:2]
    if (oh, ow) == (h, w):
        return img
    if _near_doubling(oh, h) and _near_doubling(ow, w):
        out = img
        while out.shape[0] < oh - 1 or out.shape[1] < ow - 1:
            out = _upsample2x(out, rows=out.shape[0] < oh - 1,
                              cols=out.shape[1] < ow - 1)
        out = out[:oh, :ow]
        ph, pw = oh - out.shape[0], ow - out.shape[1]
        if ph or pw:
            out = jnp.pad(out, ((0, ph), (0, pw)) + ((0, 0),) * (out.ndim - 2),
                          mode="edge")
        return out
    ys = (np.arange(oh, dtype=np.float32) + 0.5) / oh * h - 0.5
    xs = (np.arange(ow, dtype=np.float32) + 0.5) / ow * w - 0.5
    ys = np.clip(ys, 0.0, h - 1.001)
    xs = np.clip(xs, 0.0, w - 1.001)
    y0 = ys.astype(np.int32)
    x0 = xs.astype(np.int32)
    fy = jnp.asarray((ys - y0)[:, None, None])
    fx = jnp.asarray((xs - x0)[None, :, None])
    rows = (jnp.take(img, y0, axis=0) * (1 - fy)
            + jnp.take(img, np.minimum(y0 + 1, h - 1), axis=0) * fy)
    return (jnp.take(rows, x0, axis=1) * (1 - fx)
            + jnp.take(rows, np.minimum(x0 + 1, w - 1), axis=1) * fx)


def _shift(img: jnp.ndarray, dy: float, dx: float) -> jnp.ndarray:
    """Bilinear sample of `img` at a constant fractional pixel offset —
    four edge-padded slices blended with scalar weights."""
    h, w = img.shape[:2]
    iy, ix = int(np.floor(dy)), int(np.floor(dx))
    fy, fx = dy - iy, dx - ix
    my, mx = max(abs(iy) + 1, 1), max(abs(ix) + 1, 1)
    p = jnp.pad(img, ((my, my + 1), (mx, mx + 1), (0, 0)), mode="edge")

    def sl(oy, ox):
        return p[my + oy:my + oy + h, mx + ox:mx + ox + w]

    return (sl(iy, ix) * (1 - fy) * (1 - fx)
            + sl(iy, ix + 1) * (1 - fy) * fx
            + sl(iy + 1, ix) * fy * (1 - fx)
            + sl(iy + 1, ix + 1) * fy * fx)


def _upsample_tent(img: jnp.ndarray, oh: int, ow: int,
                   radius: float) -> jnp.ndarray:
    """9-tap tent-filter upsample (Bloom.hlsl upsample kernel): resize to
    the target, then tent taps as constant pixel shifts (radius is in
    normalized units, as in the reference)."""
    up = _resize_bilinear(img, oh, ow)
    ry = radius * oh
    rx = radius * ow

    def tap(ou, ov, wgt):
        return _shift(up, ov * ry, ou * rx) * wgt

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
        blur = target + _upsample_tent(blur, target.shape[0],
                                       target.shape[1], radius)
    blur = _upsample_tent(blur, img.shape[0], img.shape[1], radius)
    return img * (1.0 - strength) + blur * strength
