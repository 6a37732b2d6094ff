"""Temporal anti-aliasing / upscaling + sharpening.

Capability stand-in for DLSS/XeSS/NIS (reference: Source/Streamline.ixx,
Source/XeSS.ixx — NN upscalers; SURVEY.md §2.3 prescribes a classical
jittered TAA upscale + sharpen kernel). Render at a lower internal
resolution with Halton-jittered cameras, reproject history by motion
vectors, clamp to the 3x3 neighborhood color AABB (variance clipping),
then blend; optional contrast-adaptive sharpen at display resolution.
"""

from __future__ import annotations

import os as _os
from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from .denoise import _bilinear_sample, _shift2d

# uniform-motion fast path headroom: the padded shift serves offsets up
# to this many pixels; larger uniform motion falls back to the gather
_UNIFORM_PAD = 4


def _bilinear_shift(img: jnp.ndarray, mx, my) -> jnp.ndarray:
    """Bilinear sample of `img` at (x + mx, y + my) for SCALAR (traced)
    offsets: edge-replicate pad + two dynamic slices + lerp — pure vector
    ops, no per-lane gather. Matches `_bilinear_sample`'s interior math
    (f16 taps, f32 blend); edges replicate-clamp like its coordinate
    clip. Offsets must satisfy |m| <= _UNIFORM_PAD (caller guards)."""
    h, w = img.shape[:2]
    p = _UNIFORM_PAD
    mx = jnp.clip(mx, -p, p)
    my = jnp.clip(my, -p, p)
    x0 = jnp.floor(mx).astype(jnp.int32)
    y0 = jnp.floor(my).astype(jnp.int32)
    fx = (mx - x0).astype(jnp.float32)
    fy = (my - y0).astype(jnp.float32)
    pad = jnp.pad(img.astype(jnp.float16),
                  ((p, p + 1), (p, p + 1), (0, 0)), mode="edge")

    def tap(dy, dx):
        return lax.dynamic_slice(
            pad, (y0 + p + dy, x0 + p + dx, 0), (h, w, img.shape[2])
        ).astype(jnp.float32)

    p00, p01 = tap(0, 0), tap(0, 1)
    p10, p11 = tap(1, 0), tap(1, 1)
    top = p00 + (p01 - p00) * fx
    bot = p10 + (p11 - p10) * fx
    return top + (bot - top) * fy


class TAAState(NamedTuple):
    history: jnp.ndarray  # (H, W, 3) display-res history
    valid: jnp.ndarray    # () bool-ish f32 — history exists


def init_state(height: int, width: int) -> TAAState:
    return TAAState(history=jnp.zeros((height, width, 3)),
                    valid=jnp.zeros(()))


def _upscale_bilinear(img: jnp.ndarray, oh: int, ow: int) -> jnp.ndarray:
    """Separable bilinear resize with STATIC index vectors — two coarse
    row/column takes instead of per-element gathers (the coordinate-grid
    form profiled as a top TAA cost at 1080p)."""
    from .bloom import _resize_bilinear

    return _resize_bilinear(img, oh, ow)


def resolve(
    state: TAAState,
    color: jnp.ndarray,     # (h, w, 3) current jittered render
    motion: jnp.ndarray,    # (h, w, 2) pixel delta to previous frame
    out_height: int,
    out_width: int,
    blend: float = 0.1,
):
    """One TAA resolve: upscale current frame, reproject display-res
    history, neighborhood-clamp, blend. Returns (output, new state).

    Runs in Reinhard-compressed space (c/(1+c)) so HDR outliers don't bias
    the neighborhood clamp (the classic HDR-TAA energy-loss fix); the
    output is decompressed back to linear."""
    color = color / (1.0 + color)
    up = _upscale_bilinear(color, out_height, out_width)
    scale_y = out_height / color.shape[0]
    scale_x = out_width / color.shape[1]
    motion_up = _upscale_bilinear(motion, out_height, out_width)
    motion_up = motion_up * jnp.asarray([scale_x, scale_y])

    gy, gx = jnp.meshgrid(jnp.arange(out_height, dtype=jnp.float32),
                          jnp.arange(out_width, dtype=jnp.float32),
                          indexing="ij")
    prev_xy = jnp.stack(
        [gx + motion_up[..., 0], gy + motion_up[..., 1]], axis=-1
    )
    # uniform-motion fast path: on static-camera frames every pixel's
    # reprojection offset is the same scalar pair (camera jitter), so
    # the history sample is a padded dynamic-slice SHIFT instead of the
    # (H*W)-lane patch-row gather (~15 ms/frame at 1080p, the top TAA op
    # in bench.py breakdown manylight). One scalar cond picks the path;
    # per-object motion falls back to the exact gather.
    m0x = motion_up[0, 0, 0]
    m0y = motion_up[0, 0, 1]
    # tolerance: the jitter-delta motion of a static frame carries ~1e-3
    # px of fp reprojection noise; 5e-3 px bounds the bilinear-weight
    # error at 0.005 (invisible) while keeping real object motion on the
    # exact gather path
    resid = jnp.max(jnp.abs(motion_up - motion_up[0:1, 0:1, :]))
    uniform = (resid < 5e-3) & (jnp.abs(m0x) < _UNIFORM_PAD - 1) \
        & (jnp.abs(m0y) < _UNIFORM_PAD - 1)
    if _os.environ.get("TPU_PBRT_TAA_UNIFORM", "1") == "0":  # A/B gate
        uniform = jnp.zeros((), bool)
    hist = lax.cond(
        uniform,
        lambda _: _bilinear_shift(state.history, m0x, m0y),
        lambda _: _bilinear_sample(state.history, prev_xy),
        0)

    # neighborhood color clamp (3x3 min/max AABB of the upscaled frame)
    cmin = up
    cmax = up
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            s = _shift2d(up, dy, dx)
            cmin = jnp.minimum(cmin, s)
            cmax = jnp.maximum(cmax, s)
    hist = jnp.clip(hist, cmin, cmax)

    a = jnp.where(state.valid > 0, blend, 1.0)
    out = hist + (up - hist) * a
    new_state = TAAState(history=out, valid=jnp.ones(()))
    out = out / jnp.maximum(1.0 - out, 1e-4)  # decompress to linear
    return out, new_state


def sharpen(img: jnp.ndarray, amount: float = 0.2) -> jnp.ndarray:
    """Contrast-adaptive-ish sharpen (NIS stand-in): unsharp mask with a
    cross Laplacian, clamped to the local neighborhood to avoid ringing."""
    up = _shift2d(img, -1, 0)
    dn = _shift2d(img, 1, 0)
    lf = _shift2d(img, 0, -1)
    rt = _shift2d(img, 0, 1)
    lap = 4.0 * img - up - dn - lf - rt
    out = img + amount * lap
    cmin = jnp.minimum(jnp.minimum(up, dn), jnp.minimum(lf, rt))
    cmin = jnp.minimum(cmin, img)
    cmax = jnp.maximum(jnp.maximum(up, dn), jnp.maximum(lf, rt))
    cmax = jnp.maximum(cmax, img)
    return jnp.clip(out, cmin, cmax)
