"""Temporal accumulation + edge-aware à-trous denoiser (SVGF-class).

Capability stand-in for the reference's NRD ReBLUR/ReLAX denoisers and the
albedo (de)modulation composition pass (reference: Source/NRD.ixx:21-170,
Source/NRDComposition.ixx + Shaders/NRDComposition.hlsl:44-88 — pack =
divide noisy signal by albedo, denoise, unpack = remodulate), per SURVEY.md
§2.3's NRD row. All passes are image-space stencils — ideal TPU work (pure
VPU, fully fused by XLA).

Pipeline per frame:
  1. demodulate: signal / (albedo + eps)
  2. temporal reprojection (motion vectors) + geometry-test history reuse,
     exponential accumulation with per-pixel history length
     (the reference's accumulation/anti-lag, ReBLUR-style)
  3. variance-guided à-trous wavelet filtering, N iterations with growing
     footprint (SVGF, Schied et al. 2017)
  4. remodulate: * albedo
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import math as pmath


class DenoiserState(NamedTuple):
    """History carried across frames (the reference's Previous* textures,
    App.cpp:629-634 history swap)."""
    color: jnp.ndarray      # (H, W, 3) accumulated demodulated radiance
    moments: jnp.ndarray    # (H, W, 2) first/second luminance moments
    depth: jnp.ndarray      # (H, W)
    normal: jnp.ndarray     # (H, W, 3)
    history_len: jnp.ndarray  # (H, W) frames accumulated (0 = invalid)


def init_state(height: int, width: int) -> DenoiserState:
    return DenoiserState(
        color=jnp.zeros((height, width, 3)),
        moments=jnp.zeros((height, width, 2)),
        depth=jnp.full((height, width), jnp.inf),
        normal=jnp.zeros((height, width, 3)),
        history_len=jnp.zeros((height, width)),
    )


def _bilinear_sample(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear reprojection as ONE row gather (img (H, W, C), xy (H, W, 2)
    pixel coords). The naive 4-tap advanced-index form costs four separate
    per-lane gathers (~68 ms at 1080p x 3ch, measured); here each texel
    precomputes its 2x2 patch row (shift+concat, pure vector ops, cast to
    f16 to halve the gathered bytes) so the reprojection is a single
    (H*W, 4C) row gather + an elementwise blend in f32."""
    out, _ = _patch_sample(img, xy)
    return out


def _patch_sample(img: jnp.ndarray, xy: jnp.ndarray, clip_h=None,
                  y_offset=0.0):
    """Returns (bilinear blend, nearest tap) of `img` at `xy` from one
    patch-row gather. `nearest` selects the patch tap with the largest
    bilinear weight (exactly the round() texel).

    Sharded use: `img` may be a halo-extended row band taller than the
    output. `clip_h` is the clamp height in xy's coordinate frame (the
    GLOBAL image height, so the edge arithmetic is bit-identical to the
    single-device path) and `y_offset` converts clamped global rows to
    `img` rows (halo_pad - band_row0). Out-of-band rows index-clamp
    safely; the caller's validity mask discards them."""
    h, w = img.shape[:2]
    c = img.shape[2]
    oh, ow = xy.shape[:2]
    patch = jnp.concatenate(
        [img, _shift2d(img, 0, 1), _shift2d(img, 1, 0), _shift2d(img, 1, 1)],
        axis=-1).astype(jnp.float16).reshape(h * w, 4 * c)
    x = jnp.clip(xy[..., 0], 0.0, w - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, (h if clip_h is None else clip_h) - 1.001)
    y = y + y_offset
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    y0c = jnp.clip(y0, 0, h - 1)
    rows = patch[(y0c * w + x0).reshape(-1)].astype(jnp.float32)
    fx = (x - x0).reshape(-1, 1)
    fy = (y - y0).reshape(-1, 1)
    p00 = rows[:, 0 * c:1 * c]
    p01 = rows[:, 1 * c:2 * c]
    p10 = rows[:, 2 * c:3 * c]
    p11 = rows[:, 3 * c:4 * c]
    blend = (p00 * (1 - fx) * (1 - fy) + p01 * fx * (1 - fy)
             + p10 * (1 - fx) * fy + p11 * fx * fy)
    nearest = jnp.where(
        fy > 0.5, jnp.where(fx > 0.5, p11, p10),
        jnp.where(fx > 0.5, p01, p00))
    return (blend.reshape(oh, ow, c), nearest.reshape(oh, ow, c))


def _nearest_sample(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    h, w = img.shape[:2]
    x = jnp.clip(jnp.round(xy[..., 0]).astype(jnp.int32), 0, w - 1)
    y = jnp.clip(jnp.round(xy[..., 1]).astype(jnp.int32), 0, h - 1)
    return img[y, x]


def temporal_accumulate(
    state: DenoiserState,
    color: jnp.ndarray,        # (H, W, 3) demodulated radiance
    depth: jnp.ndarray,        # (H, W) linear depth
    normal: jnp.ndarray,       # (H, W, 3) shading normal
    motion: jnp.ndarray,       # (H, W, 2) pixel delta to previous frame
    max_history: float = 32.0,
    depth_tolerance: float = 0.05,
    normal_tolerance: float = 0.9,
    halo=None,
):
    """Reproject history via motion vectors, validate with depth/normal
    tests (the reference's disocclusion logic), accumulate.

    With `halo` (multi-chip row bands: {"extend2d", "pad", "row0",
    "total_h"}) all arrays are the local band; history taps ride a halo
    exchange of `pad` boundary rows and reprojections that land beyond
    the halo are rejected exactly like any disocclusion (same contract
    as the ReSTIR temporal halo in parallel/app_mesh.py).

    Returns (accumulated color, variance, new state)."""
    h, w = color.shape[:2]
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    if halo is not None:
        gy = gy + halo["row0"]          # global row coordinates
        total_h = halo["total_h"]
    else:
        total_h = h
    prev_xy = jnp.stack([gx + motion[..., 0], gy + motion[..., 1]], axis=-1)

    # ALL history fields ride ONE patch-row gather (f16 rows): bilinear
    # blend for color/moments, nearest tap for depth/normal/length.
    # Separate per-field sampling cost ~20 per-lane gathers per frame;
    # even the round-2 two-gather packing paid the ~15 ms per-gather
    # base cost twice. Infinity-carrying depth is clamped to a finite
    # sentinel so the f16 cast keeps the disocclusion test semantics.
    packed = jnp.concatenate(
        [state.color, state.moments,
         jnp.minimum(state.depth, 6e4)[..., None], state.normal,
         state.history_len[..., None]], axis=-1)
    packed = jnp.clip(packed, -6e4, 6e4)
    if halo is not None:
        packed = halo["extend2d"](packed, halo["pad"])
        smp_b, smp_n = _patch_sample(
            packed, prev_xy, clip_h=total_h,
            y_offset=halo["pad"] - halo["row0"])
    else:
        smp_b, smp_n = _patch_sample(packed, prev_xy)
    prev_color = smp_b[..., 0:3]
    prev_moments = smp_b[..., 3:5]
    prev_depth = smp_n[..., 5]
    prev_normal = smp_n[..., 6:9]
    prev_len = smp_n[..., 9]

    in_bounds = (
        (prev_xy[..., 0] >= 0) & (prev_xy[..., 0] <= w - 1)
        & (prev_xy[..., 1] >= 0) & (prev_xy[..., 1] <= total_h - 1)
    )
    if halo is not None:
        # beyond-halo reprojection = disocclusion (band-seam contract).
        # Upper bound keeps the full 2x2 bilinear patch (rows y0, y0+1)
        # inside the exchanged halo, so accepted taps are bit-identical
        # to the single-device reprojection.
        in_bounds = in_bounds & (
            (prev_xy[..., 1] >= halo["row0"] - halo["pad"])
            & (prev_xy[..., 1] <= halo["row0"] + h - 1 + halo["pad"] - 1)
        )
    finite = jnp.isfinite(depth) & jnp.isfinite(prev_depth)
    depth_ok = jnp.abs(prev_depth - depth) <= depth_tolerance * jnp.maximum(
        jnp.abs(depth), 1e-3
    )
    normal_ok = pmath.dot(prev_normal, normal) >= normal_tolerance
    valid = in_bounds & finite & depth_ok & normal_ok & (prev_len > 0)

    n = jnp.where(valid, jnp.minimum(prev_len + 1.0, max_history), 1.0)
    alpha = 1.0 / n

    lum = pmath.luminance(color)
    moments = jnp.stack([lum, lum * lum], axis=-1)

    acc_color = jnp.where(
        valid[..., None],
        prev_color + (color - prev_color) * alpha[..., None],
        color,
    )
    acc_moments = jnp.where(
        valid[..., None],
        prev_moments + (moments - prev_moments) * alpha[..., None],
        moments,
    )
    variance = jnp.maximum(acc_moments[..., 1] - acc_moments[..., 0] ** 2, 0.0)
    # young-history variance boost (SVGF: fall back to spatial estimate)
    variance = jnp.where(n < 4.0, jnp.maximum(variance, 1.0), variance)

    new_state = DenoiserState(
        color=acc_color, moments=acc_moments, depth=depth, normal=normal,
        history_len=n,
    )
    return acc_color, variance, new_state


def _shift2d(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift with edge clamp (replicate border) — pad + static slice.

    The obvious `img[ys][:, xs]` index form lowers to per-element GATHERS
    (the axis-1 take walks the 128-wide lane dimension); profiled at
    ~14 ms per fused à-trous tap group at 1080p. Pad+slice is a pure
    vector-memory op XLA fuses for free."""
    h, w = img.shape[:2]
    yb, ya = max(-dy, 0), max(dy, 0)   # pad (before, after) on rows
    xb, xa = max(-dx, 0), max(dx, 0)
    pad = ((yb, ya), (xb, xa)) + ((0, 0),) * (img.ndim - 2)
    p = jnp.pad(img, pad, mode="edge")
    return p[ya:ya + h, xa:xa + w]


# 5-tap B3-spline kernel weights for the à-trous wavelet
_B3 = (1.0 / 16.0, 1.0 / 4.0, 3.0 / 8.0, 1.0 / 4.0, 1.0 / 16.0)


def atrous_filter(
    color: jnp.ndarray,       # (H, W, 3)
    variance: jnp.ndarray,    # (H, W)
    depth: jnp.ndarray,       # (H, W)
    normal: jnp.ndarray,      # (H, W, 3)
    iterations: int = 4,
    sigma_z: float = 1.0,
    sigma_n: float = 128.0,
    sigma_l: float = 4.0,
    halo=None,
):
    """Edge-stopping à-trous wavelet filter (SVGF). Separable-ish 5x5 cross
    pattern per iteration with stride 2^i.

    With `halo` all arrays are a local row band: each iteration exchanges
    its own 2*step boundary rows (true neighbor rows interior, edge
    replication at the global top/bottom), so the filtered band is
    bit-identical to the single-device filter — row shifts read real
    cross-band pixels instead of clamping at the seam."""
    # miss pixels carry +inf depth; |inf - inf| = NaN would poison the
    # depth weight — clamp to a large finite sentinel (still an edge
    # against every finite depth)
    finite_depth = jnp.isfinite(depth)
    depth = jnp.where(finite_depth, depth, 1e10)
    h = depth.shape[0]

    for it in range(iterations):
        step = 1 << it
        p = 2 * step if halo is not None else 0
        if halo is not None:
            ext = halo["extend2d"](
                jnp.concatenate([color, variance[..., None],
                                 depth[..., None], normal], axis=-1), p)
            e_color = ext[..., 0:3]
            e_variance = ext[..., 3]
            e_depth = ext[..., 4]
            e_normal = ext[..., 5:8]
        else:
            e_color, e_variance = color, variance
            e_depth, e_normal = depth, normal

        def row_shift(a, dy, dx):
            """Band shift: rows come from the halo-extended array (true
            neighbor pixels), columns edge-clamp like the single-device
            path."""
            if halo is None:
                return _shift2d(a, dy, dx)
            return _shift2d(a[p + dy:p + dy + h], 0, dx)

        lum_c = pmath.luminance(color)
        # local variance smoothing for the luminance weight (3x3 gaussian)
        vsum = jnp.zeros_like(variance)
        wsum_g = 0.0
        for dy, wy in ((-1, 0.25), (0, 0.5), (1, 0.25)):
            for dx, wx in ((-1, 0.25), (0, 0.5), (1, 0.25)):
                vsum = vsum + row_shift(
                    e_variance[..., None], dy, dx)[..., 0] * (wy * wx)
                wsum_g += wy * wx
        sigma_lum = sigma_l * jnp.sqrt(jnp.maximum(vsum / wsum_g, 1e-10))

        acc = jnp.zeros_like(color)
        acc_v = jnp.zeros_like(variance)
        wacc = jnp.zeros_like(variance)
        for iy, wy in enumerate(_B3):
            dy = (iy - 2) * step
            for ix, wx in enumerate(_B3):
                dx = (ix - 2) * step
                kw = wy * wx
                c_s = row_shift(e_color, dy, dx)
                v_s = row_shift(e_variance[..., None], dy, dx)[..., 0]
                d_s = row_shift(e_depth[..., None], dy, dx)[..., 0]
                n_s = row_shift(e_normal, dy, dx)
                l_s = pmath.luminance(c_s)

                w_z = jnp.exp(
                    -jnp.abs(d_s - depth)
                    / (sigma_z * jnp.maximum(jnp.abs(depth), 1e-3) * (abs(dy) + abs(dx) + 1e-3))
                )
                w_n = jnp.maximum(pmath.dot(n_s, normal), 0.0) ** sigma_n
                w_l = jnp.exp(-jnp.abs(l_s - lum_c) / jnp.maximum(sigma_lum, 1e-10))
                wgt = kw * w_z * w_n * w_l
                wgt = jnp.where(jnp.isfinite(d_s) == jnp.isfinite(depth), wgt, 0.0)

                acc = acc + c_s * wgt[..., None]
                acc_v = acc_v + v_s * wgt * wgt
                wacc = wacc + wgt

        color = acc / jnp.maximum(wacc, 1e-10)[..., None]
        variance = acc_v / jnp.maximum(wacc * wacc, 1e-10)
    return color


def demodulation_albedo(base_color: jnp.ndarray, metallic: jnp.ndarray,
                        roughness: jnp.ndarray,
                        nov: jnp.ndarray) -> jnp.ndarray:
    """Combined diffuse+specular demodulation albedo
    (NRDComposition.hlsl pack semantics: divide noisy signal by material
    albedo so the denoiser filters illumination, not texture).

    The specular term uses the pre-integrated split-sum environment BRDF
    at the actual F0/roughness/NoV — the reference demodulates with
    BRDF::EnvironmentTerm_Rtg the same way
    (Shaders/GBufferGeneration.hlsl:117-232, BxDF.hlsli:317-320); a fixed
    0.04 underestimates metals and glancing angles, leaving texture in
    the denoiser input."""
    from ..ops import brdf

    m = metallic[..., None]
    f0 = 0.04 * (1.0 - m) + base_color * m
    spec = brdf.environment_term(f0, jnp.maximum(nov, 1e-4), roughness)
    diffuse = base_color * (1.0 - m)
    return jnp.maximum(diffuse + spec, 0.01)


def denoise_frame(
    state: DenoiserState,
    radiance: jnp.ndarray,     # (H, W, 3) noisy 1-SPP output
    albedo: jnp.ndarray,       # (H, W, 3) demodulation albedo
    depth: jnp.ndarray,
    normal: jnp.ndarray,
    motion: jnp.ndarray,
    iterations: int = 4,
    halo=None,
):
    """Full denoiser: demodulate -> temporal -> à-trous -> remodulate.

    `halo` (see temporal_accumulate/atrous_filter) runs the whole
    denoiser on a local row band of a sharded frame."""
    demod = radiance / albedo
    acc, variance, new_state = temporal_accumulate(
        state, demod, depth, normal, motion, halo=halo
    )
    filtered = atrous_filter(acc, variance, depth, normal, iterations,
                             halo=halo)
    return filtered * albedo, new_state
