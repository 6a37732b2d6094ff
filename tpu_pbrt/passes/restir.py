"""ReSTIR DI: reservoir-based direct-light sampling (initial candidates,
temporal reuse, spatial reuse, final shading).

Capability mirror of the reference's RTXDI integration
(reference: Source/RTXDI.ixx:141-241 — LocalLightPresampling/ReGIR/
InitialSampling/TemporalResampling/SpatialResampling/FinalShading pipeline;
Shaders/DIInitialSampling.hlsl, DITemporalResampling.hlsl,
DISpatialResampling.hlsl, DIFinalShading.hlsl; Shaders/RTXDIAppBridge.hlsli
surface/brdf callbacks). TPU re-design:

  * reservoirs are SoA arrays over the pixel pool — light index + sample
    barycentrics + stream statistics (w_sum, M, W), merged branchlessly;
  * the RIS power-PDF mip pyramid becomes the light table's prefix-sum CDF
    (passes/lights.py) — same distribution, sort-free on TPU;
  * temporal reuse reprojects via the G-buffer motion vectors with
    depth/normal disocclusion tests (RTXDIAppBridge.hlsli:297-376);
  * spatial reuse taps a per-frame jittered disc of neighbors
    (DISpatialResampling.hlsl semantics) with the same geometry tests;
  * final shading traces one visibility ray for the winning sample and
    splits the result into diffuse/specular for the denoiser
    (DIFinalShading.hlsl:27-103).

Weighting uses streaming RIS with 1/M normalization and clamped history
(the reference's default "basic" bias-correction mode) — visibility-driven
darkening at disocclusions is bounded by the M-clamp exactly as in RTXDI.
"""

from __future__ import annotations

import dataclasses
import os as _os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

# spatial-reuse tap offsets shared by all pixels within a frame (per-frame
# rotated): turns each neighbor tap's per-lane row gather into a vector
# shift via the _tap_rows uniform fast path. Same expectation (offsets
# remain random per frame/tap, the merge randomness stays per-lane);
# correlated neighbor noise is the tradeoff (reference uses per-pixel
# offsets, DISpatialResampling.hlsl). DEFAULT ON since the round-5 A/B:
# app 10.58 -> 11.07 fps (+4.6%) with golden app-graph SSIM 0.7337 ->
# 0.7356 (no quality cost at 256 frames; the per-frame rotation
# decorrelates the shared offsets across history).
RESTIR_SHARED_TAPS = _os.environ.get(
    "TPU_PBRT_RESTIR_SHARED_TAPS", "1") == "1"

from ..models.scene import Scene
from ..ops import bxdf, rng, sampling, vec
from ..ops import shade_table as shade_mod
from ..ops.vec import Vec3
from .gbuffer import GBuffer


@dataclasses.dataclass(frozen=True)
class ReSTIRSettings:
    """Defaults follow the reference (MyAppData.h:192-246)."""
    initial_light_samples: int = 8      # ReGIR/local-light candidates
    initial_brdf_samples: int = 1       # BRDF-ray candidates (DIInitialSampling)
    # local-light candidate mode (reference README settings tree:
    # Uniform | Power RIS | ReGIR RIS; ReGIR engages via the grid arg)
    local_light_mode: str = "power_ris"  # "uniform" | "power_ris"
    temporal: bool = True
    spatial: bool = True
    spatial_samples: int = 1            # neighbor taps (MyAppData.h: Samples = 1)
    spatial_radius: float = 30.0        # pixels
    max_history: float = 20.0           # M-clamp (x initial M)
    initial_visibility: bool = True     # DIInitialSampling.hlsl:51-57
    # Bias-correction modes for reuse (reference: MyAppData.h:227-246
    # ReSTIR_DI_TemporalBiasCorrectionMode / SpatialBiasCorrectionMode):
    #   "basic"     — 1/M normalization: cheap, darkens at geometric
    #                 discontinuities where neighbor samples are
    #                 unrepresentable at the center pixel;
    #   "pairwise"  — defensive pairwise MIS: every reused sample is
    #                 weighted by a partition of unity built from the
    #                 neighbor's own target pdf vs the center's
    #                 (m_i = beta_i/k, m_c = 1 - sum beta_i/k with
    #                 beta_i(y) = k*M_i*p_i(y) / (k*M_i*p_i(y) +
    #                 M_c*p_c(y)) — sums to 1 for every y, so the
    #                 estimator is unbiased for ANY approximate p_i);
    #   "raytraced" — pairwise with traced visibility folded into the
    #                 cross-domain pdf evaluations (2 extra rays per
    #                 reused sample), killing reuse of samples shadowed
    #                 in the other domain.
    temporal_bias_correction: str = "basic"
    spatial_bias_correction: str = "basic"
    # boiling filter: cull temporal reservoirs whose RIS weight exceeds a
    # multiple of the local tile average (DITemporalResampling.hlsl:1-49,
    # RTXDI_BoilingFilter thread-group semantics)
    boiling_filter: bool = True
    boiling_filter_strength: float = 0.2  # (0, 1]; higher = more aggressive


class Reservoir(NamedTuple):
    """Per-pixel DI reservoir (RTXDI packed reservoir analogue)."""
    light: jnp.ndarray    # (R,) i32 light index, -1 = empty
    u: jnp.ndarray        # (R,) sample barycentric u (sqrt-warped space)
    v: jnp.ndarray        # (R,)
    w_sum: jnp.ndarray    # (R,) sum of RIS weights
    m: jnp.ndarray        # (R,) candidate count
    w: jnp.ndarray        # (R,) unbiased contribution weight W

    @classmethod
    def empty(cls, r: int) -> "Reservoir":
        z = jnp.zeros((r,))
        return cls(jnp.full((r,), -1, jnp.int32), z, z, z, z, z)


def _light_point(scene: Scene, light, u, v, ltable=None):
    """Reconstruct the sampled point on light `light` from stored (u, v)
    (sqrt-warped barycentrics, Shaders/Math.hlsli:41-45). With `ltable`
    (the packed light table) the fetch is one select-chain/one-hot row
    read instead of five per-lane gathers (~7 ms each at 2M lanes)."""
    if ltable is not None:
        lf = shade_mod.fetch_light_by_index(ltable, light, u, v)
        return lf.position, lf.normal, lf.radiance
    s = jnp.sqrt(u)
    b0 = s * (1.0 - v)
    b1 = s * v
    li = jnp.maximum(light, 0)
    pos = (
        vec.gather(scene.lights.v0, li)
        + vec.gather(scene.lights.e1, li) * b0
        + vec.gather(scene.lights.e2, li) * b1
    )
    normal = vec.gather(scene.lights.normal, li)
    radiance = vec.gather(scene.lights.radiance, li)
    return pos, normal, radiance


def _target_pdf(scene: Scene, b: bxdf.BSDF, sv: bxdf.SurfaceVectors,
                view: Vec3, position: Vec3, light, u, v, ltable=None):
    """p-hat: luminance of the unshadowed contribution f * Le * G
    (RTXDIAppBridge.hlsli target-pdf callback semantics).
    Returns (p_hat, wi, dist, cos_light)."""
    lpos, lnrm, lrad = _light_point(scene, light, u, v, ltable)
    to_l = lpos - position
    dist2 = jnp.maximum(vec.dot(to_l, to_l), 1e-12)
    dist = jnp.sqrt(dist2)
    wi = to_l * (1.0 / dist)
    cos_light = -vec.dot(lnrm, wi)
    weights = bxdf.lobe_weights(b, sv, view)
    f_d, f_s = bxdf.evaluate_combined(b, sv, wi, view, weights)
    f = f_d + f_s
    g = jnp.maximum(cos_light, 0.0) / dist2
    p_hat = vec.luminance(f * lrad) * g
    return (jnp.where((light >= 0) & (cos_light > 0.0), p_hat, 0.0),
            wi, dist, cos_light)


def _light_area_pdf(scene: Scene, light, ltable=None):
    """Area-measure pdf of drawing `light` + a uniform point on it via
    power sampling (the light-candidate source distribution). With
    `ltable` the pdf rides the packed light-row fetch (CSE-merged with
    the _target_pdf fetch — zero extra gathers) instead of two per-lane
    gathers (power[li], area[li])."""
    li = jnp.maximum(light, 0)
    if ltable is not None:
        return shade_mod.fetch_light_pdf_area(ltable, li)
    total = jnp.sum(scene.lights.power)
    select_pdf = scene.lights.power[li] / jnp.maximum(total, 1e-20)
    return select_pdf / jnp.maximum(scene.lights.area[li], 1e-20)


def _merge(res: Reservoir, cand_light, cand_u, cand_v, weight, rand,
           cand_m=1.0):
    """Branchless streaming-RIS reservoir update."""
    w_sum = res.w_sum + weight
    take = (rand * jnp.maximum(w_sum, 1e-20)) < weight
    return Reservoir(
        light=jnp.where(take, cand_light, res.light),
        u=jnp.where(take, cand_u, res.u),
        v=jnp.where(take, cand_v, res.v),
        w_sum=w_sum,
        m=res.m + cand_m,
        w=res.w,
    )


def _surface_from_gbuffer(scene: Scene, gb: GBuffer, view: Vec3):
    b = bxdf.make_bsdf(gb.base_color, gb.metallic, gb.roughness, gb.ior,
                       gb.transmission, gb.is_front_face)
    sv = bxdf.make_surface_vectors(gb.is_front_face, gb.geometric_normal,
                                   gb.shading_normal)
    return b, sv


def initial_sampling(scene: Scene, gb: GBuffer, view: Vec3, tracer,
                     px, py, frame, settings: ReSTIRSettings,
                     regir=None) -> Reservoir:
    """Candidate generation (DIInitialSampling.hlsl /
    RTXDI_SampleLightsForSurface): N power-sampled light candidates plus
    M BRDF-ray candidates (light discovery via the tri->light remap,
    RTXDIAppBridge.hlsli:455-472), streamed into one reservoir with
    balance-heuristic mixture pdfs (Talbot MIS-RIS — the candidate source
    pdf is the pooled mixture of both strategies in area measure); optional
    initial visibility on the winner.

    `regir`: optional (ReGIRGrid, ReGIRSettings) — light candidates then
    come from the surface's presampled world-space cell (chained RIS: the
    slot W is the candidate's inverse selection pdf, RTXDI invSourcePdf
    semantics), falling back to the global power CDF outside the grid."""
    from . import regir as regir_mod

    r = gb.depth.shape[0]
    ltable = getattr(tracer, "light_table", None)
    b, sv = _surface_from_gbuffer(scene, gb, view)
    res = Reservoir.empty(r)
    rays = jnp.zeros((), jnp.float32)

    n_l = settings.initial_light_samples
    n_b = settings.initial_brdf_samples
    n_tot = max(n_l + n_b, 1)
    weights = bxdf.lobe_weights(b, sv, view)

    def mixture_pdf(p_light_area, p_brdf_area):
        if n_b == 0:
            return p_light_area
        return (n_l * p_light_area + n_b * p_brdf_area) / n_tot

    if regir is not None:
        grid, rs = regir
        cell, inside = regir_mod.cell_of(grid, rs, gb.position)
        inside = inside & gb.valid
        # ONE cell-row fetch serves all n_l candidate draws (the per-draw
        # pool gathers were the app graph's 35% ReGIR overhead)
        cell_rows = regir_mod.fetch_cell_rows(grid, rs, cell)

    for k in range(n_l):
        u4 = rng.uniform4(px, py, frame, 100 + k)
        # the power-CDF fallback draw must be INDEPENDENT of the ReGIR
        # slot pick: conditioning the fallback on u4[0] landing in an
        # empty slot's subinterval would bias the CDF draw for lanes in
        # partially filled cells — use a separate stream
        u_cdf = (rng.uniform4(px, py, frame, 130 + k)[0]
                 if regir is not None else u4[0])
        nl = scene.lights.power.shape[0]
        if settings.local_light_mode == "uniform":
            # Uniform candidate mode (reference Local Light Mode:
            # Uniform): every light equally likely, pdf = 1/(nl * area)
            li = jnp.clip((u_cdf * nl).astype(jnp.int32), 0, nl - 1)
            pdf_area = 1.0 / jnp.maximum(
                nl * scene.lights.area[li], 1e-20)
        else:
            li = sampling.draw_cdf(scene.lights.cdf, u_cdf)
            li = jnp.clip(li, 0, nl - 1)
            pdf_area = _light_area_pdf(scene, li, ltable)
        if regir is not None:
            li_g, w_slot = regir_mod.sample_from_rows(
                cell_rows, rs, inside, u4[0])
            use_g = li_g >= 0
            li = jnp.where(use_g, li_g, li)
            # chained RIS: slot W is the inverse light-selection pdf;
            # uniform area point on the light divides by its area
            pdf_area = jnp.where(
                use_g,
                1.0 / jnp.maximum(
                    w_slot * (shade_mod.fetch_light_area(ltable, li)
                              if ltable is not None else
                              scene.lights.area[jnp.maximum(li, 0)]), 1e-20),
                pdf_area)

        p_hat, wi, dist, cos_l = _target_pdf(scene, b, sv, view, gb.position,
                                             li, u4[1], u4[2], ltable)
        if n_b > 0:
            p_b_sa = bxdf.pdf_combined(b, sv, wi, view, weights)
            p_b_area = p_b_sa * jnp.maximum(cos_l, 0.0) / jnp.maximum(
                dist * dist, 1e-12)
        else:
            p_b_area = 0.0
        p_mix = mixture_pdf(pdf_area, p_b_area)
        w = jnp.where(p_mix > 0, p_hat / jnp.maximum(p_mix, 1e-20), 0.0)
        w = jnp.where(gb.valid & (scene.lights.count > 0), w, 0.0)
        res = _merge(res, li, u4[1], u4[2], w, u4[3])

    # --- BRDF-ray candidates: sample the BSDF, trace, and remap an
    # emissive hit to its light (candidates that find nothing still count
    # toward M — the mixture accounting absorbs them unbiasedly)
    for k in range(n_b):
        u4 = rng.uniform4(px, py, frame, 150 + k)
        d, _, valid_dir = bxdf.sample(b, sv, view, u4)
        origin = vec.safe_spawn_offset(gb.position, gb.flat_normal, d)
        traced = gb.valid & valid_dir & (scene.lights.count > 0)
        hit = tracer.closest_hit(
            origin, d, 0.0, jnp.where(traced, jnp.inf, -jnp.inf))
        rays = rays + jnp.sum(traced.astype(jnp.float32))
        li = jnp.where(hit.tri >= 0,
                       scene.lights.tri_to_light[jnp.maximum(hit.tri, 0)], -1)
        found = (li >= 0) & traced

        # hit point -> stored sqrt-warped barycentrics on the light triangle
        lidx = jnp.maximum(li, 0)
        hp = origin + d * hit.t
        lv0 = vec.gather(scene.lights.v0, lidx)
        le1 = vec.gather(scene.lights.e1, lidx)
        le2 = vec.gather(scene.lights.e2, lidx)
        rel = hp - lv0
        a11 = vec.dot(le1, le1)
        a12 = vec.dot(le1, le2)
        a22 = vec.dot(le2, le2)
        det = jnp.maximum(a11 * a22 - a12 * a12, 1e-20)
        b0 = jnp.clip((a22 * vec.dot(rel, le1) - a12 * vec.dot(rel, le2))
                      / det, 0.0, 1.0)
        b1 = jnp.clip((a11 * vec.dot(rel, le2) - a12 * vec.dot(rel, le1))
                      / det, 0.0, 1.0)
        s = jnp.minimum(b0 + b1, 1.0)
        cand_u = s * s
        cand_v = b1 / jnp.maximum(s, 1e-8)

        p_hat, wi, dist, cos_l = _target_pdf(scene, b, sv, view, gb.position,
                                             li, cand_u, cand_v, ltable)
        p_b_sa = bxdf.pdf_combined(b, sv, d, view, weights)
        p_b_area = p_b_sa * jnp.maximum(cos_l, 0.0) / jnp.maximum(
            dist * dist, 1e-12)
        p_mix = mixture_pdf(_light_area_pdf(scene, li, ltable), p_b_area)
        w = jnp.where(found & (p_mix > 0),
                      p_hat / jnp.maximum(p_mix, 1e-20), 0.0)
        res = _merge(res, li, cand_u, cand_v, w, u4[3])

    res = finalize(scene, b, sv, view, gb.position, res, ltable)

    if settings.initial_visibility:
        lpos, _, _ = _light_point(scene, res.light, res.u, res.v, ltable)
        to_l = lpos - gb.position
        dist = vec.length(to_l)
        wi = to_l * (1.0 / jnp.maximum(dist, 1e-8))
        origin = vec.safe_spawn_offset(gb.position, gb.flat_normal, wi)
        traced = gb.valid & (res.light >= 0)
        occluded = tracer.any_hit(
            origin, wi, 0.0,
            jnp.where(traced, dist * (1.0 - 1e-3), -jnp.inf),
        )
        res = res._replace(w=jnp.where(occluded, 0.0, res.w))
        rays = rays + jnp.sum(traced.astype(jnp.float32))
    return res, rays


def finalize(scene, b, sv, view, position, res: Reservoir,
             ltable=None) -> Reservoir:
    """Compute the unbiased contribution weight W = w_sum / (M * p_hat)
    (the 'basic' 1/M normalization)."""
    p_hat, _, _, _ = _target_pdf(scene, b, sv, view, position,
                              res.light, res.u, res.v, ltable)
    w = jnp.where(
        (p_hat > 0) & (res.m > 0),
        res.w_sum / jnp.maximum(res.m * p_hat, 1e-20),
        0.0,
    )
    return res._replace(w=w)


def finalize_gris(scene, b, sv, view, position, res: Reservoir,
                  ltable=None) -> Reservoir:
    """Generalized-RIS contribution weight W = w_sum / p_hat(y) — the MIS
    weights already normalized the candidate stream (pairwise modes), so
    no 1/M division."""
    p_hat, _, _, _ = _target_pdf(scene, b, sv, view, position,
                              res.light, res.u, res.v, ltable)
    w = jnp.where(p_hat > 0, res.w_sum / jnp.maximum(p_hat, 1e-20), 0.0)
    return res._replace(w=w)


def _reproject_nearest(field, prev_x, prev_y, width, height):
    """Nearest-pixel gather of a (R,) field laid out row-major."""
    xi = jnp.clip(jnp.round(prev_x).astype(jnp.int32), 0, width - 1)
    yi = jnp.clip(jnp.round(prev_y).astype(jnp.int32), 0, height - 1)
    return field[yi * width + xi], (
        (prev_x >= 0) & (prev_x <= width - 1)
        & (prev_y >= 0) & (prev_y <= height - 1)
    )


def _oct_encode_soa(n: Vec3):
    """SoA octahedral encode (unit normal -> 2 floats)."""
    s = jnp.maximum(jnp.abs(n.x) + jnp.abs(n.y) + jnp.abs(n.z), 1e-12)
    nx, ny, nz = n.x / s, n.y / s, n.z / s
    wx = (1.0 - jnp.abs(ny)) * jnp.where(nx >= 0.0, 1.0, -1.0)
    wy = (1.0 - jnp.abs(nx)) * jnp.where(ny >= 0.0, 1.0, -1.0)
    return (jnp.where(nz >= 0.0, nx, wx), jnp.where(nz >= 0.0, ny, wy))


def _oct_decode_soa(ex, ey) -> Vec3:
    z = 1.0 - jnp.abs(ex) - jnp.abs(ey)
    t = jnp.maximum(-z, 0.0)
    x = ex + jnp.where(ex >= 0.0, -t, t)
    y = ey + jnp.where(ey >= 0.0, -t, t)
    return vec.normalize(Vec3(x, y, z))


def _pack_taps(res: Reservoir, depth, normal: Vec3):
    """(R, 8) packed reservoir + geometry rows so one neighbor tap costs
    ONE row gather instead of nine (R,) gathers (~15 ms each at a 2M-lane
    pool). Row-gather cost steps at 32 bytes/row on v5e (8 f32 = 31 ms vs
    9 f32 = 46 ms at 2M) — the normal is oct-encoded to stay at 8 wide."""
    ex, ey = _oct_encode_soa(normal)
    return jnp.stack(
        [res.light.astype(jnp.float32), res.u, res.v, res.w, res.m,
         depth, ex, ey], axis=-1)


# uniform-offset fast-path headroom (pixels); offsets beyond this fall
# back to the per-lane gather
_TAP_SHIFT_PAD = 64


def _tap_rows_shifted(packed, sdx, sdy, width, height):
    """`_tap_rows`'s row read for a UNIFORM integer offset (sdx, sdy):
    reflect-padded dynamic slice — pure vector ops, no per-lane gather.
    The pads reproduce the gather path's index arithmetic exactly:
    negative xr -> |xr| ('reflect'), xr >= w -> 2w-xr-1 ('symmetric'),
    then clip."""
    import numpy as np

    p = _TAP_SHIFT_PAD
    c = packed.shape[-1]
    img = packed.reshape(height, width, c)

    def reflect_np(v, n):
        v = np.abs(v)
        v = np.where(v >= n, 2 * n - v - 1, v)
        return np.clip(v, 0, n - 1)

    def pads(arr, n, axis):
        # STATIC index vectors via the exact gather formula — the side
        # takes are constant-index and tiny (p columns/rows)
        left = jnp.take(arr, jnp.asarray(reflect_np(np.arange(-p, 0), n)),
                        axis=axis)
        right = jnp.take(arr, jnp.asarray(reflect_np(np.arange(n, n + p),
                                                     n)), axis=axis)
        return jnp.concatenate([left, arr, right], axis=axis)

    padded = pads(pads(img, width, 1), height, 0)
    rows = jax.lax.dynamic_slice(
        padded, (sdy + p, sdx + p, 0), (height, width, c))
    return rows.reshape(height * width, c)


def _tap_rows(packed, x, y, width, height, halo=None,
              reflect_edges=False, base_xy=None):
    """Gather packed rows at nearest pixels; returns (fields dict, mask).

    `halo`: sharded-mesh descriptor {"pad": int, "row0": traced global
    first row, "total_h": int} — `packed` is then the tile EXTENDED by
    `pad` exchanged boundary rows on each side (parallel/app_mesh.py), so
    taps within `pad` rows of a tile seam read the true neighbor-tile
    rows instead of being rejected; validity is checked against GLOBAL
    image bounds.

    `reflect_edges`: mirror out-of-view tap positions across the screen
    edges instead of rejecting them (spatial reuse only — the reference's
    RAB_ClampSamplePositionIntoView, RTXDIAppBridge.hlsli:112-135,
    'prevents the spread of colorful blobs from screen edges'). Under a
    halo, reflection happens in GLOBAL rows; a reflected tap can only
    leave the tile+halo if the disc radius exceeded the halo pad, and is
    then rejected as before."""
    xr = jnp.round(x).astype(jnp.int32)
    if reflect_edges:
        xr = jnp.abs(xr)
        xr = jnp.where(xr >= width, 2 * width - xr - 1, xr)
    xi = jnp.clip(xr, 0, width - 1)
    x_ok = reflect_edges | ((x >= 0) & (x <= width - 1))
    if halo is None:
        yr = jnp.round(y).astype(jnp.int32)
        if reflect_edges:
            yr = jnp.abs(yr)
            yr = jnp.where(yr >= height, 2 * height - yr - 1, yr)
        yi = jnp.clip(yr, 0, height - 1)
        y_ok = reflect_edges | ((y >= 0) & (y <= height - 1))
    else:
        pad = halo["pad"]
        total_h = halo["total_h"]
        yr = jnp.round(y).astype(jnp.int32)
        if reflect_edges:
            gy = yr + halo["row0"].astype(jnp.int32)
            gy = jnp.abs(gy)
            gy = jnp.where(gy >= total_h, 2 * total_h - gy - 1, gy)
            yr = gy - halo["row0"].astype(jnp.int32)
            y_ok = ((yr >= -pad) & (yr <= height - 1 + pad)
                    & (gy >= 0) & (gy <= total_h - 1))
        else:
            gy = y + halo["row0"]
            y_ok = ((y >= -pad) & (y <= height - 1 + pad)
                    & (gy >= 0) & (gy <= total_h - 1))
        yi = jnp.clip(yr + pad, 0, height + 2 * pad - 1)
    def gather_rows(_):
        return packed[yi * width + xi]          # (R, 8|16) one row gather

    if base_xy is not None and halo is None:
        # uniform-offset fast path: when every lane's ROUNDED tap offset
        # from its own pixel is the same integer pair (temporal reuse on
        # a static frame; spatial reuse with shared per-frame offsets),
        # the row read is a reflect-padded dynamic-slice SHIFT — no
        # per-lane gather (~3-4 ms each at 2M lanes). Integer equality
        # check, so fp tie-rounding differences fall back to the gather.
        bx, by = base_xy
        sx = jnp.round(x).astype(jnp.int32) - bx.astype(jnp.int32)
        sy = jnp.round(y).astype(jnp.int32) - by.astype(jnp.int32)
        sdx = jnp.clip(sx.reshape(-1)[0], -_TAP_SHIFT_PAD, _TAP_SHIFT_PAD)
        sdy = jnp.clip(sy.reshape(-1)[0], -_TAP_SHIFT_PAD, _TAP_SHIFT_PAD)
        uniform = ((jnp.max(sx) == jnp.min(sx))
                   & (jnp.max(sy) == jnp.min(sy))
                   & (jnp.abs(sx.reshape(-1)[0]) <= _TAP_SHIFT_PAD)
                   & (jnp.abs(sy.reshape(-1)[0]) <= _TAP_SHIFT_PAD))
        rows = jax.lax.cond(
            uniform,
            lambda _: _tap_rows_shifted(packed, sdx, sdy, width, height),
            gather_rows, 0)
    else:
        rows = gather_rows(0)
    in_b = x_ok & y_ok
    return {
        "light": rows[:, 0].astype(jnp.int32),
        "u": rows[:, 1], "v": rows[:, 2], "w": rows[:, 3], "m": rows[:, 4],
        "depth": rows[:, 5],
        "normal": _oct_decode_soa(rows[:, 6], rows[:, 7]),
        "rows": rows,
    }, in_b


def _pack_surface(gb: GBuffer):
    """(R, 8) reduced neighbor-surface rows for pairwise bias correction:
    position + base color + metallic + roughness (the RAB-style compact
    surface the reference reconstructs from its G-buffer at neighbor
    pixels, RTXDIAppBridge.hlsli:297-352)."""
    return jnp.stack(
        [gb.position.x, gb.position.y, gb.position.z,
         gb.base_color.x, gb.base_color.y, gb.base_color.z,
         gb.metallic, gb.roughness], axis=-1)


def _tap_surface(tap_rows16, cam_pos):
    """Reconstruct (b, sv, view, position) from a 16-wide pairwise tap row
    (cols 8..15 = _pack_surface layout; cols 6..7 = oct normal).

    The reconstructed surface is REDUCED (shading normal doubles as the
    geometric normal; dielectric ior/transmission defaults): pairwise MIS
    weights stay a valid partition of unity for any approximate neighbor
    pdf, so this costs variance only, never bias."""
    rows = tap_rows16
    n = _oct_decode_soa(rows[:, 6], rows[:, 7])
    pos = Vec3(rows[:, 8], rows[:, 9], rows[:, 10])
    base = Vec3(rows[:, 11], rows[:, 12], rows[:, 13])
    metallic = rows[:, 14]
    roughness = rows[:, 15]
    ones = jnp.ones_like(metallic)
    front = jnp.ones_like(metallic, bool)
    b = bxdf.make_bsdf(base, metallic, roughness, ones * 1.5,
                       jnp.zeros_like(metallic), front)
    sv = bxdf.make_surface_vectors(front, n, n)
    cp = Vec3.splat(jnp.zeros_like(metallic))
    cp = Vec3(cp.x + cam_pos[0], cp.y + cam_pos[1], cp.z + cam_pos[2])
    view = vec.normalize(cp - pos)
    return b, sv, view, pos


def _visibility(tracer, position: Vec3, normal: Vec3, scene: Scene,
                light, u, v, live, ltable):
    """Traced visibility factor (0/1) from `position` to light sample
    (light,u,v) — the extra rays of the 'raytraced' bias-correction mode.
    Returns (visible: f32, rays traced)."""
    lpos, _, _ = _light_point(scene, light, u, v, ltable)
    to_l = lpos - position
    dist = vec.length(to_l)
    wi = to_l * (1.0 / jnp.maximum(dist, 1e-8))
    origin = vec.safe_spawn_offset(position, normal, wi)
    occluded = tracer.any_hit(
        origin, wi, 0.0, jnp.where(live, dist * (1.0 - 1e-3), -jnp.inf))
    return (jnp.where(live & ~occluded, 1.0, jnp.where(live, 0.0, 1.0)),
            jnp.sum(live.astype(jnp.float32)))


def _geometry_similar(gb: GBuffer, prev_depth, prev_normal: Vec3,
                      depth_tol=0.1, normal_tol=0.9):
    """Disocclusion test (RTXDIAppBridge.hlsli:371-376 material/geometry
    similarity)."""
    depth_ok = jnp.abs(prev_depth - gb.depth) <= depth_tol * jnp.maximum(
        jnp.abs(gb.depth), 1e-3)
    normal_ok = vec.dot(prev_normal, gb.shading_normal) >= normal_tol
    return depth_ok & normal_ok & jnp.isfinite(prev_depth)


class ReSTIRState(NamedTuple):
    """Cross-frame state: previous reservoirs + previous geometry.
    `surface` carries the (R, 8) reduced previous-frame surface
    (_pack_surface) when temporal pairwise/raytraced bias correction is
    on; a (1, 8) dummy otherwise (keeps the pytree structure fixed)."""
    reservoir: Reservoir
    depth: jnp.ndarray      # (R,)
    normal: Vec3            # (R,) x3
    surface: jnp.ndarray    # (R, 8) or (1, 8) dummy

    @classmethod
    def empty(cls, r: int, pairwise: bool = False) -> "ReSTIRState":
        return cls(Reservoir.empty(r), jnp.full((r,), jnp.inf),
                   Vec3.zeros((r,)),
                   jnp.zeros((r if pairwise else 1, 8)))


def temporal_resampling(scene: Scene, gb: GBuffer, view: Vec3,
                        state: ReSTIRState, cur: Reservoir,
                        px, py, frame, width, height,
                        settings: ReSTIRSettings,
                        py_grid=None, ltable=None, tracer=None,
                        cam_prev=None, halo=None):
    """Motion-guided temporal reuse (DITemporalResampling.hlsl). Returns
    (reservoir, bias-correction rays traced).

    `py_grid`: row index used for ADDRESSING the reservoir grid — under a
    row-sharded mesh this is the tile-local row while `py` stays the
    global row feeding the RNG streams (defaults to `py`). `cam_prev`:
    previous-frame camera position (pairwise modes evaluate the history
    surface's view vector with it)."""
    if py_grid is None:
        py_grid = py
    if cam_prev is None:
        cam_prev = jnp.zeros((3,), jnp.float32)
    b, sv = _surface_from_gbuffer(scene, gb, view)
    prev_x = px.astype(jnp.float32) + gb.motion_x
    prev_y = py_grid.astype(jnp.float32) + gb.motion_y

    mode = settings.temporal_bias_correction
    prev = state.reservoir
    packed = _pack_taps(prev, state.depth, state.normal)
    if mode != "basic":
        packed = jnp.concatenate([packed, state.surface], axis=-1)
    if halo is not None:
        packed = halo["extend"](packed)
    tap, in_b = _tap_rows(packed, prev_x, prev_y, width, height, halo=halo,
                          base_xy=(px, py_grid))
    p_light, p_u, p_v = tap["light"], tap["u"], tap["v"]
    p_w, p_m, pd, pn = tap["w"], tap["m"], tap["depth"], tap["normal"]
    valid_hist = in_b & _geometry_similar(gb, pd, pn) & (p_light >= 0) & gb.valid

    # clamp history (RTXDI maxHistoryLength)
    m_clamp = settings.max_history * jnp.maximum(cur.m, 1.0)
    p_m = jnp.minimum(p_m, m_clamp)

    # re-evaluate the previous sample's target pdf at the current surface
    p_hat_prev, _, _, _ = _target_pdf(scene, b, sv, view, gb.position,
                                   p_light, p_u, p_v, ltable)
    u = rng.uniform4(px, py, frame, 200)

    if mode == "basic":
        w_prev = jnp.where(valid_hist, p_hat_prev * p_w * p_m, 0.0)
        merged = _merge(cur, p_light, p_u, p_v, w_prev, u[0],
                        cand_m=jnp.where(valid_hist, p_m, 0.0))
        if settings.boiling_filter:
            merged = _boiling_filter(merged, width, height,
                                     settings.boiling_filter_strength)
        return finalize(scene, b, sv, view, gb.position, merged,
                        ltable), jnp.zeros(())
    # --- pairwise / raytraced MIS (k = 1 reused technique): the history
    # sample is weighted against the canonical (current) pixel's target
    # pdf via beta(y) = M_t*p_t(y) / (M_t*p_t(y) + M_c*p_c(y)); the
    # canonical sample gets 1 - beta(y_c) — a partition of unity, so
    # reuse stays unbiased at disocclusions where basic 1/M darkens.
    bt, st_, vt, pos_t = _tap_surface(tap["rows"], cam_prev)
    m_c = jnp.maximum(cur.m, 1.0)
    rays = jnp.zeros(())

    p_t_yt, _, _, _ = _target_pdf(scene, bt, st_, vt, pos_t,
                                  p_light, p_u, p_v, ltable)
    p_c_yc, _, _, _ = _target_pdf(scene, b, sv, view, gb.position,
                                  cur.light, cur.u, cur.v, ltable)
    p_t_yc, _, _, _ = _target_pdf(scene, bt, st_, vt, pos_t,
                                  cur.light, cur.u, cur.v, ltable)
    p_c_yt = p_hat_prev
    if mode == "raytraced":
        # visibility folded into the CROSS-domain evals (2 rays)
        vis_c_yt, r1 = _visibility(tracer, gb.position, gb.flat_normal,
                                   scene, p_light, p_u, p_v,
                                   valid_hist, ltable)
        vis_t_yc, r2 = _visibility(tracer, pos_t, pn, scene,
                                   cur.light, cur.u, cur.v,
                                   valid_hist & (cur.light >= 0), ltable)
        p_c_yt_b = p_c_yt * vis_c_yt
        p_t_yc_b = p_t_yc * vis_t_yc
        rays = rays + r1 + r2
    else:
        p_c_yt_b, p_t_yc_b = p_c_yt, p_t_yc

    def beta(p_t, p_c):
        num = p_m * p_t
        den = num + m_c * p_c
        return jnp.where(valid_hist & (den > 0), num / jnp.maximum(den, 1e-20),
                         0.0)

    m_hist = beta(p_t_yt, p_c_yt_b)
    m_can = 1.0 - beta(p_t_yc_b, p_c_yc)
    res = Reservoir.empty(cur.light.shape[0])
    res = _merge(res, cur.light, cur.u, cur.v, m_can * p_c_yc * cur.w, u[1],
                 cand_m=cur.m)
    res = _merge(res, p_light, p_u, p_v, m_hist * p_c_yt * p_w, u[0],
                 cand_m=jnp.where(valid_hist, p_m, 0.0))
    if settings.boiling_filter:
        res = _boiling_filter(res, width, height,
                              settings.boiling_filter_strength)
    return finalize_gris(scene, b, sv, view, gb.position, res,
                         ltable), rays


def _boiling_filter(res: Reservoir, width, height, strength,
                    tile: int = 16) -> Reservoir:
    """Kill temporally-fed reservoirs whose RIS weight is a large outlier
    vs their local tile average — the "boiling" fireflies temporal reuse
    breeds when one lucky sample dominates a region (reference:
    DITemporalResampling.hlsl boilingFilterStrength -> RTXDI_BoilingFilter,
    which averages reservoir weight over the 8x16 thread group and zeroes
    reservoirs above a strength-scaled multiple). The TPU form replaces
    wave intrinsics with a tile mean over 16x16 pixel blocks."""
    multiplier = 10.0 / jnp.clip(strength, 1e-2, 1.0) - 9.0  # 1 @ s=1
    w = res.w_sum.reshape(height, width)
    hp, wp = (-height) % tile, (-width) % tile
    wpad = jnp.pad(w, ((0, hp), (0, wp)))
    cnt = jnp.pad(jnp.ones_like(w), ((0, hp), (0, wp)))
    th, tw = wpad.shape[0] // tile, wpad.shape[1] // tile
    sums = wpad.reshape(th, tile, tw, tile).sum((1, 3))
    cnts = cnt.reshape(th, tile, tw, tile).sum((1, 3))
    avg = sums / jnp.maximum(cnts, 1.0)
    avg_full = jnp.repeat(jnp.repeat(avg, tile, 0), tile, 1)[
        :height, :width].reshape(-1)
    boil = res.w_sum > avg_full * multiplier
    return res._replace(
        light=jnp.where(boil, -1, res.light),
        w_sum=jnp.where(boil, 0.0, res.w_sum),
    )


def spatial_resampling(scene: Scene, gb: GBuffer, view: Vec3,
                       cur: Reservoir, px, py, frame, width, height,
                       settings: ReSTIRSettings, py_grid=None,
                       ltable=None, tracer=None, cam_pos=None, halo=None):
    """Neighbor-disc spatial reuse (DISpatialResampling.hlsl). Returns
    (reservoir, bias-correction rays traced)."""
    if py_grid is None:
        py_grid = py
    if cam_pos is None:
        cam_pos = jnp.zeros((3,), jnp.float32)
    mode = settings.spatial_bias_correction
    b, sv = _surface_from_gbuffer(scene, gb, view)
    packed = _pack_taps(cur, gb.depth, gb.shading_normal)
    if mode != "basic":
        packed = jnp.concatenate([packed, _pack_surface(gb)], axis=-1)
    if halo is not None:
        packed = halo["extend"](packed)

    # gather every tap first (pairwise needs the accepted count k_eff)
    taps = []
    for k in range(settings.spatial_samples):
        u4 = rng.uniform4(px, py, frame, 300 + k)
        if RESTIR_SHARED_TAPS:
            # scalar offset stream: same disc distribution, one offset
            # pair per (frame, tap) shared by every pixel
            us = rng.uniform4(jnp.uint32(0x5EED + k), jnp.uint32(0x7A95),
                              frame, 300 + k)
            ang = 2.0 * jnp.pi * us[0]
            rad = settings.spatial_radius * jnp.sqrt(us[1])
        else:
            ang = 2.0 * jnp.pi * u4[0]
            rad = settings.spatial_radius * jnp.sqrt(u4[1])
        nx = px.astype(jnp.float32) + jnp.cos(ang) * rad
        ny = py_grid.astype(jnp.float32) + jnp.sin(ang) * rad
        tap, in_b = _tap_rows(packed, nx, ny, width, height, halo=halo,
                              reflect_edges=True,
                              base_xy=((px, py_grid)
                                       if RESTIR_SHARED_TAPS else None))
        ok = (in_b & _geometry_similar(gb, tap["depth"], tap["normal"])
              & (tap["light"] >= 0) & gb.valid)
        taps.append((tap, ok, u4))

    if mode == "basic":
        res = cur
        for tap, ok, u4 in taps:
            p_hat_n, _, _, _ = _target_pdf(scene, b, sv, view, gb.position,
                                        tap["light"], tap["u"], tap["v"],
                                        ltable)
            w_n = jnp.where(ok, p_hat_n * tap["w"] * tap["m"], 0.0)
            res = _merge(res, tap["light"], tap["u"], tap["v"], w_n, u4[2],
                         cand_m=jnp.where(ok, tap["m"], 0.0))
        return finalize(scene, b, sv, view, gb.position, res,
                        ltable), jnp.zeros(())

    # --- pairwise / raytraced MIS over k accepted neighbors: partition
    # m_i = beta_i/k, m_c = 1 - sum_i beta_i(y_c)/k with
    # beta_i(y) = k*M_i*p_i(y) / (k*M_i*p_i(y) + M_c*p_c(y)).
    k_eff = jnp.maximum(
        sum(ok.astype(jnp.float32) for _, ok, _ in taps), 1.0)
    m_c = jnp.maximum(cur.m, 1.0)
    p_c_yc, _, _, _ = _target_pdf(scene, b, sv, view, gb.position,
                                  cur.light, cur.u, cur.v, ltable)
    rays = jnp.zeros(())
    m_can = jnp.ones_like(p_c_yc)
    res = Reservoir.empty(cur.light.shape[0])
    merges = []
    for tap, ok, u4 in taps:
        bn, sn, vn, pos_n = _tap_surface(tap["rows"], cam_pos)
        p_c_yn, _, _, _ = _target_pdf(scene, b, sv, view, gb.position,
                                      tap["light"], tap["u"], tap["v"],
                                      ltable)
        p_n_yn, _, _, _ = _target_pdf(scene, bn, sn, vn, pos_n,
                                      tap["light"], tap["u"], tap["v"],
                                      ltable)
        p_n_yc, _, _, _ = _target_pdf(scene, bn, sn, vn, pos_n,
                                      cur.light, cur.u, cur.v, ltable)
        p_c_yn_b, p_n_yc_b = p_c_yn, p_n_yc
        if mode == "raytraced":
            vis_c_yn, r1 = _visibility(tracer, gb.position, gb.flat_normal,
                                       scene, tap["light"], tap["u"],
                                       tap["v"], ok, ltable)
            vis_n_yc, r2 = _visibility(tracer, pos_n, tap["normal"], scene,
                                       cur.light, cur.u, cur.v,
                                       ok & (cur.light >= 0), ltable)
            p_c_yn_b = p_c_yn * vis_c_yn
            p_n_yc_b = p_n_yc * vis_n_yc
            rays = rays + r1 + r2

        def beta(p_n, p_c, m_n=tap["m"], ok=ok):
            num = k_eff * m_n * p_n
            den = num + m_c * p_c
            return jnp.where(ok & (den > 0), num / jnp.maximum(den, 1e-20),
                             0.0)

        m_n_yn = beta(p_n_yn, p_c_yn_b) / k_eff
        m_can = m_can - beta(p_n_yc_b, p_c_yc) / k_eff
        merges.append((tap, ok, m_n_yn * p_c_yn * tap["w"], u4))

    res = _merge(res, cur.light, cur.u, cur.v,
                 jnp.maximum(m_can, 0.0) * p_c_yc * cur.w,
                 rng.uniform4(px, py, frame, 310)[0], cand_m=cur.m)
    for tap, ok, w_n, u4 in merges:
        res = _merge(res, tap["light"], tap["u"], tap["v"],
                     jnp.where(ok, w_n, 0.0), u4[2],
                     cand_m=jnp.where(ok, tap["m"], 0.0))
    return finalize_gris(scene, b, sv, view, gb.position, res,
                         ltable), rays


def final_shading(scene: Scene, gb: GBuffer, view: Vec3, tracer,
                  res: Reservoir):
    """Shade the winning sample with a visibility ray; returns
    (diffuse: Vec3, specular: Vec3) for the denoiser demux
    (DIFinalShading.hlsl:27-103)."""
    b, sv = _surface_from_gbuffer(scene, gb, view)
    lpos, lnrm, lrad = _light_point(scene, res.light, res.u, res.v,
                                    getattr(tracer, "light_table", None))
    to_l = lpos - gb.position
    dist2 = jnp.maximum(vec.dot(to_l, to_l), 1e-12)
    dist = jnp.sqrt(dist2)
    wi = to_l * (1.0 / dist)
    cos_light = jnp.maximum(-vec.dot(lnrm, wi), 0.0)
    g = cos_light / dist2

    weights = bxdf.lobe_weights(b, sv, view)
    f_d, f_s = bxdf.evaluate_combined(b, sv, wi, view, weights)

    live = gb.valid & (res.light >= 0) & (res.w > 0.0) & (cos_light > 0.0)
    origin = vec.safe_spawn_offset(gb.position, gb.flat_normal, wi)
    occluded = tracer.any_hit(
        origin, wi, 0.0,
        jnp.where(live, dist * (1.0 - 1e-3), -jnp.inf),
    )
    scale = jnp.where(live & ~occluded, g * res.w, 0.0)
    diffuse = f_d * lrad * scale
    specular = f_s * lrad * scale
    return diffuse, specular, jnp.sum(live.astype(jnp.float32))


def render_direct_lighting(scene: Scene, gb: GBuffer, view: Vec3, tracer,
                           state: ReSTIRState, px, py, frame, width, height,
                           settings: ReSTIRSettings = ReSTIRSettings(),
                           py_grid=None, regir=None, cam_pos=None,
                           cam_prev=None, halo=None):
    """The full per-frame ReSTIR DI pipeline (RTXDI.ixx:207-241 order).
    Returns ((diffuse, specular), new state, rays traced). `py_grid`: see
    temporal_resampling — tile-local rows under a sharded mesh. `regir`:
    optional (ReGIRGrid, ReGIRSettings), see initial_sampling.
    `cam_pos`/`cam_prev`: camera positions (current/previous frame),
    needed by the pairwise/raytraced bias-correction modes."""
    ltable = getattr(tracer, "light_table", None)
    res, rays = initial_sampling(scene, gb, view, tracer, px, py, frame,
                                 settings, regir=regir)
    if settings.temporal:
        res, r_t = temporal_resampling(scene, gb, view, state, res, px, py,
                                       frame, width, height, settings,
                                       py_grid=py_grid, ltable=ltable,
                                       tracer=tracer, cam_prev=cam_prev,
                                       halo=halo)
        rays = rays + r_t
    if settings.spatial:
        res, r_s = spatial_resampling(scene, gb, view, res, px, py, frame,
                                      width, height, settings,
                                      py_grid=py_grid, ltable=ltable,
                                      tracer=tracer, cam_pos=cam_pos,
                                      halo=halo)
        rays = rays + r_s
    diffuse, specular, shade_rays = final_shading(scene, gb, view, tracer, res)
    pairwise_t = settings.temporal_bias_correction != "basic"
    new_state = ReSTIRState(
        reservoir=res, depth=gb.depth, normal=gb.shading_normal,
        surface=(_pack_surface(gb) if pairwise_t
                 else jnp.zeros((1, 8))))
    return (diffuse, specular), new_state, rays + shade_rays
