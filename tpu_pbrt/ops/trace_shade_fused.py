"""Fused bounce megakernel: dense traversal + shade fetch + unpack in ONE
Pallas kernel, plus a fused any-hit (shadow) kernel.

Why: the round-4 PT profile (bench.py breakdown, v5e 1080p Cornell) showed
the bounce body spending 38.8% in `fetch` and 16.5% + 12.8% in the
shadow/traverse dense sweeps, with `bytes_by_scope` an order of magnitude
above speed-of-light — XLA materializes the (T, R) sweep intermediates and
the (C, R) fetched block in HBM between fusions. Fusing traversal, the
one-hot MXU row fetch, and the whole unpack into one kernel keeps every
(T, tile) intermediate in VMEM; HBM traffic drops to the ray/interval lane
reads plus one (32, R) post-unpack output block.

This is the TPU analogue of the reference's hardware RayQuery + inline hit
shading loop (reference: Shaders/RaytracingHelpers.hlsli:59-133 TraceRay +
Shaders/Raytracing.hlsl:213-346 hit fetch/shade), specialized to the dense
(small-scene) backend: every ray tests every triangle, triangles resident
in VMEM.

Semantics contract: bit-compatible with `traverse_dense.closest_hit`
(same Möller–Trumbore forms, same packed u32 min-reduce with the index in
the low mantissa bits) and with `shade_table._fetch_bounce_fused_pallas`
(same unpack math). Verified in tests/test_trace_fused.py (interpret mode
vs the XLA paths).
"""

from __future__ import annotations

import os as _os

import jax
import jax.numpy as jnp
from jax import lax

from . import shade_table as st
from .traverse import Hit
from .traverse_dense import DenseTris
from .vec import Vec3

INF = jnp.float32(jnp.inf)

# default OFF by measurement (tools/r4g_kbench.py, v5e, 2M lanes, Cornell):
# the XLA dense sweeps are already compute-optimal — any_hit 0.58 ms vs
# 2.19-4.23 fused, closest+fetch 2.58 ms vs 3.42-3.58 fused across lane
# tiles 2048-8192; at frame level the fused build measured 53.4 ms vs
# 41.3 unfused (bench.py breakdown, 2026-08-19). Mosaic's lowering of the
# (T_pad, tile) broadcast sweep loses to XLA's own fusion here. Kept
# functional (tests/test_trace_fused.py) for the negative-result record
# and for revisiting when the sweep shape changes.
TRACE_FUSED = _os.environ.get("TPU_PBRT_TRACE_FUSED", "0") == "1"

# largest padded triangle count the VMEM-resident sweep supports: beyond
# this the (T, tile) intermediates force tiles too small to pipeline well
# and the blocked/culled backends win anyway (tracer.py DENSE_MAX_TRIS is
# 2048, but the dense backend is only the *default* up to that; the fused
# kernel keeps a conservative cap)
MAX_TRIS_PAD = 1024

# output row layout: rows [0, st.FB_ROWS) are exactly the fused-fetch
# block (shade_table._FB_*); two extra rows carry the traversal result
_ROW_HIT_T = st.FB_ROWS        # 24: closest-hit t (+inf on miss)
_ROW_FOUND = st.FB_ROWS + 1    # 25: 1.0 where a triangle was hit
OUT_ROWS = 32                  # padded to the f32 sublane tile

# geometry block column layout ((T_pad, 16) f32, triangles on sublanes)
_G_V0, _G_E1, _G_E2 = 0, 3, 6
_G_OPACITY = 9
_G_COLS = 16


# sweepable lane-tile override for micro-benchmarks (tools/r4g_kbench.py)
TILE_OVERRIDE: int | None = None


def _tile_for(t_pad: int) -> int:
    """Lane-tile size: ~(1<<19)/T_pad budget keeps each (T_pad, tile) f32
    sweep intermediate ≤ 2 MB (VMEM ~16 MB, a few live at once) while
    amortizing per-grid-step overhead — small soups (Cornell T_pad=40)
    take the full 8192-lane tile; T_pad=512 drops to 1024."""
    if TILE_OVERRIDE is not None:
        return TILE_OVERRIDE
    return max(512, min(8192, (1 << 19) // t_pad // 128 * 128))


def _geom_block(tris: DenseTris) -> jnp.ndarray:
    """(T_pad, 16) f32: v0 | e1 | e2 | opacity | zero padding. T padded to
    a multiple of 8 already by traverse_dense.prepare; pad again to 8 here
    defensively (sublane tile)."""
    tp = tris.v0.shape[0]
    t_pad = -(-tp // 8) * 8
    g = jnp.zeros((t_pad, _G_COLS), jnp.float32)
    g = g.at[:tp, _G_V0:_G_V0 + 3].set(tris.v0.astype(jnp.float32))
    g = g.at[:tp, _G_E1:_G_E1 + 3].set(tris.e1.astype(jnp.float32))
    g = g.at[:tp, _G_E2:_G_E2 + 3].set(tris.e2.astype(jnp.float32))
    g = g.at[:tp, _G_OPACITY].set(tris.opacity.astype(jnp.float32))
    return g


def supported(tris, table, atlas) -> bool:
    """Can the fused bounce kernel serve this scene? (static decision)"""
    if not TRACE_FUSED or not isinstance(tris, DenseTris):
        return False
    if atlas is not None or table is None:
        return False
    return (tris.v0.shape[0] <= MAX_TRIS_PAD
            and table.shape[0] <= st.ONEHOT_MAX_ROWS)


def _pad_lanes(r: int, tile: int, *arrays):
    r_pad = -(-r // tile) * tile
    if r_pad == r:
        return r_pad, [a[None, :] for a in arrays]
    out = []
    for a in arrays:
        pad = jnp.zeros((r_pad - r,), a.dtype)
        out.append(jnp.concatenate([a, pad])[None, :])
    return r_pad, out


def closest_hit_shade(tris: DenseTris, sub: jnp.ndarray,
                      origin: Vec3, direction: Vec3, t_min, t_max,
                      interpret: bool | None = None):
    """One kernel: dense closest hit + one-hot row fetch of the bounce
    sub-table + full unpack. Returns (Hit, ShadeAttrs) matching
    `traverse_dense.closest_hit` + `shade_table.fetch_bounce` (untextured).

    `sub` is the (T, 30) untextured bounce-column sub-table
    (shade_table._BOUNCE_COLS order)."""
    from jax.experimental import pallas as pl

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    r = origin.x.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))

    geom = _geom_block(tris)
    t_pad = geom.shape[0]
    tp = tris.v0.shape[0]          # padded-to-8 count used for id packing
    # table padded on the MXU contraction axis (same as the fused fetch)
    tc, c = sub.shape
    t_mxu = -(-max(tc, 128) // 128) * 128
    c_pad = -(-c // 8) * 8
    tab_t = jnp.zeros((c_pad, t_mxu), jnp.float32).at[:c, :tc].set(
        sub.astype(jnp.float32).T)

    tile = _tile_for(t_pad)
    r_pad, lanes = _pad_lanes(
        r, tile, origin.x, origin.y, origin.z,
        direction.x, direction.y, direction.z, t_min, t_max)

    # index packing: EXACTLY traverse_dense.closest_hit (t's low mantissa
    # bits carry the row id; tie-breaking blur only). Plain Python ints —
    # Pallas kernels may not close over traced array constants.
    import numpy as np

    # int32 keys, not uint32 (Mosaic can't reduce unsigned ints): every
    # real key is a non-negative-float bit pattern (t >= 0, same contract
    # as traverse_dense), so int32 min-ordering matches uint32's; the miss
    # sentinel INT32_MAX still never undercuts `init`.
    idx_bits = t_pad.bit_length()
    idx_mask = np.int32((1 << idx_bits) - 1)
    keep_mask = np.int32(-(1 << idx_bits))       # two's-complement ~idx_mask
    sentinel = np.int32(0x7FFFFFFF)
    inf = float("inf")

    def kern(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
             tmin_ref, tmax_ref, geom_ref, tab_ref, out_ref):
        ox, oy, oz = ox_ref[:, :], oy_ref[:, :], oz_ref[:, :]
        dx, dy, dz = dx_ref[:, :], dy_ref[:, :], dz_ref[:, :]
        tmin, tmax = tmin_ref[:, :], tmax_ref[:, :]

        def gc(i):
            return geom_ref[:, i:i + 1]                      # (T_pad, 1)

        v0x, v0y, v0z = gc(_G_V0), gc(_G_V0 + 1), gc(_G_V0 + 2)
        e1x, e1y, e1z = gc(_G_E1), gc(_G_E1 + 1), gc(_G_E1 + 2)
        e2x, e2y, e2z = gc(_G_E2), gc(_G_E2 + 1), gc(_G_E2 + 2)

        # --- Möller–Trumbore sweep, (T_pad, tile), traverse_dense form
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        valid = jnp.abs(det) > 1e-12
        inv = 1.0 / jnp.where(valid, det, 1.0)
        tvx = ox - v0x
        tvy = oy - v0y
        tvz = oz - v0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (dx * qvx + dy * qvy + dz * qvz) * inv
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
        hit = (valid & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
               & (t > tmin) & (t < tmax))
        t = jnp.where(hit, t, inf)

        # --- packed min+argmin (i32 keys, id in the low mantissa bits)
        row_ids = lax.broadcasted_iota(jnp.int32, (t_pad, tile), 0)
        bits = lax.bitcast_convert_type(t, jnp.int32)
        key = (bits & keep_mask) | row_ids
        key = jnp.where(jnp.isfinite(t), key, sentinel)
        init = (lax.bitcast_convert_type(jnp.maximum(tmax, 0.0), jnp.int32)
                & keep_mask) | idx_mask
        best = jnp.minimum(jnp.min(key, axis=0, keepdims=True), init)
        best_t = lax.bitcast_convert_type(best & keep_mask, jnp.float32)
        best_i = best & idx_mask
        found = (best & idx_mask) != idx_mask
        slot = jnp.where(found, best_i, 0)                   # (1, tile)

        # --- one-hot MXU row fetch (exact: HIGHEST precision f32)
        iota_t = lax.broadcasted_iota(jnp.int32, (t_mxu, tile), 0)
        oh = (iota_t == slot).astype(jnp.float32)
        rows = lax.dot_general(
            tab_ref[:, :], oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST)                 # (c_pad, tile)

        def g(i):
            return rows[i:i + 1, :]                          # (1, tile)

        # --- unpack: shade_table._fetch_bounce_fused_pallas math, with
        # barycentrics recomputed from the FETCHED row (identical to the
        # unfused path, which re-derives them via ray_triangle_soa)
        p0x, p0y, p0z = g(st._SB_P0), g(st._SB_P0 + 1), g(st._SB_P0 + 2)
        f1x, f1y, f1z = g(st._SB_E1), g(st._SB_E1 + 1), g(st._SB_E1 + 2)
        f2x, f2y, f2z = g(st._SB_E2), g(st._SB_E2 + 1), g(st._SB_E2 + 2)

        fpvx = dy * f2z - dz * f2y
        fpvy = dz * f2x - dx * f2z
        fpvz = dx * f2y - dy * f2x
        fdet = f1x * fpvx + f1y * fpvy + f1z * fpvz
        finv_det = 1.0 / jnp.where(jnp.abs(fdet) > 1e-12, fdet, 1.0)
        ftvx, ftvy, ftvz = ox - p0x, oy - p0y, oz - p0z
        fu = (ftvx * fpvx + ftvy * fpvy + ftvz * fpvz) * finv_det
        fqvx = ftvy * f1z - ftvz * f1y
        fqvy = ftvz * f1x - ftvx * f1z
        fqvz = ftvx * f1y - ftvy * f1x
        fv = (dx * fqvx + dy * fqvy + dz * fqvz) * finv_det
        fu = jnp.clip(fu, 0.0, 1.0)
        fv = jnp.clip(fv, 0.0, 1.0)
        fw = 1.0 - fu - fv

        out_ref[st._FB_POS:st._FB_POS + 3, :] = jnp.concatenate(
            [p0x + f1x * fu + f2x * fv,
             p0y + f1y * fu + f2y * fv,
             p0z + f1z * fu + f2z * fv], axis=0)

        fx = f1y * f2z - f1z * f2y
        fy = f1z * f2x - f1x * f2z
        fz = f1x * f2y - f1y * f2x
        finv = lax.rsqrt(jnp.maximum(fx * fx + fy * fy + fz * fz, 1e-20))
        fx, fy, fz = fx * finv, fy * finv, fz * finv

        sx = (g(st._SB_N0) * fw + g(st._SB_N0 + 3) * fu
              + g(st._SB_N0 + 6) * fv)
        sy = (g(st._SB_N0 + 1) * fw + g(st._SB_N0 + 4) * fu
              + g(st._SB_N0 + 7) * fv)
        sz = (g(st._SB_N0 + 2) * fw + g(st._SB_N0 + 5) * fu
              + g(st._SB_N0 + 8) * fv)
        sinv = lax.rsqrt(jnp.maximum(sx * sx + sy * sy + sz * sz, 1e-20))
        sx, sy, sz = sx * sinv, sy * sinv, sz * sinv

        lcos = -(fx * dx + fy * dy + fz * dz)
        flip = (fx * sx + fy * sy + fz * sz) < 0.0
        fx = jnp.where(flip, -fx, fx)
        fy = jnp.where(flip, -fy, fy)
        fz = jnp.where(flip, -fz, fz)
        front = (fx * dx + fy * dy + fz * dz) < 0.0
        sx = jnp.where(front, sx, -sx)
        sy = jnp.where(front, sy, -sy)
        sz = jnp.where(front, sz, -sz)

        out_ref[st._FB_FLAT:st._FB_FLAT + 3, :] = jnp.concatenate(
            [fx, fy, fz], axis=0)
        out_ref[st._FB_SHAD:st._FB_SHAD + 3, :] = jnp.concatenate(
            [sx, sy, sz], axis=0)
        out_ref[st._FB_LCOS:st._FB_LCOS + 1, :] = lcos
        out_ref[st._FB_FRONT:st._FB_FRONT + 1, :] = front.astype(jnp.float32)
        out_ref[st._FB_BASE:st._FB_BASE + 3, :] = (
            rows[st._SB_BASE:st._SB_BASE + 3, :])
        out_ref[st._FB_EMIT:st._FB_EMIT + 3, :] = (
            rows[st._SB_EMIT:st._SB_EMIT + 3, :])
        out_ref[st._FB_METAL:st._FB_TRI + 1, :] = (
            rows[st._SB_METAL:st._SB_TRI + 1, :])
        # traversal result rows
        out_ref[_ROW_HIT_T:_ROW_HIT_T + 1, :] = jnp.where(
            found, best_t, inf)
        out_ref[_ROW_FOUND:_ROW_FOUND + 1, :] = found.astype(jnp.float32)
        out_ref[_ROW_FOUND + 1:OUT_ROWS, :] = jnp.zeros(
            (OUT_ROWS - _ROW_FOUND - 1, tile), jnp.float32)

    out = pl.pallas_call(
        kern,
        grid=(r_pad // tile,),
        in_specs=[pl.BlockSpec((1, tile), lambda i: (0, i))] * 8
        + [pl.BlockSpec((t_pad, _G_COLS), lambda i: (0, 0)),
           pl.BlockSpec((c_pad, t_mxu), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((OUT_ROWS, tile), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((OUT_ROWS, r_pad), jnp.float32),
        interpret=interpret,
    )(*lanes, geom, tab_t)
    out = out[:, :r]

    found = out[_ROW_FOUND] > 0.5
    # tri id from the fetched row (original id, matches the XLA path where
    # padded rows carry -1); the traversal slot is the table row index
    tri = jnp.where(found, out[st._FB_TRI].astype(jnp.int32), -1)
    hit = Hit(jnp.where(found, out[_ROW_HIT_T], INF),
              jnp.zeros((r,)), jnp.zeros((r,)), tri)

    def v3(i):
        return Vec3(out[i], out[i + 1], out[i + 2])

    zeros = jnp.zeros((r,))
    neg1 = jnp.full((r,), -1, jnp.int32)
    attrs = st.ShadeAttrs(
        position=v3(st._FB_POS),
        prev_position=v3(st._FB_POS),
        flat_normal=v3(st._FB_FLAT),
        shading_normal=v3(st._FB_SHAD),
        tangent=Vec3(jnp.ones((r,)), zeros, zeros),
        uv_u=zeros,
        uv_v=zeros,
        is_front_face=out[st._FB_FRONT] > 0.5,
        material=neg1,
        object_id=neg1,
        tri=out[st._FB_TRI].astype(jnp.int32),
        base_color=v3(st._FB_BASE),
        emission=v3(st._FB_EMIT),
        metallic=out[st._FB_METAL],
        roughness=out[st._FB_ROUGH],
        ior=out[st._FB_IOR],
        transmission=out[st._FB_TRANS],
        light_pdf_area=out[st._FB_LPDF],
        light_cos=out[st._FB_LCOS],
        tex_base=neg1, tex_emit=neg1, tex_mr=neg1, tex_nrm=neg1,
        uv_density=zeros,
    )
    return hit, attrs


def any_hit(tris: DenseTris, origin: Vec3, direction: Vec3, t_min, t_max,
            interpret: bool | None = None) -> jnp.ndarray:
    """Fused occlusion sweep: division-free det-scaled Möller–Trumbore over
    VMEM-resident triangles, opacity-gated, one bool per lane. Bit-matches
    `traverse_dense.any_hit` (same _mt_any_chunk_T comparisons)."""
    from jax.experimental import pallas as pl

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    r = origin.x.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))

    geom = _geom_block(tris)
    t_pad = geom.shape[0]
    tile = _tile_for(t_pad)
    r_pad, lanes = _pad_lanes(
        r, tile, origin.x, origin.y, origin.z,
        direction.x, direction.y, direction.z, t_min, t_max)

    def kern(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
             tmin_ref, tmax_ref, geom_ref, out_ref):
        ox, oy, oz = ox_ref[:, :], oy_ref[:, :], oz_ref[:, :]
        dx, dy, dz = dx_ref[:, :], dy_ref[:, :], dz_ref[:, :]
        tmin, tmax = tmin_ref[:, :], tmax_ref[:, :]

        def gc(i):
            return geom_ref[:, i:i + 1]

        v0x, v0y, v0z = gc(_G_V0), gc(_G_V0 + 1), gc(_G_V0 + 2)
        e1x, e1y, e1z = gc(_G_E1), gc(_G_E1 + 1), gc(_G_E1 + 2)
        e2x, e2y, e2z = gc(_G_E2), gc(_G_E2 + 1), gc(_G_E2 + 2)
        op = gc(_G_OPACITY)

        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        s = jnp.where(det >= 0.0, 1.0, -1.0)
        adet = det * s
        tvx = ox - v0x
        tvy = oy - v0y
        tvz = oz - v0z
        un = (tvx * pvx + tvy * pvy + tvz * pvz) * s
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        vn = (dx * qvx + dy * qvy + dz * qvz) * s
        tn = (e2x * qvx + e2y * qvy + e2z * qvz) * s
        blocks = ((adet > 1e-12) & (un >= 0.0) & (vn >= 0.0)
                  & (un + vn <= adet)
                  & (tn > tmin * adet) & (tn < tmax * adet)
                  & (op >= 0.5))
        out_ref[:, :] = jnp.any(blocks, axis=0, keepdims=True).astype(
            jnp.float32)

    out = pl.pallas_call(
        kern,
        grid=(r_pad // tile,),
        in_specs=[pl.BlockSpec((1, tile), lambda i: (0, i))] * 8
        + [pl.BlockSpec((t_pad, _G_COLS), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((1, tile), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
        interpret=interpret,
    )(*lanes, geom)
    return out[0, :r] > 0.5
