"""Packed per-triangle shade table: ONE wide row-gather per hit.

Why: on this TPU/XLA stack, each additional dynamic gather inside a fused
loop body costs ~25 ms per 2M lanes (measured; they appear to lower to
serialized row loops), while ONE row-gather of a wide (T, 64) table costs
~5 ms total. So everything shading needs at a hit — triangle geometry,
vertex normals/tangents/UVs, material constants, emission, NEE-MIS light
pdf — is packed into a single f32 table row, fetched once per bounce, and
unpacked with pure elementwise math.

This replaces the reference's bindless descriptor-heap fetch chain
(reference: Shaders/RaytracingHelpers.hlsli:59-133 vertex loads +
Shaders/ShadingHelpers.hlsli material/texture loads + g_objectData lookups,
Source/CommonShaderData.ixx:14-40) with the TPU equivalent of one coalesced
"object data" read.
"""

from __future__ import annotations

import os as _os
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from . import sampling
from .vec import Vec3

# column layout
_P0 = 0       # 3: triangle base vertex
_E1 = 3       # 3: edge 1
_E2 = 6       # 3: edge 2
_N0 = 9       # 9: vertex normals
_T0 = 18      # 9: vertex tangents
_UV = 27      # 6: vertex uv (u0,v0,u1,v1,u2,v2)
_MAT = 33     # material id
_OBJ = 34     # object id
_TRI = 35     # original triangle id (-1 padding)
_EMIT = 36    # 3: emissive radiance
_BASE = 39    # 3: base color rgb
_METAL = 42
_ROUGH = 43
_IOR = 44
_TRANS = 45
_LPDF = 46    # NEE area-measure pdf of this triangle (0 if not a light)
_ALPHA_MODE = 47
_PP0 = 48     # 3: previous-frame base vertex (motion vectors; = p0 static)
_PE1 = 51     # 3
_PE2 = 54     # 3
_TEX_BASE = 57   # texture indices (-1 = none): base color
_TEX_EMIT = 58   # emissive
_TEX_MR = 59     # metallic-roughness (glTF: B=metal, G=rough)
_TEX_NRM = 60    # normal map
_UVDEN = 61      # sqrt(uv_area / world_area): UVs per world unit (mip LOD)
_ALPHA_CUT = 62  # alpha cutoff (ALPHA_MASK materials)
_ALPHA_CONST = 63  # constant base-color alpha factor
COLS = 64     # padded for lane alignment


def build(geometry, materials, lights) -> np.ndarray:
    """(T, COLS) float32, numpy (host-side, one device transfer)."""
    pos = np.asarray(geometry.positions, np.float32)
    nrm = np.asarray(geometry.normals, np.float32)
    tan = np.asarray(geometry.tangents, np.float32)[:, :3]
    uv = np.asarray(geometry.uv0, np.float32)
    ind = np.asarray(geometry.indices, np.int32)
    mat = np.asarray(geometry.tri_material, np.int32)
    obj = np.asarray(geometry.tri_object, np.int32)

    t = ind.shape[0]
    out = np.zeros((t, COLS), np.float32)
    i0, i1, i2 = ind[:, 0], ind[:, 1], ind[:, 2]
    out[:, _P0:_P0 + 3] = pos[i0]
    out[:, _E1:_E1 + 3] = pos[i1] - pos[i0]
    out[:, _E2:_E2 + 3] = pos[i2] - pos[i0]
    out[:, _N0:_N0 + 3] = nrm[i0]
    out[:, _N0 + 3:_N0 + 6] = nrm[i1]
    out[:, _N0 + 6:_N0 + 9] = nrm[i2]
    out[:, _T0:_T0 + 3] = tan[i0]
    out[:, _T0 + 3:_T0 + 6] = tan[i1]
    out[:, _T0 + 6:_T0 + 9] = tan[i2]
    out[:, _UV:_UV + 2] = uv[i0]
    out[:, _UV + 2:_UV + 4] = uv[i1]
    out[:, _UV + 4:_UV + 6] = uv[i2]
    out[:, _MAT] = mat
    out[:, _OBJ] = obj
    out[:, _TRI] = np.arange(t, dtype=np.float32)

    m_base = np.asarray(materials.base_color, np.float32)[:, :3]
    m_emit = np.asarray(materials.emissive, np.float32)
    m_metal = np.asarray(materials.metallic, np.float32)
    m_rough = np.asarray(materials.roughness, np.float32)
    m_ior = np.asarray(materials.ior, np.float32)
    m_trans = np.asarray(materials.transmission, np.float32)
    m_alpha = np.asarray(materials.alpha_mode, np.float32)
    out[:, _EMIT:_EMIT + 3] = m_emit[mat]
    out[:, _BASE:_BASE + 3] = m_base[mat]
    out[:, _METAL] = m_metal[mat]
    out[:, _ROUGH] = m_rough[mat]
    out[:, _IOR] = m_ior[mat]
    # fully-metallic kills transmission (Raytracing.hlsl:146)
    out[:, _TRANS] = np.where(m_metal[mat] < 1.0, m_trans[mat], 0.0)
    out[:, _ALPHA_MODE] = m_alpha[mat]

    # NEE MIS: area-measure pdf this triangle would have under power
    # sampling (passes/lights.py) — folded in so emission MIS costs no
    # extra gather
    t2l = np.asarray(lights.tri_to_light, np.int32)
    power = np.asarray(lights.power, np.float32)
    area = np.asarray(lights.area, np.float32)
    total = max(float(power.sum()), 1e-20)
    li = np.maximum(t2l, 0)
    lpdf = np.where(
        t2l >= 0, power[li] / total / np.maximum(area[li], 1e-20), 0.0
    )
    out[:, _LPDF] = lpdf
    # previous-frame geometry = current for static scenes; the animation
    # pass overwrites these per frame (GBufferGeneration.hlsl:62-91 motion)
    out[:, _PP0:_PP0 + 3] = out[:, _P0:_P0 + 3]
    out[:, _PE1:_PE1 + 3] = out[:, _E1:_E1 + 3]
    out[:, _PE2:_PE2 + 3] = out[:, _E2:_E2 + 3]
    # material texture slots (Material.ixx:23-33 order; models/material.py)
    ti = np.asarray(materials.texture_index, np.int32)
    out[:, _TEX_BASE] = ti[mat, 0]
    out[:, _TEX_EMIT] = ti[mat, 1]
    out[:, _TEX_MR] = ti[mat, 4]
    out[:, _TEX_NRM] = ti[mat, 6]
    # UV density for ray-cone mip selection: how many UV units one world
    # unit spans on this triangle (0 when UVs are degenerate -> level 0)
    duv1 = uv[i1] - uv[i0]
    duv2 = uv[i2] - uv[i0]
    uv_area = 0.5 * np.abs(duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0])
    e1w = pos[i1] - pos[i0]
    e2w = pos[i2] - pos[i0]
    world_area = 0.5 * np.linalg.norm(np.cross(e1w, e2w), axis=-1)
    out[:, _UVDEN] = np.sqrt(uv_area / np.maximum(world_area, 1e-20))
    out[:, _ALPHA_CUT] = np.asarray(materials.alpha_cutoff, np.float32)[mat]
    out[:, _ALPHA_CONST] = np.asarray(materials.base_color, np.float32)[mat, 3]
    return out


def pad(table: np.ndarray, chunk: int = 128) -> np.ndarray:
    t = table.shape[0]
    padn = (-t) % chunk
    if padn:
        padrows = np.zeros((padn, COLS), np.float32)
        padrows[:, _TRI] = -1.0
        padrows[:, (_TEX_BASE, _TEX_EMIT, _TEX_MR, _TEX_NRM)] = -1.0
        table = np.concatenate([table, padrows])
    return table


class ShadeAttrs(NamedTuple):
    """Unpacked hit attributes + material — everything `shade` consumes."""
    position: Vec3
    prev_position: Vec3
    flat_normal: Vec3
    shading_normal: Vec3
    tangent: Vec3
    uv_u: jnp.ndarray
    uv_v: jnp.ndarray
    is_front_face: jnp.ndarray
    material: jnp.ndarray       # i32
    object_id: jnp.ndarray      # i32
    tri: jnp.ndarray            # i32 original triangle, -1 invalid
    base_color: Vec3
    emission: Vec3
    metallic: jnp.ndarray
    roughness: jnp.ndarray
    ior: jnp.ndarray
    transmission: jnp.ndarray
    light_pdf_area: jnp.ndarray  # NEE MIS pdf of hitting this emitter
    light_cos: jnp.ndarray       # cos at the emitting side w.r.t. the ray
    tex_base: jnp.ndarray        # i32 texture indices, -1 = none
    tex_emit: jnp.ndarray
    tex_mr: jnp.ndarray
    tex_nrm: jnp.ndarray
    uv_density: jnp.ndarray      # UV units per world unit (mip LOD)


ONEHOT_MAX_ROWS = 512
# the FUSED bounce fetch kernel holds the (C', t_pad) table transpose and
# its (t_pad, tile) one-hot in VMEM, and its MXU dot contracts over the
# FULL t_pad — efficient systolic use far past the XLA one-hot cap.
# 8192 rows: table 1 MB + one-hot 4 MB VMEM, ~1.3 GMAC/128-lane tile.
# Round-5 motivation: the animated config's 5k-tri table fell to the
# blocked sort/gather fetch, which the breakdown measured at 72% of the
# frame (1086 of 1510 ms per 3 frames, 59 GB/frame of traffic).
FUSED_MAX_ROWS = 8192
# route small-table fetches through the Pallas kernel below (TPU only;
# default ON by measurement — tools/diag_fetch.py, v5e, 2M lanes, 30 cols:
# XLA one-hot dot 2.24 ms vs Pallas VMEM-resident 0.62 ms (3.6×), both
# exact; env-overridable for A/B runs)
FETCH_PALLAS = _os.environ.get("TPU_PBRT_FETCH_PALLAS", "1") == "1"
FETCH_BLOCK = 64     # table rows per block of the big-table fetch
FETCH_CHUNK = 128    # lanes per chunk (one vector-lane width)
FETCH_KB = 8         # blocks one-hot-fetched per chunk
FETCH_GROUP = 64     # chunks per map step (memory control)


def _fetch_rows(table: jnp.ndarray, slot: jnp.ndarray,
                coherent: bool = True) -> jnp.ndarray:
    """Row fetch, TRANSPOSED output (COLS, R): small tables go through a
    one-hot MXU matmul (measured ~7x faster than XLA's row gather inside a
    fused loop body on v5e: 4.3 vs 32 ms per 2M-lane bounce); the compare
    is exact and HIGHEST precision keeps f32 through the MXU. Larger
    tables use the chunked BLOCK fetch below — the direct row gather
    costs ~31 ms per 32 row-bytes per 2M lanes (the round-2 "big-scene
    gather wall": 50 tex cols = 200 B rows ~ 190 ms per bounce).

    Why transposed: the fetch result is materialized in HBM, and the
    unpack slices ~20 attribute groups out of it. Row-major (R, 64) puts
    the 64 columns on the minor axis, so every column slice re-reads most
    of the 530 MB buffer (profiled: the slice fusions cost more than the
    dot itself at 1080p). With (COLS, R) each attribute is one contiguous
    (R,) row — a slice reads only its own 8 MB."""
    from jax import lax

    tp = table.shape[0]
    if (FETCH_PALLAS and tp <= FUSED_MAX_ROWS
            and jax.default_backend() == "tpu"):
        # the VMEM-resident kernel scales past the XLA one-hot cap: its
        # MXU dot contracts the full t_pad and traffic stays slot+output
        # (see FUSED_MAX_ROWS note; the blocked sort/gather fetch at 5k
        # rows measured 72% of the animated frame)
        return _fetch_rows_pallas(table, slot)
    if tp <= ONEHOT_MAX_ROWS:
        onehot = (
            slot[None, :] == jnp.arange(tp, dtype=jnp.int32)[:, None]
        ).astype(jnp.float32)                                     # (T, R)
        return lax.dot_general(
            table, onehot, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST)                     # (C, R)
    if FETCH_SORTED:
        # handles coherent AND incoherent slots: the permutation sort
        # makes every chunk coherent by construction
        return _fetch_rows_sorted(table, slot)
    if coherent:
        return _fetch_rows_blocked(table, slot)
    # incoherent slots (e.g. CDF light draws): the chunked block fetch
    # would overflow its fallback pool — take the plain row gather
    return table[slot].T


def _fetch_rows_pallas(table: jnp.ndarray, slot: jnp.ndarray,
                       interpret: bool | None = None) -> jnp.ndarray:
    """Small-table row fetch as a Pallas kernel: the (T, C) table is
    resident in VMEM across grid steps and the one-hot selector is built
    in-register per lane tile, so — unlike the XLA one-hot dot, whose
    (T, R) f32 operand is materialized in HBM (~T*8 MB per 2M-lane
    bounce; the 'fetch 41%' slice of the 1080p PT profile) — HBM traffic
    is just the slot read + the (C, R) output write. The dot runs at
    HIGHEST precision so the selection is exact f32, same contract as
    `_fetch_rows`."""
    from jax.experimental import pallas as pl

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tp, c = table.shape
    r = slot.shape[0]
    t_pad = -(-max(tp, 128) // 128) * 128
    c_pad = -(-c // 8) * 8
    tab_t = jnp.zeros((c_pad, t_pad), jnp.float32).at[:c, :tp].set(
        table.astype(jnp.float32).T)
    # lane tile sized so the in-VMEM one-hot stays ~4 MB f32
    tile = min(8192, max(128, ((1 << 20) // t_pad) // 128 * 128))
    r_pad = -(-r // tile) * tile
    slot_p = jnp.concatenate(
        [slot, jnp.zeros((r_pad - r,), slot.dtype)]) if r_pad != r else slot

    def kern(slot_ref, tab_ref, out_ref):
        s = slot_ref[:, :]                                   # (1, tile)
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (t_pad, tile), 0)
        oh = (iota_t == s).astype(jnp.float32)               # (T, tile)
        out_ref[:, :] = jax.lax.dot_general(
            tab_ref[:, :], oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    out = pl.pallas_call(
        kern,
        grid=(r_pad // tile,),
        in_specs=[
            pl.BlockSpec((1, tile), lambda i: (0, i)),
            pl.BlockSpec((c_pad, t_pad), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((c_pad, tile), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((c_pad, r_pad), jnp.float32),
        interpret=interpret,
    )(slot_p[None, :], tab_t)
    return out[:c, :r]


# fused bounce-fetch: dot + unpack math in ONE Pallas kernel (staged —
# default set by frame-level A/B, like FETCH_PALLAS above). The round-4
# profile localized the PT frame's biggest slice in the unpack AROUND the
# fetch dot, not the dot: with the Pallas row fetch on, `fetch/pallas_call`
# is ~2 ms/frame while the fetch-scope slice fusions (MT re-derivation,
# normal interpolation + normalizes over the materialized (30, R) block)
# still cost ~12 ms/frame at 1080p. Fusing the unpack into the kernel
# removes the (30, R) HBM round-trip entirely: traffic drops to the
# slot/ray reads plus one (24, R) post-unpack output.
FETCH_FUSED = _os.environ.get("TPU_PBRT_FETCH_FUSED", "1") == "1"

# fused-output row layout ((FB_ROWS, R) f32, post-unpack values)
_FB_POS = 0       # 3: hit position
_FB_FLAT = 3      # 3: oriented flat normal
_FB_SHAD = 6      # 3: front-resolved shading normal
_FB_LCOS = 9      # emitting-side cosine (pre-orientation flat vs -ray)
_FB_FRONT = 10    # 1.0 = front face
_FB_BASE = 11     # 3
_FB_EMIT = 14     # 3
_FB_METAL = 17
_FB_ROUGH = 18
_FB_IOR = 19
_FB_TRANS = 20
_FB_LPDF = 21
_FB_TRI = 22      # f32-carried triangle id
FB_ROWS = 24

# _BOUNCE_COLS positions inside the untextured sub-table (see below)
_SB_P0, _SB_E1, _SB_E2 = 0, 3, 6
_SB_N0 = 9
_SB_EMIT, _SB_BASE = 18, 21
_SB_METAL, _SB_ROUGH, _SB_IOR, _SB_TRANS, _SB_LPDF, _SB_TRI = (
    24, 25, 26, 27, 28, 29)


def _fetch_bounce_fused_pallas(sub: jnp.ndarray, slot: jnp.ndarray,
                               o: Vec3, d: Vec3,
                               interpret: bool | None = None) -> jnp.ndarray:
    """(T, 30) untextured bounce sub-table + slots + rays -> (FB_ROWS, R)
    post-unpack block: one one-hot MXU row fetch (exact, HIGHEST) plus the
    whole `fetch_bounce` unpack (Möller–Trumbore barycentric re-derivation,
    flat/shading normal construction, front-face resolution) on VMEM
    operands."""
    from jax.experimental import pallas as pl

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tp, c = sub.shape
    r = slot.shape[0]
    t_pad = -(-max(tp, 128) // 128) * 128
    c_pad = -(-c // 8) * 8
    tab_t = jnp.zeros((c_pad, t_pad), jnp.float32).at[:c, :tp].set(
        sub.astype(jnp.float32).T)
    tile = min(8192, max(128, ((1 << 20) // t_pad) // 128 * 128))
    if r % 128 == 0:
        # prefer a tile that DIVIDES r: r_pad == r makes the per-output
        # unpad slice a pure reshape instead of 23 copy fusions
        for k in range(tile // 128, 0, -1):
            if (r // 128) % k == 0:
                tile = 128 * k
                break
    r_pad = -(-r // tile) * tile

    def padlane(a):
        return (jnp.concatenate([a, jnp.zeros((r_pad - r,), a.dtype)])
                if r_pad != r else a)

    slot_p = padlane(slot)
    lanes = [padlane(x) for x in (o.x, o.y, o.z, d.x, d.y, d.z)]

    def kern(slot_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
             tab_ref, out_ref):
        s = slot_ref[:, :]                                   # (1, tile)
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (t_pad, tile), 0)
        oh = (iota_t == s).astype(jnp.float32)
        rows = jax.lax.dot_general(
            tab_ref[:, :], oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)             # (C, tile)

        def g(i):
            return rows[i:i + 1, :]                          # (1, tile)

        ox, oy, oz = ox_ref[:, :], oy_ref[:, :], oz_ref[:, :]
        dx, dy, dz = dx_ref[:, :], dy_ref[:, :], dz_ref[:, :]
        p0x, p0y, p0z = g(_SB_P0), g(_SB_P0 + 1), g(_SB_P0 + 2)
        e1x, e1y, e1z = g(_SB_E1), g(_SB_E1 + 1), g(_SB_E1 + 2)
        e2x, e2y, e2z = g(_SB_E2), g(_SB_E2 + 1), g(_SB_E2 + 2)

        # Möller–Trumbore barycentrics (ops/intersect.py semantics)
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
        tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
        u = jnp.clip(u, 0.0, 1.0)
        v = jnp.clip(v, 0.0, 1.0)
        w = 1.0 - u - v

        out_ref(_FB_POS, p0x + e1x * u + e2x * v)
        out_ref(_FB_POS + 1, p0y + e1y * u + e2y * v)
        out_ref(_FB_POS + 2, p0z + e1z * u + e2z * v)

        fx = e1y * e2z - e1z * e2y
        fy = e1z * e2x - e1x * e2z
        fz = e1x * e2y - e1y * e2x
        finv = jax.lax.rsqrt(jnp.maximum(fx * fx + fy * fy + fz * fz,
                                         1e-20))
        fx, fy, fz = fx * finv, fy * finv, fz * finv

        sx = g(_SB_N0) * w + g(_SB_N0 + 3) * u + g(_SB_N0 + 6) * v
        sy = (g(_SB_N0 + 1) * w + g(_SB_N0 + 4) * u + g(_SB_N0 + 7) * v)
        sz = (g(_SB_N0 + 2) * w + g(_SB_N0 + 5) * u + g(_SB_N0 + 8) * v)
        sinv = jax.lax.rsqrt(jnp.maximum(sx * sx + sy * sy + sz * sz,
                                         1e-20))
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

        out_ref(_FB_FLAT, fx)
        out_ref(_FB_FLAT + 1, fy)
        out_ref(_FB_FLAT + 2, fz)
        out_ref(_FB_SHAD, sx)
        out_ref(_FB_SHAD + 1, sy)
        out_ref(_FB_SHAD + 2, sz)
        out_ref(_FB_LCOS, lcos)
        out_ref(_FB_FRONT, front.astype(jnp.float32))
        for j in range(3):
            out_ref(_FB_BASE + j, rows[_SB_BASE + j:_SB_BASE + j + 1, :])
            out_ref(_FB_EMIT + j, rows[_SB_EMIT + j:_SB_EMIT + j + 1, :])
        for dst, src in ((_FB_METAL, _SB_METAL), (_FB_ROUGH, _SB_ROUGH),
                         (_FB_IOR, _SB_IOR), (_FB_TRANS, _SB_TRANS),
                         (_FB_LPDF, _SB_LPDF), (_FB_TRI, _SB_TRI)):
            out_ref(dst, rows[src:src + 1, :])

    # SEPARATE (1, R) outputs, one per post-unpack row: a single
    # (FB_ROWS, R) block forced a 19-way slice kLoop fusion in every
    # consumer (the round-5 breakdown's single biggest PT op, 5.6
    # ms/frame of pure data movement re-reading the 192 MB block) —
    # multi-output writes each row to its own buffer once.
    def kern_mo(*refs):
        ins, outs = refs[:8], refs[8:]

        def write(idx, val):
            outs[idx][:, :] = val

        kern(*ins, write)

    n_out = _FB_TRI + 1
    outs = pl.pallas_call(
        kern_mo,
        grid=(r_pad // tile,),
        in_specs=[pl.BlockSpec((1, tile), lambda i: (0, i))] * 7
        + [pl.BlockSpec((c_pad, t_pad), lambda i: (0, 0))],
        out_specs=[pl.BlockSpec((1, tile), lambda i: (0, i))] * n_out,
        out_shape=[jax.ShapeDtypeStruct((1, r_pad), jnp.float32)] * n_out,
        interpret=interpret,
    )(slot_p[None, :], *(x[None, :] for x in lanes), tab_t)
    return [o[0, :r] for o in outs]


# slot-sorted big-table fetch (round 5c): the sphere-bench profile put
# the blocked fetch at 64% of the frame — its uncovered-lane fallback
# (full-pool 3-op sort + row gather + (pool, c) SCATTER, ~35 ms/query)
# fires whenever ANY lane misses the chunk's top-KB blocks, i.e. every
# bounce pool in practice. Sorting lanes by slot first makes each
# 128-lane chunk span ~2 distinct rows (2M lanes over ≤64k rows), so
# kb=4 covers essentially always and the fallback cond stays on its
# cheap branch; the results ride back to lane order through ONE
# (1+c)-operand sort instead of a scatter. A/B: TPU_PBRT_FETCH_SORTED.
FETCH_SORTED = _os.environ.get("TPU_PBRT_FETCH_SORTED", "1") == "1"
FETCH_KB_SORTED = 4


def _fetch_rows_sorted(table: jnp.ndarray, slot: jnp.ndarray
                       ) -> jnp.ndarray:
    """Big-table row fetch, slot-sorted: 2-operand permutation sort →
    blocked one-hot fetch on the sorted (near-perfectly coherent) slots
    → one multi-operand unsort carrying the c output columns. Same
    (C, R) contract as `_fetch_rows_blocked`."""
    from jax import lax

    tp, c = table.shape
    r = slot.shape[0]
    rpad = (-r) % FETCH_CHUNK
    slot_p = jnp.concatenate(
        [slot, jnp.zeros((rpad,), slot.dtype)]) if rpad else slot
    rp = slot_p.shape[0]
    iota = jnp.arange(rp, dtype=jnp.int32)
    slot_s, perm = lax.sort((slot_p, iota), dimension=0, num_keys=1)
    rows_t = _fetch_rows_blocked(table, slot_s, kb=FETCH_KB_SORTED)
    outs = lax.sort((perm,) + tuple(rows_t[j] for j in range(c)),
                    dimension=0, num_keys=1)
    return jnp.stack(outs[1:], axis=0)[:, :r]


def _fetch_rows_blocked(table: jnp.ndarray, slot: jnp.ndarray,
                        kb: int | None = None) -> jnp.ndarray:
    """Big-table row fetch as MXU matmuls: lanes are processed in chunks
    of FETCH_CHUNK; each chunk one-hot-fetches the FETCH_KB blocks (of
    FETCH_BLOCK rows) most of its lanes address, then selects per-lane
    rows from the fetched tile with a second one-hot. Lanes whose block
    did not make the chunk's top-KB (rare: neighboring lanes are
    neighboring pixels hitting id-adjacent triangles) are compacted to
    the head of an R/8 pool by one multi-operand sort and resolved by a
    plain row gather there, then row-scattered back. MAC cost is linear
    in the table size (KB x B one-hots), NOT in lanes x row-bytes like
    the gather."""
    from jax import lax

    tp, c = table.shape
    r = slot.shape[0]
    bpad = (-tp) % FETCH_BLOCK
    if bpad:
        table = jnp.concatenate(
            [table, jnp.zeros((bpad, c), table.dtype)])
    nb = table.shape[0] // FETCH_BLOCK
    tableb = table.reshape(nb, FETCH_BLOCK * c)

    rpad = (-r) % FETCH_CHUNK
    slot_p = jnp.concatenate(
        [slot, jnp.zeros((rpad,), slot.dtype)]) if rpad else slot
    rp = slot_p.shape[0]
    nc = rp // FETCH_CHUNK
    g = min(FETCH_GROUP, nc)
    while nc % g:
        g -= 1

    iota_b = jnp.arange(nb, dtype=jnp.int32)
    kb = min(FETCH_KB if kb is None else kb, nb)

    def chunk(sl):
        blk = sl // FETCH_BLOCK                              # (128,)
        pos = sl % FETCH_BLOCK
        counts = jnp.sum(iota_b[:, None] == blk[None, :],
                         axis=1).astype(jnp.int32)           # (B,)
        _, chosen = lax.top_k(counts, kb)                    # (kb,)
        onehot_b = (chosen[:, None] == iota_b[None, :]).astype(
            jnp.float32)                                     # (kb, B)
        fetched = lax.dot_general(
            onehot_b, tableb, (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST)                 # (kb, 64*c)
        fetched = fetched.reshape(kb * FETCH_BLOCK, c)
        match = chosen[:, None] == blk[None, :]              # (kb, 128)
        covered = match.any(axis=0)
        k_idx = jnp.argmax(match, axis=0).astype(jnp.int32)
        local = k_idx * FETCH_BLOCK + pos                    # (128,)
        sel = (local[:, None] == jnp.arange(
            kb * FETCH_BLOCK, dtype=jnp.int32)[None, :]).astype(
            jnp.float32)                                     # (128, kb*64)
        rows = lax.dot_general(
            sel, fetched, (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST)                 # (128, c)
        return rows, covered

    rows, covered = lax.map(
        lambda s: jax.vmap(chunk)(s),
        slot_p.reshape(nc // g, g, FETCH_CHUNK))
    rows = rows.reshape(rp, c)
    covered = covered.reshape(rp)
    n_unc = jnp.sum((~covered).astype(jnp.int32))

    # fallback: compact uncovered lanes to the head of an rp/8 pool by
    # one sort, row-gather just that slice, row-scatter back (mode=drop
    # on the out-of-play lanes).
    pool = max((rp // 8) // FETCH_CHUNK * FETCH_CHUNK, FETCH_CHUNK)

    def fallback(rows):
        rid0 = jnp.arange(rp, dtype=jnp.int32)
        _, slot_s, rid = lax.sort(
            (covered.astype(jnp.int32), slot_p, rid0),
            dimension=0, num_keys=1)
        sl = slice(0, pool)
        fb = table[slot_s[sl]]                               # (pool, c)
        in_play = jnp.arange(pool) < n_unc
        rid_eff = jnp.where(in_play, rid[sl], rp)
        return rows.at[rid_eff].set(fb, mode="drop")

    rows = lax.cond(n_unc > 0, fallback, lambda x: x, rows)
    # uncovered lanes beyond the pool (pathological coherence collapse):
    # resolved exactly by a masked full gather — never fires in practice.
    rows = lax.cond(
        n_unc > pool,
        lambda x: jnp.where(covered[:, None], x, table[slot_p]),
        lambda x: x, rows)
    return rows[:r].T


def fetch(table: jnp.ndarray, slot: jnp.ndarray, ray_origin: Vec3,
          ray_dir: Vec3, u: jnp.ndarray | None = None,
          v: jnp.ndarray | None = None) -> ShadeAttrs:
    """One row fetch + elementwise unpack/interpolate.

    slot: (R,) padded-table row index (clamped >= 0 by caller). When u/v
    are None the barycentrics are re-derived against the fetched triangle
    (Möller–Trumbore on the winning row — cheaper than carrying them
    through the traversal's minor-axis reductions)."""
    from . import vec

    row = _fetch_rows(table, slot)          # (COLS, R)

    def v3(c):
        return Vec3(row[c], row[c + 1], row[c + 2])

    p0 = v3(_P0)
    e1 = v3(_E1)
    e2 = v3(_E2)
    if u is None or v is None:
        from . import intersect

        _, u, v, _ = intersect.ray_triangle_soa(
            ray_origin, ray_dir, p0, e1, e2, -jnp.inf, jnp.inf
        )
        u = jnp.clip(u, 0.0, 1.0)
        v = jnp.clip(v, 0.0, 1.0)
    w = 1.0 - u - v
    position = p0 + e1 * u + e2 * v
    prev_position = v3(_PP0) + v3(_PE1) * u + v3(_PE2) * v

    flat = vec.normalize(vec.cross(e1, e2))

    n0 = v3(_N0)
    n1 = v3(_N0 + 3)
    n2 = v3(_N0 + 6)
    shading = vec.normalize(n0 * w + n1 * u + n2 * v)

    t0 = v3(_T0)
    t1 = v3(_T0 + 3)
    t2 = v3(_T0 + 6)
    tangent = vec.normalize(t0 * w + t1 * u + t2 * v)

    uv_u = row[_UV] * w + row[_UV + 2] * u + row[_UV + 4] * v
    uv_v = row[_UV + 1] * w + row[_UV + 3] * u + row[_UV + 5] * v

    # emitting-side cosine (lights emit from their winding side):
    # cos = dot(flat_winding, -ray_dir)
    light_cos = -vec.dot(flat, ray_dir)

    # orient flat with the interpolated normal, then resolve front face
    flat = vec.where(vec.dot(flat, shading) < 0.0, -flat, flat)
    front = vec.dot(flat, ray_dir) < 0.0
    shading = vec.where(front, shading, -shading)

    return ShadeAttrs(
        position=position,
        prev_position=prev_position,
        flat_normal=flat,
        shading_normal=shading,
        tangent=tangent,
        uv_u=uv_u,
        uv_v=uv_v,
        is_front_face=front,
        material=row[_MAT].astype(jnp.int32),
        object_id=row[_OBJ].astype(jnp.int32),
        tri=row[_TRI].astype(jnp.int32),
        base_color=v3(_BASE),
        emission=v3(_EMIT),
        metallic=row[_METAL],
        roughness=row[_ROUGH],
        ior=row[_IOR],
        transmission=row[_TRANS],
        light_pdf_area=row[_LPDF],
        light_cos=light_cos,
        tex_base=row[_TEX_BASE].astype(jnp.int32),
        tex_emit=row[_TEX_EMIT].astype(jnp.int32),
        tex_mr=row[_TEX_MR].astype(jnp.int32),
        tex_nrm=row[_TEX_NRM].astype(jnp.int32),
        uv_density=row[_UVDEN],
    )


# compact bounce-loop column subsets: the bounce loop consumes ~27 of the
# 64 columns (no prev-frame geometry, no object ids; tangent/uv/tex only
# when textured). Fetching the subset halves the materialized dot output
# and its unpack traffic (profiled: the full-width fetch cost more than
# traversal at 1080p).
_BOUNCE_COLS = (
    list(range(_P0, _P0 + 9))        # p0, e1, e2
    + list(range(_N0, _N0 + 9))      # vertex normals
    + list(range(_EMIT, _EMIT + 3))
    + list(range(_BASE, _BASE + 3))
    + [_METAL, _ROUGH, _IOR, _TRANS, _LPDF, _TRI]
)
_BOUNCE_COLS_TEX = (
    _BOUNCE_COLS
    + list(range(_T0, _T0 + 9))
    + list(range(_UV, _UV + 6))
    + [_TEX_BASE, _TEX_EMIT, _TEX_MR, _TEX_NRM, _UVDEN]
)


def fetch_bounce(table: jnp.ndarray, slot: jnp.ndarray, ray_origin: Vec3,
                 ray_dir: Vec3, atlas=None, footprint=None) -> ShadeAttrs:
    """Bounce-loop fetch: one-hot fetch of the COMPACT column subset.

    Same semantics as `fetch` for the attributes the integrator uses;
    prev_position aliases position and object/uv/tex fields are dummies
    unless textured (the G-buffer pass keeps using the full `fetch`).
    Applies the texture maps when `atlas` is given; `footprint` (per-lane
    world-space ray-cone width at the hit) selects mip levels."""
    from . import vec

    textured = atlas is not None
    cols = _BOUNCE_COLS_TEX if textured else _BOUNCE_COLS
    sub = table[:, jnp.asarray(cols, jnp.int32)]   # (T, C') — tiny gather
    if (not textured and FETCH_FUSED and table.shape[0] <= FUSED_MAX_ROWS
            and jax.default_backend() == "tpu"):
        return _fetch_bounce_fused(sub, slot, ray_origin, ray_dir)
    row = _fetch_rows(sub, slot)                   # (C', R)
    pos_of = {c: i for i, c in enumerate(cols)}

    def at(c):
        return row[pos_of[c]]

    def v3(c):
        i = pos_of[c]
        return Vec3(row[i], row[i + 1], row[i + 2])

    p0, e1, e2 = v3(_P0), v3(_E1), v3(_E2)
    from . import intersect

    _, u, v, _ = intersect.ray_triangle_soa(
        ray_origin, ray_dir, p0, e1, e2, -jnp.inf, jnp.inf)
    u = jnp.clip(u, 0.0, 1.0)
    v = jnp.clip(v, 0.0, 1.0)
    w = 1.0 - u - v
    position = p0 + e1 * u + e2 * v
    flat = vec.normalize(vec.cross(e1, e2))
    shading = vec.normalize(v3(_N0) * w + v3(_N0 + 3) * u + v3(_N0 + 6) * v)
    light_cos = -vec.dot(flat, ray_dir)
    flat = vec.where(vec.dot(flat, shading) < 0.0, -flat, flat)
    front = vec.dot(flat, ray_dir) < 0.0
    shading = vec.where(front, shading, -shading)

    r = position.x.shape[0]
    zeros = jnp.zeros((r,))
    neg1 = jnp.full((r,), -1, jnp.int32)
    if textured:
        tangent = vec.normalize(
            v3(_T0) * w + v3(_T0 + 3) * u + v3(_T0 + 6) * v)
        uv_u = at(_UV) * w + at(_UV + 2) * u + at(_UV + 4) * v
        uv_v = at(_UV + 1) * w + at(_UV + 3) * u + at(_UV + 5) * v
        tex = (at(_TEX_BASE).astype(jnp.int32),
               at(_TEX_EMIT).astype(jnp.int32),
               at(_TEX_MR).astype(jnp.int32),
               at(_TEX_NRM).astype(jnp.int32))
        uvden = at(_UVDEN)
    else:
        tangent = Vec3(jnp.ones((r,)), zeros, zeros)
        uv_u = uv_v = zeros
        tex = (neg1, neg1, neg1, neg1)
        uvden = zeros

    attrs = ShadeAttrs(
        position=position,
        prev_position=position,
        flat_normal=flat,
        shading_normal=shading,
        tangent=tangent,
        uv_u=uv_u,
        uv_v=uv_v,
        is_front_face=front,
        material=neg1,
        object_id=neg1,
        tri=at(_TRI).astype(jnp.int32),
        base_color=v3(_BASE),
        emission=v3(_EMIT),
        metallic=at(_METAL),
        roughness=at(_ROUGH),
        ior=at(_IOR),
        transmission=at(_TRANS),
        light_pdf_area=at(_LPDF),
        light_cos=light_cos,
        tex_base=tex[0],
        tex_emit=tex[1],
        tex_mr=tex[2],
        tex_nrm=tex[3],
        uv_density=uvden,
    )
    if textured:
        attrs = apply_textures(atlas, attrs, footprint=footprint)
    return attrs


def _fetch_bounce_fused(sub: jnp.ndarray, slot: jnp.ndarray,
                        ray_origin: Vec3, ray_dir: Vec3,
                        interpret: bool | None = None) -> ShadeAttrs:
    """`fetch_bounce`'s untextured path through the fused Pallas kernel:
    identical ShadeAttrs contract, built from the (FB_ROWS, R) post-unpack
    block (dummy tangent/uv/tex fields, as in the XLA path)."""
    out = _fetch_bounce_fused_pallas(sub, slot, ray_origin, ray_dir,
                                     interpret=interpret)

    def v3(i):
        return Vec3(out[i], out[i + 1], out[i + 2])

    r = slot.shape[0]
    zeros = jnp.zeros((r,))
    neg1 = jnp.full((r,), -1, jnp.int32)
    return ShadeAttrs(
        position=v3(_FB_POS),
        prev_position=v3(_FB_POS),
        flat_normal=v3(_FB_FLAT),
        shading_normal=v3(_FB_SHAD),
        tangent=Vec3(jnp.ones((r,)), zeros, zeros),
        uv_u=zeros,
        uv_v=zeros,
        is_front_face=out[_FB_FRONT] > 0.5,
        material=neg1,
        object_id=neg1,
        tri=out[_FB_TRI].astype(jnp.int32),
        base_color=v3(_FB_BASE),
        emission=v3(_FB_EMIT),
        metallic=out[_FB_METAL],
        roughness=out[_FB_ROUGH],
        ior=out[_FB_IOR],
        transmission=out[_FB_TRANS],
        light_pdf_area=out[_FB_LPDF],
        light_cos=out[_FB_LCOS],
        tex_base=neg1,
        tex_emit=neg1,
        tex_mr=neg1,
        tex_nrm=neg1,
        uv_density=zeros,
    )


_ALPHA_COLS = (
    list(range(_P0, _P0 + 9))        # p0, e1, e2 (barycentric recompute)
    + list(range(_UV, _UV + 6))
    + [_TEX_BASE, _ALPHA_MODE, _ALPHA_CUT, _ALPHA_CONST]
)


def hit_transparent(table: jnp.ndarray, slot: jnp.ndarray, ray_origin: Vec3,
                    ray_dir: Vec3, atlas) -> jnp.ndarray:
    """(R,) bool — True where the hit triangle is an ALPHA_MASK surface
    whose base-color alpha at the hit UV falls below the cutoff (the
    any-hit alpha test the reference emulates by re-intersecting,
    reference: Shaders/RaytracingHelpers.hlsli:17-44 +
    ShadingHelpers.hlsli IsOpaque). Minimal column fetch + ONE nearest
    texture tap; caller masks by hit validity."""
    from . import intersect, texture as tex_mod

    cols = _ALPHA_COLS
    sub = table[:, jnp.asarray(cols, jnp.int32)]
    row = _fetch_rows(sub, slot)
    pos_of = {c: i for i, c in enumerate(cols)}

    def v3(c):
        i = pos_of[c]
        return Vec3(row[i], row[i + 1], row[i + 2])

    p0, e1, e2 = v3(_P0), v3(_E1), v3(_E2)
    _, u, v, _ = intersect.ray_triangle_soa(
        ray_origin, ray_dir, p0, e1, e2, -jnp.inf, jnp.inf)
    u = jnp.clip(u, 0.0, 1.0)
    v = jnp.clip(v, 0.0, 1.0)
    w = 1.0 - u - v

    def at(c):
        return row[pos_of[c]]

    uv_u = at(_UV) * w + at(_UV + 2) * u + at(_UV + 4) * v
    uv_v = at(_UV + 1) * w + at(_UV + 3) * u + at(_UV + 5) * v
    tex = at(_TEX_BASE).astype(jnp.int32)
    _, tex_a = tex_mod.sample_nearest(atlas, tex, uv_u, uv_v)
    alpha = at(_ALPHA_CONST) * jnp.where(tex >= 0, tex_a, 1.0)
    from ..models.material import ALPHA_MASK

    return (at(_ALPHA_MODE) == ALPHA_MASK) & (alpha < at(_ALPHA_CUT))


# ---------------------------------------------------------------------------
# packed emissive-light table for NEE (one row-gather per light sample)
# ---------------------------------------------------------------------------

_LV0 = 0
_LE1 = 3
_LE2 = 6
_LN = 9
_LRAD = 12
_LPDFA = 15
_LAREA = 16
LIGHT_COLS = 17


def build_light_table(lights) -> np.ndarray:
    """(L, 16) float32: v0, e1, e2, normal, radiance, area-pdf."""
    n = np.asarray(lights.v0, np.float32).shape[0]
    out = np.zeros((n, LIGHT_COLS), np.float32)
    out[:, _LV0:_LV0 + 3] = np.asarray(lights.v0, np.float32)
    out[:, _LE1:_LE1 + 3] = np.asarray(lights.e1, np.float32)
    out[:, _LE2:_LE2 + 3] = np.asarray(lights.e2, np.float32)
    out[:, _LN:_LN + 3] = np.asarray(lights.normal, np.float32)
    out[:, _LRAD:_LRAD + 3] = np.asarray(lights.radiance, np.float32)
    power = np.asarray(lights.power, np.float32)
    area = np.asarray(lights.area, np.float32)
    total = max(float(power.sum()), 1e-20)
    out[:, _LPDFA] = power / total / np.maximum(area, 1e-20)
    out[:, _LAREA] = area
    return out


class LightFetch(NamedTuple):
    position: Vec3
    normal: Vec3
    radiance: Vec3
    pdf_area: jnp.ndarray


SELECT_MAX_LIGHTS = 8


def _light_rows(table: jnp.ndarray, li: jnp.ndarray):
    """Row accessor for a light index vector: broadcast select chain for
    tiny light sets (pure elementwise, fuses into the consumer), one-hot
    MXU fetch otherwise — never a per-lane gather."""
    nl = table.shape[0]
    if nl <= SELECT_MAX_LIGHTS:
        def col(c):
            out = jnp.full(li.shape, table[0, c])
            for l in range(1, nl):
                out = jnp.where(li == l, table[l, c], out)
            return out

        return [col(c) for c in range(LIGHT_COLS)]
    return _fetch_rows(table, li, coherent=False)   # (COLS, R)


def fetch_light_pdf_area(table: jnp.ndarray, li: jnp.ndarray):
    """Area-measure selection pdf column for explicit light indices —
    rides the same row fetch as fetch_light_by_index (XLA CSE merges the
    two when both appear in one jit), so it costs zero extra gathers."""
    return _light_rows(table, jnp.maximum(li, 0))[_LPDFA]


def fetch_light_area(table: jnp.ndarray, li: jnp.ndarray):
    """Triangle area column (the ReGIR chained-RIS weight needs 1/(W*area)
    without a per-lane gather)."""
    return _light_rows(table, jnp.maximum(li, 0))[_LAREA]


def fetch_light_by_index(table: jnp.ndarray, li: jnp.ndarray,
                         bary_u, bary_v) -> LightFetch:
    """Row fetch of explicit light indices + sqrt-warped point
    reconstruction (the ReSTIR reservoir-sample accessor — replaces five
    per-lane gathers per call with one fused fetch)."""
    row = _light_rows(table, jnp.maximum(li, 0))

    def v3(c):
        return Vec3(row[c], row[c + 1], row[c + 2])

    s = jnp.sqrt(bary_u)
    b0 = s * (1.0 - bary_v)
    b1 = s * bary_v
    pos = v3(_LV0) + v3(_LE1) * b0 + v3(_LE2) * b1
    return LightFetch(pos, v3(_LN), v3(_LRAD), row[_LPDFA])


def fetch_light(table: jnp.ndarray, cdf: jnp.ndarray, u0, bary_u, bary_v) -> LightFetch:
    """Power-CDF selection + one row fetch + uniform point.

    Tiny light sets (<= 8 rows — e.g. the Cornell panel) skip the one-hot
    dot for a broadcast select chain: pure elementwise work XLA fuses into
    the NEE consumer, eliminating the (16, R) HBM materialization + its
    T(1,128) unpack fusion (profiled at ~5 ms/frame at 1080p)."""
    nl = table.shape[0]
    li = jnp.clip(sampling.draw_cdf(cdf, u0), 0, nl - 1)
    return fetch_light_by_index(table, li, bary_u, bary_v)


def refresh_light_table(light_table: jnp.ndarray, light_tri: jnp.ndarray,
                        v0, v1, v2, num_tris: int):
    """Device-side per-frame emissive-light refresh (the reference re-runs
    LightPreparation every ReSTIR frame, App.cpp:1095-1115): gather the
    posed light triangles from the deformed soup, recompute
    normal/area/power/CDF, and return (light_table, cdf, per-padded-
    triangle emission-MIS pdf column for the shade table). Handles moving
    AND scaling emitters (area/power change under animated scale)."""
    li = jnp.maximum(light_tri, 0)
    lv0, lv1, lv2 = v0[li], v1[li], v2[li]
    le1, le2 = lv1 - lv0, lv2 - lv0
    cr = jnp.cross(le1, le2)
    crlen = jnp.maximum(
        jnp.linalg.norm(cr, axis=-1, keepdims=True), 1e-20)
    normal = cr / crlen
    area = 0.5 * crlen[:, 0]
    rad = light_table[:, _LRAD:_LRAD + 3]
    lum = rad @ jnp.asarray([0.2126, 0.7152, 0.0722], jnp.float32)
    power = lum * area * jnp.pi
    total = jnp.maximum(power.sum(), 1e-20)
    cdf = jnp.cumsum(power) / total
    pdfa = power / total / jnp.maximum(area, 1e-20)

    table = light_table.at[:, _LV0:_LV0 + 3].set(lv0)
    table = table.at[:, _LE1:_LE1 + 3].set(le1)
    table = table.at[:, _LE2:_LE2 + 3].set(le2)
    table = table.at[:, _LN:_LN + 3].set(normal)
    table = table.at[:, _LPDFA].set(pdfa)
    table = table.at[:, _LAREA].set(area)

    tri_lpdf = jnp.zeros((num_tris,), jnp.float32).at[li].set(
        jnp.where(light_tri >= 0, pdfa, 0.0))
    return table, cdf, tri_lpdf


def update_geometry(table: jnp.ndarray, p0, e1, e2,
                    normals0, normals1, normals2,
                    prev_p0, prev_e1, prev_e2) -> jnp.ndarray:
    """Device-side per-frame geometry refresh for deforming meshes (the
    skinning pass output; Scene.ixx:233-280 analogue). All args (T, 3)
    arrays in triangle order; padding rows must be passed through."""
    t = table.shape[0]

    def put(tab, col, arr):
        return tab.at[:, col:col + 3].set(arr)

    table = put(table, _P0, p0)
    table = put(table, _E1, e1)
    table = put(table, _E2, e2)
    table = put(table, _N0, normals0)
    table = put(table, _N0 + 3, normals1)
    table = put(table, _N0 + 6, normals2)
    table = put(table, _PP0, prev_p0)
    table = put(table, _PE1, prev_e1)
    table = put(table, _PE2, prev_e2)
    return table


def apply_textures(atlas, attrs: ShadeAttrs, footprint=None) -> ShadeAttrs:
    """Modulate the fetched material by its texture maps
    (reference: Shaders/ShadingHelpers.hlsli:159-235 EvaluateMaterial —
    base-color/emissive multiply, metallic-roughness B/G channels, normal
    perturbation through the TBN). `footprint` — world-space ray-cone
    width at the hit — selects mip levels (ray-cone replacement for the
    reference's screen-space SampleGrad); None keeps level-0 bilinear."""
    from . import texture as tex_mod
    from . import vec

    u, v = attrs.uv_u, attrs.uv_v

    if footprint is not None:
        # texels covered = footprint(world) * uv_density * map_resolution;
        # per-map resolution folds in as an additive log2 term
        uv_span = jnp.maximum(footprint * attrs.uv_density, 1e-20)
        log2_span = jnp.log2(uv_span)

        def sample(tex_index):
            w = atlas.desc[jnp.maximum(tex_index, 0)][:, 1]
            lod = jnp.maximum(log2_span + jnp.log2(w), 0.0)
            return tex_mod.sample_lod(atlas, tex_index, u, v, lod)
    else:
        def sample(tex_index):
            return tex_mod.sample_bilinear(atlas, tex_index, u, v)

    base_rgb, base_a = sample(attrs.tex_base)
    has = attrs.tex_base >= 0
    base_color = vec.where(has, attrs.base_color * base_rgb,
                           attrs.base_color)

    emit_rgb, _ = sample(attrs.tex_emit)
    emission = vec.where(attrs.tex_emit >= 0, attrs.emission * emit_rgb,
                         attrs.emission)

    mr_rgb, _ = sample(attrs.tex_mr)
    has_mr = attrs.tex_mr >= 0
    metallic = jnp.where(has_mr, attrs.metallic * mr_rgb.z, attrs.metallic)
    roughness = jnp.where(has_mr, attrs.roughness * mr_rgb.y,
                          attrs.roughness)

    nrm_rgb, _ = sample(attrs.tex_nrm)
    has_n = attrs.tex_nrm >= 0
    # tangent-space normal decode + TBN rotate (Math.hlsli:17-21 TBN)
    n_ts = vec.normalize(Vec3(nrm_rgb.x * 2.0 - 1.0, nrm_rgb.y * 2.0 - 1.0,
                              jnp.maximum(nrm_rgb.z * 2.0 - 1.0, 1e-3)))
    n = attrs.shading_normal
    t = vec.normalize(attrs.tangent - n * vec.dot(n, attrs.tangent))
    b = vec.cross(n, t)
    n_world = vec.normalize(t * n_ts.x + b * n_ts.y + n * n_ts.z)
    shading = vec.where(has_n, n_world, attrs.shading_normal)

    return attrs._replace(base_color=base_color, emission=emission,
                          metallic=metallic, roughness=roughness,
                          shading_normal=shading)
