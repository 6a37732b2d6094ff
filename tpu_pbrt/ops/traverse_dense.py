"""Dense (gather-free) traversal: blocked all-triangles intersection.

Why this exists: the TPU vector unit has no per-lane gather, so the
skip-link BVH walk (ops/traverse.py) — whose loop body is a chain of
*loop-carried* dynamic gathers — runs at ~20 ms per step per 1M rays on a
v5e, ~1000x slower than its dense equivalent. For small-to-medium triangle
counts the TPU-idiomatic replacement for hardware `TraceRay` is a *dense*
sweep: every ray tests every triangle in Morton-coherent blocks, expressed
as broadcasted vector ops the compiler can keep entirely in registers/VMEM.
The per-(ray, triangle) work is ~50 VPU flops; a v5e sustains hundreds of
Mrays/s on scenes up to a few thousand triangles this way — far above the
gather-based walk.

Large scenes use the two-level blocked variant (`closest_hit_blocked`):
triangles are grouped into Morton-ordered blocks with precomputed AABBs;
each block is slab-tested against all rays first (dense R x B, no gathers)
and the expensive triangle sweep is masked per block. A Pallas ray-GEMM
kernel is the next step up (see ops/traverse_pallas.py).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from . import intersect
from .traverse import Hit
from .vec import Vec3

INF = jnp.float32(jnp.inf)

# MXU plane-form sweep (Havel–Herout), the dense twin of
# traverse_culled._mt_mxu_T: the six per-(tri, ray) dot products of the
# triangle test come out of ONE (3C, 4) @ (4, 2R) f32 HIGHEST matmul and
# only ~13 VPU ops/pair remain.
#
# MEASURED NEGATIVE RESULT (round 5, v5e): cornell PT-only bench 193.74
# (off) vs 91.08 Mrays/s (on) — a 2.1x LOSS. See the longer note in
# traverse_culled.py; default OFF, kept as tested engineering record.
# Import-time-only flag: jitted callers bake the value at first trace.
MT_MXU = os.environ.get("TPU_PBRT_MT_MXU", "0") == "1"


def _plane_rows(cv0, ce1, ce2):
    """(3C, 4) plane-form rows from (C, 3) chunk components (see
    `_plane_rows_soa` for the math and contract)."""
    return _plane_rows_soa(cv0[:, 0], cv0[:, 1], cv0[:, 2],
                           ce1[:, 0], ce1[:, 1], ce1[:, 2],
                           ce2[:, 0], ce2[:, 1], ce2[:, 2])


def _plane_rows_soa(v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z):
    """(3C, 4) plane-form rows [n | n.v0], [p1 | v0.p1], [p2 | v0.p2]
    with n = e1 x e2, p1 = (e2 x n)/|n|^2, p2 = (n x e1)/|n|^2, from
    (C,) SoA component vectors. Built in-register (~25 VPU ops per
    TRIANGLE, amortized over all R rays). Degenerate/padded rows
    (e1 = e2 = 0) yield n = 0 -> den = 0 -> guaranteed miss. Shared
    with the culled tracer's `_mt_mxu_T` (advisor r4: the twin copies
    could drift)."""
    nx = e1y * e2z - e1z * e2y
    ny = e1z * e2x - e1x * e2z
    nz = e1x * e2y - e1y * e2x
    n2 = nx * nx + ny * ny + nz * nz
    inv_n2 = 1.0 / jnp.where(n2 > 0.0, n2, 1.0)
    p1x = (e2y * nz - e2z * ny) * inv_n2
    p1y = (e2z * nx - e2x * nz) * inv_n2
    p1z = (e2x * ny - e2y * nx) * inv_n2
    p2x = (ny * e1z - nz * e1y) * inv_n2
    p2y = (nz * e1x - nx * e1z) * inv_n2
    p2z = (nx * e1y - ny * e1x) * inv_n2
    d0 = nx * v0x + ny * v0y + nz * v0z
    c1 = p1x * v0x + p1y * v0y + p1z * v0z
    c2 = p2x * v0x + p2y * v0y + p2z * v0z
    return jnp.concatenate([
        jnp.stack([nx, ny, nz, d0], axis=1),
        jnp.stack([p1x, p1y, p1z, c1], axis=1),
        jnp.stack([p2x, p2y, p2z, c2], axis=1)], axis=0)


def _mxu_dots(T, o: Vec3, d: Vec3):
    """(3C, 2R) = T @ [[o; -1] | [d; 0]] on the MXU at f32 HIGHEST."""
    r = o.x.shape[0]
    ones = jnp.ones((r,), jnp.float32)
    X = jnp.stack([
        jnp.concatenate([o.x, d.x]),
        jnp.concatenate([o.y, d.y]),
        jnp.concatenate([o.z, d.z]),
        jnp.concatenate([-ones, jnp.zeros((r,), jnp.float32)])],
        axis=0)
    return lax.dot_general(T, X, (((1,), (0,)), ((), ())),
                           precision=lax.Precision.HIGHEST)


def _mt_mxu_chunk_T(o, d, cv0, ce1, ce2, t_min, t_max):
    """Plane-form closest-hit sweep on the MXU; same contract as
    `_mt_chunk_T` ((t, u, v), t (C, R) inf where missed). den = n.d
    equals Möller–Trumbore's det up to sign, so the same 1e-12
    degeneracy cutoff applies."""
    c = cv0.shape[0]
    r = o.x.shape[0]
    Y = _mxu_dots(_plane_rows(cv0, ce1, ce2), o, d)
    den = Y[:c, r:]
    t_num = -Y[:c, :r]
    valid = jnp.abs(den) > 1e-12
    inv = 1.0 / jnp.where(valid, den, 1.0)
    t = t_num * inv
    u = Y[c:2 * c, :r] + t * Y[c:2 * c, r:]
    v = Y[2 * c:, :r] + t * Y[2 * c:, r:]
    hit = (
        valid & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > t_min[None, :]) & (t < t_max[None, :])
    )
    return jnp.where(hit, t, INF), u, v


def _mt_mxu_any_chunk_T(o, d, cv0, ce1, ce2, t_min, t_max):
    """Division-free plane-form occlusion sweep -> (C, R) bool: the MXU
    supplies the six dot products and every inequality is compared in
    the |den|-scaled domain (u*|den| = (p1.(o-v0))*|den| + (t_num*s)*(p1.d),
    s = sign(den)) — no reciprocal, ~10 VPU ops/pair."""
    c = cv0.shape[0]
    r = o.x.shape[0]
    Y = _mxu_dots(_plane_rows(cv0, ce1, ce2), o, d)
    den = Y[:c, r:]
    tn = -Y[:c, :r]
    s = jnp.where(den >= 0.0, 1.0, -1.0)
    aden = den * s
    tns = tn * s
    us = Y[c:2 * c, :r] * aden + tns * Y[c:2 * c, r:]
    vs = Y[2 * c:, :r] * aden + tns * Y[2 * c:, r:]
    return (
        (aden > 1e-12) & (us >= 0.0) & (vs >= 0.0) & (us + vs <= aden)
        & (tns > t_min[None, :] * aden) & (tns < t_max[None, :] * aden)
    )


def _mt_chunk(o, d, cv0, ce1, ce2, t_min, t_max):
    """Möller–Trumbore of R rays against C triangles, broadcast (R, C).
    Returns (t, u, v) with t=inf where missed.

    Written component-wise: every intermediate is (R, C) with C on the minor
    (lane) axis. The (R, C, 3) formulation puts 3 on the lane axis and wastes
    125/128 of every TPU vector register. o/d are Vec3 of (R,) components."""
    ox, oy, oz = o.x[:, None], o.y[:, None], o.z[:, None]
    dx, dy, dz = d.x[:, None], d.y[:, None], d.z[:, None]
    v0x, v0y, v0z = cv0[None, :, 0], cv0[None, :, 1], cv0[None, :, 2]
    e1x, e1y, e1z = ce1[None, :, 0], ce1[None, :, 1], ce1[None, :, 2]
    e2x, e2y, e2z = ce2[None, :, 0], ce2[None, :, 1], ce2[None, :, 2]

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
    hit = (
        valid & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > t_min[:, None]) & (t < t_max[:, None])
    )
    return jnp.where(hit, t, INF), u, v


def _mt_chunk_T(o, d, cv0, ce1, ce2, t_min, t_max):
    """Transposed Möller–Trumbore: C triangles (sublane/major axis) against
    R rays (lane/minor axis), broadcast (C, R). Returns (t, u, v), t=inf
    where missed.

    The transposed twin of `_mt_chunk`: with RAYS on the 128-wide lane axis
    every vector register is fully used regardless of the triangle count,
    so C only needs padding to the 8-row f32 sublane tile (vs 128) — 3.5x
    less wasted intersection math for a 36-tri Cornell box — and the
    closest-hit reduce runs over the MAJOR axis, which the VPU executes as
    C-1 elementwise mins instead of a cross-lane tree (profiled: the lane
    reduce was the single hottest fusion of the rays-major sweep)."""
    ox, oy, oz = o.x[None, :], o.y[None, :], o.z[None, :]
    dx, dy, dz = d.x[None, :], d.y[None, :], d.z[None, :]
    v0x, v0y, v0z = cv0[:, 0:1], cv0[:, 1:2], cv0[:, 2:3]
    e1x, e1y, e1z = ce1[:, 0:1], ce1[:, 1:2], ce1[:, 2:3]
    e2x, e2y, e2z = ce2[:, 0:1], ce2[:, 1:2], ce2[:, 2:3]

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
    hit = (
        valid & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > t_min[None, :]) & (t < t_max[None, :])
    )
    return jnp.where(hit, t, INF), u, v


def _mt_any_chunk_T(o, d, cv0, ce1, ce2, t_min, t_max):
    """Division-free transposed Möller–Trumbore occlusion test -> (C, R)
    bool. Everything is compared in the det-scaled domain (multiply the
    barycentric/t inequalities through by |det| instead of dividing each
    pair by det — the VPU reciprocal is the most expensive op in the
    sweep and occlusion needs no t/u/v values)."""
    ox, oy, oz = o.x[None, :], o.y[None, :], o.z[None, :]
    dx, dy, dz = d.x[None, :], d.y[None, :], d.z[None, :]
    v0x, v0y, v0z = cv0[:, 0:1], cv0[:, 1:2], cv0[:, 2:3]
    e1x, e1y, e1z = ce1[:, 0:1], ce1[:, 1:2], ce1[:, 2:3]
    e2x, e2y, e2z = ce2[:, 0:1], ce2[:, 1:2], ce2[:, 2:3]

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
    return (
        (adet > 1e-12) & (un >= 0.0) & (vn >= 0.0) & (un + vn <= adet)
        & (tn > t_min[None, :] * adet) & (tn < t_max[None, :] * adet)
    )


def _mt_T(*args):
    """Closest-hit sweep dispatcher: module flag read at trace time."""
    return (_mt_mxu_chunk_T if MT_MXU else _mt_chunk_T)(*args)


def _mt_any_T(*args):
    """Occlusion sweep dispatcher: module flag read at trace time."""
    return (_mt_mxu_any_chunk_T if MT_MXU else _mt_any_chunk_T)(*args)


class DenseTris(NamedTuple):
    """Triangle soup padded to a multiple of the chunk size. Padded rows are
    degenerate (zero edges) and never hit."""
    v0: jnp.ndarray   # (Tp, 3)
    e1: jnp.ndarray   # (Tp, 3)
    e2: jnp.ndarray   # (Tp, 3)
    tri_id: jnp.ndarray  # (Tp,) i32, -1 on padding
    opacity: jnp.ndarray  # (Tp,) f32 — shadow/stochastic-alpha opacity
    num: int          # real triangle count (static)


def prepare(v0: jnp.ndarray, v1: jnp.ndarray, v2: jnp.ndarray,
            chunk: int = 128, opacity: jnp.ndarray | None = None) -> DenseTris:
    """`opacity` (T,) in [0,1]: 1 = opaque; alpha-MASK materials carry their
    constant base alpha, alpha-BLEND their alpha (transparent-shadow
    behavior, reference: Shaders/ShadingHelpers.hlsli:105-157 IsOpaque +
    RaytracingHelpers.hlsli:17-44 any-hit emulation).

    Padding: triangles sit on the SUBLANE axis of the transposed sweep, so
    small scenes only pad to the 8-row f32 tile; scenes above one chunk pad
    to a whole number of chunks."""
    t = v0.shape[0]
    pad = (-t) % (8 if t <= chunk else chunk)
    z = jnp.zeros((pad, 3), v0.dtype)
    ids = jnp.concatenate([
        jnp.arange(t, dtype=jnp.int32), jnp.full((pad,), -1, jnp.int32)
    ])
    if opacity is None:
        opacity = jnp.ones((t,), jnp.float32)
    return DenseTris(
        v0=jnp.concatenate([v0, z]),
        e1=jnp.concatenate([v1 - v0, z]),
        e2=jnp.concatenate([v2 - v0, z]),
        tri_id=ids,
        opacity=jnp.concatenate([opacity, jnp.zeros((pad,), jnp.float32)]),
        num=t,
    )


def closest_hit(tris: DenseTris, origin: Vec3, direction: Vec3, t_min, t_max,
                chunk: int = 128) -> Hit:
    """Dense closest hit via the TRANSPOSED sweep; O(R * T) all-vector work.

    min and argmin are fused into ONE u32 min-reduce by packing the row
    index into the low mantissa bits of t (positive-float bit patterns are
    order-preserving as u32). The stolen bits only blur *tie-breaking*
    between nearly-equal t (relative 2^-10 — far below geometric epsilon).
    The reduce runs over the triangle (major) axis — measured vs the
    rays-major form on v5e Cornell 2M rays: see README perf notes."""
    r = origin.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    tp = tris.v0.shape[0]
    chunk = tp if tp <= chunk else chunk
    n_chunks = tp // chunk
    idx_bits = tp.bit_length()
    idx_mask = jnp.uint32((1 << idx_bits) - 1)
    row_ids = jax.lax.broadcasted_iota(jnp.uint32, (chunk, 1), 0)

    def pack(t, base):
        bits = lax.bitcast_convert_type(t, jnp.uint32)
        key = (bits & ~idx_mask) | (row_ids + jnp.uint32(base))
        return jnp.where(jnp.isfinite(t), key, jnp.uint32(0xFFFFFFFF))

    def body(c, best_key):
        base = c * chunk
        cv0 = lax.dynamic_slice(tris.v0, (base, 0), (chunk, 3))
        ce1 = lax.dynamic_slice(tris.e1, (base, 0), (chunk, 3))
        ce2 = lax.dynamic_slice(tris.e2, (base, 0), (chunk, 3))
        best_t = lax.bitcast_convert_type(best_key & ~idx_mask, jnp.float32)
        t, u, v = _mt_T(origin, direction, cv0, ce1, ce2, t_min,
                        jnp.minimum(t_max, best_t))
        key = jnp.min(pack(t, base), axis=0)
        return jnp.minimum(best_key, key)

    init = (
        lax.bitcast_convert_type(jnp.maximum(t_max, 0.0), jnp.uint32)
        & ~idx_mask
    ) | idx_mask
    if n_chunks == 1:
        best_key = body(0, init)
    else:
        best_key = lax.fori_loop(0, n_chunks, body, init)
    best_t = lax.bitcast_convert_type(best_key & ~idx_mask, jnp.float32)
    best_i = (best_key & idx_mask).astype(jnp.int32)
    found = (best_key & idx_mask) != idx_mask
    zeros = jnp.zeros((r,))
    return Hit(jnp.where(found, best_t, INF), zeros, zeros,
               jnp.where(found, best_i, -1))


def any_hit(tris: DenseTris, origin: Vec3, direction: Vec3, t_min, t_max,
            chunk: int = 128) -> jnp.ndarray:
    """Dense occlusion query via the transposed sweep."""
    r = origin.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    tp = tris.v0.shape[0]
    chunk = tp if tp <= chunk else chunk
    n_chunks = tp // chunk

    def body(c, occluded):
        base = c * chunk
        cv0 = lax.dynamic_slice(tris.v0, (base, 0), (chunk, 3))
        ce1 = lax.dynamic_slice(tris.e1, (base, 0), (chunk, 3))
        ce2 = lax.dynamic_slice(tris.e2, (base, 0), (chunk, 3))
        cop = lax.dynamic_slice(tris.opacity, (base,), (chunk,))
        tmax = jnp.where(occluded, -INF, t_max)
        hit = _mt_any_T(origin, direction, cv0, ce1, ce2, t_min, tmax)
        blocks = hit & (cop[:, None] >= 0.5)
        return occluded | jnp.any(blocks, axis=0)

    if n_chunks == 1:
        return body(0, jnp.zeros((r,), bool))
    return lax.fori_loop(0, n_chunks, body, jnp.zeros((r,), bool))


def _closest_hit_rays_major(tris: DenseTris, origin: Vec3, direction: Vec3,
                            t_min, t_max, chunk: int = 128) -> Hit:
    """The rays-major (R, C) sweep — kept for A/B measurement; the
    transposed form above replaced it after profiling showed the cross-lane
    reduce dominating."""
    r = origin.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    tp = tris.v0.shape[0]
    chunk = tp if tp <= chunk else chunk
    n_chunks = tp // chunk
    # one spare code above tp-1 is reserved as the 'no hit' sentinel
    idx_bits = tp.bit_length()
    idx_mask = jnp.uint32((1 << idx_bits) - 1)
    row_ids = jax.lax.broadcasted_iota(jnp.uint32, (1, chunk), 1)

    def pack(t, base):
        bits = lax.bitcast_convert_type(t, jnp.uint32)
        key = (bits & ~idx_mask) | (row_ids + jnp.uint32(base))
        # misses (t = inf) must never undercut the "no hit" sentinel
        return jnp.where(jnp.isfinite(t), key, jnp.uint32(0xFFFFFFFF))

    def body(c, best_key):
        base = c * chunk
        cv0 = lax.dynamic_slice(tris.v0, (base, 0), (chunk, 3))
        ce1 = lax.dynamic_slice(tris.e1, (base, 0), (chunk, 3))
        ce2 = lax.dynamic_slice(tris.e2, (base, 0), (chunk, 3))
        best_t = lax.bitcast_convert_type(best_key & ~idx_mask, jnp.float32)
        t, u, v = _mt_chunk(origin, direction, cv0, ce1, ce2, t_min,
                            jnp.minimum(t_max, best_t))
        key = jnp.min(pack(t, base), axis=-1)
        return jnp.minimum(best_key, key)

    # init encodes "no hit" (index field all-ones) with the t field set to
    # max(t_max, 0) so the first chunk's interval is correct; lanes with an
    # empty interval (t_max = -inf) keep t=0 and never accept a hit
    init = (
        lax.bitcast_convert_type(jnp.maximum(t_max, 0.0), jnp.uint32)
        & ~idx_mask
    ) | idx_mask
    best_key = lax.fori_loop(0, n_chunks, body, init)
    best_t = lax.bitcast_convert_type(best_key & ~idx_mask, jnp.float32)
    best_i = (best_key & idx_mask).astype(jnp.int32)
    # a lane that never improved keeps index == idx_mask from init
    found = (best_key & idx_mask) != idx_mask
    # padded rows never hit (degenerate); ids are original triangle order
    zeros = jnp.zeros((r,))
    return Hit(jnp.where(found, best_t, INF), zeros, zeros,
               jnp.where(found, best_i, -1))


def _any_hit_rays_major(tris: DenseTris, origin: Vec3, direction: Vec3,
                        t_min, t_max, chunk: int = 128) -> jnp.ndarray:
    """Rays-major occlusion query — kept for A/B measurement."""
    r = origin.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    tp = tris.v0.shape[0]
    chunk = tp if tp <= chunk else chunk
    n_chunks = tp // chunk

    def body(c, occluded):
        base = c * chunk
        cv0 = lax.dynamic_slice(tris.v0, (base, 0), (chunk, 3))
        ce1 = lax.dynamic_slice(tris.e1, (base, 0), (chunk, 3))
        ce2 = lax.dynamic_slice(tris.e2, (base, 0), (chunk, 3))
        cop = lax.dynamic_slice(tris.opacity, (base,), (chunk,))
        # occluded lanes shrink their interval to empty — skips real work
        tmax = jnp.where(occluded, -INF, t_max)
        t, _, _ = _mt_chunk(origin, direction, cv0, ce1, ce2, t_min, tmax)
        # only sufficiently-opaque surfaces occlude (transparent shadows:
        # conservative visibility like the reference's shadow any-hit)
        blocks = jnp.isfinite(t) & (cop[None, :] >= 0.5)
        return occluded | jnp.any(blocks, axis=-1)

    return lax.fori_loop(0, n_chunks, body, jnp.zeros((r,), bool))
