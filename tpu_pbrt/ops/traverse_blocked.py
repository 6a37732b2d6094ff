"""Blocked two-level traversal for larger scenes: Morton triangle blocks +
per-ray-tile block culling + coherent ray sorting.

The scaling story (SURVEY.md §7 hard part #1, §2.4 SER row): TPUs cannot do
per-lane divergent walks, so the large-scene structure is *packet tracing*:

  * triangles are Morton-sorted and grouped into blocks of 128 with
    precomputed AABBs (the BLAS build analogue — Morton order is what makes
    block AABBs tight);
  * the ray pool is processed in tiles; every (tile, block) pair first runs
    a conservative *scalar* reachability test (interval arithmetic over the
    tile's origin/direction bounds vs the block AABB), and the dense
    128-wide Möller–Trumbore sweep executes under a `lax.cond` — XLA emits
    a real branch, so culled blocks cost nothing;
  * coherence comes from sorting rays by direction octant + origin Morton
    cell between bounces — the TPU-idiomatic equivalent of NVIDIA Shader
    Execution Reordering (reference: Shaders/RaytracingHelpers.hlsli:47-54,
    App.cpp:391-396 SER probe).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from . import vec
from .bvh import morton3d
from .traverse import Hit
from .traverse_dense import _mt_any_chunk_T, _mt_chunk_T
from .vec import Vec3

INF = jnp.float32(jnp.inf)
BLOCK = 128


class BlockedTris(NamedTuple):
    v0: jnp.ndarray        # (Tp, 3) Morton-ordered, padded
    e1: jnp.ndarray        # (Tp, 3)
    e2: jnp.ndarray        # (Tp, 3)
    tri_id: jnp.ndarray    # (Tp,) i32 original triangle id, -1 padding
    opacity: jnp.ndarray   # (Tp,)
    block_min: jnp.ndarray  # (B, 3)
    block_max: jnp.ndarray  # (B, 3)
    scene_diag: jnp.ndarray  # () f32 — bounds rays with t_max = inf
    num: int


def prepare(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
            opacity: np.ndarray | None = None) -> BlockedTris:
    """Host-side build: Morton sort + blocking (numpy — runs once)."""
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    t = v0.shape[0]
    if opacity is None:
        opacity = np.ones((t,), np.float32)

    centroid = (v0 + v1 + v2) / 3.0
    lo = centroid.min(0)
    hi = centroid.max(0)
    q = np.clip((centroid - lo) / np.maximum(hi - lo, 1e-12) * 1024.0,
                0, 1023).astype(np.uint32)

    def expand(x):
        x = (x * 0x00010001) & 0xFF0000FF
        x = (x * 0x00000101) & 0x0F00F00F
        x = (x * 0x00000011) & 0xC30C30C3
        x = (x * 0x00000005) & 0x49249249
        return x

    codes = (expand(q[:, 0]) << 2) | (expand(q[:, 1]) << 1) | expand(q[:, 2])
    order = np.argsort(codes, kind="stable").astype(np.int32)

    sv0, sv1, sv2 = v0[order], v1[order], v2[order]
    sid = order
    sop = opacity[order]

    pad = (-t) % BLOCK
    if pad:
        z = np.zeros((pad, 3), np.float32)
        sv0 = np.concatenate([sv0, z])
        sv1 = np.concatenate([sv1, z])
        sv2 = np.concatenate([sv2, z])
        sid = np.concatenate([sid, np.full((pad,), -1, np.int32)])
        sop = np.concatenate([sop, np.zeros((pad,), np.float32)])
    tp = sv0.shape[0]
    nb = tp // BLOCK

    tri_min = np.minimum(np.minimum(sv0, sv1), sv2).reshape(nb, BLOCK, 3)
    tri_max = np.maximum(np.maximum(sv0, sv1), sv2).reshape(nb, BLOCK, 3)
    # padded rows are zero triangles at the origin; neutralize their bounds
    valid = (sid >= 0).reshape(nb, BLOCK, 1)
    bmin = np.where(valid, tri_min, np.inf).min(1)
    bmax = np.where(valid, tri_max, -np.inf).max(1)

    diag = float(np.linalg.norm(v0.max(0) - v0.min(0)) + 1e-3)
    return BlockedTris(
        v0=jnp.asarray(sv0), e1=jnp.asarray(sv1 - sv0),
        e2=jnp.asarray(sv2 - sv0), tri_id=jnp.asarray(sid),
        opacity=jnp.asarray(sop),
        block_min=jnp.asarray(bmin.astype(np.float32)),
        block_max=jnp.asarray(bmax.astype(np.float32)),
        scene_diag=jnp.asarray(diag, jnp.float32),
        num=t,
    )


def refit(tris: BlockedTris, v0, v1, v2) -> BlockedTris:
    """Refit to deformed vertices, keeping the Morton block assignment
    fixed (the ALLOW_UPDATE skinned-BLAS path, reference:
    Source/Scene.ixx:329): re-gather vertices into the stored sorted
    order and recompute per-block AABBs on device. Block bounds loosen as
    the mesh deforms away from the build pose — the classic refit
    trade-off — but traversal stays correct for any deformation."""
    tid = jnp.maximum(tris.tri_id, 0)
    valid = (tris.tri_id >= 0)[:, None]
    sv0 = jnp.where(valid, jnp.asarray(v0, jnp.float32)[tid], 0.0)
    sv1 = jnp.where(valid, jnp.asarray(v1, jnp.float32)[tid], 0.0)
    sv2 = jnp.where(valid, jnp.asarray(v2, jnp.float32)[tid], 0.0)
    nb = tris.block_min.shape[0]
    tri_min = jnp.minimum(jnp.minimum(sv0, sv1), sv2).reshape(nb, BLOCK, 3)
    tri_max = jnp.maximum(jnp.maximum(sv0, sv1), sv2).reshape(nb, BLOCK, 3)
    v3 = valid.reshape(nb, BLOCK, 1)
    bmin = jnp.where(v3, tri_min, jnp.inf).min(1)
    bmax = jnp.where(v3, tri_max, -jnp.inf).max(1)
    # bounds over ALL THREE vertex arrays — a deformation whose extent
    # lives in v1/v2 must still grow the t_cap block-reach diagonal
    lo = jnp.min(jnp.where(valid, jnp.minimum(jnp.minimum(sv0, sv1), sv2),
                           jnp.inf), axis=0)
    hi = jnp.max(jnp.where(valid, jnp.maximum(jnp.maximum(sv0, sv1), sv2),
                           -jnp.inf), axis=0)
    diag = jnp.linalg.norm(hi - lo) + 1e-3
    return tris._replace(
        v0=sv0, e1=sv1 - sv0, e2=sv2 - sv0,
        block_min=bmin, block_max=bmax,
        scene_diag=diag.astype(jnp.float32),
    )


def _tile_reachable(tris: BlockedTris, o: Vec3, d: Vec3, t_cap):
    """(B,) conservative mask: can ANY ray of this tile reach each block?
    Interval arithmetic over the tile's origin box and direction box."""
    o_lo = jnp.stack([o.x.min(), o.y.min(), o.z.min()])
    o_hi = jnp.stack([o.x.max(), o.y.max(), o.z.max()])
    d_lo = jnp.stack([d.x.min(), d.y.min(), d.z.min()])
    d_hi = jnp.stack([d.x.max(), d.y.max(), d.z.max()])
    reach_lo = o_lo + jnp.minimum(d_lo, 0.0) * t_cap
    reach_hi = o_hi + jnp.maximum(d_hi, 0.0) * t_cap
    overlap = (
        (tris.block_min <= reach_hi[None, :])
        & (tris.block_max >= reach_lo[None, :])
    )
    return jnp.all(overlap, axis=-1)


def closest_hit(tris: BlockedTris, origin: Vec3, direction: Vec3,
                t_min, t_max, tile: int = 1 << 16) -> Hit:
    r = origin.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    nb = tris.block_min.shape[0]
    tile = min(tile, r)
    pad = (-r) % tile

    def padded(a, fill=0.0):
        if pad == 0:
            return a
        return jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])

    ox = padded(origin.x).reshape(-1, tile)
    oy = padded(origin.y).reshape(-1, tile)
    oz = padded(origin.z).reshape(-1, tile)
    dx = padded(direction.x).reshape(-1, tile)
    dy = padded(direction.y).reshape(-1, tile)
    dz = padded(direction.z, 1.0).reshape(-1, tile)
    tmin_t = padded(t_min).reshape(-1, tile)
    tmax_t = padded(t_max, -INF).reshape(-1, tile)

    def per_tile(args):
        tox, toy, toz, tdx, tdy, tdz, t0, t1 = args
        o = Vec3(tox, toy, toz)
        d = Vec3(tdx, tdy, tdz)
        # conservative reach cap: infinite-t rays are bounded by the
        # scene diameter (anything farther cannot hit a block)
        t_cap = tris.scene_diag * 2.0
        reach = _tile_reachable(tris, o, d, t_cap)

        def body(bi, carry):
            best_t, best_i = carry

            def run(carry):
                best_t, best_i = carry
                base = bi * BLOCK
                cv0 = lax.dynamic_slice(tris.v0, (base, 0), (BLOCK, 3))
                ce1 = lax.dynamic_slice(tris.e1, (base, 0), (BLOCK, 3))
                ce2 = lax.dynamic_slice(tris.e2, (base, 0), (BLOCK, 3))
                # transposed sweep: triangles on the sublane (major) axis,
                # rays on the lane axis — the reduce is per-row mins, not a
                # cross-lane tree (measured 1.4-1.5x at this block size)
                t, _, _ = _mt_chunk_T(o, d, cv0, ce1, ce2, t0,
                                      jnp.minimum(t1, best_t))
                j = jnp.argmin(t, axis=0)
                tj = jnp.min(t, axis=0)
                closer = tj < best_t
                return (jnp.where(closer, tj, best_t),
                        jnp.where(closer, (base + j).astype(jnp.int32),
                                  best_i))

            return lax.cond(reach[bi], run, lambda c: c, (best_t, best_i))

        init = (t1, jnp.full((tile,), -1, jnp.int32))
        best_t, best_i = lax.fori_loop(0, nb, body, init)
        return best_t, best_i

    best_t, best_i = lax.map(per_tile, (ox, oy, oz, dx, dy, dz,
                                        tmin_t, tmax_t))
    best_t = best_t.reshape(-1)[:r]
    best_i = best_i.reshape(-1)[:r]
    found = best_i >= 0
    tri = jnp.where(found, tris.tri_id[jnp.maximum(best_i, 0)], -1)
    return Hit(jnp.where(found, best_t, INF),
               jnp.zeros((r,)), jnp.zeros((r,)), tri)


def any_hit(tris: BlockedTris, origin: Vec3, direction: Vec3,
            t_min, t_max, tile: int = 1 << 16) -> jnp.ndarray:
    r = origin.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    nb = tris.block_min.shape[0]
    tile = min(tile, r)
    pad = (-r) % tile

    def padded(a, fill=0.0):
        if pad == 0:
            return a
        return jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])

    parts = [padded(x).reshape(-1, tile) for x in
             (origin.x, origin.y, origin.z, direction.x, direction.y)]
    dz = padded(direction.z, 1.0).reshape(-1, tile)
    t0s = padded(t_min).reshape(-1, tile)
    t1s = padded(t_max, -INF).reshape(-1, tile)

    def per_tile(args):
        tox, toy, toz, tdx, tdy, tdz, t0, t1 = args
        o = Vec3(tox, toy, toz)
        d = Vec3(tdx, tdy, tdz)
        t_cap = jnp.minimum(
            jnp.max(jnp.where(jnp.isfinite(t1), jnp.maximum(t1, 0.0), 0.0)),
            tris.scene_diag * 2.0)
        reach = _tile_reachable(tris, o, d, t_cap)

        def body(bi, occ):
            def run(occ):
                base = bi * BLOCK
                cv0 = lax.dynamic_slice(tris.v0, (base, 0), (BLOCK, 3))
                ce1 = lax.dynamic_slice(tris.e1, (base, 0), (BLOCK, 3))
                ce2 = lax.dynamic_slice(tris.e2, (base, 0), (BLOCK, 3))
                cop = lax.dynamic_slice(tris.opacity, (base,), (BLOCK,))
                hit = _mt_any_chunk_T(o, d, cv0, ce1, ce2, t0,
                                      jnp.where(occ, -INF, t1))
                blocks = hit & (cop[:, None] >= 0.5)
                return occ | jnp.any(blocks, axis=0)

            return lax.cond(reach[bi], run, lambda c: c, occ)

        return lax.fori_loop(0, nb, body, jnp.zeros((tile,), bool))

    occ = lax.map(per_tile, (*parts, dz, t0s, t1s))
    return occ.reshape(-1)[:r]


# ---------------------------------------------------------------------------
# Ray sorting (the SER analogue): direction octant + origin Morton cell
# ---------------------------------------------------------------------------

def sort_rays(origin: Vec3, direction: Vec3, scene_lo, scene_hi):
    """Returns (perm, inv_perm) ordering rays for coherence. Apply `perm`
    to all per-ray arrays before traversal, `inv_perm` to the results."""
    octant = (
        (direction.x >= 0).astype(jnp.uint32)
        + 2 * (direction.y >= 0).astype(jnp.uint32)
        + 4 * (direction.z >= 0).astype(jnp.uint32)
    )
    code = morton3d(origin.to_array(), scene_lo, scene_hi)
    key = (octant << jnp.uint32(27)) | (code >> jnp.uint32(5))
    perm = jnp.argsort(key).astype(jnp.int32)
    inv = jnp.zeros_like(perm).at[perm].set(
        jnp.arange(perm.shape[0], dtype=jnp.int32))
    return perm, inv
