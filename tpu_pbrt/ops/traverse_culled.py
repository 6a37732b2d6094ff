"""Per-ray-culled big-scene traversal: exact slab masks + chunk-ranked
block selection + one-hot MXU triangle fetch + dense transposed sweep.

The production replacement for DXR `RayQuery` hardware traversal at scene
sizes where the dense/blocked sweeps collapse (reference:
Shaders/RaytracingHelpers.hlsli:59-133; the app requires RT tier 1.1,
Source/DeviceResources.cpp:472-533). Round-2 measured why the previous
attempts failed and this design follows directly from those numbers
(ops/traverse_resident.py docstring + round-3 measurements):

  * tile-union interval culling is hopeless for incoherent rays (a sorted
    512-ray tile "reaches" 152/198 blocks by interval arithmetic) — but
    the EXACT per-ray slab mask is tiny: ~3.7 blocks/ray on the 25k-tri
    bench sphere, and the exact union over a SORTED 128-ray chunk is only
    ~12-16 blocks (measured, bs=64);
  * per-lane divergent walks don't map to the VPU, and Pallas fixed costs
    (~6 us per while-iteration, ~0.5 us per skipped grid step) put any
    per-chunk dynamic walk at 100s of ms — so the sweep must be a
    STATICALLY-SHAPED dense pass over a small per-chunk working set;
  * multi-operand `lax.sort` (~2.4 ms per 1.15M lanes x 8 operands) is
    ~20x cheaper than gathers/scatters — rays are reordered for coherence
    and compacted between cascade passes by sorting, never gathering;
  * the per-chunk triangle working set is fetched with a one-hot matmul
    on the MXU (exact in f32 at HIGHEST precision — the same trick as the
    shade-table fetch), so the data movement for divergent block choices
    costs MACs, not per-lane gathers.

Pipeline per query:
  1. sort rays by direction octant + origin Morton (the SER analogue);
  2. chunk 128 rays (one vector-lane width); per chunk: slab-test all
     blocks exactly (blocks on sublanes x rays on lanes), rank blocks by
     how many chunk rays hit them, keep the top U;
  3. fetch the U chosen blocks' triangles (+ ids + opacity) as one
     one-hot (U, B) @ (B, 64*11) matmul; run the transposed
     Moller-Trumbore sweep; fold min via mantissa-packed u32 keys;
  4. rays whose own mask was not covered by the chunk's top U are
     compacted by one more sort and re-swept with a larger U (cascade:
     U=12 on all -> U=64 on R/8 -> exact dense on R/32 -> full dense),
     every later pass under a scalar `lax.cond` so the common case pays
     nothing. The cascade is EXACT: a ray's result is always the min over
     every block its slab mask touches.

Scaling note: the slab phase is O(R x B) and the fetch O(R/128 x U x B)
MACs — linear in block count. Past ~100k triangles add a superblock
level (test 8-block superblocks first, expand survivors); the hooks are
the same primitives.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import os

import jax
import jax.numpy as jnp
from jax import lax

from .bvh import morton3d
from .traverse import Hit
from .traverse_dense import _mt_chunk_T  # noqa: F401 (re-exported for diag tools)
from .vec import Vec3

INF = jnp.float32(jnp.inf)
BLOCK = 64          # triangles per Morton block (tight AABBs)
CHUNK = 128         # rays per chunk = one vector-lane width
COLS = 12           # v0(3) e1(3) e2(3) id(1) opacity(1) pad(1)
U1 = int(os.environ.get("TPU_PBRT_CULLED_U1", "12"))
#                   # pass-1 blocks per chunk. r5 TPU sweep (entry rank,
#                   # 25k sphere, 2M primary rays): closest 90.6/86.9/99.7
#                   # ms at U1=8/12/16, any 82.8/84.0/95.4 — 12 is the
#                   # shipping default; the cascade absorbs the smaller
#                   # pass-1 at 8 and the extra sweep work dominates at 16
U2 = int(os.environ.get("TPU_PBRT_CULLED_U2", "64"))
#                   # pass-2 blocks per chunk (uncovered rays, R/8 pool);
#                   # env-tunable so the U1/U2 ladder can be swept jointly
#                   # (a small U1 wants a smaller pass-2 jump than 64)
GROUP = 64          # chunks per sweep step (memory control)
SUPER = 8           # blocks per superblock for the fused touched prepass
KS_EXTRA = 2        # extra supers expanded past ceil(U/SUPER) per chunk
# superblock pre-level default OFF — rejected twice with numbers:
#  * r4f (popularity-ranked supers, 25k sphere): 95.3 ms off vs 998.8 on
#    (37% uncovered);
#  * r5 (nearest-ENTRY-ranked supers + t_cull, tools/r5_preselect_ab.py):
#    25k primary 98.7 off vs 128.3 on (11.8% unc), 25k bounce 125.9 vs
#    1136.1 (22.3% unc), 101k-tri primary 185.1 off vs 4139.4 on (19.0%
#    unc). Entry ranking cut the uncovered set 3x vs r4f but a FIXED
#    ks = ceil(U1/8)+2 supers cannot cover divergent chunks — silhouette
#    and bounce chunks touch many supers — and the cascade re-sweep eats
#    the slab saving 5-20x over. The flat exact slab + entry-ranked
#    top-U1 needs no hierarchy through at least 101k tris (11.3 Mrays/s
#    primary, 1.7% uncovered at U1=16). Keep A/B-able by env.
PRESELECT = os.environ.get("TPU_PBRT_CULLED_PRESELECT", "0") == "1"
# pass-1 block ranking: "entry" (nearest slab entry first — pairs with
# the conservative t_cull uncovered test) | "count" (most-touched).
# Entry is the default from the round-5 matrix (tools/r4h_culled_rank.py,
# v5e, 25k-tri sphere, 2M rays): identical pass-1 cost, 7-15x fewer
# uncovered rays (U1=16: 10404 -> 672; U1=12: 96268 -> 14405), because a
# far block skipped by entry rank almost always fails `mlo <= t_cull`.
RANK = os.environ.get("TPU_PBRT_CULLED_RANK", "entry")
# any-hit (occlusion) pass-1 ranking: entry ranking puts the blocks a
# shadow ray ENTERS first at the top — the occluder is usually near the
# origin, and an occluded ray drops out of the uncovered set entirely
# (`unc & ~occ`), so near-first ordering shrinks the cascade exactly
# like t_cull does for closest-hit. Counts ranking (the pre-r5c default)
# maximizes per-chunk coverage instead. A/B: TPU_PBRT_ANY_RANK.
ANY_RANK = os.environ.get("TPU_PBRT_ANY_RANK", "entry")
# cascade compaction: "gather" compacts the (tiny, entry-ranked) pass-2
# pool by a 2-operand permutation sort + head gathers instead of the
# 12-operand full-pool sort — the full sort re-streams every ray operand
# (~6 ms per 2M-lane query) to move what is usually <1k uncovered rays
# (672 at U1=16 on the 25k bench sphere). Falls back to the full-sort
# cascade when n_unc overflows the small head pool. A/B: r5c.
CASCADE_GATHER = os.environ.get("TPU_PBRT_CASCADE_GATHER", "1") == "1"
# query-level head gather: sort 3 key operands + gather hp-ray windows
# instead of the 11-operand full-pool sort (see `_query`). Default OFF
# by measurement (r5e, tools/r5_query_diag.py, 25k sphere, 42%-touched
# 2M-ray queries): gather path primary closest 331 ms vs full-sort
# 89.7 ms — the 8 ray-operand gathers per window (~25 ms per 2M gathered
# lanes) dwarf the one full-pool sort they replace. Kept A/B-able; the
# windowed CASCADE gather below is the part that measured faster and
# stays default-on.
QUERY_GATHER = os.environ.get("TPU_PBRT_QUERY_GATHER", "0") == "1"
IDX_BITS = 12       # mantissa bits packing the row index (U2*BLOCK <= 4096)
_UMAX = jnp.uint32(0xFFFFFFFF)


class CulledTris(NamedTuple):
    table: jnp.ndarray      # (B, BLOCK*COLS) f32 fetch table
    block_min: jnp.ndarray  # (B, 3)
    block_max: jnp.ndarray  # (B, 3)
    super_min: jnp.ndarray  # (S, 3) unions of SUPER Morton-adjacent blocks
    super_max: jnp.ndarray  # (S, 3)
    super_blocks: jnp.ndarray  # (S, SUPER*8) per-super packed child-block
    #                            bounds rows [min3 max3 valid pad] x SUPER
    tri_id: jnp.ndarray     # (B*BLOCK,) i32 (refit bookkeeping)
    lo: jnp.ndarray         # (3,) scene bounds for the ray Morton sort
    hi: jnp.ndarray         # (3,)
    num: int


def _pack_table(sv0, sv1, sv2, sid, sop):
    """(B, COLS*BLOCK) rows, COMPONENT-MAJOR within each block: column
    group c holds that component for all BLOCK triangles —
    [v0x×B | v0y×B | v0z×B | e1x×B | … | id×B | op×B | pad×B].

    Why component-major: the per-chunk sweep consumes the fetched rows as
    SoA vectors. The original tri-major layout ([v0 e1 e2 id op] per tri)
    forced the consumer through a (k*BLOCK, 12) reshape with the 12
    components on the MINOR axis — the measured ~90× anti-pattern (see
    .claude verify notes / ops/shade_table.py) that made pass-1 sweeps run
    at ~7% of the dense sweep's MT rate (r4 diag: 880 ms per 2M-ray
    sweep). Component-major keeps every post-fetch slice contiguous."""
    xp = jnp if isinstance(sv0, jnp.ndarray) else np
    tp = sv0.shape[0]
    nb = tp // BLOCK
    cols = xp.concatenate(
        [sv0, sv1 - sv0, sv2 - sv0,
         sid.astype(xp.float32)[:, None],
         sop.astype(xp.float32)[:, None],
         xp.zeros((tp, 1), xp.float32)], axis=1)      # (tp, COLS) tri-major
    return (cols.reshape(nb, BLOCK, COLS)
            .transpose(0, 2, 1)
            .reshape(nb, COLS * BLOCK))


def _table_comps(fetched):
    """(..., k, COLS*BLOCK) fetched block rows -> tuple of COLS component
    vectors, each (..., k*BLOCK): the block axis merges into the triangle
    axis (works under vmap: leading dims preserved)."""
    lead = fetched.shape[:-2]
    k = fetched.shape[-2]
    parts = fetched.reshape(lead + (k, COLS, BLOCK))
    return tuple(parts[..., c, :].reshape(lead + (k * BLOCK,))
                 for c in range(COLS))


def _mt_comp_T(o: Vec3, d: Vec3, v0x, v0y, v0z, e1x, e1y, e1z,
               e2x, e2y, e2z, t_min, t_max):
    """Transposed Möller–Trumbore on COMPONENT vectors: C triangles as
    (C,) SoA components (broadcast to sublanes) against R rays on lanes.
    Returns t (C, R), inf where missed — the SoA twin of
    traverse_dense._mt_chunk_T without the (C, 3) minor-axis slices."""
    ox, oy, oz = o.x[None, :], o.y[None, :], o.z[None, :]
    dx, dy, dz = d.x[None, :], d.y[None, :], d.z[None, :]
    v0x, v0y, v0z = v0x[:, None], v0y[:, None], v0z[:, None]
    e1x, e1y, e1z = e1x[:, None], e1y[:, None], e1z[:, None]
    e2x, e2y, e2z = e2x[:, None], e2y[:, None], e2z[:, None]

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
    return jnp.where(hit, t, INF)


# MXU plane-form sweep (Havel–Herout style): per (tri, ray) pair the
# ~48 MAC flops of Möller–Trumbore move onto the systolic array as one
# (3C, 4) @ (4, 2R) matmul and only ~13 VPU ops/pair remain (reciprocal,
# two FMAs, the hit compares).
#
# MEASURED NEGATIVE RESULT (round 5, v5e): full-bench A/B MT_MXU=0 vs 1 —
# cornell PT 193.74 vs 91.08 Mrays/s (2.1x LOSS, dense sweep), sphere
# 8.68 vs 8.12 Mrays/s (-6%, culled sweep). The K=4 contraction leaves
# the 128x128 systolic array >96% idle while the epilogue (reciprocal +
# 2 FMAs + 4 compares per pair) still runs on the VPU — the matmul adds
# latency without removing the VPU bottleneck. Kept functional + tested
# (exact-equivalence in tests/test_culled.py) as engineering record;
# default OFF. NOTE: the env var is read at import time and baked into
# jitted callers at first trace — toggling at runtime is a no-op; the
# blocked tracer never routes through this dispatcher.
MT_MXU = os.environ.get("TPU_PBRT_MT_MXU", "0") == "1"


def _mt_mxu_T(o: Vec3, d: Vec3, v0x, v0y, v0z, e1x, e1y, e1z,
              e2x, e2y, e2z, t_min, t_max):
    """Plane-form ray-triangle sweep on the MXU; same contract as
    `_mt_comp_T` (t (C, R), inf where missed).

    Math: with n = e1 x e2, p1 = (e2 x n)/|n|^2, p2 = (n x e1)/|n|^2,
    a hit point P = o + t d has t = (n.v0 - n.o)/(n.d),
    u = (P - v0).p1, v = (P - v0).p2. All six per-pair dot products
    come out of ONE f32 HIGHEST matmul (rows/columns built by the
    shared `traverse_dense._plane_rows_soa`/`_mxu_dots` helpers).
    den = n.d equals Moller-Trumbore's det up to sign, so the same
    1e-12 degeneracy cutoff applies; padded rows (e1 = e2 = 0) give
    n = 0 -> den = 0 -> miss, exactly like `_mt_comp_T`."""
    from .traverse_dense import _mxu_dots, _plane_rows_soa

    C = v0x.shape[0]
    R = o.x.shape[0]
    Y = _mxu_dots(_plane_rows_soa(v0x, v0y, v0z, e1x, e1y, e1z,
                                  e2x, e2y, e2z), o, d)    # (3C, 2R)
    den = Y[:C, R:]                      # n.d  (= -MT det)
    t_num = -Y[:C, :R]                   # n.v0 - n.o
    valid = jnp.abs(den) > 1e-12
    inv = 1.0 / jnp.where(valid, den, 1.0)
    t = t_num * inv
    u = Y[C:2 * C, :R] + t * Y[C:2 * C, R:]
    v = Y[2 * C:, :R] + t * Y[2 * C:, R:]
    hit = (
        valid & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > t_min[None, :]) & (t < t_max[None, :])
    )
    return jnp.where(hit, t, INF)


def _mt_T(*args):
    """Sweep dispatcher: module flag read at trace time."""
    return (_mt_mxu_T if MT_MXU else _mt_comp_T)(*args)


def _super_bounds(bmin, bmax):
    """(S, 3) AABB unions of SUPER Morton-adjacent blocks plus the packed
    (S, SUPER*8) child-block bounds rows the per-chunk pre-select fetches
    with a one-hot dot (np or jnp)."""
    xp = jnp if isinstance(bmin, jnp.ndarray) else np
    nb = bmin.shape[0]
    pad = (-nb) % SUPER
    valid = xp.concatenate([xp.ones((nb,), xp.float32),
                            xp.zeros((pad,), xp.float32)])
    if pad:
        big = xp.float32(3e38)
        bmin = xp.concatenate([bmin, xp.full((pad, 3), big, bmin.dtype)])
        bmax = xp.concatenate([bmax, xp.full((pad, 3), -big, bmax.dtype)])
    s = bmin.shape[0] // SUPER
    rows = xp.concatenate(
        [bmin, bmax, valid[:, None], xp.zeros((bmin.shape[0], 1),
                                              xp.float32)], axis=1)
    sb = rows.reshape(s, SUPER * 8)
    # the union min/max over padded entries: +/-3e38 sentinels never win
    return (bmin.reshape(s, SUPER, 3).min(1),
            bmax.reshape(s, SUPER, 3).max(1), sb)


def prepare(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
            opacity: np.ndarray | None = None) -> CulledTris:
    """Host-side build: Morton sort + 64-tri blocking (numpy, runs once)."""
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    t = v0.shape[0]
    if opacity is None:
        opacity = np.ones((t,), np.float32)

    from ..native import morton_order

    order = morton_order(v0, v1, v2)     # native host build when available
    if order is None:
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

        codes = ((expand(q[:, 0]) << 2) | (expand(q[:, 1]) << 1)
                 | expand(q[:, 2]))
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
    valid = (sid >= 0).reshape(nb, BLOCK, 1)
    bmin = np.where(valid, tri_min, np.inf).min(1)
    bmax = np.where(valid, tri_max, -np.inf).max(1)

    glo = np.minimum(np.minimum(v0.min(0), v1.min(0)), v2.min(0))
    ghi = np.maximum(np.maximum(v0.max(0), v1.max(0)), v2.max(0))
    smin, smax, sblocks = _super_bounds(bmin.astype(np.float32),
                                        bmax.astype(np.float32))
    return CulledTris(
        table=jnp.asarray(_pack_table(sv0, sv1, sv2, sid, sop)),
        block_min=jnp.asarray(bmin.astype(np.float32)),
        block_max=jnp.asarray(bmax.astype(np.float32)),
        super_min=jnp.asarray(smin), super_max=jnp.asarray(smax),
        super_blocks=jnp.asarray(sblocks),
        tri_id=jnp.asarray(sid),
        lo=jnp.asarray(glo), hi=jnp.asarray(ghi),
        num=t,
    )


def refit(tris: CulledTris, v0, v1, v2) -> CulledTris:
    """Device refit for deformed vertices (ALLOW_UPDATE skinned-BLAS path):
    re-gather vertices into the stored Morton order, recompute block AABBs,
    repack the fetch table. Block assignment stays fixed."""
    tid = jnp.maximum(tris.tri_id, 0)
    valid = (tris.tri_id >= 0)[:, None]
    sv0 = jnp.where(valid, jnp.asarray(v0, jnp.float32)[tid], 0.0)
    sv1 = jnp.where(valid, jnp.asarray(v1, jnp.float32)[tid], 0.0)
    sv2 = jnp.where(valid, jnp.asarray(v2, jnp.float32)[tid], 0.0)
    nb = tris.block_min.shape[0]
    op = _table_comps(tris.table)[10].reshape(-1)
    tri_min = jnp.minimum(jnp.minimum(sv0, sv1), sv2).reshape(nb, BLOCK, 3)
    tri_max = jnp.maximum(jnp.maximum(sv0, sv1), sv2).reshape(nb, BLOCK, 3)
    v3 = valid.reshape(nb, BLOCK, 1)
    bmin = jnp.where(v3, tri_min, jnp.inf).min(1)
    bmax = jnp.where(v3, tri_max, -jnp.inf).max(1)
    lo = jnp.min(jnp.where(valid, jnp.minimum(jnp.minimum(sv0, sv1), sv2),
                           jnp.inf), axis=0)
    hi = jnp.max(jnp.where(valid, jnp.maximum(jnp.maximum(sv0, sv1), sv2),
                           -jnp.inf), axis=0)
    smin, smax, sblocks = _super_bounds(bmin, bmax)
    return tris._replace(
        table=_pack_table(sv0, sv1, sv2, tris.tri_id, op),
        block_min=bmin, block_max=bmax,
        super_min=smin, super_max=smax, super_blocks=sblocks,
        lo=lo, hi=hi)


# ---------------------------------------------------------------------------
# per-chunk machinery
# ---------------------------------------------------------------------------

def _slab_mask(o: Vec3, d: Vec3, t0, t1, bmin, bmax):
    """(B, CHUNK) exact slab mask + entry t: blocks on sublanes, rays on
    lanes. Returns (mask, lo): lo is the slab-interval entry distance,
    used for hit-distance culling of the uncovered set."""
    def axis(blo, bhi, oc, dc):
        inv = 1.0 / jnp.where(jnp.abs(dc) < 1e-12,
                              jnp.where(dc < 0, -1e-12, 1e-12), dc)
        a = (blo[:, None] - oc[None, :]) * inv[None, :]
        b = (bhi[:, None] - oc[None, :]) * inv[None, :]
        return jnp.minimum(a, b), jnp.maximum(a, b)

    lx, hx = axis(bmin[:, 0], bmax[:, 0], o.x, d.x)
    ly, hy = axis(bmin[:, 1], bmax[:, 1], o.y, d.y)
    lz, hz = axis(bmin[:, 2], bmax[:, 2], o.z, d.z)
    lo = jnp.maximum(jnp.maximum(lx, ly), jnp.maximum(lz, t0[None, :]))
    hi = jnp.minimum(jnp.minimum(hx, hy), jnp.minimum(hz, t1[None, :]))
    return hi >= lo, lo


def _touched(tris: CulledTris, ox, oy, oz, dx, dy, dz, t0, t1):
    """Slab-only prepass: per-ray 'touches any SUPERBLOCK' flag — a
    conservative superset of the exact per-block mask, but fully fused
    elementwise VPU work: no map steps, no conds (the round-3 profile
    showed the exact chunked/cond'd prepass cost ~20 ms/query in map-step
    and cond fixed costs alone). Dead lanes (t1 < t0) test empty. Tiled
    over supers in groups of SUPER so unfused intermediates stay bounded."""
    sm, sM = tris.super_min, tris.super_max
    s = sm.shape[0]
    o = Vec3(ox, oy, oz)
    d = Vec3(dx, dy, dz)
    if s <= 16 * SUPER:     # unrolled tiles: fully parallel VPU work
        touched = jnp.zeros(ox.shape, bool)
        for a in range(0, s, SUPER):
            b = min(a + SUPER, s)
            m, _ = _slab_mask(o, d, t0, t1, sm[a:b], sM[a:b])
            touched = touched | m.any(axis=0)
        return touched
    # very large scenes: bounded compile via lax.map over super tiles
    pad = (-s) % SUPER
    big = jnp.float32(3e38)
    smp = jnp.concatenate([sm, jnp.full((pad, 3), big)]) if pad else sm
    sMp = jnp.concatenate([sM, jnp.full((pad, 3), -big)]) if pad else sM
    nt = smp.shape[0] // SUPER

    def tile(args):
        tlo, thi = args
        m, _ = _slab_mask(o, d, t0, t1, tlo, thi)
        return m.any(axis=0)

    out = lax.map(tile, (smp.reshape(nt, SUPER, 3),
                         sMp.reshape(nt, SUPER, 3)))
    return out.any(axis=0)


def _chunk_query(tris: CulledTris, o: Vec3, d: Vec3, t0, t1, u_blocks,
                 any_mode: bool, ks_extra: int | None = None,
                 preselect: bool | None = None):
    """One chunk (CHUNK rays) against its top-`u_blocks` blocks, selected
    through a SUPERBLOCK pre-level: slab-test the S supers, expand the
    top ceil(u/SUPER)+2 supers' child-block bounds with a one-hot dot,
    slab-test only those candidates exactly, then rank. The slab phase is
    O(S + u*~1.6) rows per ray instead of O(B) — it was the second
    biggest slice of the pass-1 profile after the MT sweep. Exactness is
    preserved: rays touching an unchosen super or an unchosen candidate
    block are flagged uncovered and re-swept by the cascade.
    `preselect=False` skips the super pre-level: slab ALL blocks + one
    top_k (the pre-superblock structure, kept A/B-able — two vmapped
    top_k + two slab phases vs one wide slab).
    Returns (key (CHUNK,) u32 packed [t | row], id (CHUNK,) f32,
    occluded (CHUNK,) bool, uncovered (CHUNK,) bool)."""
    table = tris.table
    nb = tris.block_min.shape[0]
    ns = tris.super_min.shape[0]
    if preselect is None:
        preselect = PRESELECT
    if ks_extra is None:
        ks_extra = KS_EXTRA

    if preselect:
        ks = min((u_blocks + SUPER - 1) // SUPER + ks_extra, ns)
        smask, slo = _slab_mask(o, d, t0, t1, tris.super_min,
                                tris.super_max)              # (S, CHUNK)
        if not any_mode:
            # nearest-ENTRY super ranking (the same fix that repaired
            # block ranking, r4h): a far super skipped this way almost
            # always fails the post-sweep `slo <= t_cull` test — the hit
            # found in the near supers precedes its entry — so it never
            # becomes uncovered. Popularity ranking (the r4f 37%-uncovered
            # regression) can skip a NEAR super many rays enter first.
            sentry = jnp.min(jnp.where(smask, slo, INF), axis=1)  # (S,)
            _, s_chosen = lax.top_k(-sentry, ks)             # (ks,)
        else:
            scounts = smask.sum(axis=1).astype(jnp.int32)
            _, s_chosen = lax.top_k(scounts, ks)             # (ks,)
        iota_s = lax.broadcasted_iota(jnp.int32, (ks, ns), 1)
        onehot_s = (iota_s == s_chosen[:, None])
        super_in = onehot_s.any(axis=0)                      # (S,)
        cand = lax.dot_general(
            onehot_s.astype(jnp.float32), tris.super_blocks,
            (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST)                 # (ks, SUPER*8)
        cand = cand.reshape(ks * SUPER, 8)
        cvalid = cand[:, 6] > 0.5
        cblk = (s_chosen[:, None] * SUPER
                + jnp.arange(SUPER, dtype=jnp.int32)[None, :]).reshape(-1)

        mask, mlo = _slab_mask(o, d, t0, t1, cand[:, 0:3],
                               cand[:, 3:6])                 # (ks*8, CHUNK)
        mask = mask & cvalid[:, None]
        k = min(u_blocks, ks * SUPER, nb)
        if not any_mode:
            centry = jnp.min(jnp.where(mask, mlo, INF), axis=1)  # (ks*8,)
            _, ci = lax.top_k(-centry, k)                    # (k,) cand index
        else:
            counts = mask.sum(axis=1).astype(jnp.int32)      # (ks*8,)
            _, ci = lax.top_k(counts, k)                     # (k,) cand index
        iota_c = lax.broadcasted_iota(jnp.int32, (k, ks * SUPER), 1)
        onehot_c = (iota_c == ci[:, None])
        cand_in = onehot_c.any(axis=0)                       # (ks*8,)
        missed = mask & ~cand_in[:, None]                    # cands not swept
        chosen = cblk[ci]                                    # (k,) global ids
        iota_b = lax.broadcasted_iota(jnp.int32, (k, nb), 1)
        onehot = (iota_b == chosen[:, None])
    else:
        mask, mlo = _slab_mask(o, d, t0, t1, tris.block_min,
                               tris.block_max)               # (B, CHUNK)
        k = min(u_blocks, nb)
        if (RANK if not any_mode else ANY_RANK) == "entry":
            # nearest-entry ranking: sweep the k blocks the chunk's rays
            # ENTER first. A far block skipped this way usually fails the
            # post-sweep `mlo <= t_cull` test (the found hit already
            # precedes it), so it never becomes uncovered — unlike
            # popularity ranking, which can leave a NEAR block unswept
            # and force the cascade.
            entry = jnp.min(jnp.where(mask, mlo, INF), axis=1)   # (B,)
            _, chosen = lax.top_k(-entry, k)                 # (k,) block ids
        else:
            counts = mask.sum(axis=1).astype(jnp.int32)      # (B,)
            _, chosen = lax.top_k(counts, k)                 # (k,) block ids
        iota_b = lax.broadcasted_iota(jnp.int32, (k, nb), 1)
        onehot = (iota_b == chosen[:, None])
        block_in = onehot.any(axis=0)                        # (B,)
        missed = mask & ~block_in[:, None]
        smask = jnp.zeros((1, mask.shape[1]), bool)          # no super level
        slo = jnp.full((1, mask.shape[1]), INF)
        super_in = jnp.ones((1,), bool)

    fetched = lax.dot_general(
        onehot.astype(jnp.float32), table,
        (((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST)                 # (k, COLS*BLOCK)
    (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
     ids, op, _) = _table_comps(fetched)                 # (k*BLOCK,) SoA
    # padded/degenerate rows (id < 0 or all-zero fetch) never hit: e1=e2=0
    # makes det 0 -> invalid in the MT kernel.
    t = _mt_T(o, d, v0x, v0y, v0z, e1x, e1y, e1z,
              e2x, e2y, e2z, t0, t1)                     # (k*BLOCK, CHUNK)
    live_row = (ids >= 0.0)[:, None]
    t = jnp.where(live_row, t, INF)

    super_missed = smask & ~super_in[:, None]            # (S, CHUNK)
    if any_mode:
        occ = jnp.any(jnp.isfinite(t) & (op[:, None] >= 0.5), axis=0)
        zero_k = jnp.full((t.shape[1],), _UMAX)
        uncovered = (jnp.any(missed, axis=0)
                     | jnp.any(super_missed, axis=0))
        return zero_k, jnp.zeros((t.shape[1],)), occ, uncovered

    row_iota = lax.broadcasted_iota(jnp.uint32, t.shape, 0)
    bits = lax.bitcast_convert_type(t, jnp.uint32)
    key = (bits & jnp.uint32(~((1 << IDX_BITS) - 1) & 0xFFFFFFFF)) | row_iota
    key = jnp.where(jnp.isfinite(t), key, _UMAX)
    best = jnp.min(key, axis=0)                          # u32 per ray
    j = (best & jnp.uint32((1 << IDX_BITS) - 1)).astype(jnp.int32)
    sel = lax.broadcasted_iota(jnp.int32, t.shape, 0) == j[None, :]
    rid = jnp.sum(jnp.where(sel, ids[:, None], 0.0), axis=0)
    rid = jnp.where(best != _UMAX, rid, -1.0)
    # early-termination culling of the uncovered set: an unswept block
    # can only matter if its slab ENTRY lies in front of the hit already
    # found. t_cull rounds the packed-key t UP (low index bits -> 1s) so
    # the cull is conservative under the 2^-12 mantissa truncation.
    t_cull = lax.bitcast_convert_type(
        best | jnp.uint32((1 << IDX_BITS) - 1), jnp.float32)
    t_cull = jnp.where(best == _UMAX, INF, t_cull)
    uncovered = (jnp.any(missed & (mlo <= t_cull[None, :]), axis=0)
                 | jnp.any(super_missed & (slo <= t_cull[None, :]),
                           axis=0))
    return best, rid, jnp.zeros((t.shape[1],), bool), uncovered


def _sweep(tris: CulledTris, ox, oy, oz, dx, dy, dz, t0, t1, u_blocks,
           any_mode: bool, n_live=None, ks_extra: int | None = None,
           preselect: bool | None = None, group: int | None = None):
    """Batched chunk sweep over a whole (padded) pool laid out row-major
    as chunks of CHUNK rays. Returns flat (key, id, occ, uncovered).

    With `n_live` (a traced count of rays needing the sweep; such rays
    MUST be pre-sorted to the head of the pool), the group loop is a
    `lax.while_loop` whose trip count is ceil(n_live / group_lanes):
    groups past the live head never execute at all — no conds, no
    identity-branch copies (the round-3 profile measured cond-per-group
    skipping at ~44 ms/query fixed cost; a bounded while pays zero)."""
    n = ox.shape[0]
    nc = n // CHUNK
    g = min(GROUP if group is None else group, nc)
    while nc % g:
        g -= 1
    arrays = (ox, oy, oz, dx, dy, dz, t0, t1)

    def sweep_group(args):
        def one(c):
            o = Vec3(c[0], c[1], c[2])
            d = Vec3(c[3], c[4], c[5])
            return _chunk_query(tris, o, d, c[6], c[7], u_blocks, any_mode,
                                ks_extra=ks_extra, preselect=preselect)

        return jax.vmap(one)(jnp.stack(list(args), axis=1))

    if n_live is None:
        key, rid, occ, unc = lax.map(
            sweep_group,
            tuple(a.reshape(nc // g, g, CHUNK) for a in arrays))
        return (key.reshape(-1), rid.reshape(-1), occ.reshape(-1),
                unc.reshape(-1))

    gl = g * CHUNK
    n_groups = (jnp.asarray(n_live, jnp.int32) + (gl - 1)) // gl

    def cond(st):
        return st[0] < n_groups

    def body(st):
        i, key, rid, occ, unc = st
        off = i * gl
        args = tuple(
            lax.dynamic_slice(a, (off,), (gl,)).reshape(g, CHUNK)
            for a in arrays)
        k, r_, o_, u_ = sweep_group(args)
        return (i + 1,
                lax.dynamic_update_slice(key, k.reshape(-1), (off,)),
                lax.dynamic_update_slice(rid, r_.reshape(-1), (off,)),
                lax.dynamic_update_slice(occ, o_.reshape(-1), (off,)),
                lax.dynamic_update_slice(unc, u_.reshape(-1), (off,)))

    init = (jnp.int32(0), jnp.full((n,), _UMAX), jnp.full((n,), -1.0),
            jnp.zeros((n,), bool), jnp.zeros((n,), bool))
    _, key, rid, occ, unc = lax.while_loop(cond, body, init)
    return key, rid, occ, unc


def _dense_pool(tris: CulledTris, ox, oy, oz, dx, dy, dz, t0, t1,
                any_mode: bool, in_play=None):
    """Exact dense transposed sweep of a small COMPACTED pool against the
    whole table — no block selection, no fetch, any scene size. Cascade
    pass 3: rays whose slab mask overflowed U2 land here; cost is
    pool/CHUNK full-table chunk sweeps, so keep the pool ~rp/32.
    `in_play` flags let idle groups skip, so the pool can be the full
    (padded) ray array when only a handful of groups still need it."""
    (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
     ids, op, _) = _table_comps(tris.table)
    live = (ids >= 0.0)[:, None]
    n = ox.shape[0]
    nc = n // CHUNK
    g = min(GROUP if in_play is not None else 8, nc)
    while nc % g:
        g -= 1

    def chunked(a):
        return a.reshape(nc // g, g, CHUNK)

    def sweep_group(args):
        def one(c):
            o = Vec3(c[0], c[1], c[2])
            d = Vec3(c[3], c[4], c[5])
            t = _mt_T(o, d, v0x, v0y, v0z, e1x, e1y, e1z,
                      e2x, e2y, e2z, c[6], c[7])
            t = jnp.where(live, t, INF)
            if any_mode:
                occ = jnp.any(jnp.isfinite(t)
                              & (op[:, None] >= 0.5), axis=0)
                return (jnp.full((CHUNK,), _UMAX), jnp.zeros((CHUNK,)),
                        occ)
            tm = jnp.min(t, axis=0)
            j = jnp.argmin(t, axis=0)
            rid_ = ids[j]
            bits = lax.bitcast_convert_type(tm, jnp.uint32)
            k = bits & jnp.uint32(~((1 << IDX_BITS) - 1) & 0xFFFFFFFF)
            fin = jnp.isfinite(tm)
            return (jnp.where(fin, k, _UMAX), jnp.where(fin, rid_, -1.0),
                    jnp.zeros((CHUNK,), bool))

        return jax.vmap(one)(jnp.stack(list(args), axis=1))

    if in_play is None:
        key, rid, occ = lax.map(
            sweep_group,
            tuple(chunked(a) for a in (ox, oy, oz, dx, dy, dz, t0, t1)))
    else:
        def per_group(args):
            def skip(a):
                return (jnp.full((g, CHUNK), _UMAX),
                        jnp.full((g, CHUNK), -1.0),
                        jnp.zeros((g, CHUNK), bool))

            return lax.cond(jnp.any(args[8] > 0), sweep_group, skip,
                            args[:8])

        key, rid, occ = lax.map(
            per_group,
            tuple(chunked(a) for a in (ox, oy, oz, dx, dy, dz, t0, t1,
                                       in_play)))
    return key.reshape(-1), rid.reshape(-1), occ.reshape(-1)


def _dense_all(tris: CulledTris, ox, oy, oz, dx, dy, dz, t0, t1,
               any_mode: bool):
    """Exact dense fallback over every block (catch-all; scalar-cond'd)."""
    nb = tris.block_min.shape[0]
    o = Vec3(ox, oy, oz)
    d = Vec3(dx, dy, dz)

    def body(bi, carry):
        best, rid, occ = carry
        row = lax.dynamic_slice(tris.table, (bi, 0), (1, COLS * BLOCK))
        (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
         ids, op, _) = _table_comps(row)
        t = _mt_comp_T(o, d, v0x, v0y, v0z, e1x, e1y, e1z,
                       e2x, e2y, e2z, t0,
                       jnp.where(occ, -INF, t1) if any_mode else t1)
        t = jnp.where((ids >= 0.0)[:, None], t, INF)
        if any_mode:
            occ = occ | jnp.any(jnp.isfinite(t) & (op[:, None] >= 0.5),
                                axis=0)
            return best, rid, occ
        row_iota = lax.broadcasted_iota(jnp.uint32, t.shape, 0)
        bits = lax.bitcast_convert_type(t, jnp.uint32)
        key = (bits & jnp.uint32(~((1 << IDX_BITS) - 1) & 0xFFFFFFFF)) \
            | row_iota
        key = jnp.where(jnp.isfinite(t), key, _UMAX)
        kmin = jnp.min(key, axis=0)
        j = (kmin & jnp.uint32((1 << IDX_BITS) - 1)).astype(jnp.int32)
        sel = lax.broadcasted_iota(jnp.int32, t.shape, 0) == j[None, :]
        bid = jnp.sum(jnp.where(sel, ids[:, None], 0.0), axis=0)
        better = kmin < best
        return (jnp.minimum(best, kmin),
                jnp.where(better & (kmin != _UMAX), bid, rid), occ)

    r = ox.shape[0]
    init = (jnp.full((r,), _UMAX), jnp.full((r,), -1.0),
            jnp.zeros((r,), bool))
    return lax.fori_loop(0, nb, body, init)


def _query(tris: CulledTris, origin: Vec3, direction: Vec3, t_min, t_max,
           any_mode: bool):
    r = origin.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    # pad so the 8 gather windows of hp = rp/8 rays tile the pool exactly
    # (windows never overlap, so no ray is ever swept twice); dead pad
    # lanes (t1 = -inf) are untouched and sort to the tail
    rp0 = -(-r // CHUNK) * CHUNK                     # CHUNK-padded count
    hp = max(-(-rp0 // (8 * CHUNK)) * CHUNK, CHUNK)  # window: ceil(rp0/8)
    pad = (8 * hp if QUERY_GATHER else rp0) - r

    def padded(a, fill=0.0):
        if pad == 0:
            return a
        return jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])

    ox = padded(origin.x)
    oy = padded(origin.y)
    oz = padded(origin.z)
    dx = padded(direction.x)
    dy = padded(direction.y)
    dz = padded(direction.z, 1.0)
    t0 = padded(t_min)
    t1 = padded(t_max, -INF)
    rp = ox.shape[0]
    rid0 = jnp.arange(rp, dtype=jnp.int32)

    # slab-only prepass: rays that touch no superblock (most primary rays
    # of a small-on-screen object, and every dead lane) are exact misses;
    # flag them so the sort clusters them at the tail and the sweep's
    # while bound never reaches their groups. The touched COUNT is
    # sort-invariant, so it is computed here and never carried.
    touched = _touched(tris, ox, oy, oz, dx, dy, dz, t0, t1)
    n_touched = jnp.sum(touched.astype(jnp.int32))

    # coherence sort (the SER analogue): untouched-last + octant + origin
    # Morton, then DIRECTION Morton as a second key, STABLE by original
    # ray index (third key). The direction key is load-bearing for
    # primary-class rays: they share one origin so key 1 ties completely,
    # and without it stable order = scanline order, whose 128-ray chunks
    # sweep a thin sliver that touches 12-16 blocks; direction-Morton
    # ties break into compact screen TILES touching far fewer. The sorted
    # rid0 key output doubles as the unsort permutation payload.
    octant = ((dx >= 0).astype(jnp.uint32)
              + 2 * (dy >= 0).astype(jnp.uint32)
              + 4 * (dz >= 0).astype(jnp.uint32))
    code = morton3d(jnp.stack([ox, oy, oz], -1), tris.lo, tris.hi)
    skey = ((octant << jnp.uint32(27)) | (code >> jnp.uint32(5))).astype(
        jnp.int32)
    skey = skey | jnp.where(touched, 0, 1 << 30)
    dkey = morton3d(jnp.stack([dx, dy, dz], -1),
                    jnp.float32(-1.0), jnp.float32(1.0)).astype(jnp.int32)
    # windowed head-gather (QUERY_GATHER): sort only the THREE key
    # operands, then gather + sweep hp-ray WINDOWS of the touched head
    # until n_touched is covered, scattering each window's compact
    # results back. One window almost always suffices (>90% of
    # secondary/shadow lanes are dead or miss-certain; per-scope
    # profiling measured the old full 11-operand sort as the dominant
    # traversal cost of the sphere bench — 56 of the 59 ms/frame
    # traverse scope at 5% live). Windowing replaced the round-5c
    # lax.cond(small, big) dispatch: a runtime branch must COMPILE the
    # whole sweep+cascade machinery twice per query instantiation, which
    # blew the sphere frame's (remote, cold) compile past 20 min; the
    # loop handles every touched count with one instantiation and no
    # full-pool operand sort at all. Windows tile the padded pool
    # exactly (rp = 8*hp), so no ray is ever swept twice.

    def windowed_path():
        _, _, perm = lax.sort((skey, dkey, rid0), dimension=0, num_keys=3)
        n_w = (n_touched + hp - 1) // hp

        def cond(st):
            return st[0] < n_w

        def body(st):
            # results land in PERM order via contiguous slice updates
            # (an .at[idx].set scatter per window measured 3.3x slower
            # at 4 windows on the 42%-touched diag workload); the single
            # permutation scatter below unsorts everything once
            w, kflat, hflat, oflat = st
            idx = lax.dynamic_slice(perm, (w * hp,), (hp,))
            arrs = tuple(a[idx] for a in (ox, oy, oz, dx, dy, dz, t0, t1))
            live = jnp.clip(n_touched - w * hp, 0, hp)
            k, h, oc, _ = _query_pool(tris, *arrs, idx, live, any_mode,
                                      deep_pool=True)
            return (w + 1,
                    lax.dynamic_update_slice(kflat, k, (w * hp,)),
                    lax.dynamic_update_slice(hflat, h, (w * hp,)),
                    lax.dynamic_update_slice(oflat, oc, (w * hp,)))

        init = (jnp.int32(0), jnp.full((rp,), _UMAX),
                jnp.full((rp,), -1.0), jnp.zeros((rp,), bool))
        _, kflat, hflat, oflat = lax.while_loop(cond, body, init)
        # one unsort: perm is a permutation, position i holds ray
        # perm[i]'s result (untouched rays keep their miss defaults)
        kf = jnp.zeros((rp,), kflat.dtype).at[perm].set(
            kflat, unique_indices=True)
        hf = jnp.zeros((rp,), hflat.dtype).at[perm].set(
            hflat, unique_indices=True)
        occf = jnp.zeros((rp,), oflat.dtype).at[perm].set(
            oflat, unique_indices=True)
        return kf, hf, occf.astype(jnp.float32)

    def big_path():
        (_, _, rid, sox, soy, soz, sdx, sdy, sdz, st0, st1) = lax.sort(
            (skey, dkey, rid0, ox, oy, oz, dx, dy, dz, t0, t1),
            dimension=0, num_keys=3)
        k, h, oc, pay = _query_pool(tris, sox, soy, soz, sdx, sdy, sdz,
                                    st0, st1, rid, n_touched, any_mode)
        if any_mode:
            _, occf = lax.sort((pay, oc.astype(jnp.float32)),
                               dimension=0, num_keys=1)
            return (jnp.full((rp,), _UMAX), jnp.full((rp,), -1.0), occf)
        _, k2, h2 = lax.sort((pay, k, h), dimension=0, num_keys=1)
        return k2, h2, jnp.zeros((rp,), jnp.float32)

    key, hid, occf = windowed_path() if QUERY_GATHER else big_path()
    if any_mode:
        return occf[:r] > 0
    key = key[:r]
    hid = hid[:r]
    found = key != _UMAX
    t = lax.bitcast_convert_type(
        key & jnp.uint32(~((1 << IDX_BITS) - 1) & 0xFFFFFFFF), jnp.float32)
    zeros = jnp.zeros((r,))
    return Hit(jnp.where(found, t, INF), zeros, zeros,
               jnp.where(found, hid, -1.0).astype(jnp.int32))


def _query_pool(tris: CulledTris, ox, oy, oz, dx, dy, dz, t0, t1,
                payload, n_live, any_mode: bool, deep_pool: bool = False):
    """Pass-1 sweep + exact cascade on a PRE-SORTED pool (rays needing
    work at the head, `n_live` of them). `payload` (i32, pool-shaped)
    rides every internal permutation; results are returned as
    (key, hid, occ, payload) in whatever order the cascade left them —
    callers restore order via the payload (sort or scatter). With
    CASCADE_GATHER the windowed cascade never permutes the pool, so
    results come back in INPUT order and payload is returned verbatim.

    `deep_pool=True` (the head-gather path): the pool is already rp/8 of
    the query, so the cascade head spans the WHOLE pool — sizing it p/8
    again made incoherent bounce pools overflow into the `_dense_all`
    catch-tail (full table x full pool, measured 556 ms of conditionals
    per 5%-live bounce query)."""
    rp = ox.shape[0]
    rid = payload

    key, hid, occ, unc = _sweep(tris, ox, oy, oz, dx, dy, dz, t0, t1,
                                U1, any_mode, n_live=n_live)
    if any_mode:
        unc = unc & ~occ
    n_unc = jnp.sum(unc.astype(jnp.int32))

    # --- cascade: compact the uncovered rays to the front by one stable
    # sort (so positions < n_unc are exactly them — no flag operands),
    # re-sweep the head rp/8 slice at U2, then dense-sweep (whole table,
    # group-skipped) whatever that leaves, then an absolute-fallback
    # dense pass for overflow past the slice (never fires in practice).
    # The whole cascade sits under ONE scalar cond whose outputs are only
    # the arrays live afterwards — the ray/aux arrays die inside, so a
    # covered frame pays one jnp.any plus a small identity copy. (An
    # in-place, sort-free cascade driven purely by group-skip flags was
    # measured and rejected: uncovered rays scatter across most touched
    # groups — 269 vs 140 ms per 2M-ray primary pool.)
    pool2 = rp if deep_pool else max((rp // 8) // CHUNK * CHUNK, CHUNK)
    sl = slice(0, pool2)
    iota = jnp.arange(rp, dtype=jnp.int32)
    n_in = jnp.minimum(n_unc, pool2)
    unc_key = (~unc).astype(jnp.int32)
    # gather-cascade window size (CASCADE_GATHER): compact by a
    # 2-operand permutation sort + head gathers instead of re-streaming
    # every ray operand through the 12-operand sort; the windowed loop
    # below covers ANY n_unc (entry ranking keeps it tiny — 672 of 2M at
    # U1=16 on the bench sphere — so it usually runs 0 or 1 windows).
    # The legacy full-sort cascade above survives only under
    # TPU_PBRT_CASCADE_GATHER=0 (python-level gate: exactly one cascade
    # is ever compiled into a query).
    pool3 = max((rp // (8 if deep_pool else 32)) // CHUNK * CHUNK, CHUNK)

    def common_head(ops):
        """Sort-compact, U2-re-sweep the head slice; returns the sorted
        operands plus the U2 sweep results and in-play flags."""
        in_play = iota[:pool2] < n_unc
        k3, id3, oc3, un3 = _sweep(
            tris, ops[0][sl], ops[1][sl], ops[2][sl], ops[3][sl],
            ops[4][sl], ops[5][sl], ops[6][sl], ops[7][sl],
            U2, any_mode, n_live=n_in)
        return in_play, k3, id3, oc3, un3

    if any_mode:
        def cascade(_):
            (_, occf, ox2, oy2, oz2, dx2, dy2, dz2, t02, t12,
             rid2) = lax.sort(
                (unc_key, occ.astype(jnp.float32),
                 ox, oy, oz, dx, dy, dz, t0, t1, rid),
                dimension=0, num_keys=1)
            occ2 = occf > 0
            rays2 = (ox2, oy2, oz2, dx2, dy2, dz2, t02, t12)
            in_play, _, _, oc3, un3 = common_head(rays2)
            occ2 = occ2.at[sl].set(occ2[sl] | (in_play & oc3))
            still = in_play & un3 & ~occ2[sl]

            def stage3(o2):
                _, _, oc4 = _dense_pool(
                    tris, ox2[sl], oy2[sl], oz2[sl], dx2[sl], dy2[sl],
                    dz2[sl], t02[sl], t12[sl], True,
                    in_play=still.astype(jnp.int32))
                return o2.at[sl].set(o2[sl] | (still & oc4))

            occ2 = lax.cond(jnp.any(still), stage3, lambda o: o, occ2)
            unc_tail = (iota >= pool2) & (iota < n_unc)

            def catch_tail(o2):
                t1m = jnp.where(unc_tail, t12, -INF)
                _, _, occd = _dense_all(tris, ox2, oy2, oz2, dx2, dy2,
                                        dz2, t02, t1m, True)
                return o2 | (unc_tail & occd)

            occ2 = lax.cond(n_unc > pool2, catch_tail, lambda o: o, occ2)
            return occ2, rid2

        if CASCADE_GATHER:
            # windowed gather cascade: compact via a 2-operand
            # permutation sort, then re-sweep pool3-ray windows of the
            # uncovered head until n_unc is covered (entry ranking keeps
            # n_unc tiny, so one window is the norm and zero windows the
            # common shadow case). A window that overlaps the previous
            # one (final clamp) only re-ORs identical exact results.
            _, perm3 = lax.sort((unc_key, iota), dimension=0, num_keys=1)
            n_w = (n_unc + pool3 - 1) // pool3

            def wcond(st):
                return st[0] < n_w

            def wbody(st):
                v, occ_f = st
                start = jnp.minimum(v * pool3, rp - pool3)
                idx = lax.dynamic_slice(perm3, (start,), (pool3,))
                rays_h = tuple(a[idx] for a in (ox, oy, oz, dx, dy, dz,
                                                t0, t1))
                live = jnp.clip(n_unc - start, 0, pool3)
                in_play = jnp.arange(pool3, dtype=jnp.int32) < live
                occ_h = occ_f[idx]
                _, _, oc3, un3 = _sweep(tris, *rays_h, U2, True,
                                        n_live=live)
                occ_h = occ_h | (in_play & oc3)
                still = in_play & un3 & ~occ_h

                def stage3(oh):
                    _, _, oc4 = _dense_pool(
                        tris, *rays_h, True,
                        in_play=still.astype(jnp.int32))
                    return oh | (still & oc4)

                occ_h = lax.cond(jnp.any(still), stage3, lambda o: o,
                                 occ_h)
                return v + 1, occ_f.at[idx].set(occ_h)

            _, occ = lax.while_loop(wcond, wbody, (jnp.int32(0), occ))
        else:
            occ, rid = lax.cond(n_unc > 0, cascade,
                                lambda _: (occ, rid), 0)
        return key, hid, occ, rid

    def cascade(_):
        (_, key2, hid2, ox2, oy2, oz2, dx2, dy2, dz2, t02, t12,
         rid2) = lax.sort(
            (unc_key, key, hid, ox, oy, oz, dx, dy, dz, t0, t1, rid),
            dimension=0, num_keys=1)
        rays2 = (ox2, oy2, oz2, dx2, dy2, dz2, t02, t12)
        in_play, k3, id3, _, un3 = common_head(rays2)
        better = in_play & (k3 < key2[sl])
        key2 = key2.at[sl].set(jnp.where(better, k3, key2[sl]))
        hid2 = hid2.at[sl].set(jnp.where(better, id3, hid2[sl]))
        still = in_play & un3

        def stage3(args):
            k2, h2 = args
            k4, id4, _ = _dense_pool(
                tris, ox2[sl], oy2[sl], oz2[sl], dx2[sl], dy2[sl],
                dz2[sl], t02[sl], t12[sl], False,
                in_play=still.astype(jnp.int32))
            b = still & (k4 < k2[sl])
            return (k2.at[sl].set(jnp.where(b, k4, k2[sl])),
                    h2.at[sl].set(jnp.where(b, id4, h2[sl])))

        key2, hid2 = lax.cond(jnp.any(still), stage3, lambda a: a,
                              (key2, hid2))
        unc_tail = (iota >= pool2) & (iota < n_unc)

        def catch_tail(args):
            k2, h2 = args
            t1m = jnp.where(unc_tail, t12, -INF)
            kd, idd, _ = _dense_all(tris, ox2, oy2, oz2, dx2, dy2, dz2,
                                    t02, t1m, False)
            b = unc_tail & (kd < k2)
            return jnp.where(b, kd, k2), jnp.where(b, idd, h2)

        key2, hid2 = lax.cond(n_unc > pool2, catch_tail, lambda a: a,
                              (key2, hid2))
        return key2, hid2, rid2

    if CASCADE_GATHER:
        # windowed gather cascade (see the any_mode twin above): exact
        # merge by strict key comparison, so overlap re-sweeps are no-ops
        _, perm3 = lax.sort((unc_key, iota), dimension=0, num_keys=1)
        n_w = (n_unc + pool3 - 1) // pool3

        def wcond(st):
            return st[0] < n_w

        def wbody(st):
            v, key_f, hid_f = st
            start = jnp.minimum(v * pool3, rp - pool3)
            idx = lax.dynamic_slice(perm3, (start,), (pool3,))
            rays_h = tuple(a[idx] for a in (ox, oy, oz, dx, dy, dz,
                                            t0, t1))
            live = jnp.clip(n_unc - start, 0, pool3)
            in_play = jnp.arange(pool3, dtype=jnp.int32) < live
            key_h = key_f[idx]
            hid_h = hid_f[idx]
            k3, id3, _, un3 = _sweep(tris, *rays_h, U2, False,
                                     n_live=live)
            better = in_play & (k3 < key_h)
            key_h = jnp.where(better, k3, key_h)
            hid_h = jnp.where(better, id3, hid_h)
            still = in_play & un3

            def stage3(args):
                kh, hh = args
                k4, id4, _ = _dense_pool(tris, *rays_h, False,
                                         in_play=still.astype(jnp.int32))
                b = still & (k4 < kh)
                return jnp.where(b, k4, kh), jnp.where(b, id4, hh)

            key_h, hid_h = lax.cond(jnp.any(still), stage3, lambda a: a,
                                    (key_h, hid_h))
            return (v + 1, key_f.at[idx].set(key_h),
                    hid_f.at[idx].set(hid_h))

        _, key, hid = lax.while_loop(wcond, wbody,
                                     (jnp.int32(0), key, hid))
        return key, hid, jnp.zeros((rp,), bool), rid

    key, hid, rid = lax.cond(n_unc > 0, cascade,
                             lambda _: (key, hid, rid), 0)
    return key, hid, jnp.zeros((rp,), bool), rid


def closest_hit(tris: CulledTris, origin: Vec3, direction: Vec3,
                t_min, t_max) -> Hit:
    return _query(tris, origin, direction, t_min, t_max, any_mode=False)


def any_hit(tris: CulledTris, origin: Vec3, direction: Vec3,
            t_min, t_max) -> jnp.ndarray:
    return _query(tris, origin, direction, t_min, t_max, any_mode=True)
