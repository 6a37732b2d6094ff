"""EXPERIMENTAL sorted-chunk Pallas tracer: ray chunks walk per-octant
front-to-back Morton block orders with early exit.

A candidate DXR TraceRay + SER replacement for scenes past the dense
sweep (reference: Shaders/RaytracingHelpers.hlsli:17-54). Exact against
the dense reference (tests/test_resident.py) but NOT yet the production
backend: on a 25k-tri sphere at 2M rays on v5e it measures ~2.7 s per
closest-hit call vs ~0.86 s for ops/traverse_blocked — kept, with its
measurements, as the foundation for the next traversal round.

What the build of this module established (all measured on v5e, kept
here so the next attempt doesn't re-derive them):

  * tile-union block culling fails for incoherent rays: a 512-ray
    sorted tile of bounce rays reaches 152/198 sphere blocks while a
    single ray crosses 11.6 — per-ray-interval culling is the only
    thing that can cut big-scene traversal work;
  * multi-operand `lax.sort` is the fast permutation primitive:
    10 operands x 2M lanes ~ 4 ms (argsort + per-array gathers measured
    ~25x that) — ray reordering (the SER analogue) is affordable;
  * the broadcast Moller-Trumbore sweep (C rays sublane x 128 tris
    lane) hits ~57 G ray-tri pairs/s in an isolated kernel — VPU speed
    of light — but this full kernel sustains only ~19 G: the gap (the
    per-step out-block round trip, the done bookkeeping, and the
    conditional) is the thing to close;
  * `lax.while_loop` iterations inside a kernel cost ~6 us of fixed
    overhead vs ~0.5 us per (skippable) grid step — dynamic-length
    walks must be grid steps with a scratch done-flag, as here;
  * the sigma-frontier early-exit (done once sigma.o + sigma.d*t_best
    passes the remaining blocks' sorted entry keys — exact for
    in-octant lanes) fires too late mid-walk: an L1 plane sweep is a
    weak bound on "blocks my ray can still reach" — per-ray slab
    intervals against a spatial hierarchy are needed.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bvh import morton3d
from .traverse import Hit
from .vec import Vec3

BLOCK = 128
CHUNK = 256        # rays per kernel chunk (VMEM-pressure validated)
DONE_PERIOD = 4    # grid steps between early-exit checks (power of two)
SQRT3 = 1.7320509
INF = jnp.float32(jnp.inf)

# triangle component rows inside a (16, 128) block
_ROWS = 16  # v0(3) e1(3) e2(3) opacity(1) pad(6)


class ResidentTris(NamedTuple):
    tris: jnp.ndarray       # (NB, 16, 128) f32: v0,e1,e2 rows + opacity row 9
    tri_id: jnp.ndarray     # (NB*128,) i32 original tri id, -1 pad
    orders: jnp.ndarray     # (8, NB) i32 per-octant front-to-back block ids
    keys: jnp.ndarray       # (8, NB) f32 sigma-projected block entry keys
    lo: jnp.ndarray         # (3,) scene bounds for the ray Morton sort
    hi: jnp.ndarray         # (3,)
    scene_diag: jnp.ndarray  # () f32
    num: int


def prepare(v0, v1, v2, opacity=None) -> ResidentTris:
    """Host build: Morton-sort tris into 128-wide blocks, pack the kernel
    layout, and precompute the 8 octant walk orders."""
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    t = v0.shape[0]
    if opacity is None:
        opacity = np.ones((t,), np.float32)
    opacity = np.asarray(opacity, np.float32)

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

    packed = np.zeros((nb, _ROWS, BLOCK), np.float32)
    e1 = sv1 - sv0
    e2 = sv2 - sv0
    packed[:, 0:3] = sv0.reshape(nb, BLOCK, 3).transpose(0, 2, 1)
    packed[:, 3:6] = e1.reshape(nb, BLOCK, 3).transpose(0, 2, 1)
    packed[:, 6:9] = e2.reshape(nb, BLOCK, 3).transpose(0, 2, 1)
    packed[:, 9] = sop.reshape(nb, BLOCK)

    tri_min = np.minimum(np.minimum(sv0, sv1), sv2).reshape(nb, BLOCK, 3)
    tri_max = np.maximum(np.maximum(sv0, sv1), sv2).reshape(nb, BLOCK, 3)
    valid = (sid >= 0).reshape(nb, BLOCK, 1)
    bmin = np.where(valid, tri_min, np.inf).min(1)
    bmax = np.where(valid, tri_max, -np.inf).max(1)

    orders = np.zeros((8, nb), np.int32)
    keys = np.zeros((8, nb), np.float32)
    for oct_ in range(8):
        sx = 1.0 if oct_ & 1 else -1.0
        sy = 1.0 if oct_ & 2 else -1.0
        sz = 1.0 if oct_ & 4 else -1.0
        # min over the AABB of sigma.x (the block's entry key along the
        # octant's sweep direction)
        k = (sx * np.where(sx > 0, bmin[:, 0], bmax[:, 0])
             + sy * np.where(sy > 0, bmin[:, 1], bmax[:, 1])
             + sz * np.where(sz > 0, bmin[:, 2], bmax[:, 2]))
        k = np.where(np.isfinite(k), k, np.inf)  # empty (all-pad) blocks last
        o = np.argsort(k, kind="stable").astype(np.int32)
        orders[oct_] = o
        keys[oct_] = k[o].astype(np.float32)
    keys = np.where(np.isfinite(keys), keys, np.float32(3e38))

    # FULL vertex bounds (the far-bound clamp needs the true extent; the
    # centroid bounds above only quantize the Morton codes)
    vlo = np.minimum(np.minimum(v0.min(0), v1.min(0)), v2.min(0))
    vhi = np.maximum(np.maximum(v0.max(0), v1.max(0)), v2.max(0))
    diag = float(np.linalg.norm(vhi - vlo) + 1e-3)
    return ResidentTris(
        tris=jnp.asarray(packed),
        tri_id=jnp.asarray(sid),
        orders=jnp.asarray(orders),
        keys=jnp.asarray(keys),
        lo=jnp.asarray(vlo.astype(np.float32)),
        hi=jnp.asarray(vhi.astype(np.float32)),
        scene_diag=jnp.asarray(diag, jnp.float32),
        num=t,
    )


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(octs_ref, orders_ref, keys_ref, rays_ref, tris_a_ref, tris_b_ref,
            out_ref, done_ref, *, nb, idx_bits, occlusion):
    """Grid step (chunk, j): sweep two blocks of the chunk's front-to-back
    octant order. The walk state (packed best + a per-chunk done flag in
    SMEM scratch) persists across j steps; once the chunk's reachable
    frontier passes every lane's best hit, remaining steps skip their
    compute (a grid step costs ~0.5 us skipped vs ~6 us for a
    `lax.while_loop` iteration — measured; that overhead gap is why this
    is a grid walk, not an in-kernel loop).

    rays_ref: (C, 8) rows ox,oy,oz,dx,dy,dz,tmin,teff per lane.
    tris_a/b_ref: (1, 16, 128) — the two blocks, DMA'd by the index_map
    straight from the prefetched order table.
    out_ref:  (C, 1) i32 — mantissa-packed (t | slot) min, or occlusion
    flag in occlusion mode."""
    ch = pl.program_id(0)
    j = pl.program_id(1)
    oct_ = octs_ref[ch]
    sx = jnp.where(oct_ & 1, 1.0, -1.0)
    sy = jnp.where(oct_ & 2, 1.0, -1.0)
    sz = jnp.where(oct_ & 4, 1.0, -1.0)

    r = rays_ref[...]
    ox = r[:, 0:1]
    oy = r[:, 1:2]
    oz = r[:, 2:3]
    dx = r[:, 3:4]
    dy = r[:, 4:5]
    dz = r[:, 5:6]
    t0 = r[:, 6:7]
    t1 = r[:, 7:8]                      # effective far bound (finite)
    so = sx * ox + sy * oy + sz * oz    # (C, 1) sigma.o
    sd = sx * dx + sy * dy + sz * dz    # (C, 1) sigma.d — EXACT advance
    # the sigma-based done test is only valid for lanes whose direction
    # lies in the chunk's octant (chunks straddling an octant boundary
    # keep their stray lanes until the walk finishes — rare and correct);
    # for in-octant lanes sigma.x(t) = sigma.o + t*sigma.d exactly, with
    # sigma.d >= 0, so the reachable-frontier test is tight
    oct_ok = ((dx * sx >= 0.0) & (dy * sy >= 0.0) & (dz * sz >= 0.0))

    # int32 keys: Mosaic has no unsigned reductions; positive-float bit
    # patterns are order-preserving as SIGNED ints too, and the sentinel
    # INT32_MAX stays above every finite packed t
    idx_mask = jnp.int32((1 << idx_bits) - 1)
    sentinel = jnp.int32(0x7FFFFFFF)
    lane_ids = lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1)

    def sweep(tr, bid, best):
        v0x = tr[0:1, :]
        v0y = tr[1:2, :]
        v0z = tr[2:3, :]
        e1x = tr[3:4, :]
        e1y = tr[4:5, :]
        e1z = tr[5:6, :]
        e2x = tr[6:7, :]
        e2y = tr[7:8, :]
        e2z = tr[8:9, :]
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        s = jnp.where(det >= 0, 1.0, -1.0)
        ad = det * s
        tvx = ox - v0x
        tvy = oy - v0y
        tvz = oz - v0z
        un = (tvx * pvx + tvy * pvy + tvz * pvz) * s
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        vn = (dx * qvx + dy * qvy + dz * qvz) * s
        tn = (e2x * qvx + e2y * qvy + e2z * qvz) * s
        if occlusion:
            teff = t1         # `best` holds the occluded flag, not a t
        else:
            teff = jnp.minimum(t1, _unpack_t(best, idx_mask))
        hit = ((ad > 1e-12) & (un >= 0.0) & (vn >= 0.0) & (un + vn <= ad)
               & (tn > t0 * ad) & (tn < teff * ad))
        if occlusion:
            op = tr[9:10, :]
            return best | jnp.any(hit & (op >= 0.5), axis=1,
                                  keepdims=True).astype(jnp.int32)
        t = jnp.where(hit, tn / jnp.where(hit, ad, 1.0), float("inf"))
        bits = lax.bitcast_convert_type(t, jnp.int32)
        slot = bid * jnp.int32(BLOCK) + lane_ids
        key = (bits & ~idx_mask) | slot
        key = jnp.where(hit, key, sentinel)
        return jnp.minimum(best, jnp.min(key, axis=1, keepdims=True))

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.full_like(
            out_ref, 0 if occlusion else 0x7FFFFFFF)
        done_ref[0] = 0

    @pl.when(done_ref[0] == 0)
    def _():
        best = out_ref[...]
        # two blocks per step (re-sweeping the clamped last block is
        # idempotent under min/or)
        best = sweep(tris_a_ref[0], orders_ref[oct_, 2 * j], best)
        best = sweep(tris_b_ref[0],
                     orders_ref[oct_, jnp.minimum(2 * j + 1, nb - 1)], best)
        out_ref[...] = best

        # a lane is done once every remaining block starts beyond its
        # best reachable point (keys are sorted along the walk); the
        # cross-sublane all()-to-SMEM reduce has real per-step cost, so
        # it only runs every DONE_PERIOD steps
        @pl.when((j & (DONE_PERIOD - 1)) == (DONE_PERIOD - 1))
        def _():
            nxt = keys_ref[oct_, jnp.minimum(2 * j + 2, nb - 1)]
            if occlusion:
                lane_done = (best > 0) | (t1 <= t0)
            else:
                best_t = _unpack_t(best, idx_mask)
                reach = jnp.minimum(best_t, t1)
                lane_done = ((oct_ok & (so + sd * reach < nxt))
                             | (t1 <= t0))
            done_ref[0] = jnp.all(lane_done).astype(jnp.int32)


def _unpack_t(key, idx_mask):
    """Approximate t from a packed key (index bits zeroed — same blur as
    the dense sweep's tie-break). The no-hit sentinel would bitcast to a
    negative NaN (0xFFFFxxxx) and poison every min() downstream — any key
    with an all-ones exponent cannot be a real finite hit, so map those
    to +inf explicitly (the sentinel INT32_MAX lands there)."""
    t = lax.bitcast_convert_type(key & ~idx_mask, jnp.float32)
    return jnp.where(key >= jnp.int32(0x7F800000), float("inf"), t)


def _pad_to(x, n, fill):
    p = n - x.shape[0]
    if p == 0:
        return x
    return jnp.concatenate([x, jnp.full((p,), fill, x.dtype)])


def _sort_for_traversal(tris: ResidentTris, origin: Vec3, direction: Vec3,
                        t_min, t_max):
    """Octant+Morton multi-operand sort; returns sorted ray block (Rp, 8),
    sorted lane ids, chunk octants, and the pad count."""
    r = origin.x.shape[0]
    rp = ((r + CHUNK - 1) // CHUNK) * CHUNK
    octant = (
        (direction.x >= 0).astype(jnp.uint32)
        + 2 * (direction.y >= 0).astype(jnp.uint32)
        + 4 * (direction.z >= 0).astype(jnp.uint32)
    )
    code = morton3d(origin.to_array(), tris.lo, tris.hi)
    key = (octant << jnp.uint32(27)) | (code >> jnp.uint32(5))
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    # inactive lanes cluster at the end (their chunks exit immediately)
    active = t_max > t_min
    key = jnp.where(active, key, jnp.uint32(0xFFFFFFFE))
    lane = jnp.arange(r, dtype=jnp.int32)

    # finite far bound: the ray cannot hit anything past its scene-bbox
    # exit, and rays missing the bbox entirely are dead on arrival —
    # this is what lets miss/background lanes release their chunk early
    def axis(o_, d_, lo_, hi_):
        inv = 1.0 / jnp.where(jnp.abs(d_) > 1e-12, d_,
                              jnp.where(d_ >= 0, 1e-12, -1e-12))
        a = (lo_ - o_) * inv
        b = (hi_ - o_) * inv
        return jnp.minimum(a, b), jnp.maximum(a, b)

    nx_, fx_ = axis(origin.x, direction.x, tris.lo[0], tris.hi[0])
    ny_, fy_ = axis(origin.y, direction.y, tris.lo[1], tris.hi[1])
    nz_, fz_ = axis(origin.z, direction.z, tris.lo[2], tris.hi[2])
    t_enter = jnp.maximum(jnp.maximum(nx_, ny_), jnp.maximum(nz_, t_min))
    t_exit = jnp.minimum(jnp.minimum(fx_, fy_), fz_)
    active = active & (t_exit >= t_enter)
    teff = jnp.minimum(t_max, t_exit * (1.0 + 1e-4) + 1e-5)
    teff = jnp.where(active, teff, -1.0)
    t0 = t_min

    ops = (
        _pad_to(key, rp, jnp.uint32(0xFFFFFFFF)),
        _pad_to(origin.x, rp, 0.0), _pad_to(origin.y, rp, 0.0),
        _pad_to(origin.z, rp, 0.0),
        _pad_to(direction.x, rp, 0.0), _pad_to(direction.y, rp, 0.0),
        _pad_to(direction.z, rp, 1.0),
        _pad_to(t0, rp, 0.0), _pad_to(teff, rp, -1.0),
        _pad_to(lane, rp, -1),
    )
    s = lax.sort(ops, dimension=0, num_keys=1)
    skey = s[0]
    rays = jnp.stack(s[1:9], axis=-1)            # (Rp, 8)
    slane = s[9]
    octs = (skey[::CHUNK] >> jnp.uint32(27)).astype(jnp.int32)
    octs = jnp.minimum(octs, 7)                  # sentinel chunks -> any
    return rays, slane, octs, rp


def _run_kernel(tris: ResidentTris, rays, octs, occlusion: bool):
    nb = tris.tris.shape[0]
    idx_bits = max((nb * BLOCK - 1).bit_length(), 1)
    nch = rays.shape[0] // CHUNK
    nb2 = (nb + 1) // 2
    kernel = functools.partial(_kernel, nb=nb, idx_bits=idx_bits,
                               occlusion=occlusion)

    def block_a(ch, j, octs, orders, keys):
        return (orders[octs[ch], 2 * j], 0, 0)

    def block_b(ch, j, octs, orders, keys):
        return (orders[octs[ch], jnp.minimum(2 * j + 1, nb - 1)], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,     # octs, orders, keys
        grid=(nch, nb2),
        in_specs=[
            pl.BlockSpec((CHUNK, 8),
                         lambda ch, j, octs, orders, keys: (ch, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _ROWS, BLOCK), block_a,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _ROWS, BLOCK), block_b,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CHUNK, 1),
                               lambda ch, j, octs, orders, keys: (ch, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rays.shape[0], 1), jnp.int32),
        interpret=_interpret(),
    )(octs, tris.orders, tris.keys, rays, tris.tris, tris.tris)
    return out[:, 0], idx_bits


def closest_hit(tris: ResidentTris, origin: Vec3, direction: Vec3,
                t_min, t_max) -> Hit:
    r = origin.x.shape[0]
    rays, slane, octs, rp = _sort_for_traversal(tris, origin, direction,
                                                t_min, t_max)
    best, idx_bits = _run_kernel(tris, rays, octs, occlusion=False)
    # restore original ray order (2-operand sort by lane id; pad lanes
    # carry -1 and sort to the front — slice them off)
    lane_sorted, best_orig = lax.sort(
        (slane, best), dimension=0, num_keys=1)
    best_orig = best_orig[rp - r:]

    idx_mask = jnp.int32((1 << idx_bits) - 1)
    missed = best_orig == jnp.int32(0x7FFFFFFF)
    t = lax.bitcast_convert_type(best_orig & ~idx_mask, jnp.float32)
    slot = best_orig & idx_mask
    tri = jnp.where(missed, -1, tris.tri_id[jnp.minimum(
        slot, tris.tri_id.shape[0] - 1)])
    zeros = jnp.zeros((r,))
    # u = v = 0 like the dense/blocked backends: consumers re-derive
    # barycentrics against the winning triangle (ops/shade_table.fetch)
    return Hit(t=jnp.where(missed, INF, t), u=zeros, v=zeros, tri=tri)


def any_hit(tris: ResidentTris, origin: Vec3, direction: Vec3,
            t_min, t_max) -> jnp.ndarray:
    r = origin.x.shape[0]
    rays, slane, octs, rp = _sort_for_traversal(tris, origin, direction,
                                                t_min, t_max)
    occ, _ = _run_kernel(tris, rays, octs, occlusion=True)
    _, occ_orig = lax.sort((slane, occ), dimension=0, num_keys=1)
    return occ_orig[rp - r:] > 0


def refit(tris: ResidentTris, v0, v1, v2) -> ResidentTris:
    """Refit deformed vertices into the stored Morton slot order (the
    ALLOW_UPDATE path; the octant walk orders/keys refresh on device)."""
    tid = jnp.maximum(tris.tri_id, 0)
    valid = tris.tri_id >= 0
    sv0 = jnp.where(valid[:, None], jnp.asarray(v0, jnp.float32)[tid], 0.0)
    sv1 = jnp.where(valid[:, None], jnp.asarray(v1, jnp.float32)[tid], 0.0)
    sv2 = jnp.where(valid[:, None], jnp.asarray(v2, jnp.float32)[tid], 0.0)
    nb = tris.tris.shape[0]

    packed = tris.tris
    e1 = sv1 - sv0
    e2 = sv2 - sv0

    def put(p, row0, arr):
        return p.at[:, row0:row0 + 3, :].set(
            arr.reshape(nb, BLOCK, 3).transpose(0, 2, 1))

    packed = put(packed, 0, sv0)
    packed = put(packed, 3, e1)
    packed = put(packed, 6, e2)

    tri_min = jnp.minimum(jnp.minimum(sv0, sv1), sv2).reshape(nb, BLOCK, 3)
    tri_max = jnp.maximum(jnp.maximum(sv0, sv1), sv2).reshape(nb, BLOCK, 3)
    vm = valid.reshape(nb, BLOCK, 1)
    bmin = jnp.where(vm, tri_min, INF).min(1)
    bmax = jnp.where(vm, tri_max, -INF).max(1)

    signs = jnp.asarray(
        [[1.0 if o & 1 else -1.0, 1.0 if o & 2 else -1.0,
          1.0 if o & 4 else -1.0] for o in range(8)], jnp.float32)
    corner = jnp.where(signs[:, None, :] > 0, bmin[None], bmax[None])
    keys = (signs[:, None, :] * corner).sum(-1)          # (8, NB)
    keys = jnp.where(jnp.isfinite(keys), keys, 3e38)
    orders = jnp.argsort(keys, axis=1).astype(jnp.int32)
    keys = jnp.take_along_axis(keys, orders, axis=1)

    lo = jnp.minimum(jnp.minimum(sv0, sv1), sv2).min(0)
    hi = jnp.maximum(jnp.maximum(sv0, sv1), sv2).max(0)
    diag = jnp.linalg.norm(hi - lo) + 1e-3
    return tris._replace(tris=packed, orders=orders,
                         keys=keys.astype(jnp.float32),
                         lo=lo, hi=hi, scene_diag=diag)
