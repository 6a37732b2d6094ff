"""SHARC-style hash-grid radiance cache — direct-mapped, 64-bit keys,
sort-only resolve (no atomics, no scatters).

Capability mirror of the reference's RTXGI SHARC integration
(reference: Source/SHARC.ixx:23-102 — 2^22-entry u64 hash grid with
resolve/compaction passes, AccumulationFrames=10, MaxStaleFrames=64;
Shaders/Raytracing.hlsl:175-316 — SHARC_UPDATE pass at 1/4 res writing path
radiance into voxels + SHARC_QUERY pass terminating paths into cached
radiance when the voxel footprint test passes; camera-centered logarithmic
voxel levels via HashGridGetLevel).

TPU re-design (round 3, after profiling the round-2 form):

  * **64-bit keys** (reference parity: u64 entries, SHARC.ixx:48-57): the
    voxel identity hashes into TWO independent 32-bit words. A cache hit
    requires both to match, so distinct voxels alias only at ~2^-64 pair
    rate — the round-2 single-u32 scheme let colliding voxels silently
    share radiance (light leaks).
  * **the table IS the direct map**: slot i of the state arrays holds the
    entry whose key maps there (slot = key_lo & (C-1)). The round-2 design
    kept a key-sorted canonical table and rebuilt a direct-mapped query
    view with a (C, 4) scatter — profiled at ~41 ms/frame at C = 2^20,
    the single largest SHARC cost. Slot order makes the query view a pure
    elementwise repack.
  * **resolve is three multi-operand sorts + elementwise combines** (a
    1.15M-lane 8-operand `lax.sort` measures 2.4 ms on v5e, ~20x cheaper
    than an equivalent scatter):
      1. sort new records by (key_lo, key_hi), segmented suffix-sum the
         per-voxel sums (Hillis-Steele doubling — exact, scatter-free);
      2. sort [table rows (slot = row index), record aggregates
         (slot = key_lo & (C-1))] by (slot, is_new, -count): each slot's
         run is [table row, best new aggregate, lesser aggregates...];
      3. combine each table row with its following aggregate branchlessly
         (EMA accumulate on a 64-bit key match; count-based eviction on a
         slot collision), mark everything else dead, and sort once more by
         slot to compact back to the C slot-ordered rows.
  * query stays ONE 16-byte row gather: qdata rows pack [key_lo, key_hi,
    rg as two f16, b as f16] into (C, 4) u32.

Double-buffering: the functional state swap in the frame loop mirrors the
reference's voxel-buffer swap (Raytracing.ixx:147).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from ..ops import vec
from ..ops.vec import Vec3

_U32 = jnp.uint32
EMPTY_KEY = jnp.uint32(0xFFFFFFFF)


@dataclasses.dataclass(frozen=True)
class SHARCSettings:
    """Defaults per the reference (SHARC.ixx:23-27, MyAppData.h:256-265)."""
    capacity_log2: int = 18          # table entries (2^22 in the reference)
    scene_scale: float = 50.0
    downscale: int = 4               # update pass at renderSize/downscale
    accumulation_frames: float = 10.0
    max_stale_frames: int = 64
    roughness_threshold: float = 0.4
    level_bias: float = 2.0
    log_base: float = 2.0


class VoxelKey(NamedTuple):
    """64-bit voxel identity as two independent 32-bit hash words
    (the reference's u64 hash entries, SHARC.ixx:48-57). `lo` also
    addresses the direct map (slot = lo & (C-1)); a hit compares both."""
    lo: jnp.ndarray   # (R,) u32, EMPTY_KEY reserved for "no voxel"
    hi: jnp.ndarray   # (R,) u32


class SHARCState(NamedTuple):
    """Slot-ordered direct-mapped voxel table: row i holds the entry whose
    key_lo & (C-1) == i (or EMPTY_KEY). qdata is the packed query view."""
    key_lo: jnp.ndarray    # (C,) u32
    key_hi: jnp.ndarray    # (C,) u32
    radiance: jnp.ndarray  # (C, 3) accumulated mean radiance
    count: jnp.ndarray     # (C,) accumulated sample count (capped)
    stale: jnp.ndarray     # (C,) frames since last touch
    qdata: jnp.ndarray     # (C, 4) u32 [key_lo, key_hi, rg f16x2, b f16]


def init_state(settings: SHARCSettings) -> SHARCState:
    c = 1 << settings.capacity_log2
    empt = jnp.full((c,), EMPTY_KEY, _U32)
    return SHARCState(
        key_lo=empt, key_hi=empt,
        radiance=jnp.zeros((c, 3)),
        count=jnp.zeros((c,)),
        stale=jnp.zeros((c,)),
        qdata=jnp.stack([empt, empt, jnp.zeros((c,), _U32),
                         jnp.zeros((c,), _U32)], axis=-1),
    )


def grid_level(position: Vec3, camera_pos, settings: SHARCSettings):
    """Camera-distance logarithmic level (HashGridGetLevel)."""
    cp = Vec3(camera_pos[0], camera_pos[1], camera_pos[2])
    d = vec.length(position - cp)
    lvl = jnp.floor(
        jnp.log2(jnp.maximum(d, 1e-6)) / jnp.log2(settings.log_base)
        + settings.level_bias
    )
    return jnp.clip(lvl, 1.0, 16.0)


def voxel_size(level, settings: SHARCSettings):
    return (settings.log_base ** level) / settings.scene_scale


def voxel_key(position: Vec3, normal: Vec3, camera_pos,
              settings: SHARCSettings) -> VoxelKey:
    """Quantize position (+ a 3-bit normal bucket like SHARC's hash of the
    surface orientation) into a 64-bit key: two independent 32-bit hashes
    of the same (ix, iy, iz, level, bucket) identity."""
    lvl = grid_level(position, camera_pos, settings)
    size = voxel_size(lvl, settings)
    ix = jnp.floor(position.x / size).astype(jnp.int32)
    iy = jnp.floor(position.y / size).astype(jnp.int32)
    iz = jnp.floor(position.z / size).astype(jnp.int32)
    # normal bucket: dominant axis + sign
    ax = jnp.abs(normal.x)
    ay = jnp.abs(normal.y)
    az = jnp.abs(normal.z)
    dom = jnp.where(ax >= jnp.maximum(ay, az), 0,
                    jnp.where(ay >= az, 1, 2))
    sgn = jnp.where(
        jnp.where(dom == 0, normal.x, jnp.where(dom == 1, normal.y,
                                                normal.z)) >= 0, 0, 1)
    bucket = (dom.astype(_U32) * 2 + sgn.astype(_U32))
    uix, uiy, uiz = ix.astype(_U32), iy.astype(_U32), iz.astype(_U32)
    ulv = lvl.astype(_U32)
    lo = (uix * _U32(0x9E3779B1)
          ^ uiy * _U32(0x85EBCA77)
          ^ uiz * _U32(0xC2B2AE3D)
          ^ ulv * _U32(0x27D4EB2F)
          ^ bucket * _U32(0x165667B1))
    # second word: same identity, different odd multipliers + final mix so
    # the two words are (empirically) independent hash functions
    hi = (uix * _U32(0x7FEB352D)
          ^ uiy * _U32(0x846CA68B)
          ^ uiz * _U32(0x9E485565)
          ^ ulv * _U32(0xAE3CC725)
          ^ bucket * _U32(0x735A2D97))
    hi = hi ^ (hi >> _U32(16))
    hi = hi * _U32(0x2C1B3C6D)
    lo = jnp.where(lo == EMPTY_KEY, _U32(0), lo)
    return VoxelKey(lo=lo, hi=hi)


def _f16_bits(x: jnp.ndarray) -> jnp.ndarray:
    """f32 -> f16 bit pattern as u32 (low 16 bits)."""
    h = jnp.clip(x, -6e4, 6e4).astype(jnp.float16)
    return lax.bitcast_convert_type(h, jnp.uint16).astype(_U32)


def _f16_unbits(bits: jnp.ndarray) -> jnp.ndarray:
    """u32 (low 16 bits hold an f16 pattern) -> f32."""
    return lax.bitcast_convert_type(
        bits.astype(jnp.uint16), jnp.float16).astype(jnp.float32)


def _pack_qdata(key_lo, key_hi, radiance, live) -> jnp.ndarray:
    """(C, 4) u32 query rows: [key_lo, key_hi, r|g<<16, b] — 16 bytes, one
    row gather per lookup. Dead rows carry EMPTY keys."""
    klo = jnp.where(live, key_lo, EMPTY_KEY)
    khi = jnp.where(live, key_hi, EMPTY_KEY)
    rg = _f16_bits(radiance[:, 0]) | (_f16_bits(radiance[:, 1]) << _U32(16))
    b = _f16_bits(radiance[:, 2])
    return jnp.stack([klo, khi, rg, b], axis=-1)


def _aggregate_records(nk_lo, nk_hi, new_radiance: Vec3, new_valid,
                       cmask: jnp.ndarray):
    """Sort the update-pool records by 64-bit key and segment-sum each
    voxel's radiance/count (Hillis-Steele segmented suffix sums — exact,
    scatter-free; TPU scatters with duplicate indices serialize and a
    cumsum-difference form would catastrophically cancel on f32 over ~1M
    records). Returns key-sorted arrays where rows flagged `agg_live`
    hold one aggregate per distinct voxel."""
    sk_lo, sk_hi, srx, sry, srz, sv = lax.sort(
        (nk_lo, nk_hi, new_radiance.x, new_radiance.y, new_radiance.z,
         new_valid.astype(jnp.float32)), dimension=0, num_keys=2)
    srx = srx * sv
    sry = sry * sv
    srz = srz * sv
    same_key = lambda a_lo, a_hi, b_lo, b_hi: (a_lo == b_lo) & (a_hi == b_hi)
    first = jnp.concatenate(
        [jnp.ones((1,), bool),
         ~same_key(sk_lo[1:], sk_hi[1:], sk_lo[:-1], sk_hi[:-1])])
    p = sk_lo.shape[0]

    def seg_suffix_sums(vals):
        d = 1
        vals = list(vals)
        while d < p:
            same = jnp.concatenate(
                [same_key(sk_lo[d:], sk_hi[d:], sk_lo[:-d], sk_hi[:-d]),
                 jnp.zeros((d,), bool)])
            for i, v in enumerate(vals):
                shifted = jnp.concatenate([v[d:], jnp.zeros((d,), v.dtype)])
                vals[i] = v + jnp.where(same, shifted, 0)
            d *= 2
        return vals

    t_cnt, t_r0, t_r1, t_r2 = seg_suffix_sums([sv, srx, sry, srz])
    agg_live = first & (sk_lo != EMPTY_KEY) & (t_cnt > 0)
    agg_cnt = jnp.where(agg_live, t_cnt, 0.0)
    agg_sums = (jnp.where(agg_live, t_r0, 0.0),
                jnp.where(agg_live, t_r1, 0.0),
                jnp.where(agg_live, t_r2, 0.0))
    return sk_lo, sk_hi, agg_live, agg_cnt, agg_sums


def resolve(state: SHARCState, new_keys: VoxelKey, new_radiance: Vec3,
            new_valid: jnp.ndarray, settings: SHARCSettings) -> SHARCState:
    """Merge new (key, radiance) records into the direct-mapped table.

    Update-pool-only resolve (round 4): all sorts are P-sized (P = update
    records, ~rw*rh/16), the C-sized table is touched only by elementwise
    aging plus ONE row scatter at unique, sorted slots. This removes the
    (C+P)-row multi-operand sort wall that forced the round-3 capacity
    clamp, so the reference's 2^22 capacity (Source/SHARC.ixx:48-57) fits
    in the frame budget. Semantics are identical to `resolve_sorted`
    (tested): per-slot winner = the aggregate with the highest sample
    count; 64-bit key match accumulates, slot collision evicts by count.
    """
    c = state.key_lo.shape[0]
    cmask = _U32(c - 1)

    nk_lo = jnp.where(new_valid, new_keys.lo, EMPTY_KEY)
    nk_hi = jnp.where(new_valid, new_keys.hi, EMPTY_KEY)

    # --- 1. aggregate the new records by 64-bit key (P-sized sort)
    sk_lo, sk_hi, agg_live, agg_cnt, (a_sx, a_sy, a_sz) = _aggregate_records(
        nk_lo, nk_hi, new_radiance, new_valid, cmask)
    agg_slot = jnp.where(agg_live, (sk_lo & cmask).astype(jnp.int32), c)

    # --- 2. one winner per slot: sort aggregates by (slot, -count); the
    # stable sort breaks count ties in key order, matching resolve_sorted
    (w_slot, _, w_lo, w_hi, w_sx, w_sy, w_sz, w_cnt) = lax.sort(
        (agg_slot, -agg_cnt, sk_lo, sk_hi, a_sx, a_sy, a_sz, agg_cnt),
        dimension=0, num_keys=2)
    win = (jnp.concatenate([jnp.ones((1,), bool),
                            w_slot[1:] != w_slot[:-1]])
           & (w_slot < c) & (w_cnt > 0))
    # losers scatter out of bounds and are dropped
    idx = jnp.where(win, w_slot, c)

    # --- 3. age + evict existing entries (C-sized, elementwise only)
    stale = state.stale + 1.0
    keep = ((state.key_lo != EMPTY_KEY) & (state.count > 0)
            & (stale <= settings.max_stale_frames))
    aged_lo = jnp.where(keep, state.key_lo, EMPTY_KEY)
    aged_hi = jnp.where(keep, state.key_hi, EMPTY_KEY)
    aged_cnt = state.count * keep
    aged_sum = state.radiance * aged_cnt[:, None]
    aged_stl = jnp.where(keep, stale, 0.0)

    # --- 4. combine winners with their table rows in P-space through a
    # PACKED (C, 8) u32 row table: TPU gathers/scatters pay per ROW, so
    # the previous SoA round-trip (7 gathers + 5 scatters at P rows each)
    # cost 24.9% of the flagship frame (round-5 breakdown: the
    # sharc_resolve scatter fusions alone were 11 ms/frame). One row
    # gather + one row scatter move the same bytes in contiguous 32-byte
    # rows. f32 values ride as BITCAST u32 so no NaN canonicalization can
    # touch key bit patterns.
    def f32b(x):
        return lax.bitcast_convert_type(x.astype(jnp.float32), _U32)

    def bf(x):
        return lax.bitcast_convert_type(x, jnp.float32)

    aged8 = jnp.stack([
        aged_lo, aged_hi,
        f32b(aged_sum[:, 0]), f32b(aged_sum[:, 1]), f32b(aged_sum[:, 2]),
        f32b(aged_cnt), f32b(aged_stl), jnp.zeros((c,), _U32)], axis=-1)

    gi = jnp.minimum(w_slot, c - 1)
    grow = aged8[gi]                                 # (P, 8) one row gather
    g_lo, g_hi = grow[:, 0], grow[:, 1]
    g_sx, g_sy, g_sz = bf(grow[:, 2]), bf(grow[:, 3]), bf(grow[:, 4])
    g_cnt, g_stl = bf(grow[:, 5]), bf(grow[:, 6])
    g_live = (g_lo != EMPTY_KEY) & (g_cnt > 0)
    match = g_live & (g_lo == w_lo) & (g_hi == w_hi)
    # eviction on a slot collision: the busier voxel wins (count-capped
    # history vs this frame's sample count — hysteresis favors established
    # entries, but a hot new voxel still displaces a cold one)
    adopt = ~g_live | (~match & (w_cnt > g_cnt))

    n_lo = jnp.where(adopt, w_lo, g_lo)
    n_hi = jnp.where(adopt, w_hi, g_hi)
    n_sx = jnp.where(adopt, w_sx, g_sx + jnp.where(match, w_sx, 0.0))
    n_sy = jnp.where(adopt, w_sy, g_sy + jnp.where(match, w_sy, 0.0))
    n_sz = jnp.where(adopt, w_sz, g_sz + jnp.where(match, w_sz, 0.0))
    n_cnt = jnp.where(adopt, w_cnt, g_cnt + jnp.where(match, w_cnt, 0.0))
    n_stl = jnp.where(adopt | match, 0.0, g_stl)

    nrow = jnp.stack([n_lo, n_hi, f32b(n_sx), f32b(n_sy), f32b(n_sz),
                      f32b(n_cnt), f32b(n_stl),
                      jnp.zeros_like(n_lo)], axis=-1)     # (P, 8)
    out8 = aged8.at[idx].set(nrow, mode="drop", unique_indices=True,
                             indices_are_sorted=True)     # ONE row scatter
    f_lo, f_hi = out8[:, 0], out8[:, 1]
    f_sum = bf(out8[:, 2:5])
    f_cnt, f_stl = bf(out8[:, 5]), bf(out8[:, 6])

    mean = f_sum / jnp.maximum(f_cnt, 1e-8)[:, None]
    live = (f_lo != EMPTY_KEY) & (f_cnt > 0)
    mean = jnp.where(live[:, None], mean, 0.0)
    f_cnt = jnp.minimum(f_cnt, settings.accumulation_frames) * live

    return SHARCState(
        key_lo=jnp.where(live, f_lo, EMPTY_KEY),
        key_hi=jnp.where(live, f_hi, EMPTY_KEY),
        radiance=mean,
        count=f_cnt,
        stale=f_stl * live,
        qdata=_pack_qdata(f_lo, f_hi, mean, live),
    )


def resolve_sorted(state: SHARCState, new_keys: VoxelKey,
                   new_radiance: Vec3, new_valid: jnp.ndarray,
                   settings: SHARCSettings) -> SHARCState:
    """Round-3 sort-only resolve kept for A/B: two (C+P)-row multi-operand
    sorts; the SHARC.hlsl resolve/compaction pair in TPU form."""
    c = state.key_lo.shape[0]
    cmask = _U32(c - 1)

    nk_lo = jnp.where(new_valid, new_keys.lo, EMPTY_KEY)
    nk_hi = jnp.where(new_valid, new_keys.hi, EMPTY_KEY)

    # --- 1. aggregate the new records by 64-bit key: multi-operand sort
    # (measured ~25x cheaper than argsort + per-array gathers on v5e)
    sk_lo, sk_hi, srx, sry, srz, sv = lax.sort(
        (nk_lo, nk_hi, new_radiance.x, new_radiance.y, new_radiance.z,
         new_valid.astype(jnp.float32)), dimension=0, num_keys=2)
    srx = srx * sv
    sry = sry * sv
    srz = srz * sv
    same_key = lambda a_lo, a_hi, b_lo, b_hi: (a_lo == b_lo) & (a_hi == b_hi)
    first = jnp.concatenate(
        [jnp.ones((1,), bool),
         ~same_key(sk_lo[1:], sk_hi[1:], sk_lo[:-1], sk_hi[:-1])])
    p = sk_lo.shape[0]

    # scatter-free, EXACT segment totals: Hillis-Steele segmented suffix
    # sums over the sorted runs — ceil(log2(n)) doubling steps of
    # shift+compare+add, all elementwise (TPU scatters serialize; a
    # cumsum-difference form would catastrophically cancel on f32 over
    # ~1M records). After the steps, every row holds the sum of its
    # segment from itself to the segment end; FIRST rows hold the total.
    def seg_suffix_sums(vals):
        d = 1
        vals = list(vals)
        while d < p:
            same = jnp.concatenate(
                [same_key(sk_lo[d:], sk_hi[d:], sk_lo[:-d], sk_hi[:-d]),
                 jnp.zeros((d,), bool)])
            for i, v in enumerate(vals):
                shifted = jnp.concatenate([v[d:], jnp.zeros((d,), v.dtype)])
                vals[i] = v + jnp.where(same, shifted, 0)
            d *= 2
        return vals

    t_cnt, t_r0, t_r1, t_r2 = seg_suffix_sums([sv, srx, sry, srz])
    agg_live = first & (sk_lo != EMPTY_KEY) & (t_cnt > 0)
    agg_cnt = jnp.where(agg_live, t_cnt, 0.0)
    agg_slot = jnp.where(agg_live, (sk_lo & cmask).astype(jnp.int32), c)

    # --- 2. age + evict existing entries (SHARC MaxStaleFrames), then
    # sort table rows and aggregates together by (slot, is_new, -count):
    # every slot 0..C-1 appears exactly once as a table row (possibly
    # EMPTY), so each slot's run is [table, best aggregate, rest...]
    stale = state.stale + 1.0
    keep = ((state.key_lo != EMPTY_KEY) & (state.count > 0)
            & (stale <= settings.max_stale_frames))
    tbl_lo = jnp.where(keep, state.key_lo, EMPTY_KEY)
    tbl_hi = jnp.where(keep, state.key_hi, EMPTY_KEY)
    tbl_cnt = state.count * keep
    tbl_sum = state.radiance * tbl_cnt[:, None]
    tbl_stale = jnp.where(keep, stale, 0.0)

    slot_k = jnp.concatenate([jnp.arange(c, dtype=jnp.int32), agg_slot])
    isnew_k = jnp.concatenate([jnp.zeros((c,), jnp.int32),
                               jnp.ones((p,), jnp.int32)])
    negcnt_k = jnp.concatenate([jnp.zeros((c,)), -agg_cnt])
    m_lo = jnp.concatenate([tbl_lo, sk_lo])
    m_hi = jnp.concatenate([tbl_hi, sk_hi])
    m_sx = jnp.concatenate([tbl_sum[:, 0], jnp.where(agg_live, t_r0, 0.0)])
    m_sy = jnp.concatenate([tbl_sum[:, 1], jnp.where(agg_live, t_r1, 0.0)])
    m_sz = jnp.concatenate([tbl_sum[:, 2], jnp.where(agg_live, t_r2, 0.0)])
    m_cnt = jnp.concatenate([tbl_cnt, agg_cnt])
    m_stl = jnp.concatenate([tbl_stale, jnp.zeros((p,))])

    (s_slot, s_new, _, s_lo, s_hi, s_sx, s_sy, s_sz, s_cnt,
     s_stl) = lax.sort(
        (slot_k, isnew_k, negcnt_k, m_lo, m_hi, m_sx, m_sy, m_sz, m_cnt,
         m_stl), dimension=0, num_keys=3)

    # --- 3. combine each table row (is_new == 0) with the aggregate that
    # follows it (same slot, is_new == 1). Lesser aggregates for the slot
    # and all aggregate rows die; survivors keep slot order.
    n = c + p
    nxt = lambda v, fill: jnp.concatenate([v[1:], jnp.full((1,), fill,
                                                           v.dtype)])
    a_is = (nxt(s_slot, c) == s_slot) & (nxt(s_new, 1) == 1) & (s_new == 0)
    a_lo, a_hi = nxt(s_lo, EMPTY_KEY), nxt(s_hi, EMPTY_KEY)
    a_sx, a_sy, a_sz = nxt(s_sx, 0.0), nxt(s_sy, 0.0), nxt(s_sz, 0.0)
    a_cnt = nxt(s_cnt, 0.0)

    t_live = (s_lo != EMPTY_KEY) & (s_new == 0)
    has_a = a_is & (a_cnt > 0)
    match = has_a & t_live & (a_lo == s_lo) & (a_hi == s_hi)
    # eviction on a slot collision: the busier voxel wins (count-capped
    # history vs this frame's sample count — hysteresis favors established
    # entries, but a hot new voxel still displaces a cold one)
    adopt = has_a & (~t_live | (~match & (a_cnt > s_cnt)))

    r_lo = jnp.where(adopt, a_lo, s_lo)
    r_hi = jnp.where(adopt, a_hi, s_hi)
    r_sx = jnp.where(adopt, a_sx, s_sx + jnp.where(match, a_sx, 0.0))
    r_sy = jnp.where(adopt, a_sy, s_sy + jnp.where(match, a_sy, 0.0))
    r_sz = jnp.where(adopt, a_sz, s_sz + jnp.where(match, a_sz, 0.0))
    r_cnt = jnp.where(adopt, a_cnt, s_cnt + jnp.where(match, a_cnt, 0.0))
    r_stl = jnp.where(adopt | match, 0.0, s_stl)
    dead = s_new == 1
    r_slot = jnp.where(dead, c, s_slot)

    # --- 4. compact: dead rows sort to the end; the surviving C rows are
    # exactly slots 0..C-1 in order (each slot survives exactly once)
    (f_slot, f_lo, f_hi, f_sx, f_sy, f_sz, f_cnt, f_stl) = lax.sort(
        (r_slot, r_lo, r_hi, r_sx, r_sy, r_sz, r_cnt, r_stl),
        dimension=0, num_keys=1)
    f_lo, f_hi = f_lo[:c], f_hi[:c]
    f_cnt = f_cnt[:c]
    f_stl = f_stl[:c]
    mean = (jnp.stack([f_sx[:c], f_sy[:c], f_sz[:c]], axis=-1)
            / jnp.maximum(f_cnt, 1e-8)[:, None])
    live = (f_lo != EMPTY_KEY) & (f_cnt > 0)
    mean = jnp.where(live[:, None], mean, 0.0)
    # accumulation cap: EMA with max effective count (SHARC
    # AccumulationFrames — old samples decay once the cap is reached)
    f_cnt = jnp.minimum(f_cnt, settings.accumulation_frames) * live

    return SHARCState(
        key_lo=jnp.where(live, f_lo, EMPTY_KEY),
        key_hi=jnp.where(live, f_hi, EMPTY_KEY),
        radiance=mean,
        count=f_cnt,
        stale=f_stl * live,
        qdata=_pack_qdata(f_lo, f_hi, mean, live),
    )


def query(state: SHARCState, keys: VoxelKey):
    """Vectorized lookup: (radiance: Vec3, found mask). ONE 16-byte row
    gather of the packed direct map + a 64-bit key compare."""
    c = state.qdata.shape[0]
    slot = (keys.lo & _U32(c - 1)).astype(jnp.int32)
    rows = state.qdata[slot]                       # (R, 4) one row gather
    found = ((rows[:, 0] == keys.lo) & (rows[:, 1] == keys.hi)
             & (keys.lo != EMPTY_KEY))
    rad = Vec3(_f16_unbits(rows[:, 2] & _U32(0xFFFF)),
               _f16_unbits(rows[:, 2] >> _U32(16)),
               _f16_unbits(rows[:, 3]))
    return vec.where(found, rad, Vec3.splat(jnp.zeros_like(rad.x))), found


def footprint_valid(hit_t, roughness_accum, position: Vec3, camera_pos,
                    settings: SHARCSettings):
    """The SHARC_QUERY validity heuristic (Raytracing.hlsl:265-274): only
    terminate into the cache once the ray's blur footprint exceeds the voxel
    size — keeps the cache invisible in sharp reflections."""
    lvl = grid_level(position, camera_pos, settings)
    size = voxel_size(lvl, settings)
    far_enough = hit_t > size * jnp.sqrt(3.0)
    a = jnp.minimum(roughness_accum, 0.99) ** 2
    footprint = hit_t * jnp.sqrt(
        0.5 * a * a / jnp.maximum(1.0 - a * a, 1e-6))
    return far_enough & (footprint > size)
