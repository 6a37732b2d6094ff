"""SHARC-style hash-grid radiance cache, reformulated sort-free-of-atomics.

Capability mirror of the reference's RTXGI SHARC integration
(reference: Source/SHARC.ixx:23-102 — 2^22-entry u64 hash grid with
resolve/compaction passes, AccumulationFrames=10, MaxStaleFrames=64;
Shaders/Raytracing.hlsl:175-316 — SHARC_UPDATE pass at 1/4 res writing path
radiance into voxels + SHARC_QUERY pass terminating paths into cached
radiance when the voxel footprint test passes; camera-centered logarithmic
voxel levels via HashGridGetLevel).

TPU re-design (SURVEY.md §7 step 9): the GPU's atomic CAS probing becomes
**key sort + segment reduce**:

  * update: the downscaled update trace records (voxel key, incident
    radiance) per path vertex; suffix accumulation over the bounce axis
    converts per-vertex throughput/emission records into per-vertex
    *incident radiance* estimates, exactly what SharcUpdateHit accumulates;
  * resolve: new records are sorted by key and segment-summed, then merged
    with the persistent sorted table under an exponential-moving-average
    with sample-count cap (the reference's accumulation-frames logic) and
    stale-entry eviction;
  * query: a DIRECT-MAPPED hash view built during resolve — one key
    gather + compare + one radiance gather per lookup. (The earlier
    `searchsorted` form cost ~20 dependent gathers per 2M-lane query —
    profiled as the single largest slice of the App frame; a lossy
    direct map only costs occasional cache misses, which are unbiased:
    the path tracer just keeps tracing.)

The table is double-buffered per frame exactly like the reference's
voxel-buffer swap (Raytracing.ixx:147).
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


class SHARCState(NamedTuple):
    """Persistent sorted voxel table (double-buffered by the frame loop)
    plus the direct-mapped query view rebuilt by every resolve."""
    keys: jnp.ndarray      # (C,) u32 sorted, EMPTY_KEY padding at the end
    radiance: jnp.ndarray  # (C, 3) accumulated mean radiance
    count: jnp.ndarray     # (C,) accumulated sample count
    stale: jnp.ndarray     # (C,) frames since last touch
    qdata: jnp.ndarray     # (C, 4) direct map (slot = key & (C-1)):
                           #   col 0 = key bits (bitcast f32), 1..3 = radiance


def init_state(settings: SHARCSettings) -> SHARCState:
    c = 1 << settings.capacity_log2
    return SHARCState(
        keys=jnp.full((c,), EMPTY_KEY, _U32),
        radiance=jnp.zeros((c, 3)),
        count=jnp.zeros((c,)),
        stale=jnp.zeros((c,)),
        qdata=jnp.concatenate(
            [lax.bitcast_convert_type(
                jnp.full((c,), EMPTY_KEY, _U32), jnp.float32)[:, None],
             jnp.zeros((c, 3))], axis=-1),
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
              settings: SHARCSettings):
    """Quantize position (+ a 3-bit normal bucket like SHARC's hash of the
    surface orientation) into a u32 key. EMPTY_KEY is reserved."""
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
    h = (ix.astype(_U32) * _U32(0x9E3779B1)
         ^ iy.astype(_U32) * _U32(0x85EBCA77)
         ^ iz.astype(_U32) * _U32(0xC2B2AE3D)
         ^ lvl.astype(_U32) * _U32(0x27D4EB2F)
         ^ (dom.astype(_U32) * 2 + sgn.astype(_U32)) * _U32(0x165667B1))
    return jnp.where(h == EMPTY_KEY, _U32(0), h)


def resolve(state: SHARCState, new_keys: jnp.ndarray, new_radiance: Vec3,
            new_valid: jnp.ndarray, settings: SHARCSettings) -> SHARCState:
    """Merge new (key, radiance) records into the table: sort + segment
    reduce (the SHARC.hlsl resolve/compaction pair, TPU form)."""
    c = state.keys.shape[0]

    nk = jnp.where(new_valid, new_keys, EMPTY_KEY)
    # aggregate the new records by key — multi-operand sort (measured
    # ~25x cheaper than argsort + per-array gathers on v5e)
    sk, srx, sry, srz, sv = lax.sort(
        (nk, new_radiance.x, new_radiance.y, new_radiance.z,
         new_valid.astype(jnp.float32)), dimension=0, num_keys=1)
    sr = jnp.stack([srx, sry, srz], axis=-1) * sv[:, None]
    # segment boundaries
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sk[1:] != sk[:-1]]
    )
    nseg = sk.shape[0]

    # scatter-free, EXACT segment totals: Hillis-Steele segmented
    # suffix sums over the sorted runs — ceil(log2(n)) doubling steps of
    # shift+compare+add, all elementwise (TPU scatters serialize; a
    # cumsum-difference form would catastrophically cancel on f32 over
    # ~1M records). After the steps, every row holds the sum of its
    # segment from itself to the segment end; FIRST rows hold the total.
    def seg_suffix_sums(vals):
        n = sk.shape[0]
        keys = sk
        d = 1
        vals = list(vals)
        while d < n:
            same = jnp.concatenate(
                [keys[d:] == keys[:-d], jnp.zeros((d,), bool)])
            for i, v in enumerate(vals):
                shifted = jnp.concatenate([v[d:], jnp.zeros((d,), v.dtype)])
                vals[i] = v + jnp.where(same, shifted, 0)
            d *= 2
        return vals

    t_cnt, t_r0, t_r1, t_r2 = seg_suffix_sums(
        [sv, sr[:, 0], sr[:, 1], sr[:, 2]])
    agg_cnt = jnp.where(first, t_cnt, 0.0)
    agg_rad = jnp.where(first[:, None],
                        jnp.stack([t_r0, t_r1, t_r2], axis=-1), 0.0)
    agg_key = jnp.where(first, sk, EMPTY_KEY)

    # age existing entries; evict stale (SHARC MaxStaleFrames)
    stale = state.stale + 1.0
    keep = (state.keys != EMPTY_KEY) & (stale <= settings.max_stale_frames)
    old_keys = jnp.where(keep, state.keys, EMPTY_KEY)

    # merge: concat old + new aggregates, sort, then combine runs (an old
    # entry and a new aggregate with the same key land adjacent)
    all_keys = jnp.concatenate([old_keys, agg_key])
    all_rad = jnp.concatenate([state.radiance * state.count[:, None], agg_rad])
    all_cnt = jnp.concatenate([state.count * keep, agg_cnt])
    all_stale = jnp.concatenate([stale, jnp.zeros((nseg,))])
    all_new = jnp.concatenate(
        [jnp.zeros((c,)), (agg_cnt > 0).astype(jnp.float32)]
    )

    k2, r2x, r2y, r2z, n2, s2, fresh2 = lax.sort(
        (all_keys, all_rad[:, 0], all_rad[:, 1], all_rad[:, 2],
         all_cnt, all_stale, all_new), dimension=0, num_keys=1)
    r2 = jnp.stack([r2x, r2y, r2z], axis=-1)

    first2 = jnp.concatenate([jnp.ones((1,), bool), k2[1:] != k2[:-1]])
    # each key appears AT MOST TWICE here (one old entry + one new
    # aggregate), so the segment combine is a pairwise shift — no
    # scatters, no scans
    nxt_same = jnp.concatenate([k2[1:] == k2[:-1], jnp.zeros((1,), bool)])

    def plus_next(v):
        nv = jnp.concatenate([v[1:], jnp.zeros_like(v[:1])])
        return v + jnp.where(nxt_same, nv, jnp.zeros_like(nv))

    cnt = plus_next(n2)
    rad_sum = jnp.stack([plus_next(r2[:, 0]), plus_next(r2[:, 1]),
                         plus_next(r2[:, 2])], axis=-1)
    s2p = jnp.where(fresh2 > 0, 0.0, s2)
    s2p_nxt = jnp.concatenate([s2p[1:], jnp.full((1,), jnp.inf)])
    stale_out = jnp.minimum(s2p, jnp.where(nxt_same, s2p_nxt, jnp.inf))

    # accumulation cap: EMA with max effective count (SHARC
    # AccumulationFrames — old samples decay once the cap is reached)
    capped = jnp.minimum(cnt, settings.accumulation_frames)
    mean_rad = rad_sum / jnp.maximum(cnt, 1e-8)[:, None]
    valid_row = first2 & (k2 != EMPTY_KEY)

    # keep the first `c` rows after pushing EMPTY keys to the end (sorting
    # by key already did that; truncate)
    keys_out = jnp.where(valid_row, k2, EMPTY_KEY)[:c]
    rad_out = jnp.where(valid_row[:, None], mean_rad, 0.0)[:c]
    cnt_out = jnp.where(valid_row, capped, 0.0)[:c]

    # direct-mapped query view: slot = key & (C-1); colliding keys keep an
    # arbitrary winner (a lossy CACHE view — misses are unbiased). Key
    # bits and radiance pack into ONE (C, 4) array so a query costs a
    # single row gather.
    live = (keys_out != EMPTY_KEY) & (cnt_out > 0.0)
    slot = jnp.where(live, (keys_out & _U32(c - 1)).astype(jnp.int32), c)
    empty_bits = lax.bitcast_convert_type(
        jnp.full((c,), EMPTY_KEY, _U32), jnp.float32)
    rows = jnp.concatenate(
        [lax.bitcast_convert_type(keys_out, jnp.float32)[:, None], rad_out],
        axis=-1)
    qdata = jnp.concatenate(
        [empty_bits[:, None], jnp.zeros((c, 3))], axis=-1
    ).at[slot].set(rows, mode="drop")

    return SHARCState(
        keys=keys_out,
        radiance=rad_out,
        count=cnt_out,
        stale=jnp.where(valid_row, stale_out, 0.0)[:c],
        qdata=qdata,
    )


def query(state: SHARCState, keys: jnp.ndarray):
    """Vectorized lookup: (radiance: Vec3, found mask). ONE row gather of
    the packed direct-mapped view + a key compare (the searchsorted form
    cost ~20 dependent gathers per query)."""
    c = state.qdata.shape[0]
    slot = (keys & _U32(c - 1)).astype(jnp.int32)
    rows = state.qdata[slot]                       # (R, 4) one row gather
    stored = lax.bitcast_convert_type(rows[:, 0], _U32)
    found = (stored == keys) & (keys != EMPTY_KEY)
    rad = Vec3(rows[:, 1], rows[:, 2], rows[:, 3])
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
