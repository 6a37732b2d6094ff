"""ReGIR: world-space reservoir grid for many-light candidate sampling.

Capability mirror of the reference's RTXDI ReGIR integration
(reference: Shaders/ReGIRPresampling.hlsl:1-12 — per-frame grid build where
every cell RIS-presamples local lights; Source/RTXDI.ixx ReGIR context
setup; consumed by DIInitialSampling through
RTXDI_SampleLightsForSurface's local-light strategy).

TPU re-design — uniform camera-centered grid instead of RTXDI's onion:

  * one flat (cells * slots) lane pool; every slot runs an independent
    C-candidate streaming RIS in parallel (no thread-group cooperation —
    the whole build is a single fused elementwise pass over the pool plus
    power-CDF searchsorted draws);
  * the cell target pdf is emitted power over squared center distance
    (clamped to the cell radius so in-cell lights don't explode);
  * each slot stores (light index, W) where W = w_sum / (M * p_target) is
    the slot's unbiased inverse-source-pdf estimate — the surface-level
    RIS chains on it exactly like RTXDI's invSourcePdf
    (chained / hierarchical RIS);
  * surfaces outside the grid fall back to the global power CDF (the
    reference falls back to local-light presampling tiles the same way).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

from ..models.scene import Scene
from ..ops import rng, sampling, vec
from ..ops import shade_table as shade_mod
from ..ops.vec import Vec3

_LANE_SALT = 0x9E3779B9


@dataclasses.dataclass(frozen=True)
class ReGIRSettings:
    """Static grid shape knobs (reference defaults scaled to the flat-grid
    memory budget: RTXDI ReGIR onion ~= 64k slots)."""
    cells_per_axis: int = 16         # uniform grid, cells_per_axis^3 cells
    lights_per_cell: int = 16        # reservoir slots per cell
    build_candidates: int = 4        # RIS candidates per slot per frame
    cell_size: float = 1.0           # world units per cell

    @property
    def num_cells(self) -> int:
        return self.cells_per_axis ** 3


class ReGIRGrid(NamedTuple):
    """Per-frame presampled light grid."""
    light: jnp.ndarray   # (cells * slots,) i32 light index, -1 empty
    w: jnp.ndarray       # (cells * slots,) f32 slot RIS weight (inv pdf)
    center: jnp.ndarray  # (3,) grid center (camera position at build)
    # packed per-cell row table (cells, 2*slots): [w_0..w_{s-1},
    # light_0..light_{s-1} as f32]. One blocked row fetch per surface
    # replaces 2 per-lane pool gathers PER candidate draw (measured rule:
    # each loop-body gather costs ~25 ms per 2M lanes — with 8 local
    # samples that was 16 gathers/pixel, the app graph's 35% ReGIR cost).
    rows: jnp.ndarray | None = None


def build(scene: Scene, center, frame,
          settings: ReGIRSettings) -> ReGIRGrid:
    """Per-frame grid build (ReGIRPresampling.hlsl analogue): every slot
    RIS-selects one light from `build_candidates` power-CDF draws with a
    distance-aware target pdf."""
    s = settings
    n = s.num_cells * s.lights_per_cell
    lanes = jnp.arange(n, dtype=jnp.uint32)

    # cell centers (lane -> cell -> xyz), camera-centered
    cell = lanes // jnp.uint32(s.lights_per_cell)
    ca = jnp.uint32(s.cells_per_axis)
    cx = (cell % ca).astype(jnp.float32)
    cy = ((cell // ca) % ca).astype(jnp.float32)
    cz = (cell // (ca * ca)).astype(jnp.float32)
    half = s.cells_per_axis * 0.5
    ccenter = Vec3(
        (cx - half + 0.5) * s.cell_size + center[0],
        (cy - half + 0.5) * s.cell_size + center[1],
        (cz - half + 0.5) * s.cell_size + center[2],
    )

    # light centroids for the distance term — packed as a tiny (L, 4)
    # table so each candidate draw fetches (power, centroid) via ONE
    # one-hot dot instead of four per-lane gathers over the grid pool
    centroid = scene.lights.v0 + (scene.lights.e1 + scene.lights.e2) * (1 / 3)
    total = jnp.maximum(jnp.sum(scene.lights.power), 1e-20)
    cnp = jnp.asarray(centroid)
    ptab = jnp.stack([scene.lights.power, cnp[:, 0], cnp[:, 1],
                      cnp[:, 2]], axis=1)                      # (L, 4)
    r2_min = (0.5 * s.cell_size * 3.0 ** 0.5) ** 2  # cell bounding radius²

    light = jnp.full((n,), -1, jnp.int32)
    w_sum = jnp.zeros((n,))
    target_win = jnp.zeros((n,))

    for k in range(s.build_candidates):
        u4 = rng.uniform4(lanes, jnp.uint32(_LANE_SALT), frame, 9000 + k)
        li = sampling.draw_cdf(scene.lights.cdf, u4[0])
        li = jnp.clip(li, 0, scene.lights.power.shape[0] - 1)
        prow = shade_mod._fetch_rows(ptab, li, coherent=False)             if ptab.shape[0] > shade_mod.ONEHOT_MAX_ROWS             else shade_mod._fetch_rows(ptab, li)               # (4, n)
        power_li = prow[0]
        p_src = power_li / total
        lpos = Vec3(prow[1], prow[2], prow[3])
        d = lpos - ccenter
        dist2 = jnp.maximum(vec.dot(d, d), r2_min)
        target = power_li / dist2
        w = jnp.where(p_src > 0, target / jnp.maximum(p_src, 1e-20), 0.0)
        w_sum_new = w_sum + w
        take = (u4[1] * jnp.maximum(w_sum_new, 1e-20)) < w
        light = jnp.where(take, li, light)
        target_win = jnp.where(take, target, target_win)
        w_sum = w_sum_new

    has_lights = scene.lights.count > 0
    w_slot = jnp.where(
        has_lights & (light >= 0) & (target_win > 0),
        w_sum / jnp.maximum(s.build_candidates * target_win, 1e-20),
        0.0,
    )
    light = jnp.where(w_slot > 0, light, -1)
    rows = jnp.concatenate([
        w_slot.reshape(s.num_cells, s.lights_per_cell),
        light.astype(jnp.float32).reshape(s.num_cells, s.lights_per_cell),
    ], axis=1)                                     # (cells, 2*slots)
    return ReGIRGrid(light=light, w=w_slot,
                     center=jnp.asarray(center, jnp.float32), rows=rows)


def cell_of(grid: ReGIRGrid, settings: ReGIRSettings, position):
    """(cell index, inside-grid mask) for world positions."""
    s = settings
    half = s.cells_per_axis * 0.5
    fx = jnp.floor((position.x - grid.center[0]) / s.cell_size + half)
    fy = jnp.floor((position.y - grid.center[1]) / s.cell_size + half)
    fz = jnp.floor((position.z - grid.center[2]) / s.cell_size + half)
    inside = (
        (fx >= 0) & (fx < s.cells_per_axis)
        & (fy >= 0) & (fy < s.cells_per_axis)
        & (fz >= 0) & (fz < s.cells_per_axis)
    )
    fx = jnp.clip(fx, 0, s.cells_per_axis - 1)
    fy = jnp.clip(fy, 0, s.cells_per_axis - 1)
    fz = jnp.clip(fz, 0, s.cells_per_axis - 1)
    ca = s.cells_per_axis
    return (fx + fy * ca + fz * ca * ca).astype(jnp.int32), inside


def sample(grid: ReGIRGrid, settings: ReGIRSettings, cell, inside, u):
    """Draw one presampled light from a surface's cell: uniform slot pick.
    Returns (light index, W — the chained inverse source pdf; -1/0 where
    the cell is empty or the surface is outside the grid)."""
    s = settings
    slot = jnp.minimum(
        (u * s.lights_per_cell).astype(jnp.int32), s.lights_per_cell - 1)
    idx = cell * s.lights_per_cell + slot
    li = grid.light[idx]
    w = grid.w[idx]
    ok = inside & (li >= 0) & (w > 0)
    return jnp.where(ok, li, -1), jnp.where(ok, w, 0.0)


def fetch_cell_rows(grid: ReGIRGrid, settings: ReGIRSettings, cell):
    """ONE row fetch of each surface's cell row (2*slots cols): small
    grids go through the one-hot MXU dot, larger through the blocked
    coherent fetch (neighboring pixels share cells). Returns
    (2*slots, R) — hoist out of the candidate loop and draw all k slots
    from it with `sample_from_rows`."""
    return shade_mod._fetch_rows(grid.rows, cell)


def sample_from_rows(rows, settings: ReGIRSettings, inside, u):
    """`sample` from a prefetched (2*slots, R) cell-row block: the slot
    pick is an in-register compare/select over the row — no gathers."""
    s = settings
    slot = jnp.minimum(
        (u * s.lights_per_cell).astype(jnp.int32), s.lights_per_cell - 1)
    w = jnp.zeros_like(u)
    lf = jnp.full(u.shape, -1.0)
    for j in range(s.lights_per_cell):
        sel = slot == j
        w = jnp.where(sel, rows[j], w)
        lf = jnp.where(sel, rows[s.lights_per_cell + j], lf)
    li = lf.astype(jnp.int32)
    ok = inside & (li >= 0) & (w > 0)
    return jnp.where(ok, li, -1), jnp.where(ok, w, 0.0)
