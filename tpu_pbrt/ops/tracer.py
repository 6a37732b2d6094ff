"""Tracer: the acceleration-structure dispatch layer.

The TPU replacement for the DXR acceleration-structure opaque handle
(reference: Source/RaytracingHelpers.ixx:28-105 + `RaytracingAccelerationStructure
g_scene`, Shaders/Raytracing.hlsl:19): one object that answers closest-hit
and any-hit queries, hiding which backend serves the scene:

  * 'dense' — blocked all-triangles sweep (ops/traverse_dense.py): the
    fastest form on TPU up to a few thousand triangles (no gathers at all)
  * 'bvh'   — skip-link LBVH walk (ops/traverse.py): O(log) work per ray,
    used on CPU and as the big-scene fallback until the Pallas kernel lands

The kind is static under `jit` (pytree aux data), so the frame function
specializes to one backend with zero dispatch overhead.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from . import bvh as bvh_mod
from . import shade_table as shade_mod
from . import traverse, traverse_blocked, traverse_culled, traverse_dense

DENSE_MAX_TRIS = 2048
# above the dense window, per-ray culling wins everywhere measured: the
# 25k-tri sphere runs ~15x faster culled than blocked (round 3), and the
# 5k-tri animated tube 2.2x (r4h A/B: 2.19 vs 1.01 fps incl. per-frame
# refit) — the blocked packet sweep's cond-per-tile serialization loses
# at every size tried. Blocked remains via TPU_PBRT_FORCE_TRACER=blocked.
CULLED_MIN_TRIS = DENSE_MAX_TRIS + 1


# re-intersection passes for textured alpha cutouts: up to K-1 transparent
# layers pierced per ray per bounce (the reference loops unbounded,
# Shaders/RaytracingHelpers.hlsli:17-44; a static cap keeps the trace jittable)
ALPHA_TEST_MAX_ITERS = 4


@jax.tree_util.register_pytree_node_class
class Tracer:
    """Acceleration structure + packed shade/light tables (one-row-gather
    shading, see ops/shade_table.py). `alpha_test` (static) turns on the
    textured-alpha re-intersection loop for scenes with ALPHA_MASK
    materials that carry a base-color texture."""

    def __init__(self, kind: str, accel, shade_table=None, light_table=None,
                 light_cdf=None, atlas=None, alpha_test: bool = False):
        self.kind = kind
        self.accel = accel
        self.shade_table = shade_table
        self.light_table = light_table
        self.light_cdf = light_cdf
        self.atlas = atlas
        self.alpha_test = alpha_test

    @property
    def textured(self) -> bool:
        return self.atlas is not None

    def tree_flatten(self):
        return (self.accel, self.shade_table, self.light_table,
                self.light_cdf, self.atlas), (self.kind, self.alpha_test)

    @classmethod
    def tree_unflatten(cls, aux, children):
        if isinstance(aux, tuple):
            kind, alpha_test = aux
        else:  # legacy aux format
            kind, alpha_test = aux, False
        return cls(kind, *children, alpha_test=alpha_test)

    def supports_fused_shade(self) -> bool:
        """Static: can bounces go through the fused traverse+fetch+unpack
        Pallas megakernel? (dense backend, untextured, small tables, TPU —
        see ops/trace_shade_fused.py)."""
        from . import trace_shade_fused

        return (self.kind == "dense" and not self.alpha_test
                and jax.default_backend() == "tpu"
                and trace_shade_fused.supported(
                    self.accel, self.shade_table, self.atlas))

    def closest_hit_shade(self, origin, direction, t_min, t_max):
        """Fused closest hit + shade fetch: (Hit, ShadeAttrs) from ONE
        Pallas kernel. Caller must have checked supports_fused_shade()."""
        from . import trace_shade_fused

        sub = self.shade_table[
            :, jnp.asarray(shade_mod._BOUNCE_COLS, jnp.int32)]
        return trace_shade_fused.closest_hit_shade(
            self.accel, sub, origin, direction, t_min, t_max)

    def _closest_raw(self, origin, direction, t_min, t_max) -> traverse.Hit:
        if self.kind == "dense":
            return traverse_dense.closest_hit(
                self.accel, origin, direction, t_min, t_max
            )
        if self.kind == "blocked":
            return traverse_blocked.closest_hit(
                self.accel, origin, direction, t_min, t_max
            )
        if self.kind == "culled":
            return traverse_culled.closest_hit(
                self.accel, origin, direction, t_min, t_max
            )
        return traverse.closest_hit(self.accel, origin, direction, t_min, t_max)

    def closest_hit(self, origin, direction, t_min, t_max) -> traverse.Hit:
        hit = self._closest_raw(origin, direction, t_min, t_max)
        if not self.alpha_test:
            return hit
        # alpha-cutout emulation: where the winning hit fails its alpha
        # test, advance past it and re-trace (only pierced lanes pay —
        # the others traverse an empty interval)
        for _ in range(ALPHA_TEST_MAX_ITERS - 1):
            pierced = hit.mask & shade_mod.hit_transparent(
                self.shade_table, jnp.maximum(hit.tri, 0),
                origin, direction, self.atlas)
            tmin2 = hit.t * (1.0 + 1e-4) + 1e-5
            rehit = self._closest_raw(
                origin, direction, tmin2,
                jnp.where(pierced, t_max, -jnp.inf))
            hit = traverse.Hit(
                t=jnp.where(pierced, rehit.t, hit.t),
                u=jnp.where(pierced, rehit.u, hit.u),
                v=jnp.where(pierced, rehit.v, hit.v),
                tri=jnp.where(pierced, rehit.tri, hit.tri),
            )
        return hit

    def any_hit(self, origin, direction, t_min, t_max) -> jnp.ndarray:
        if self.alpha_test:
            # exact cutout shadows: nearest OPAQUE hit within the interval
            # (the baked per-triangle opacity can't see texture alpha)
            return self.closest_hit(origin, direction, t_min, t_max).mask
        if self.kind == "dense":
            from . import trace_shade_fused

            if (trace_shade_fused.TRACE_FUSED
                    and jax.default_backend() == "tpu"
                    and self.accel.v0.shape[0]
                    <= trace_shade_fused.MAX_TRIS_PAD):
                return trace_shade_fused.any_hit(
                    self.accel, origin, direction, t_min, t_max
                )
            return traverse_dense.any_hit(
                self.accel, origin, direction, t_min, t_max
            )
        if self.kind == "blocked":
            return traverse_blocked.any_hit(
                self.accel, origin, direction, t_min, t_max
            )
        if self.kind == "culled":
            return traverse_culled.any_hit(
                self.accel, origin, direction, t_min, t_max
            )
        return traverse.any_hit(self.accel, origin, direction, t_min, t_max)


def build(v0, v1, v2, kind: str | None = None) -> Tracer:
    """Build the acceleration structure only (no shade tables — traversal
    tests / refit paths). `kind` None -> choose by triangle count."""
    if kind is None:
        kind = "dense" if v0.shape[0] <= DENSE_MAX_TRIS else "bvh"
    if kind == "dense":
        return Tracer("dense", traverse_dense.prepare(v0, v1, v2))
    return Tracer("bvh", bvh_mod.build(v0, v1, v2))


def build_for_scene(scene, kind: str | None = None, textures=None,
                    texture_srgb=None) -> Tracer:
    """Full build: acceleration structure + packed shade/light tables +
    optional texture atlas. Host-side (numpy) table construction; the
    caller device-puts or jits the accel build."""
    geometry = scene.geometry
    t = geometry.num_tris
    if kind is None:
        kind = os.environ.get("TPU_PBRT_FORCE_TRACER") or (
            "dense" if t <= DENSE_MAX_TRIS
            else "blocked" if t < CULLED_MIN_TRIS else "culled")

    table = shade_mod.build(geometry, scene.materials, scene.lights)
    table = shade_mod.pad(table)
    light_table = shade_mod.build_light_table(scene.lights)

    pos = np.asarray(geometry.positions, np.float32)
    ind = np.asarray(geometry.indices, np.int32)
    v0, v1, v2 = pos[ind[:, 0]], pos[ind[:, 1]], pos[ind[:, 2]]
    # per-triangle opacity for shadow rays (ALPHA_BLEND never occludes;
    # ALPHA_MASK occludes when its constant alpha passes the cutoff)
    mat = np.asarray(geometry.tri_material, np.int32)
    alpha_mode = np.asarray(scene.materials.alpha_mode, np.int32)[mat]
    base_a = np.asarray(scene.materials.base_color, np.float32)[mat, 3]
    cutoff = np.asarray(scene.materials.alpha_cutoff, np.float32)[mat]
    opacity = np.where(
        alpha_mode == 0, 1.0,
        np.where(alpha_mode == 2, (base_a >= cutoff).astype(np.float32),
                 base_a),
    ).astype(np.float32)
    if kind == "dense":
        accel = traverse_dense.prepare(jnp.asarray(v0), jnp.asarray(v1),
                                       jnp.asarray(v2),
                                       opacity=jnp.asarray(opacity))
    elif kind == "blocked":
        accel = traverse_blocked.prepare(v0, v1, v2, opacity)
    elif kind == "culled":
        accel = traverse_culled.prepare(v0, v1, v2, opacity)
    else:
        accel = bvh_mod.build(jnp.asarray(v0), jnp.asarray(v1),
                              jnp.asarray(v2))
    atlas = None
    if textures:
        from . import texture as tex_mod

        atlas = tex_mod.build_atlas(textures, texture_srgb)
    # textured alpha cutouts present? (constant-alpha MASK is already baked
    # into the traversal opacity above)
    tex_idx = np.asarray(scene.materials.texture_index, np.int32)[mat, 0]
    alpha_test = atlas is not None and bool(
        np.any((alpha_mode == 2) & (tex_idx >= 0)))
    return Tracer(kind, accel, jnp.asarray(table), jnp.asarray(light_table),
                  jnp.asarray(np.asarray(scene.lights.cdf, np.float32)),
                  atlas, alpha_test=alpha_test)


def refit(tracer: Tracer, v0, v1, v2) -> Tracer:
    """Refit to deformed vertices (skinned-BLAS update equivalent,
    Source/Scene.ixx:329). Preserves tables, opacity, atlas."""
    t = v0.shape[0]
    if tracer.kind == "dense":
        accel = traverse_dense.prepare(
            v0, v1, v2, opacity=tracer.accel.opacity[:t])
    elif tracer.kind == "blocked":
        accel = traverse_blocked.refit(tracer.accel, v0, v1, v2)
    elif tracer.kind == "culled":
        accel = traverse_culled.refit(tracer.accel, v0, v1, v2)
    else:
        accel = bvh_mod.refit(tracer.accel, v0, v1, v2)
    return Tracer(tracer.kind, accel, tracer.shade_table,
                  tracer.light_table, tracer.light_cdf, tracer.atlas,
                  alpha_test=tracer.alpha_test)
