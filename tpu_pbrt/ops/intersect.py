"""Ray-primitive intersection (Möller–Trumbore, AABB slab test).

This replaces the DXR hardware `RayQuery` primitive tests
(reference: Shaders/RaytracingHelpers.hlsli:7-57 — inline raytracing with
alpha-test emulation). Everything is batched SoA over a ray pool.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import math as pmath

INF = jnp.float32(jnp.inf)


def ray_triangle(o, d, v0, e1, e2, t_min, t_max):
    """Möller–Trumbore, no backface culling (the reference traces both sides
    and resolves front/back by the geometric normal, Shaders/HitInfo.hlsli:46).

    o, d:      (..., 3) ray origin/direction
    v0, e1, e2:(..., 3) triangle base vertex and edges (v1-v0, v2-v0)
    Returns (t, u, v, hit) with t=+inf where no hit.
    """
    pvec = pmath.cross(d, e2)
    det = pmath.dot(e1, pvec)
    # Parallel rays: |det| ~ 0.
    valid = jnp.abs(det) > 1e-12
    inv_det = 1.0 / jnp.where(valid, det, 1.0)
    tvec = o - v0
    u = pmath.dot(tvec, pvec) * inv_det
    qvec = pmath.cross(tvec, e1)
    v = pmath.dot(d, qvec) * inv_det
    t = pmath.dot(e2, qvec) * inv_det
    eps = 0.0
    hit = (
        valid
        & (u >= -eps)
        & (v >= -eps)
        & (u + v <= 1.0 + eps)
        & (t > t_min)
        & (t < t_max)
    )
    return jnp.where(hit, t, INF), u, v, hit


def ray_aabb(o, inv_d, bmin, bmax, t_min, t_max):
    """Slab test. inv_d = 1/d with ±inf for zero components (IEEE rules make
    the test correct thanks to the min/max ordering below).

    Returns a hit mask: does [t_min, t_max] overlap the box interval.
    """
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tsmall = jnp.minimum(t0, t1)
    tbig = jnp.maximum(t0, t1)
    t_near = jnp.maximum(jnp.max(tsmall, axis=-1), t_min)
    t_far = jnp.minimum(jnp.min(tbig, axis=-1), t_max)
    return t_near <= t_far


def safe_inv_dir(d: jnp.ndarray) -> jnp.ndarray:
    """1/d that avoids NaNs from -0.0 components (gives ±inf)."""
    return jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -INF, INF), 1.0 / d)


# ---------------------------------------------------------------------------
# SoA (Vec3) forms — full-lane-occupancy versions used by the hot path
# ---------------------------------------------------------------------------

from .vec import Vec3  # noqa: E402
from . import vec as _vec  # noqa: E402


def ray_triangle_soa(o: Vec3, d: Vec3, v0: Vec3, e1: Vec3, e2: Vec3,
                     t_min, t_max):
    """Möller–Trumbore on Vec3 lanes; returns (t, u, v, hit)."""
    pvec = _vec.cross(d, e2)
    det = _vec.dot(e1, pvec)
    valid = jnp.abs(det) > 1e-12
    inv_det = 1.0 / jnp.where(valid, det, 1.0)
    tvec = o - v0
    u = _vec.dot(tvec, pvec) * inv_det
    qvec = _vec.cross(tvec, e1)
    v = _vec.dot(d, qvec) * inv_det
    t = _vec.dot(e2, qvec) * inv_det
    hit = (
        valid & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > t_min) & (t < t_max)
    )
    return jnp.where(hit, t, INF), u, v, hit


def ray_aabb_soa(o: Vec3, inv_d: Vec3, bmin: Vec3, bmax: Vec3, t_min, t_max):
    """Slab test on Vec3 lanes; returns overlap mask."""
    tx0 = (bmin.x - o.x) * inv_d.x
    tx1 = (bmax.x - o.x) * inv_d.x
    ty0 = (bmin.y - o.y) * inv_d.y
    ty1 = (bmax.y - o.y) * inv_d.y
    tz0 = (bmin.z - o.z) * inv_d.z
    tz1 = (bmax.z - o.z) * inv_d.z
    t_near = jnp.maximum(
        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
        jnp.maximum(jnp.minimum(tz0, tz1), t_min),
    )
    t_far = jnp.minimum(
        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
        jnp.minimum(jnp.maximum(tz0, tz1), t_max),
    )
    return t_near <= t_far


def safe_inv_dir_soa(d: Vec3) -> Vec3:
    def inv(c):
        return jnp.where(jnp.abs(c) < 1e-20, jnp.where(c < 0, -INF, INF), 1.0 / c)
    return Vec3(inv(d.x), inv(d.y), inv(d.z))
