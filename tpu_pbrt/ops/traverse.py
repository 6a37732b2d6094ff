"""Stackless BVH traversal over a ray pool (pure JAX, jit-safe).

This is the TPU replacement for hardware `RayQuery` traversal
(reference: Shaders/RaytracingHelpers.hlsli:7-133 `TraceRay`/`CastRay`).
Design: every ray carries exactly one i32 of traversal state (the current
node) thanks to precomputed escape links — the whole pool advances in
lock-step inside a `lax.while_loop`, with masked lanes idling at -1. Per
step each active lane does two node gathers (AABB), one triangle gather,
one slab test, and one Möller–Trumbore test. No divergence, no stacks, no
dynamic shapes.

The reference's SER thread-reordering (RaytracingHelpers.hlsli:47-54) maps
to pool-level ray sorting *between* bounces (see passes/pathtrace.py), not
to anything inside this loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from . import intersect
from . import math as pmath
from . import vec
from .bvh import BVH
from .vec import Vec3

INF = jnp.float32(jnp.inf)


class Hit(NamedTuple):
    t: jnp.ndarray        # (R,) f32, +inf on miss
    u: jnp.ndarray        # (R,) f32 barycentric
    v: jnp.ndarray        # (R,) f32 barycentric
    tri: jnp.ndarray      # (R,) i32 original triangle index, -1 on miss

    @property
    def mask(self):
        return self.tri >= 0


def closest_hit(bvh: BVH, origin: Vec3, direction: Vec3,
                t_min, t_max) -> Hit:
    """Closest-hit query for a pool of R rays. t_min/t_max broadcast to (R,)."""
    r = origin.shape[0]
    n = bvh.num_tris
    leaf_base = n - 1 if n > 1 else 0

    inv_d = intersect.safe_inv_dir_soa(direction)
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))

    state0 = (
        jnp.zeros((r,), jnp.int32),            # current node
        t_max,                                  # best t (doubles as ray t_max)
        jnp.zeros((r,), jnp.float32),           # best u
        jnp.zeros((r,), jnp.float32),           # best v
        jnp.full((r,), -1, jnp.int32),          # best sorted-tri index
    )

    def cond(state):
        cur = state[0]
        return jnp.any(cur >= 0)

    def body(state):
        cur, best_t, best_u, best_v, best_i = state
        active = cur >= 0
        node = jnp.maximum(cur, 0)

        bmin = vec.gather(bvh.node_min, node)
        bmax = vec.gather(bvh.node_max, node)
        box_hit = intersect.ray_aabb_soa(origin, inv_d, bmin, bmax, t_min, best_t)
        box_hit = box_hit & active

        is_leaf = node >= leaf_base
        tri_i = jnp.clip(node - leaf_base, 0, n - 1)
        t, u, v, tri_hit = intersect.ray_triangle_soa(
            origin, direction,
            vec.gather(bvh.tri_v0, tri_i),
            vec.gather(bvh.tri_e1, tri_i),
            vec.gather(bvh.tri_e2, tri_i),
            t_min, best_t,
        )
        take = box_hit & is_leaf & tri_hit
        best_t = jnp.where(take, t, best_t)
        best_u = jnp.where(take, u, best_u)
        best_v = jnp.where(take, v, best_v)
        best_i = jnp.where(take, tri_i, best_i)

        descend = box_hit & ~is_leaf
        nxt = jnp.where(descend, bvh.left[node], bvh.miss[node])
        cur = jnp.where(active, nxt, cur)
        return cur, best_t, best_u, best_v, best_i

    _, best_t, best_u, best_v, best_i = lax.while_loop(cond, body, state0)
    tri = jnp.where(best_i >= 0, bvh.tri_id[jnp.maximum(best_i, 0)], -1)
    return Hit(jnp.where(best_i >= 0, best_t, INF), best_u, best_v, tri)


def any_hit(bvh: BVH, origin: Vec3, direction: Vec3,
            t_min, t_max) -> jnp.ndarray:
    """Occlusion query: True where *any* triangle blocks [t_min, t_max].
    Lanes stop traversing as soon as they find an occluder (conservative
    visibility, like the reference's shadow rays,
    Shaders/RTXDIAppBridge.hlsli:412-427)."""
    r = origin.shape[0]
    n = bvh.num_tris
    leaf_base = n - 1 if n > 1 else 0

    inv_d = intersect.safe_inv_dir_soa(direction)
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))

    state0 = (jnp.zeros((r,), jnp.int32), jnp.zeros((r,), bool))

    def cond(state):
        cur, _ = state
        return jnp.any(cur >= 0)

    def body(state):
        cur, occluded = state
        active = cur >= 0
        node = jnp.maximum(cur, 0)
        box_hit = intersect.ray_aabb_soa(
            origin, inv_d,
            vec.gather(bvh.node_min, node),
            vec.gather(bvh.node_max, node),
            t_min, t_max,
        ) & active

        is_leaf = node >= leaf_base
        tri_i = jnp.clip(node - leaf_base, 0, n - 1)
        _, _, _, tri_hit = intersect.ray_triangle_soa(
            origin, direction,
            vec.gather(bvh.tri_v0, tri_i),
            vec.gather(bvh.tri_e1, tri_i),
            vec.gather(bvh.tri_e2, tri_i),
            t_min, t_max,
        )
        found = box_hit & is_leaf & tri_hit
        occluded = occluded | found

        descend = box_hit & ~is_leaf
        nxt = jnp.where(descend, bvh.left[node], bvh.miss[node])
        nxt = jnp.where(occluded, -1, nxt)  # early out
        cur = jnp.where(active, nxt, cur)
        return cur, occluded

    _, occluded = lax.while_loop(cond, body, state0)
    return occluded


def brute_force_closest_hit(v0, v1, v2, origin, direction, t_min, t_max) -> Hit:
    """O(N*R) ground truth for BVH correctness tests (SURVEY.md §4.3)."""
    e1 = v1 - v0
    e2 = v2 - v0

    def per_ray(o, d, tmin, tmax):
        t, u, v, hit = intersect.ray_triangle(
            o[None, :], d[None, :], v0, e1, e2, tmin, tmax
        )
        i = jnp.argmin(t)
        has = hit[i]
        return (
            jnp.where(has, t[i], INF), u[i], v[i],
            jnp.where(has, i, -1).astype(jnp.int32),
        )

    import jax
    t, u, v, tri = jax.vmap(per_ray)(
        origin, direction,
        jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (origin.shape[0],)),
        jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (origin.shape[0],)),
    )
    return Hit(t, u, v, tri)
