"""LBVH: Morton-sorted linear BVH build + refit, fully on-device.

Replaces the D3D12 acceleration-structure build managed by RTXMU
(reference: Source/RaytracingHelpers.ixx:28-105, Source/Scene.ixx:286-380 —
static BLAS = FAST_TRACE, skinned BLAS = ALLOW_UPDATE refit). TPU-first
design decisions:

  * topology via Karras 2012 ("Maximally Parallel Construction of ...") —
    every internal node found independently, pure vector ops, no recursion;
  * node AABBs via a bottom-up *level sweep* (`lax.while_loop` over tree
    height with masked updates) instead of the GPU atomic-flag trick — the
    same sweep is the skinned-mesh **refit** path (fixed topology);
  * traversal is *stackless*: we precompute escape ("miss") links so the
    walk per ray is just `node = hit ? left_child : miss_link`, which keeps
    the per-lane state to one i32 — ideal for a lock-step vector machine
    (SURVEY.md §7 hard part #1);
  * triangles are pre-gathered into Morton order (v0/e1/e2 SoA) so a leaf
    visit is a single gather.

The sort itself is `jnp.argsort` (XLA's on-device sort), standing in for the
radix sort a CUDA builder would hand-roll.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

INF = jnp.float32(jnp.inf)
_U32 = jnp.uint32


class BVH(NamedTuple):
    """Flattened 2-wide BVH over one triangle soup.

    With N triangles there are N-1 internal nodes [0, N-1) and N leaves
    [N-1, 2N-1). Node 0 is the root (for N == 1 the single leaf is node 0).
    """
    node_min: jnp.ndarray   # (2N-1, 3) f32
    node_max: jnp.ndarray   # (2N-1, 3) f32
    left: jnp.ndarray       # (2N-1,) i32 — left child; -1 at leaves
    right: jnp.ndarray      # (2N-1,) i32 — right child; -1 at leaves
    miss: jnp.ndarray       # (2N-1,) i32 — escape link; -1 = done
    parent: jnp.ndarray     # (2N-1,) i32 — -1 at root (needed for refit)
    tri_v0: jnp.ndarray     # (N, 3) f32 — Morton-ordered triangle soup
    tri_e1: jnp.ndarray     # (N, 3)
    tri_e2: jnp.ndarray     # (N, 3)
    tri_id: jnp.ndarray     # (N,) i32 — original triangle index

    @property
    def num_tris(self):
        return self.tri_id.shape[0]


# ---------------------------------------------------------------------------
# Morton codes
# ---------------------------------------------------------------------------

def _expand_bits_10(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of v so they occupy every 3rd bit."""
    v = v.astype(_U32)
    v = (v * _U32(0x00010001)) & _U32(0xFF0000FF)
    v = (v * _U32(0x00000101)) & _U32(0x0F00F00F)
    v = (v * _U32(0x00000011)) & _U32(0xC30C30C3)
    v = (v * _U32(0x00000005)) & _U32(0x49249249)
    return v


def morton3d(p: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    """30-bit Morton code of points p (..., 3) within bounds [lo, hi]."""
    x = jnp.clip((p - lo) / jnp.maximum(hi - lo, 1e-12), 0.0, 1.0)
    q = jnp.minimum((x * 1024.0), 1023.0).astype(_U32)
    return (
        (_expand_bits_10(q[..., 0]) << _U32(2))
        | (_expand_bits_10(q[..., 1]) << _U32(1))
        | _expand_bits_10(q[..., 2])
    )


def _clz32(x: jnp.ndarray) -> jnp.ndarray:
    """Count leading zeros of a uint32 via bit smearing + popcount."""
    x = x.astype(_U32)
    x = x | (x >> _U32(1))
    x = x | (x >> _U32(2))
    x = x | (x >> _U32(4))
    x = x | (x >> _U32(8))
    x = x | (x >> _U32(16))
    return lax.population_count(~x).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Karras radix-tree topology
# ---------------------------------------------------------------------------

def _build_topology(codes: jnp.ndarray):
    """codes: (N,) uint32, sorted. Returns (left, right, parent) for the
    2N-1 node array layout (internal [0, N-1), leaves [N-1, 2N-1))."""
    n = codes.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)

    def delta(i, j):
        """Common-prefix length of keys i and j; -1 out of range. Equal codes
        fall back to index bits (Karras §4: concatenate the index)."""
        valid = (j >= 0) & (j < n)
        jc = jnp.clip(j, 0, n - 1)
        ci = codes[i]
        cj = codes[jc]
        x = ci ^ cj
        d = jnp.where(
            x == 0,
            32 + _clz32((i.astype(_U32) ^ jc.astype(_U32))),
            _clz32(x),
        )
        return jnp.where(valid, d, -1)

    i = idx[: max(n - 1, 0)]  # internal node ids 0..n-2

    d = jnp.sign(delta(i, i + 1) - delta(i, i - 1)).astype(jnp.int32)
    delta_min = delta(i, i - d)

    # Upper bound for the range length by doubling (<= 32+log2(n) prefix
    # bits -> 64 doublings are more than enough; use a fixed unrolled scan).
    def grow(l_max, _):
        ok = delta(i, i + l_max * 2 * d) > delta_min
        return jnp.where(ok, l_max * 2, l_max), None

    l_max = jnp.full_like(i, 2)
    # 2^32 upper bound on range: 32 iterations of doubling.
    l_max, _ = lax.scan(grow, l_max, None, length=32)

    # Binary search the exact other end j = i + l*d.
    def shrink(carry, t):
        l, step = carry
        step = jnp.maximum(step // 2, 1)
        ok = delta(i, i + (l + step) * d) > delta_min
        l = jnp.where(ok, l + step, l)
        return (l, step), None

    (l, _), _ = lax.scan(shrink, (jnp.zeros_like(i), l_max), None, length=33)
    j = i + l * d

    # Split position: highest differing bit within [min(i,j), max(i,j)].
    delta_node = delta(i, j)

    def split_step(carry, t):
        s, step = carry
        step = (step + 1) // 2  # ceil halving starting from l
        ok = delta(i, i + (s + step) * d) > delta_node
        s = jnp.where(ok & (step >= 1), s + step, s)
        return (s, step), None

    (s, _), _ = lax.scan(split_step, (jnp.zeros_like(i), l), None, length=33)
    gamma = i + s * d + jnp.minimum(d, 0)

    lo = jnp.minimum(i, j)
    hi = jnp.maximum(i, j)
    n_leaf_base = n - 1
    left = jnp.where(lo == gamma, n_leaf_base + gamma, gamma)
    right = jnp.where(hi == gamma + 1, n_leaf_base + gamma + 1, gamma + 1)

    num_nodes = 2 * n - 1
    parent = jnp.full((num_nodes,), -1, dtype=jnp.int32)
    parent = parent.at[left].set(i)
    parent = parent.at[right].set(i)

    left_full = jnp.full((num_nodes,), -1, dtype=jnp.int32)
    right_full = jnp.full((num_nodes,), -1, dtype=jnp.int32)
    left_full = left_full.at[i].set(left)
    right_full = right_full.at[i].set(right)
    return left_full, right_full, parent


def _compute_miss_links(left, right, parent):
    """Escape links: miss(v) = right(parent(v)) if v is a left child, else
    miss(parent(v)); miss(root) = -1. The recurrence is solved by pointer
    doubling in O(log height) masked sweeps.

    State per node: (miss, hop). hop < 0 means resolved (miss final);
    hop >= 0 means "my miss equals miss(hop)"."""
    num_nodes = left.shape[0]
    nodes = jnp.arange(num_nodes, dtype=jnp.int32)
    safe_parent = jnp.maximum(parent, 0)
    is_left_child = (left[safe_parent] == nodes) & (parent >= 0)
    is_right_child = (parent >= 0) & ~is_left_child

    miss = jnp.where(is_left_child, right[safe_parent], -1)
    hop = jnp.where(is_right_child, parent, -1)

    def cond(state):
        _, hop = state
        return jnp.any(hop >= 0)

    def body(state):
        miss, hop = state
        h = jnp.maximum(hop, 0)
        pending = hop >= 0
        parent_resolved = hop[h] < 0
        # adopt the ancestor's final miss, or jump to its hop (doubling)
        miss = jnp.where(pending & parent_resolved, miss[h], miss)
        hop = jnp.where(pending, jnp.where(parent_resolved, -1, hop[h]), hop)
        return miss, hop

    miss, _ = lax.while_loop(cond, body, (miss, hop))
    return miss


def _bottom_up_aabbs(left, right, parent, leaf_min, leaf_max):
    """Masked bottom-up sweep: internal AABB = union of children once both
    are ready. Also the refit path (Scene.ixx:329 ALLOW_UPDATE analogue)."""
    n = leaf_min.shape[0]
    num_nodes = 2 * n - 1
    node_min = jnp.full((num_nodes, 3), INF)
    node_max = jnp.full((num_nodes, 3), -INF)
    node_min = node_min.at[n - 1 :].set(leaf_min)
    node_max = node_max.at[n - 1 :].set(leaf_max)
    ready = jnp.concatenate(
        [jnp.zeros((n - 1,), bool), jnp.ones((n,), bool)]
    )

    internal = jnp.arange(max(n - 1, 0), dtype=jnp.int32)
    l = left[internal]
    r = right[internal]

    def cond(state):
        node_min, node_max, ready = state
        return ~ready[0] if n > 1 else jnp.asarray(False)

    def body(state):
        node_min, node_max, ready = state
        can = ready[l] & ready[r] & ~ready[:max(n - 1, 0)]
        new_min = jnp.minimum(node_min[l], node_min[r])
        new_max = jnp.maximum(node_max[l], node_max[r])
        node_min = node_min.at[internal].set(
            jnp.where(can[:, None], new_min, node_min[internal])
        )
        node_max = node_max.at[internal].set(
            jnp.where(can[:, None], new_max, node_max[internal])
        )
        ready = ready.at[internal].set(ready[internal] | can)
        return node_min, node_max, ready

    if n > 1:
        node_min, node_max, _ = lax.while_loop(
            cond, body, (node_min, node_max, ready)
        )
    return node_min, node_max


def build(v0: jnp.ndarray, v1: jnp.ndarray, v2: jnp.ndarray) -> BVH:
    """Build an LBVH over a triangle soup (N, 3) x3. jit-safe, on-device."""
    n = v0.shape[0]
    centroid = (v0 + v1 + v2) / 3.0
    lo = jnp.min(jnp.minimum(jnp.minimum(v0, v1), v2), axis=0)
    hi = jnp.max(jnp.maximum(jnp.maximum(v0, v1), v2), axis=0)
    codes = morton3d(centroid, lo, hi)

    order = jnp.argsort(codes).astype(jnp.int32)
    codes = codes[order]

    sv0, sv1, sv2 = v0[order], v1[order], v2[order]
    tri_e1 = sv1 - sv0
    tri_e2 = sv2 - sv0

    if n == 1:
        leaf_min = jnp.minimum(jnp.minimum(sv0, sv1), sv2)
        leaf_max = jnp.maximum(jnp.maximum(sv0, sv1), sv2)
        minus1 = jnp.asarray([-1], jnp.int32)
        return BVH(
            node_min=leaf_min, node_max=leaf_max,
            left=minus1, right=minus1, miss=minus1, parent=minus1,
            tri_v0=sv0, tri_e1=tri_e1, tri_e2=tri_e2, tri_id=order,
        )

    left, right, parent = _build_topology(codes)
    miss = _compute_miss_links(left, right, parent)

    leaf_min = jnp.minimum(jnp.minimum(sv0, sv1), sv2)
    leaf_max = jnp.maximum(jnp.maximum(sv0, sv1), sv2)
    node_min, node_max = _bottom_up_aabbs(left, right, parent, leaf_min, leaf_max)

    return BVH(node_min, node_max, left, right, miss, parent, sv0, tri_e1, tri_e2, order)


def refit(bvh: BVH, v0: jnp.ndarray, v1: jnp.ndarray, v2: jnp.ndarray) -> BVH:
    """Refit node AABBs to deformed vertices, keeping topology — the
    FAST_BUILD/ALLOW_UPDATE skinned path (reference: Source/Scene.ixx:329).
    v0/v1/v2 are in *original* triangle order; we re-gather by tri_id."""
    sv0, sv1, sv2 = v0[bvh.tri_id], v1[bvh.tri_id], v2[bvh.tri_id]
    n = sv0.shape[0]
    leaf_min = jnp.minimum(jnp.minimum(sv0, sv1), sv2)
    leaf_max = jnp.maximum(jnp.maximum(sv0, sv1), sv2)
    if n == 1:
        return bvh._replace(node_min=leaf_min, node_max=leaf_max,
                            tri_v0=sv0, tri_e1=sv1 - sv0, tri_e2=sv2 - sv0)
    node_min, node_max = _bottom_up_aabbs(
        bvh.left, bvh.right, bvh.parent, leaf_min, leaf_max
    )
    return bvh._replace(node_min=node_min, node_max=node_max,
                        tri_v0=sv0, tri_e1=sv1 - sv0, tri_e2=sv2 - sv0)
