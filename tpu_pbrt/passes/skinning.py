"""Linear-blend skinning as a GEMM — the TPU-native vertex skinning pass.

Capability mirror of the reference skinning compute shader (reference:
Shaders/SkeletalMeshSkinning.hlsl:25-62 — 4-joint LBS with weight
renormalization, normals via rotation, per-vertex motion = old − new;
Source/SkeletalMeshSkinning.ixx:42-60 dispatch). TPU re-design: instead of
per-vertex palette gathers, the blended per-vertex affine is computed as a
single MXU matmul

    M_v (V, 12) = W (V, J) @ palette (J, 12)

where W is the sparse joint-weight matrix densified to one-hot columns
(J is small — tens of joints — so the dense form is tiny and the MXU eats
it). Positions/normals/tangents then transform with elementwise math.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def build_weight_matrix(joints: np.ndarray, weights: np.ndarray,
                        num_joints: int) -> np.ndarray:
    """(V, J) dense weight matrix from 4-joint indices/weights, renormalized
    like the reference (SkeletalMeshSkinning.hlsl:37-48)."""
    v = joints.shape[0]
    w = np.asarray(weights, np.float32)
    total = w.sum(-1, keepdims=True)
    w = np.where(total > 0, w / np.maximum(total, 1e-8), 0.0)
    out = np.zeros((v, num_joints), np.float32)
    rows = np.arange(v)
    for k in range(joints.shape[1]):
        np.add.at(out, (rows, np.clip(joints[:, k], 0, num_joints - 1)),
                  w[:, k])
    return out


def skin_vertices(weight_matrix: jnp.ndarray, palette: jnp.ndarray,
                  positions: jnp.ndarray, normals: jnp.ndarray,
                  tangents: jnp.ndarray):
    """Apply LBS. weight_matrix (V, J), palette (J, 12) row-major 3x4,
    positions/normals (V, 3), tangents (V, 3 or 4).

    Returns (posed_positions, posed_normals, posed_tangents) — all (V, 3).
    Normals use the blended rotation (the reference applies the
    inverse-transpose; for rigid-dominated palettes the rotation part is a
    faithful approximation, renormalized)."""
    m = jnp.dot(weight_matrix, palette,
                preferred_element_type=jnp.float32)  # (V, 12)
    r00, r01, r02, tx = m[:, 0], m[:, 1], m[:, 2], m[:, 3]
    r10, r11, r12, ty = m[:, 4], m[:, 5], m[:, 6], m[:, 7]
    r20, r21, r22, tz = m[:, 8], m[:, 9], m[:, 10], m[:, 11]

    px, py, pz = positions[:, 0], positions[:, 1], positions[:, 2]
    posed = jnp.stack([
        r00 * px + r01 * py + r02 * pz + tx,
        r10 * px + r11 * py + r12 * pz + ty,
        r20 * px + r21 * py + r22 * pz + tz,
    ], axis=-1)

    def rotate(vec3):
        x, y, z = vec3[:, 0], vec3[:, 1], vec3[:, 2]
        out = jnp.stack([
            r00 * x + r01 * y + r02 * z,
            r10 * x + r11 * y + r12 * z,
            r20 * x + r21 * y + r22 * z,
        ], axis=-1)
        n = jnp.linalg.norm(out, axis=-1, keepdims=True)
        return out / jnp.maximum(n, 1e-12)

    return posed, rotate(normals), rotate(tangents[:, :3])
