"""Compressed attribute packing (oct normals, snorm16, half UVs).

Mirrors the reference's bandwidth-saving vertex layout
(reference: Source/Vertex.ixx:39-57 — snorm16 normals/tangents, fp16 UVs) and
the G-buffer's oct-encoded normals (reference:
Shaders/GBufferGeneration.hlsl:117-232 via Packing::EncodeUnitVector).
On TPU the same trick pays in HBM bandwidth: normals stay int16 in HBM and
decode on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def snorm16_encode(x: jnp.ndarray) -> jnp.ndarray:
    """float [-1,1] -> int16."""
    return jnp.asarray(
        jnp.round(jnp.clip(x, -1.0, 1.0) * 32767.0), dtype=jnp.int16
    )


def snorm16_decode(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x.astype(jnp.float32) / 32767.0, -1.0)


def _oct_wrap(v: jnp.ndarray) -> jnp.ndarray:
    return (1.0 - jnp.abs(v[..., ::-1])) * jnp.where(v >= 0.0, 1.0, -1.0)


def oct_encode(n: jnp.ndarray) -> jnp.ndarray:
    """Unit vector -> octahedral (..., 2) in [-1, 1]."""
    n = n / jnp.sum(jnp.abs(n), axis=-1, keepdims=True)
    xy = n[..., :2]
    return jnp.where(n[..., 2:3] >= 0.0, xy, _oct_wrap(xy))


def oct_decode(e: jnp.ndarray) -> jnp.ndarray:
    """Octahedral (..., 2) -> unit vector (..., 3)."""
    z = 1.0 - jnp.abs(e[..., 0]) - jnp.abs(e[..., 1])
    t = jnp.maximum(-z, 0.0)
    x = e[..., 0] + jnp.where(e[..., 0] >= 0.0, -t, t)
    y = e[..., 1] + jnp.where(e[..., 1] >= 0.0, -t, t)
    v = jnp.stack([x, y, z], axis=-1)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def f16_encode(x: jnp.ndarray) -> jnp.ndarray:
    return x.astype(jnp.float16)


def f16_decode(x: jnp.ndarray) -> jnp.ndarray:
    return x.astype(jnp.float32)
