"""Counter-based per-pixel RNG.

The reference seeds a per-pixel hash RNG from (pixel, frameIndex)
(reference: Shaders/Raytracing.hlsl:108 `Rng::Hash::Initialize`) and draws a
stream of floats. The TPU-idiomatic equivalent is a *stateless* counter-based
generator: every draw is `pcg4d(pixel.x, pixel.y, frame_salt, counter)` — no
carried state, perfectly vectorizable, identical on CPU/TPU, and reproducible
under any sharding (each pixel owns its stream regardless of which chip
renders it).

pcg4d is the public hash from Jarzynski & Olano, "Hash Functions for GPU
Rendering" (JCGT 2020).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_U32 = jnp.uint32


def pcg4d(v: jnp.ndarray) -> jnp.ndarray:
    """pcg4d hash: (..., 4) uint32 -> (..., 4) uint32."""
    v = v.astype(_U32)
    v = v * _U32(1664525) + _U32(1013904223)
    x, y, z, w = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    w = w ^ (w >> 16)
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    return jnp.stack([x, y, z, w], axis=-1)


def u32_to_uniform(u: jnp.ndarray) -> jnp.ndarray:
    """uint32 -> float32 in [0, 1): set mantissa bits of 1.0f and subtract."""
    bits = (u >> _U32(9)) | _U32(0x3F800000)
    return lax.bitcast_convert_type(bits, jnp.float32) - 1.0


class PixelRng:
    """A per-pixel counter-based stream.

    `PixelRng(px, py, frame)` then `.next1()/.next2()/.next4()` mimic the
    reference's sequential `Rng::Hash::GetFloat*` draws
    (Shaders/Raytracing.hlsl:112,330,351) but are pure values under jit: the
    counter is a tiny Python int advanced at *trace* time, so every draw is a
    distinct fused hash evaluation — no cross-iteration dependency chain.

    For draws inside `lax` loops (traced counters), pass an explicit
    `salt` array via `uniform(px, py, frame, counter)` instead.
    """

    def __init__(self, px: jnp.ndarray, py: jnp.ndarray, frame):
        self._px = px.astype(_U32)
        self._py = py.astype(_U32)
        self._frame = jnp.asarray(frame).astype(_U32)
        self._counter = 0

    def _draw(self) -> jnp.ndarray:
        c = jnp.broadcast_to(
            jnp.asarray(self._counter, dtype=_U32), self._px.shape
        )
        frame = jnp.broadcast_to(self._frame, self._px.shape)
        self._counter += 1
        v = jnp.stack([self._px, self._py, frame, c], axis=-1)
        return u32_to_uniform(pcg4d(v))

    def next1(self) -> jnp.ndarray:
        return self._draw()[..., 0]

    def next2(self) -> jnp.ndarray:
        return self._draw()[..., :2]

    def next3(self) -> jnp.ndarray:
        return self._draw()[..., :3]

    def next4(self) -> jnp.ndarray:
        return self._draw()


def uniform4(px: jnp.ndarray, py: jnp.ndarray, frame, counter) -> jnp.ndarray:
    """Stateless draw of 4 uniforms; `frame`/`counter` may be traced scalars
    (use inside `lax.fori_loop`/`lax.while_loop` bodies)."""
    shape = jnp.broadcast_shapes(jnp.shape(px), jnp.shape(py))
    v = jnp.stack(
        [
            jnp.broadcast_to(jnp.asarray(px), shape).astype(_U32),
            jnp.broadcast_to(jnp.asarray(py), shape).astype(_U32),
            jnp.broadcast_to(jnp.asarray(frame), shape).astype(_U32),
            jnp.broadcast_to(jnp.asarray(counter), shape).astype(_U32),
        ],
        axis=-1,
    )
    return u32_to_uniform(pcg4d(v))
