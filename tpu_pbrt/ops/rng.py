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


def pcg4d(x, y, z, w):
    """pcg4d hash on four u32 component arrays -> four u32 arrays (SoA:
    stacking into (..., 4) puts 4 on the TPU lane axis and wastes 31/32
    lanes on every op — measured as a hot fusion class)."""
    x = x.astype(_U32) * _U32(1664525) + _U32(1013904223)
    y = y.astype(_U32) * _U32(1664525) + _U32(1013904223)
    z = z.astype(_U32) * _U32(1664525) + _U32(1013904223)
    w = w.astype(_U32) * _U32(1664525) + _U32(1013904223)
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
    return x, y, z, w


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

    def _draw(self):
        c = jnp.broadcast_to(
            jnp.asarray(self._counter, dtype=_U32), self._px.shape
        )
        frame = jnp.broadcast_to(self._frame, self._px.shape)
        self._counter += 1
        x, y, z, w = pcg4d(self._px, self._py, frame, c)
        return (u32_to_uniform(x), u32_to_uniform(y),
                u32_to_uniform(z), u32_to_uniform(w))

    def next1(self) -> jnp.ndarray:
        return self._draw()[0]

    def next2(self):
        return self._draw()[:2]

    def next3(self):
        return self._draw()[:3]

    def next4(self):
        return self._draw()


def uniform4(px: jnp.ndarray, py: jnp.ndarray, frame, counter):
    """Stateless draw of 4 uniforms as a TUPLE of component arrays (SoA);
    `frame`/`counter` may be traced scalars (use inside `lax` loop
    bodies)."""
    shape = jnp.broadcast_shapes(jnp.shape(px), jnp.shape(py))
    x, y, z, w = pcg4d(
        jnp.broadcast_to(jnp.asarray(px), shape),
        jnp.broadcast_to(jnp.asarray(py), shape),
        jnp.broadcast_to(jnp.asarray(frame), shape),
        jnp.broadcast_to(jnp.asarray(counter), shape),
    )
    return (u32_to_uniform(x), u32_to_uniform(y),
            u32_to_uniform(z), u32_to_uniform(w))
