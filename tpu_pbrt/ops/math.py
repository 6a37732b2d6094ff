"""Vector math core (pure JAX, f32).

TPU-first conventions:
  * every function is elementwise over a leading batch shape; 3-vectors live in
    a trailing axis of size 3 so the VPU sees long contiguous lanes,
  * no data-dependent Python control flow — everything is `jnp.where`-style
    select so it traces once under `jax.jit`.

Semantics mirror the reference's math helpers (reference:
Shaders/Math.hlsli:7-50, Shaders/HitInfo.hlsli:81-99,
Shaders/SelfIntersectionAvoidance.hlsli:37-117) without copying code.
"""

from __future__ import annotations

import jax.numpy as jnp

F32_EPS = jnp.float32(1.1920929e-07)
INF = jnp.float32(jnp.inf)


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the trailing axis, keepdims dropped."""
    return jnp.sum(a * b, axis=-1)


def dotk(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product, keepdims=True (broadcastable against vectors)."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def length(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.maximum(dot(v, v), 0.0))


def normalize(v: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """Safe normalize: returns v * rsqrt(max(|v|^2, eps))."""
    return v * jnp.sqrt(1.0 / jnp.maximum(dotk(v, v), eps))


def luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    """Rec.709 luminance (reference uses Color::Luminance for RR and lobe
    probabilities, Shaders/Raytracing.hlsl:361, Shaders/BxDF.hlsli:25-26)."""
    w = jnp.asarray([0.2126, 0.7152, 0.0722], dtype=rgb.dtype)
    return jnp.sum(rgb * w, axis=-1)


def reflect(i: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """HLSL reflect: i - 2*dot(i,n)*n (i points *toward* the surface)."""
    return i - 2.0 * dotk(i, n) * n


def refract(i: jnp.ndarray, n: jnp.ndarray, eta: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """HLSL refract with a validity mask instead of NaNs.

    i points toward the surface, n away from it, eta = IORi/IORo.
    Returns (direction, total_internal_reflection_mask).
    """
    eta = jnp.asarray(eta)[..., None] if jnp.ndim(eta) == jnp.ndim(i) - 1 else eta
    cosi = -dotk(i, n)
    k = 1.0 - eta * eta * (1.0 - cosi * cosi)
    tir = (k < 0.0)[..., 0]
    t = eta * i + (eta * cosi - jnp.sqrt(jnp.maximum(k, 0.0))) * n
    return t, tir


def orthonormal_basis(n: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Branchless Frisvad/Pixar (Duff et al. 2017) basis from a unit normal.

    Returns (tangent, bitangent) with [t, b, n] right-handed. Used where the
    reference builds a shading basis without a surface tangent.
    """
    s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + s * n[..., 0] * n[..., 0] * a, s * b, -s * n[..., 0]], axis=-1
    )
    bt = jnp.stack([b, s + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return t, bt


def tbn_from_normal_tangent(n: jnp.ndarray, t: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gram-Schmidt TBN (reference: Shaders/Math.hlsli:17-21).

    Returns (T, B, N) rows of the world->tangent rotation.
    """
    t = normalize(t - n * dotk(n, t))
    b = cross(n, t)
    return t, b, n


def to_local(t, b, n, v):
    """World -> tangent space (rows T,B,N); v_local = [v.T, v.B, v.N]."""
    return jnp.stack([dot(v, t), dot(v, b), dot(v, n)], axis=-1)


def to_world(t, b, n, v):
    """Tangent -> world: v.x*T + v.y*B + v.z*N."""
    return v[..., 0:1] * t + v[..., 1:2] * b + v[..., 2:3] * n


def calculate_uv(pixel_xy: jnp.ndarray, dims, jitter=0.0) -> jnp.ndarray:
    """Pixel center -> UV in [0,1] (reference: Shaders/Math.hlsli:7-10)."""
    return (pixel_xy + 0.5 + jitter) / jnp.asarray(dims, dtype=jnp.float32)


def calculate_ndc(uv: jnp.ndarray) -> jnp.ndarray:
    """UV -> NDC, y-down flip (reference: Shaders/Math.hlsli:12-15)."""
    return uv * jnp.asarray([2.0, -2.0], dtype=uv.dtype) + jnp.asarray(
        [-1.0, 1.0], dtype=uv.dtype
    )


def to_latlong_uv(d: jnp.ndarray) -> jnp.ndarray:
    """Direction -> lat-long texture coordinate
    (reference: Shaders/Math.hlsli:29-33)."""
    u = (1.0 + jnp.arctan2(d[..., 0], d[..., 2]) / jnp.pi) * 0.5
    v = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0)) / jnp.pi
    return jnp.stack([u, v], axis=-1)


def sample_triangle(u: jnp.ndarray) -> jnp.ndarray:
    """Uniform barycentrics from 2 uniforms
    (reference: Shaders/Math.hlsli:41-45)."""
    s = jnp.sqrt(u[..., 0])
    return jnp.stack([s * (1.0 - u[..., 1]), s * u[..., 1]], axis=-1)


def to_solid_angle_pdf(area_pdf, dist, cos_theta):
    """Area-measure -> solid-angle-measure PDF
    (reference: Shaders/Math.hlsli:47-50)."""
    return area_pdf * dist * dist / jnp.maximum(cos_theta, 1e-8)


def srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    lo = c / 12.92
    hi = ((c + 0.055) / 1.055) ** 2.4
    return jnp.where(c <= 0.04045, lo, hi)


def linear_to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    c = jnp.clip(c, 0.0, 1.0)
    lo = c * 12.92
    hi = 1.055 * c ** (1.0 / 2.4) - 0.055
    return jnp.where(c <= 0.0031308, lo, hi)


# ---------------------------------------------------------------------------
# Self-intersection avoidance (reference: Shaders/SelfIntersectionAvoidance
# .hlsli:37-117 — NVIDIA's ULP-bounded safe spawn offset). We implement the
# same published algorithm: offset the spawn point along the flat normal by a
# bound that scales with the magnitude of the hit position.
# ---------------------------------------------------------------------------

_ORIGIN = 1.0 / 32.0
_FLOAT_SCALE = 1.0 / 65536.0
_INT_SCALE = 256.0


def offset_ray_origin(p: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Ray-origin offsetting ("A Fast and Robust Method for Avoiding
    Self-Intersection", Ray Tracing Gems ch.6). p is the hit position, n the
    (front-facing w.r.t. the new ray) geometric normal."""
    import jax.lax as lax

    of_i = jnp.asarray(_INT_SCALE * n, dtype=jnp.int32)
    p_i32 = lax.bitcast_convert_type(p.astype(jnp.float32), jnp.int32)
    p_i = lax.bitcast_convert_type(
        jnp.where(p < 0.0, p_i32 - of_i, p_i32 + of_i), jnp.float32
    )
    return jnp.where(jnp.abs(p) < _ORIGIN, p + _FLOAT_SCALE * n, p_i)


def safe_spawn_offset(p: jnp.ndarray, n: jnp.ndarray, direction: jnp.ndarray) -> jnp.ndarray:
    """Spawn point for a secondary ray leaving surface point p with flat
    normal n, in direction d (reference: Shaders/HitInfo.hlsli:96-99 —
    offsets along ±flat normal by the sign of dot(d, n))."""
    sgn = jnp.where(dotk(direction, n) >= 0.0, 1.0, -1.0)
    return offset_ray_origin(p, n * sgn)
