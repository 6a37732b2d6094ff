"""Emissive-triangle light sampling (power-proportional selection + uniform
area sampling, solid-angle PDFs).

Capability mirror of the reference's triangle-light machinery
(reference: Shaders/Light.hlsli:26-96 — TriangleLight init/sample/PDF;
Source/RTXDIResources.ixx:36-57 power-PDF construction). The mip-pyramid
power PDF texture becomes a prefix-sum CDF + `searchsorted` — the
TPU-idiomatic form of the same distribution.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..models.scene import EmissiveLights
from ..ops import sampling, vec
from ..ops.vec import Vec3


class LightSample(NamedTuple):
    position: Vec3           # point on the light
    normal: Vec3             # emitting-side normal
    radiance: Vec3
    pdf_area: jnp.ndarray    # (R,) selection pdf x (1/area), area measure
    light: jnp.ndarray       # (R,) i32 light index


def sample(lights: EmissiveLights, u3) -> LightSample:
    """Pick a light ~ power, then a uniform point on it. u3: a tuple of
    (R,) uniforms (SoA RNG)."""
    li = sampling.draw_cdf(lights.cdf, u3[0])
    li = jnp.clip(li, 0, lights.power.shape[0] - 1)

    s = jnp.sqrt(u3[1])
    b0 = s * (1.0 - u3[2])
    b1 = s * u3[2]
    pos = (
        vec.gather(lights.v0, li)
        + vec.gather(lights.e1, li) * b0
        + vec.gather(lights.e2, li) * b1
    )
    total = jnp.sum(lights.power)
    select_pdf = lights.power[li] / jnp.maximum(total, 1e-20)
    pdf_area = select_pdf / jnp.maximum(lights.area[li], 1e-20)
    return LightSample(pos, vec.gather(lights.normal, li),
                       vec.gather(lights.radiance, li), pdf_area, li)


def pdf_hit_area(lights: EmissiveLights, tri: jnp.ndarray) -> jnp.ndarray:
    """Area-measure PDF that NEE would have produced the hit triangle `tri`
    (for MIS weighting of BSDF-sampled emission). 0 for non-lights."""
    li = lights.tri_to_light[jnp.maximum(tri, 0)]
    valid = (tri >= 0) & (li >= 0)
    li = jnp.maximum(li, 0)
    total = jnp.sum(lights.power)
    select_pdf = lights.power[li] / jnp.maximum(total, 1e-20)
    pdf = select_pdf / jnp.maximum(lights.area[li], 1e-20)
    return jnp.where(valid, pdf, 0.0)
