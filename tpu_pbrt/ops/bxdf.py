"""The 3-lobe BSDF: diffuse reflection, GGX specular reflection, GGX specular
transmission — with one-sample MIS lobe selection.

Capability mirror of the reference BSDF (reference: Shaders/BxDF.hlsli:36-321,
Shaders/SurfaceVectors.hlsli:5-16), re-designed for TPU: a *branchless*
struct-of-arrays formulation. Every lane computes all three candidate lobes
and selects by the sampled lobe index — the reference's `switch` on LobeType
becomes vectorized selects ("expert routing" resolved by weighted eval, as
SURVEY.md §2.4 prescribes). Matches the reference's estimator exactly:

  throughput *= Evaluate(lobe) / (lobe_pdf * lobe_weight)

Conventions: V points *away* from the surface (toward the previous vertex),
L is the sampled outgoing direction, roughness is perceptual (alpha = r^2),
minimum roughness 2e-3 (Shaders/BxDF.hlsli:19).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import math as pmath
from . import brdf, sampling

MIN_ROUGHNESS = 2e-3

LOBE_DIFFUSE = 0
LOBE_SPECULAR = 1
LOBE_TRANSMISSION = 2


class SurfaceVectors(NamedTuple):
    """Front-facing geometric normal + shading normal + shading basis rows."""
    front_geometric_normal: jnp.ndarray  # (..., 3)
    shading_normal: jnp.ndarray          # (..., 3)
    tangent: jnp.ndarray                 # (..., 3) basis row 0
    bitangent: jnp.ndarray               # (..., 3) basis row 1


def make_surface_vectors(is_front_face: jnp.ndarray, geometric_normal: jnp.ndarray,
                         shading_normal: jnp.ndarray) -> SurfaceVectors:
    """reference: Shaders/SurfaceVectors.hlsli:10-15."""
    front = jnp.where(is_front_face[..., None], geometric_normal, -geometric_normal)
    t, b = pmath.orthonormal_basis(shading_normal)
    return SurfaceVectors(front, shading_normal, t, b)


class BSDF(NamedTuple):
    """Material sample at a hit point (reference: BSDFSample fields,
    Shaders/BxDF.hlsli:38-67)."""
    base_color: jnp.ndarray    # (..., 3)
    metallic: jnp.ndarray      # (...,)
    albedo: jnp.ndarray        # (..., 3) = base_color * (1 - metallic)
    roughness: jnp.ndarray     # (...,)  >= MIN_ROUGHNESS
    ior_i: jnp.ndarray         # (...,)
    ior_o: jnp.ndarray         # (...,)
    f0: jnp.ndarray            # (..., 3)
    transmission: jnp.ndarray  # (...,)


def make_bsdf(base_color, metallic, roughness, ior, transmission, is_front_face) -> BSDF:
    """reference: BSDFSample::Initialize (Shaders/BxDF.hlsli:45-67)."""
    albedo = base_color * (1.0 - metallic[..., None])
    roughness = jnp.maximum(roughness, MIN_ROUGHNESS)
    ior_i = jnp.where(is_front_face, 1.0, ior)
    ior_o = jnp.where(is_front_face, ior, 1.0)
    f0_dielectric = ((ior_i - ior_o) / (ior_i + ior_o)) ** 2
    f0 = f0_dielectric[..., None] * (1.0 - metallic[..., None]) + base_color * metallic[..., None]
    return BSDF(base_color, metallic, albedo, roughness, ior_i, ior_o, f0,
                transmission)


def estimate_diffuse_probability(albedo, f0, roughness, nov):
    """reference: Shaders/BxDF.hlsli:21-34."""
    f_env = brdf.environment_term(f0, nov, roughness)
    diffuse = pmath.luminance(albedo * (1.0 - f_env))
    specular = pmath.luminance(f_env)
    total = diffuse + specular
    p = jnp.where(total > 0.0, diffuse / jnp.maximum(total, 1e-20), 1.0)
    interior = (p > 0.0) & (p < 1.0)
    return jnp.where(interior, jnp.clip(p, 0.05, 0.95), p)


def lobe_weights(bsdf: BSDF, sv: SurfaceVectors, v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) weights [diffuse, specular, transmission]
    (reference: Shaders/BxDF.hlsli:184-196)."""
    nov = jnp.abs(pmath.dot(sv.shading_normal, v))
    w_t = bsdf.transmission * (1.0 - bsdf.metallic)
    w_r = 1.0 - w_t
    p_d = estimate_diffuse_probability(bsdf.albedo, bsdf.f0, bsdf.roughness, nov)
    return jnp.stack([p_d * w_r, (1.0 - p_d) * w_r, w_t], axis=-1)


def find_lobe(weights: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Select a lobe index from stacked weights, matching the reference's
    reverse-scan (transmission first; reference: Shaders/BxDF.hlsli:198-212)."""
    w_t = weights[..., LOBE_TRANSMISSION]
    w_s = weights[..., LOBE_SPECULAR]
    lobe = jnp.where(
        u < w_t,
        LOBE_TRANSMISSION,
        jnp.where(u < w_t + w_s, LOBE_SPECULAR, LOBE_DIFFUSE),
    )
    return lobe.astype(jnp.int32)


def _half_vector(bsdf: BSDF, sv: SurfaceVectors, l, v, is_transmissive):
    """reference: BSDFSample::ComputeHalfVector (Shaders/BxDF.hlsli:228-245)."""
    n = sv.front_geometric_normal
    refracted = is_transmissive & (pmath.dot(n, l) < 0.0)
    h_t = pmath.normalize(l * bsdf.ior_o[..., None] + v * bsdf.ior_i[..., None])
    h_t = jnp.where(pmath.dotk(n, h_t) < 0.0, -h_t, h_t)
    h_r = pmath.normalize(l + v)
    return jnp.where(refracted[..., None], h_t, h_r)


def sample(bsdf: BSDF, sv: SurfaceVectors, v: jnp.ndarray, u4: jnp.ndarray):
    """Sample an outgoing direction.

    Returns (L, lobe, valid). All three lobes are sampled branchlessly and
    the result selected by the lobe drawn from u4[...,0]
    (reference: Shaders/BxDF.hlsli:214-226).
    """
    weights = lobe_weights(bsdf, sv, v)
    lobe = find_lobe(weights, u4[..., 0])

    t, b, n = sv.tangent, sv.bitangent, sv.shading_normal
    v_local = pmath.to_local(t, b, n, v)

    # Diffuse: cosine hemisphere around the shading normal.
    l_diff = pmath.to_world(t, b, n, sampling.sample_cosine_hemisphere(u4[..., 1:3]))

    # Specular reflection & transmission share the VNDF half-vector.
    h = pmath.to_world(t, b, n, sampling.sample_ggx_vndf(u4[..., 1:3], bsdf.roughness, v_local))
    l_spec = pmath.reflect(-v, h)

    # Transmission: reflect or refract at H by exact dielectric Fresnel
    # (reference: Shaders/BxDF.hlsli:148-168).
    eta = bsdf.ior_i / bsdf.ior_o
    voh = jnp.abs(pmath.dot(v, h))
    tir = eta * eta * (1.0 - voh * voh) > 1.0
    f_diel = brdf.fresnel_dielectric(eta, voh)
    refr, refr_tir = pmath.refract(-v, h, eta[..., None])
    reflect_choice = tir | (u4[..., 3] < f_diel)
    l_trans = jnp.where(reflect_choice[..., None], l_spec, refr)
    # refract() is masked-safe; degenerate lanes fall back to -V like the
    # reference's isfinite guard (Shaders/BxDF.hlsli:162-166).
    bad = (~reflect_choice) & refr_tir
    l_trans = jnp.where(bad[..., None], -v, l_trans)

    l_out = jnp.where(
        (lobe == LOBE_DIFFUSE)[..., None],
        l_diff,
        jnp.where((lobe == LOBE_SPECULAR)[..., None], l_spec, l_trans),
    )

    # Validity: reflection lobes must leave through the front hemisphere of
    # the *geometric* normal; transmission is always valid
    # (Shaders/BxDF.hlsli:85,117,167).
    front = pmath.dot(sv.front_geometric_normal, l_out) > 0.0
    valid = jnp.where(lobe == LOBE_TRANSMISSION, True, front)
    return l_out, lobe, valid


def _pdf_all(bsdf: BSDF, sv: SurfaceVectors, l, v):
    """Per-lobe PDFs (diffuse, specular, transmission), no lobe weights."""
    t, b, n = sv.tangent, sv.bitangent, sv.shading_normal
    front = pmath.dot(sv.front_geometric_normal, l) > 0.0
    nol = jnp.abs(pmath.dot(n, l))

    pdf_d = jnp.where(front, sampling.cosine_hemisphere_pdf(nol), 0.0)

    is_trans = bsdf.transmission > 0.0
    h = _half_vector(bsdf, sv, l, v, is_trans)
    v_local = pmath.to_local(t, b, n, v)
    noh = pmath.dot(n, h)
    pdf_s = jnp.where(front, sampling.ggx_vndf_pdf(v_local, noh, bsdf.roughness), 0.0)

    pdf_t = nol  # reference: Shaders/BxDF.hlsli:170-175
    return pdf_d, pdf_s, pdf_t


def _eval_all(bsdf: BSDF, sv: SurfaceVectors, l, v):
    """Per-lobe unweighted f values (each already multiplied by NoL, like the
    reference's Evaluate*), shapes (..., 3)."""
    n = sv.shading_normal
    front = pmath.dot(sv.front_geometric_normal, l) > 0.0
    nol = jnp.abs(pmath.dot(n, l))
    nov = jnp.abs(pmath.dot(n, v))

    is_trans = bsdf.transmission > 0.0
    h = _half_vector(bsdf, sv, l, v, is_trans)
    voh = jnp.abs(pmath.dot(v, h))
    noh = jnp.abs(pmath.dot(n, h))

    f_d = nol[..., None] * bsdf.albedo * brdf.diffuse_term(bsdf.roughness, nol, nov, voh)[..., None]
    f_d = jnp.where(front[..., None], f_d, 0.0)

    d = brdf.distribution(bsdf.roughness, noh)
    gmod = brdf.geometry_mod(bsdf.roughness, nol, nov)
    f = brdf.fresnel_schlick_rgb(bsdf.f0, voh)
    f_s = (nol * d * gmod)[..., None] * f
    f_s = jnp.where(front[..., None], f_s, 0.0)

    f_t = nol[..., None] * bsdf.base_color
    return f_d, f_s, f_t


def pdf_sampled_lobe(bsdf: BSDF, sv: SurfaceVectors, l, v, weights, lobe):
    """PDF of L given it was drawn from `lobe`, scaled by the lobe weight
    (reference: Shaders/BxDF.hlsli:287-299)."""
    pdf_d, pdf_s, pdf_t = _pdf_all(bsdf, sv, l, v)
    pdf = jnp.where(
        lobe == LOBE_DIFFUSE, pdf_d,
        jnp.where(lobe == LOBE_SPECULAR, pdf_s, pdf_t),
    )
    # select instead of take_along_axis (per-lane gather — slow on TPU)
    w = jnp.where(
        lobe == LOBE_DIFFUSE, weights[..., LOBE_DIFFUSE],
        jnp.where(lobe == LOBE_SPECULAR, weights[..., LOBE_SPECULAR],
                  weights[..., LOBE_TRANSMISSION]),
    )
    return pdf * w


def evaluate_sampled_lobe(bsdf: BSDF, sv: SurfaceVectors, l, v, weights, lobe):
    """f for the sampled lobe, scaled by reflection/transmission split
    (reference: Shaders/BxDF.hlsli:301-315)."""
    f_d, f_s, f_t = _eval_all(bsdf, sv, l, v)
    w_t = weights[..., LOBE_TRANSMISSION]
    w_r = (1.0 - w_t)[..., None]
    return jnp.where(
        (lobe == LOBE_TRANSMISSION)[..., None],
        f_t * w_t[..., None],
        jnp.where((lobe == LOBE_DIFFUSE)[..., None], f_d * w_r, f_s * w_r),
    )


def pdf_combined(bsdf: BSDF, sv: SurfaceVectors, l, v, weights):
    """Full mixture PDF over all lobes — used by ReSTIR/NEE MIS
    (reference: Shaders/BxDF.hlsli:247-264)."""
    pdf_d, pdf_s, pdf_t = _pdf_all(bsdf, sv, l, v)
    w_t = weights[..., LOBE_TRANSMISSION]
    front = pmath.dot(sv.front_geometric_normal, l) > 0.0
    pdf = jnp.where(w_t > 0.0, pdf_t * w_t, 0.0)
    refl = jnp.where(
        (w_t < 1.0) & front,
        pdf_d * weights[..., LOBE_DIFFUSE] + pdf_s * weights[..., LOBE_SPECULAR],
        0.0,
    )
    return pdf + refl


def evaluate_combined(bsdf: BSDF, sv: SurfaceVectors, l, v, weights):
    """Full mixture (diffuse, specular) split f — used by direct lighting
    (reference: Shaders/BxDF.hlsli:266-285). Returns (diffuse, specular)."""
    f_d, f_s, f_t = _eval_all(bsdf, sv, l, v)
    w_t = weights[..., LOBE_TRANSMISSION:LOBE_TRANSMISSION + 1]
    w_r = 1.0 - w_t
    front = (pmath.dot(sv.front_geometric_normal, l) > 0.0)[..., None]
    spec = jnp.where(w_t > 0.0, f_t * w_t, 0.0)
    diff = jnp.where((w_t < 1.0) & front, f_d * w_r, 0.0)
    spec = spec + jnp.where((w_t < 1.0) & front, f_s * w_r, 0.0)
    return diff, spec
