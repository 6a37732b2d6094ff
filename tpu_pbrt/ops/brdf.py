"""Microfacet BRDF terms.

Replaces the NVIDIA MathLib `BRDF::*` namespace used by the reference BSDF
(reference: Shaders/BxDF.hlsli:23,105,140-142,155). All terms take
*perceptual* roughness r (alpha = r^2):

  * `distribution`   — GGX D                     (BRDF::DistributionTerm)
  * `geometry_mod`   — height-correlated Smith visibility V = G2/(4 NoL NoV)
                       (BRDF::GeometryTermMod — "Mod" folds the 4 NoL NoV
                       microfacet denominator into G)
  * `fresnel_schlick`— Schlick F                 (BRDF::FresnelTerm)
  * `fresnel_dielectric` — exact unpolarized dielectric Fresnel
                       (BRDF::FresnelTerm_Dielectric)
  * `diffuse_term`   — Burley (Disney) diffuse / pi (BRDF::DiffuseTerm)
  * `environment_term` — analytic pre-integrated GGX split-sum approximation
                       (stands in for BRDF::EnvironmentTerm_Rtg; we use the
                       public Karis mobile approximation — it only steers the
                       diffuse-vs-specular lobe probability, which the
                       reference clamps to [0.05, 0.95] anyway,
                       Shaders/BxDF.hlsli:29-32)
"""

from __future__ import annotations

import jax.numpy as jnp

from .sampling import ggx_ndf, ggx_smith_lambda


def distribution(roughness: jnp.ndarray, noh: jnp.ndarray) -> jnp.ndarray:
    return ggx_ndf(roughness, noh)


def geometry_mod(roughness: jnp.ndarray, nol: jnp.ndarray, nov: jnp.ndarray) -> jnp.ndarray:
    """Height-correlated Smith G2 divided by (4 NoL NoV)."""
    nol = jnp.maximum(jnp.abs(nol), 1e-6)
    nov = jnp.maximum(jnp.abs(nov), 1e-6)
    lam = ggx_smith_lambda(roughness, nol) + ggx_smith_lambda(roughness, nov)
    g2 = 1.0 / (1.0 + lam)
    return g2 / (4.0 * nol * nov)


def fresnel_schlick(f0: jnp.ndarray, voh: jnp.ndarray) -> jnp.ndarray:
    """Schlick Fresnel; f0 and voh must broadcast against each other."""
    m = jnp.clip(1.0 - voh, 0.0, 1.0)
    w = (m * m) * (m * m) * m
    return f0 + (1.0 - f0) * w


def fresnel_schlick_rgb(f0: jnp.ndarray, voh: jnp.ndarray) -> jnp.ndarray:
    """f0: (..., 3), voh: (...,) -> (..., 3)."""
    m = jnp.clip(1.0 - voh, 0.0, 1.0)
    w = (m * m) * (m * m) * m
    return f0 + (1.0 - f0) * w[..., None]


def fresnel_dielectric(eta: jnp.ndarray, cos_i: jnp.ndarray) -> jnp.ndarray:
    """Exact unpolarized dielectric Fresnel reflectance.

    eta = IORi / IORo (ratio of the incident side over transmitted side),
    cos_i = |cos| of the incident angle. Returns 1 under total internal
    reflection.
    """
    cos_i = jnp.clip(jnp.abs(cos_i), 0.0, 1.0)
    sin2_t = eta * eta * (1.0 - cos_i * cos_i)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    # r_parallel / r_perpendicular with eta = n_i / n_t:
    r_par = (cos_i - eta * cos_t) / jnp.maximum(cos_i + eta * cos_t, 1e-8)
    r_perp = (eta * cos_i - cos_t) / jnp.maximum(eta * cos_i + cos_t, 1e-8)
    f = 0.5 * (r_par * r_par + r_perp * r_perp)
    return jnp.where(tir, 1.0, f)


def diffuse_term(roughness: jnp.ndarray, nol: jnp.ndarray, nov: jnp.ndarray, voh: jnp.ndarray) -> jnp.ndarray:
    """Burley (Disney) diffuse, normalized by pi."""
    f90 = 0.5 + 2.0 * roughness * voh * voh
    def schlick_weight(c):
        m = jnp.clip(1.0 - c, 0.0, 1.0)
        return (m * m) * (m * m) * m
    fl = 1.0 + (f90 - 1.0) * schlick_weight(nol)
    fv = 1.0 + (f90 - 1.0) * schlick_weight(nov)
    return fl * fv / jnp.pi


def fresnel_schlick_soa(f0, voh):
    """Schlick Fresnel for Vec3 f0 (SoA colors)."""
    from .vec import Vec3

    m = jnp.clip(1.0 - voh, 0.0, 1.0)
    w = (m * m) * (m * m) * m
    return f0 + (Vec3.splat(jnp.ones_like(voh)) - f0) * w


def environment_term_soa(f0, nov, roughness):
    """Karis split-sum approximation on Vec3 f0 (see environment_term)."""
    r = roughness
    rx = -1.0 * r + 1.0
    ry = -0.0275 * r + 0.0425
    rz = -0.572 * r + 1.04
    rw = 0.022 * r - 0.04
    a004 = jnp.minimum(rx * rx, jnp.exp2(-9.28 * nov)) * rx + ry
    scale = -1.04 * a004 + rz
    bias = 1.04 * a004 + rw
    out = f0 * scale + bias
    from .vec import Vec3

    return Vec3(jnp.clip(out.x, 0.0, 1.0), jnp.clip(out.y, 0.0, 1.0),
                jnp.clip(out.z, 0.0, 1.0))


def environment_term(f0: jnp.ndarray, nov: jnp.ndarray, roughness: jnp.ndarray) -> jnp.ndarray:
    """Analytic split-sum environment BRDF approximation (Karis 2014,
    "Physically Based Material on Mobile"). f0 (..., 3) -> (..., 3)."""
    c0 = jnp.asarray([-1.0, -0.0275, -0.572, 0.022], dtype=f0.dtype)
    c1 = jnp.asarray([1.0, 0.0425, 1.04, -0.04], dtype=f0.dtype)
    r = roughness[..., None] * c0 + c1
    a004 = jnp.minimum(r[..., 0] * r[..., 0], jnp.exp2(-9.28 * nov)) * r[..., 0] + r[..., 1]
    scale = -1.04 * a004 + r[..., 2]
    bias = 1.04 * a004 + r[..., 3]
    return jnp.clip(f0 * scale[..., None] + bias[..., None], 0.0, 1.0)
