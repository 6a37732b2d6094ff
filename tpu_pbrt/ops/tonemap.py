"""Tone mapping operators: Saturate, Reinhard, ACES (filmic), ST2084/HDR10.

Replaces DirectXTK's ToneMapPostProcess instances
(reference: Source/App.cpp:787-828, 1777-1803 — Saturate/Reinhard/ACES for
SDR and ST2084 PQ for HDR10 with paper-white nits). Pure elementwise JAX.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import math as pmath

OPERATOR_NONE = "none"
OPERATOR_SATURATE = "saturate"
OPERATOR_REINHARD = "reinhard"
OPERATOR_ACES = "aces"
OPERATOR_ST2084 = "st2084"

# Rec.709 -> Rec.2020 color-primary rotation (HDR10 wide-gamut container;
# reference: Source/MyAppData.h:316-320 HDR color-primary rotation applied
# on the ST2084 path, App.cpp:1782-1794). Row-vector convention: c' = M @ c.
_REC709_TO_REC2020 = (
    (0.6274040, 0.3292820, 0.0433136),
    (0.0690970, 0.9195400, 0.0113612),
    (0.0163916, 0.0880132, 0.8955950),
)

# the reference's other two HDR rotations (MyAppData.h:316-320:
# Rec.709->Rec.2020 | DCI-P3-D65->Rec.2020 | Rec.709->DCI-P3-D65)
_DCIP3D65_TO_REC2020 = (
    (0.7538330, 0.1986730, 0.0474947),
    (0.0457438, 0.9417770, 0.0124772),
    (-0.0012100, 0.0176017, 0.9836070),
)
_REC709_TO_DCIP3D65 = (
    (0.8224620, 0.1775380, 0.0000000),
    (0.0331941, 0.9668060, 0.0000000),
    (0.0170827, 0.0723974, 0.9105200),
)

ROTATIONS = {
    "rec709_to_rec2020": _REC709_TO_REC2020,
    "dcip3d65_to_rec2020": _DCIP3D65_TO_REC2020,
    "rec709_to_dcip3d65": _REC709_TO_DCIP3D65,
}


def saturate(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(x, 0.0, 1.0)


def reinhard(x: jnp.ndarray, exposure: float = 1.0) -> jnp.ndarray:
    x = x * exposure
    return x / (1.0 + x)


def aces_filmic(x: jnp.ndarray, exposure: float = 1.0) -> jnp.ndarray:
    """ACES fitted curve (Narkowicz 2015) — the same operator family
    DirectXTK's ACESFilmic uses."""
    x = x * exposure
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def st2084_pq(nits: jnp.ndarray, paper_white_nits: float = 200.0) -> jnp.ndarray:
    """Linear (1.0 == paper-white) -> SMPTE ST2084 PQ signal for HDR10
    (reference: App.cpp:1782-1794 ST2084 path with paper-white nits)."""
    m1, m2 = 2610.0 / 16384.0, 2523.0 / 4096.0 * 128.0
    c1, c2, c3 = 3424.0 / 4096.0, 2413.0 / 4096.0 * 32.0, 2392.0 / 4096.0 * 32.0
    y = jnp.clip(nits * paper_white_nits / 10000.0, 0.0, 1.0)
    yp = y ** m1
    return ((c1 + c2 * yp) / (1.0 + c3 * yp)) ** m2


def rec709_to_rec2020(rgb: jnp.ndarray) -> jnp.ndarray:
    """Rotate linear Rec.709 primaries into the Rec.2020 container
    (the HDR10 gamut step the reference applies before PQ encoding)."""
    m = jnp.asarray(_REC709_TO_REC2020, rgb.dtype)
    return jnp.einsum("...c,oc->...o", rgb, m)


def color_rotate(rgb: jnp.ndarray, rotation: str) -> jnp.ndarray:
    """Apply a named HDR color-primary rotation (MyAppData.h:316-320)."""
    m = jnp.asarray(ROTATIONS[rotation], rgb.dtype)
    return jnp.einsum("...c,oc->...o", rgb, m)


def apply(x: jnp.ndarray, operator: str = OPERATOR_ACES,
          exposure: float = 1.0,
          paper_white_nits: float = 200.0,
          color_rotation: str = "rec709_to_rec2020") -> jnp.ndarray:
    if operator == OPERATOR_NONE:
        return x
    if operator == OPERATOR_SATURATE:
        return saturate(x * exposure)
    if operator == OPERATOR_REINHARD:
        return reinhard(x, exposure)
    if operator == OPERATOR_ACES:
        return aces_filmic(x, exposure)
    if operator == OPERATOR_ST2084:
        # HDR signal chain: exposure -> gamut rotation -> PQ encode
        wide = color_rotate(jnp.maximum(x * exposure, 0.0),
                            color_rotation)
        return st2084_pq(wide, paper_white_nits)
    raise ValueError(f"unknown tonemap operator: {operator}")


def to_srgb8(linear_rgb: jnp.ndarray) -> jnp.ndarray:
    """Display encode: linear -> sRGB -> uint8."""
    srgb = pmath.linear_to_srgb(jnp.clip(linear_rgb, 0.0, 1.0))
    return jnp.asarray(jnp.round(srgb * 255.0), jnp.uint8)
