"""Small screen-space lens effects (reference: the post-processing
chain's Chromatic Aberration toggle, README settings tree /
Source/MyAppData.h post-processing block; applied between upscaling and
bloom like the reference's pass order)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax
from jax.scipy.ndimage import map_coordinates


def chromatic_aberration(img: jnp.ndarray,
                         strength: float) -> jnp.ndarray:
    """Radial RGB split: red magnified, blue minified by `strength`
    (fraction of the half-diagonal at the screen edge). (H, W, 3)."""
    if strength <= 0.0:
        return img
    h, w = img.shape[:2]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = lax.broadcasted_iota(jnp.float32, (h, w), 1)
    outs = []
    for c, k in enumerate((1.0, 0.0, -1.0)):    # R out, G ref, B in
        s = 1.0 + strength * k
        ys = cy + (yy - cy) / s
        xs = cx + (xx - cx) / s
        outs.append(map_coordinates(img[..., c], [ys, xs], order=1,
                                    mode="nearest"))
    return jnp.stack(outs, -1)
