"""Metallic/roughness PBR material table (SoA).

Capability mirror of the reference material model (reference:
Source/Material.ixx:12-33 — BaseColor, EmissiveStrength/Color, Metallic,
Roughness, IOR, Transmission, AlphaMode/Cutoff + 7 texture map slots).
Stored as a struct-of-arrays so hit shading is pure gathers.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

ALPHA_OPAQUE = 0
ALPHA_BLEND = 1
ALPHA_MASK = 2

# texture map slots (reference: Source/Material.ixx:23-33)
MAP_BASE_COLOR = 0
MAP_EMISSIVE = 1
MAP_METALLIC = 2
MAP_ROUGHNESS = 3
MAP_METALLIC_ROUGHNESS = 4
MAP_TRANSMISSION = 5
MAP_NORMAL = 6
NUM_MAPS = 7


class MaterialTable(NamedTuple):
    base_color: jnp.ndarray     # (M, 4) rgba
    emissive: jnp.ndarray       # (M, 3) color * strength
    metallic: jnp.ndarray       # (M,)
    roughness: jnp.ndarray      # (M,)
    ior: jnp.ndarray            # (M,)
    transmission: jnp.ndarray   # (M,)
    alpha_mode: jnp.ndarray     # (M,) i32
    alpha_cutoff: jnp.ndarray   # (M,)
    texture_index: jnp.ndarray  # (M, NUM_MAPS) i32, -1 = none

    @property
    def count(self):
        return self.base_color.shape[0]


def make_table(materials: list[dict]) -> MaterialTable:
    """Build a device table from a list of material dicts with the
    reference's defaults (Material.ixx:12-21: BaseColor=1, Metallic=0,
    Roughness=0.5, IOR=1.5, Transmission=0, opaque)."""
    m = max(len(materials), 1)

    def col(key, default, width=None):
        out = []
        for mat in (materials or [{}]):
            v = mat.get(key, default)
            out.append(v)
        a = np.asarray(out, dtype=np.float32)
        if width is not None and a.ndim == 1:
            a = np.broadcast_to(a[:, None], (m, width)).copy()
        return a

    emissive_color = np.asarray(
        [mat.get("emissive_color", (0, 0, 0)) for mat in (materials or [{}])],
        dtype=np.float32,
    )
    emissive_strength = np.asarray(
        [mat.get("emissive_strength", 1.0) for mat in (materials or [{}])],
        dtype=np.float32,
    )
    tex = np.asarray(
        [mat.get("texture_index", [-1] * NUM_MAPS) for mat in (materials or [{}])],
        dtype=np.int32,
    )
    alpha = np.asarray(
        [mat.get("alpha_mode", ALPHA_OPAQUE) for mat in (materials or [{}])],
        dtype=np.int32,
    )
    # numpy-backed; `make_scene` device-puts the whole table once (eager
    # per-field device ops are very slow over the axon TPU tunnel)
    return MaterialTable(
        base_color=col("base_color", (1.0, 1.0, 1.0, 1.0)),
        emissive=emissive_color * emissive_strength[:, None],
        metallic=col("metallic", 0.0),
        roughness=col("roughness", 0.5),
        ior=col("ior", 1.5),
        transmission=col("transmission", 0.0),
        alpha_mode=alpha,
        alpha_cutoff=col("alpha_cutoff", 0.5),
        texture_index=tex,
    )
