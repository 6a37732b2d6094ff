"""Triangle geometry SoA (host-side assembly).

The reference's per-hit bindless vertex fetch (reference:
Shaders/RaytracingHelpers.hlsli:59-133, Source/Model.ixx:26-49) lives in
ops/shade_table.py on the device side; this module assembles the host
Geometry arrays the shade table and tracers are built from.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from .material import MaterialTable


class Geometry(NamedTuple):
    """World-space scene geometry (single merged soup for static scenes;
    instancing re-gathers through `tri_object`)."""
    positions: jnp.ndarray   # (V, 3) f32
    normals: jnp.ndarray     # (V, 3) f32
    tangents: jnp.ndarray    # (V, 4) f32 (xyz + handedness w)
    uv0: jnp.ndarray         # (V, 2) f32
    indices: jnp.ndarray     # (T, 3) i32
    tri_material: jnp.ndarray  # (T,) i32
    tri_object: jnp.ndarray    # (T,) i32 — instance/render-object id

    @property
    def num_tris(self):
        return self.indices.shape[0]

    def triangle_vertices(self):
        """(T,3) x3 world-space triangle corners."""
        i = self.indices
        p = self.positions
        return p[i[:, 0]], p[i[:, 1]], p[i[:, 2]]


def build_geometry(meshes: list[dict]) -> Geometry:
    """Merge host mesh dicts {positions, normals, indices, material, object,
    [uv0, tangents]} (numpy) into one device Geometry."""
    pos, nrm, tan, uv, idx, mat, obj = [], [], [], [], [], [], []
    voffset = 0
    for k, mesh in enumerate(meshes):
        p = np.asarray(mesh["positions"], np.float32)
        n = np.asarray(mesh["normals"], np.float32)
        i = np.asarray(mesh["indices"], np.int32).reshape(-1, 3)
        t = np.asarray(
            mesh.get("tangents", _default_tangents(n)), np.float32
        )
        u = np.asarray(
            mesh.get("uv0", np.zeros((len(p), 2), np.float32)), np.float32
        )
        pos.append(p)
        nrm.append(n)
        tan.append(t if t.shape[1] == 4 else np.concatenate(
            [t, np.ones((len(t), 1), np.float32)], axis=1))
        uv.append(u)
        idx.append(i + voffset)
        mat.append(np.full((len(i),), mesh.get("material", 0), np.int32))
        obj.append(np.full((len(i),), mesh.get("object", k), np.int32))
        voffset += len(p)
    # numpy-backed — `make_scene` device-puts the assembled scene once
    return Geometry(
        positions=np.concatenate(pos),
        normals=np.concatenate(nrm),
        tangents=np.concatenate(tan),
        uv0=np.concatenate(uv),
        indices=np.concatenate(idx),
        tri_material=np.concatenate(mat),
        tri_object=np.concatenate(obj),
    )


def _default_tangents(normals: np.ndarray) -> np.ndarray:
    """Arbitrary valid tangents for meshes without UVs (Frisvad basis)."""
    n = normals
    s = np.where(n[:, 2] >= 0, 1.0, -1.0)
    a = -1.0 / (s + n[:, 2])
    b = n[:, 0] * n[:, 1] * a
    t = np.stack(
        [1.0 + s * n[:, 0] ** 2 * a, s * b, -s * n[:, 0]], axis=-1
    ).astype(np.float32)
    return np.concatenate([t, np.ones((len(n), 1), np.float32)], axis=1)
