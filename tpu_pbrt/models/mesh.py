"""Triangle geometry SoA + hit-point attribute interpolation.

Replaces the reference's bindless vertex fetch path (reference:
Shaders/RaytracingHelpers.hlsli:59-133 CastRay attribute loads,
Shaders/Vertex.hlsli attribute interpolation, Source/Model.ixx:26-49 Mesh
buffers). Geometry lives as flat device arrays; a hit is shaded by gathering
the 3 vertices of the hit triangle and lerping with barycentrics — exactly
what the HLSL does from ByteAddressBuffers, but as batched `take` ops.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..ops import math as pmath
from ..ops import vec
from ..ops.vec import Vec3
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


class HitAttributes(NamedTuple):
    """Interpolated surface attributes at hit points (HitInfo analogue,
    Shaders/HitInfo.hlsli:7-99). SoA: vectors are Vec3 of (R,) components."""
    position: Vec3
    flat_normal: Vec3              # geometric (triangle plane) normal
    shading_normal: Vec3           # interpolated vertex normal
    tangent: Vec3
    uv0_u: jnp.ndarray             # (R,)
    uv0_v: jnp.ndarray             # (R,)
    is_front_face: jnp.ndarray     # (R,) bool
    material: jnp.ndarray          # (R,) i32
    object_id: jnp.ndarray         # (R,) i32


def interpolate_hit(geom: Geometry, tri: jnp.ndarray, u: jnp.ndarray,
                    v: jnp.ndarray, ray_origin: Vec3,
                    ray_dir: Vec3, t: jnp.ndarray) -> HitAttributes:
    """Gather + lerp surface attributes for hit triangles.

    `tri` may contain -1 (miss); those lanes produce valid-but-meaningless
    values the caller must mask. Front-face test and normal flipping follow
    the reference (Shaders/HitInfo.hlsli:46-64: shading normal is flipped to
    oppose the ray when back-facing; geometric normal keeps object
    orientation)."""
    tid = jnp.maximum(tri, 0)
    i0 = geom.indices[:, 0][tid]
    i1 = geom.indices[:, 1][tid]
    i2 = geom.indices[:, 2][tid]
    p0 = vec.gather(geom.positions, i0)
    p1 = vec.gather(geom.positions, i1)
    p2 = vec.gather(geom.positions, i2)
    w = 1.0 - u - v

    # Recompute the position from barycentrics (more robust than o + t*d).
    position = p0 * w + p1 * u + p2 * v

    flat = vec.normalize(vec.cross(p1 - p0, p2 - p0))

    n0 = vec.gather(geom.normals, i0)
    n1 = vec.gather(geom.normals, i1)
    n2 = vec.gather(geom.normals, i2)
    shading = vec.normalize(n0 * w + n1 * u + n2 * v)

    t0 = vec.gather(geom.tangents, i0)
    t1 = vec.gather(geom.tangents, i1)
    t2 = vec.gather(geom.tangents, i2)
    tangent = vec.normalize(t0 * w + t1 * u + t2 * v)

    uv_u = geom.uv0[:, 0][i0] * w + geom.uv0[:, 0][i1] * u + geom.uv0[:, 0][i2] * v
    uv_v = geom.uv0[:, 1][i0] * w + geom.uv0[:, 1][i1] * u + geom.uv0[:, 1][i2] * v

    # Orient the flat normal with the interpolated one so both agree on the
    # "geometric" side, then resolve front-face against the ray.
    flat = vec.where(vec.dot(flat, shading) < 0.0, -flat, flat)
    front = vec.dot(flat, ray_dir) < 0.0
    shading = vec.where(front, shading, -shading)

    return HitAttributes(
        position=position,
        flat_normal=flat,
        shading_normal=shading,
        tangent=tangent,
        uv0_u=uv_u,
        uv0_v=uv_v,
        is_front_face=front,
        material=geom.tri_material[tid],
        object_id=geom.tri_object[tid],
    )


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
