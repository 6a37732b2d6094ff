"""G-buffer generation: primary visibility + surface attributes + motion.

Capability mirror of the reference's G-buffer pass
(reference: Shaders/GBufferGeneration.hlsl:117-232 — one primary raytrace
per pixel writing up to 13 channels gated by flags; Source/
GBufferGeneration.ixx:28-44). TPU design: one traversal over the pixel pool,
all channels produced as a NamedTuple of SoA arrays (XLA dead-code-eliminates
any channel the frame graph doesn't consume — the flag bits become free).

Motion vectors: static scenes reproject the hit's world position through the
*previous* camera (reference: GBufferGeneration.hlsl:62-91 uses per-vertex
mesh motion + previous instance transforms; the skinned-mesh delta is added
by the animation pass when enabled).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..models.mesh import interpolate_hit
from ..models.scene import Scene, environment_radiance
from ..ops import math as pmath, traverse
from ..render.camera import CameraData


class GBuffer(NamedTuple):
    """Per-pixel primary-surface attributes (all (R,) or (R, k))."""
    valid: jnp.ndarray            # (R,) bool — primary hit exists
    position: jnp.ndarray         # (R, 3) world position
    depth: jnp.ndarray            # (R,) linear view depth (+inf on miss)
    flat_normal: jnp.ndarray      # (R, 3)
    geometric_normal: jnp.ndarray # (R, 3) oriented, pre-flip
    shading_normal: jnp.ndarray   # (R, 3)
    is_front_face: jnp.ndarray    # (R,) bool
    base_color: jnp.ndarray       # (R, 3)
    metallic: jnp.ndarray         # (R,)
    roughness: jnp.ndarray        # (R,)
    ior: jnp.ndarray              # (R,)
    transmission: jnp.ndarray     # (R,)
    emission: jnp.ndarray         # (R, 3) — emissive at hit or env on miss
    motion: jnp.ndarray           # (R, 2) previous-frame pixel delta
    uv0: jnp.ndarray              # (R, 2)
    material: jnp.ndarray         # (R,) i32
    object_id: jnp.ndarray        # (R,) i32
    tri: jnp.ndarray              # (R,) i32
    bary: jnp.ndarray             # (R, 2)


def project_to_uv(cam: CameraData, world_pos: jnp.ndarray,
                  previous: bool = False) -> jnp.ndarray:
    """World position -> UV under the (previous) camera. Inverse of the
    FoV-scaled basis ray generation (Shaders/Camera.hlsli:27-30): the basis
    vectors are mutually orthogonal, so NDC recovers by projection."""
    pos, right, up, fwd = (
        (cam.prev_position, cam.prev_right, cam.prev_up, cam.prev_forward)
        if previous else (cam.position, cam.right, cam.up, cam.forward)
    )
    w = world_pos - pos
    sx = pmath.dot(w, right[None, :]) / jnp.maximum(pmath.dot(right, right), 1e-12)
    sy = pmath.dot(w, up[None, :]) / jnp.maximum(pmath.dot(up, up), 1e-12)
    sz = pmath.dot(w, fwd[None, :]) / jnp.maximum(pmath.dot(fwd, fwd), 1e-12)
    ndc_x = sx / jnp.maximum(sz, 1e-8)
    ndc_y = sy / jnp.maximum(sz, 1e-8)
    return jnp.stack([(ndc_x + 1.0) * 0.5, (1.0 - ndc_y) * 0.5], axis=-1)


def generate(tracer, scene: Scene, cam: CameraData,
             origin: jnp.ndarray, direction: jnp.ndarray,
             t_min, t_max, pixel_uv: jnp.ndarray,
             dims: tuple[int, int]) -> GBuffer:
    """Trace primary rays and fill the G-buffer. pixel_uv is the jittered UV
    each ray was generated from (for motion-vector deltas)."""
    hit = tracer.closest_hit(origin, direction, t_min, t_max)
    attrs = interpolate_hit(
        scene.geometry, hit.tri, hit.u, hit.v, origin, direction, hit.t
    )
    m = attrs.material
    mats = scene.materials

    env = environment_radiance(scene.environment, direction)
    emissive = pmath.gather_rows(mats.emissive, m)
    emission = jnp.where(hit.mask[:, None], emissive, env)

    # linear view depth = t * dot(dir, forward_unit)
    fwd = cam.forward / jnp.linalg.norm(cam.forward)
    depth = jnp.where(hit.mask, hit.t * pmath.dot(direction, fwd[None, :]),
                      jnp.inf)

    prev_uv = project_to_uv(cam, attrs.position, previous=True)
    wh = jnp.asarray(dims, jnp.float32)
    motion = jnp.where(
        hit.mask[:, None], (prev_uv - pixel_uv) * wh, 0.0
    )

    geometric = jnp.where(
        attrs.is_front_face[:, None], attrs.flat_normal, -attrs.flat_normal
    )

    return GBuffer(
        valid=hit.mask,
        position=attrs.position,
        depth=depth,
        flat_normal=attrs.flat_normal,
        geometric_normal=geometric,
        shading_normal=attrs.shading_normal,
        is_front_face=attrs.is_front_face,
        base_color=pmath.gather_rows(mats.base_color[:, :3], m),
        metallic=mats.metallic[m],
        roughness=mats.roughness[m],
        ior=mats.ior[m],
        transmission=jnp.where(mats.metallic[m] < 1.0, mats.transmission[m], 0.0),
        emission=emission,
        motion=motion,
        uv0=attrs.uv0,
        material=m,
        object_id=attrs.object_id,
        tri=hit.tri,
        bary=jnp.stack([hit.u, hit.v], axis=-1),
    )
