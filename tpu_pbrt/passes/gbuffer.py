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

from ..models.scene import Scene, environment_radiance
from ..ops import shade_table, vec
from ..ops.vec import Vec3
from ..render.camera import CameraData


class GBuffer(NamedTuple):
    """Per-pixel primary-surface attributes (SoA: Vec3 + (R,) scalars)."""
    valid: jnp.ndarray            # (R,) bool — primary hit exists
    position: Vec3                # world position
    depth: jnp.ndarray            # (R,) linear view depth (+inf on miss)
    flat_normal: Vec3
    geometric_normal: Vec3        # oriented to the front face
    shading_normal: Vec3
    is_front_face: jnp.ndarray    # (R,) bool
    base_color: Vec3
    metallic: jnp.ndarray         # (R,)
    roughness: jnp.ndarray        # (R,)
    ior: jnp.ndarray              # (R,)
    transmission: jnp.ndarray     # (R,)
    emission: Vec3                # emissive at hit or env on miss
    motion_x: jnp.ndarray         # (R,) previous-frame pixel delta
    motion_y: jnp.ndarray         # (R,)
    uv0_u: jnp.ndarray            # (R,)
    uv0_v: jnp.ndarray            # (R,)
    material: jnp.ndarray         # (R,) i32
    object_id: jnp.ndarray        # (R,) i32
    tri: jnp.ndarray              # (R,) i32
    bary_u: jnp.ndarray           # (R,)
    bary_v: jnp.ndarray           # (R,)


def project_to_uv(cam: CameraData, world_pos: Vec3, previous: bool = False):
    """World position -> (u, v) under the (previous) camera. Inverse of the
    FoV-scaled basis ray generation (Shaders/Camera.hlsli:27-30): the basis
    vectors are mutually orthogonal, so NDC recovers by projection."""
    pos, right, up, fwd = (
        (cam.prev_position, cam.prev_right, cam.prev_up, cam.prev_forward)
        if previous else (cam.position, cam.right, cam.up, cam.forward)
    )
    w = world_pos - Vec3(pos[0], pos[1], pos[2])
    rv = Vec3(right[0], right[1], right[2])
    uv_ = Vec3(up[0], up[1], up[2])
    fv = Vec3(fwd[0], fwd[1], fwd[2])
    sx = vec.dot(w, rv) / jnp.maximum(vec.dot(rv, rv), 1e-12)
    sy = vec.dot(w, uv_) / jnp.maximum(vec.dot(uv_, uv_), 1e-12)
    sz = vec.dot(w, fv) / jnp.maximum(vec.dot(fv, fv), 1e-12)
    ndc_x = sx / jnp.maximum(sz, 1e-8)
    ndc_y = sy / jnp.maximum(sz, 1e-8)
    return (ndc_x + 1.0) * 0.5, (1.0 - ndc_y) * 0.5


def generate(tracer, scene: Scene, cam: CameraData,
             origin: Vec3, direction: Vec3,
             t_min, t_max, pixel_u: jnp.ndarray, pixel_v: jnp.ndarray,
             dims: tuple[int, int], cone_spread: float = 0.0) -> GBuffer:
    """Trace primary rays and fill the G-buffer. pixel_u/v is the jittered
    UV each ray was generated from (for motion-vector deltas).
    cone_spread > 0 enables mip-aware texture fetches (one pixel's ray-cone
    angle; the screen-space-derivative analogue of GBufferGeneration.hlsl's
    hardware Sample)."""
    hit = tracer.closest_hit(origin, direction, t_min, t_max)
    attrs = shade_table.fetch(
        tracer.shade_table, jnp.maximum(hit.tri, 0), origin, direction
    )
    if tracer.textured:
        fp = cone_spread * jnp.maximum(hit.t, 0.0) if cone_spread > 0 else None
        attrs = shade_table.apply_textures(tracer.atlas, attrs, footprint=fp)
    env = environment_radiance(scene.environment, direction)
    emission = vec.where(hit.mask, attrs.emission, env)

    # linear view depth = t * dot(dir, forward_unit)
    fwd = vec.normalize(Vec3(cam.forward[0], cam.forward[1], cam.forward[2]))
    depth = jnp.where(hit.mask, hit.t * vec.dot(direction, fwd), jnp.inf)

    prev_u, prev_v = project_to_uv(cam, attrs.prev_position, previous=True)
    w, h = dims
    motion_x = jnp.where(hit.mask, (prev_u - pixel_u) * w, 0.0)
    motion_y = jnp.where(hit.mask, (prev_v - pixel_v) * h, 0.0)

    geometric = vec.where(attrs.is_front_face, attrs.flat_normal,
                          -attrs.flat_normal)

    return GBuffer(
        valid=hit.mask,
        position=attrs.position,
        depth=depth,
        flat_normal=attrs.flat_normal,
        geometric_normal=geometric,
        shading_normal=attrs.shading_normal,
        is_front_face=attrs.is_front_face,
        base_color=attrs.base_color,
        metallic=attrs.metallic,
        roughness=attrs.roughness,
        ior=attrs.ior,
        transmission=attrs.transmission,
        emission=emission,
        motion_x=motion_x,
        motion_y=motion_y,
        uv0_u=attrs.uv_u,
        uv0_v=attrs.uv_v,
        material=attrs.material,
        object_id=attrs.object_id,
        tri=hit.tri,
        bary_u=hit.u,
        bary_v=hit.v,
    )
