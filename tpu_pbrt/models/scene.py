"""Scene: geometry + materials + environment light + emissive-light table.

Mirror of the reference scene graph's device-visible state (reference:
Source/Scene.ixx:32-104 — render objects, camera, environment light;
Shaders/ShadingHelpers.hlsli:11-30 — environment light evaluation with
constant color / texture / procedural sky fallback).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..ops import math as pmath
from ..ops import vec
from ..ops.vec import Vec3
from .material import MaterialTable
from .mesh import Geometry


class EnvironmentLight(NamedTuple):
    """color.a < 0 selects the procedural sky gradient fallback
    (reference: Shaders/ShadingHelpers.hlsli:25-29)."""
    color: jnp.ndarray        # (4,) rgba; a >= 0 -> constant color
    rotation: jnp.ndarray     # (3, 3) world->light rotation for textures
    texture: jnp.ndarray | None = None  # (H, W, 3) lat-long radiance or None


def make_environment(color=(-1.0, -1.0, -1.0, -1.0), rotation=None, texture=None) -> EnvironmentLight:
    rot = np.eye(3, dtype=np.float32) if rotation is None else np.asarray(rotation, np.float32)
    return EnvironmentLight(np.asarray(color, np.float32), rot,
                            None if texture is None else np.asarray(texture, np.float32))


def environment_radiance(env: EnvironmentLight, direction: Vec3) -> Vec3:
    """Evaluate the environment light for Vec3 directions
    (reference: Shaders/ShadingHelpers.hlsli:11-30)."""
    if env.texture is not None:
        rot = env.rotation
        d = vec.normalize(Vec3(
            rot[0, 0] * direction.x + rot[0, 1] * direction.y + rot[0, 2] * direction.z,
            rot[1, 0] * direction.x + rot[1, 1] * direction.y + rot[1, 2] * direction.z,
            rot[2, 0] * direction.x + rot[2, 1] * direction.y + rot[2, 2] * direction.z,
        ))
        uu = (1.0 + jnp.arctan2(d.x, d.z) / jnp.pi) * 0.5
        vv = jnp.arccos(jnp.clip(d.y, -1.0, 1.0)) / jnp.pi
        h, w = env.texture.shape[:2]
        # bilinear with u-wrap / v-clamp (the reference samples with a
        # hardware linear sampler, ShadingHelpers.hlsli:11-30)
        fx = uu * w - 0.5
        fy = vv * h - 0.5
        x0 = jnp.floor(fx).astype(jnp.int32)
        y0 = jnp.floor(fy).astype(jnp.int32)
        tx = fx - x0
        ty = fy - y0
        x1 = jnp.mod(x0 + 1, w)
        x0 = jnp.mod(x0, w)
        y1 = jnp.clip(y0 + 1, 0, h - 1)
        y0 = jnp.clip(y0, 0, h - 1)
        tex = env.texture.reshape(-1, 3)

        def tap(y, x):
            return vec.gather(tex, y * w + x)

        top = tap(y0, x0) * (1.0 - tx) + tap(y0, x1) * tx
        bot = tap(y1, x0) * (1.0 - tx) + tap(y1, x1) * tx
        return top * (1.0 - ty) + bot * ty
    # procedural sky: srgb->linear(lerp(1, skyblue, (y+1)/2))
    tsky = (direction.y + 1.0) * 0.5
    sky = Vec3(
        pmath.srgb_to_linear(1.0 - tsky * 0.5),
        pmath.srgb_to_linear(1.0 - tsky * 0.3),
        pmath.srgb_to_linear(jnp.ones_like(tsky)),
    )
    const = Vec3(
        jnp.broadcast_to(env.color[0], direction.shape),
        jnp.broadcast_to(env.color[1], direction.shape),
        jnp.broadcast_to(env.color[2], direction.shape),
    )
    return vec.where(env.color[3] >= 0.0, const, sky)


class EmissiveLights(NamedTuple):
    """Flattened emissive-triangle table for NEE / ReSTIR
    (reference: Source/LightPreparation.ixx:52-125, Shaders/Light.hlsli).
    Empty tables keep a single dummy row so shapes stay static."""
    tri_index: jnp.ndarray   # (L,) i32 into geometry triangles
    v0: jnp.ndarray          # (L, 3)
    e1: jnp.ndarray          # (L, 3)
    e2: jnp.ndarray          # (L, 3)
    normal: jnp.ndarray      # (L, 3) geometric (emitting side) normal
    radiance: jnp.ndarray    # (L, 3) emitted radiance
    area: jnp.ndarray        # (L,)
    power: jnp.ndarray       # (L,) luminance * area * pi (for power RIS)
    cdf: jnp.ndarray         # (L,) inclusive prefix sum of power / total
    tri_to_light: jnp.ndarray  # (T,) i32 — light id per triangle, -1 if none
    count: jnp.ndarray       # () i32 — actual number of lights


class Scene(NamedTuple):
    geometry: Geometry
    materials: MaterialTable
    environment: EnvironmentLight
    lights: EmissiveLights


def _average_emissive_texture(textures, texture_srgb, tex_idx, uv, ind, tris,
                              samples: int = 4):
    """(len(tris), 3) mean emissive-texture radiance over each triangle —
    the reference integrates the emissive map with SampleGrad over the UV
    edges when building triangle lights (LightPreparation.hlsl:88-127).
    Host numpy: a barycentric grid of `samples`^2 nearest taps per
    triangle, sRGB-decoded per the texture flag."""
    out = np.ones((len(tris), 3), np.float32)
    if not textures:
        return out
    # barycentric sample grid (uniform over the triangle)
    g = (np.arange(samples, dtype=np.float32) + 0.5) / samples
    a, b = np.meshgrid(g, g, indexing="ij")
    keep = a + b <= 1.0
    a, b = a[keep], b[keep]
    for k, t in enumerate(tris):
        ti = int(tex_idx[t])
        if ti < 0:
            continue
        img = np.asarray(textures[ti], np.float32) / 255.0
        if texture_srgb[ti]:
            img = np.where(img <= 0.04045, img / 12.92,
                           ((img + 0.055) / 1.055) ** 2.4)
        h, w = img.shape[:2]
        uv0, uv1, uv2 = uv[ind[t, 0]], uv[ind[t, 1]], uv[ind[t, 2]]
        us = uv0[0] + (uv1[0] - uv0[0]) * a + (uv2[0] - uv0[0]) * b
        vs = uv0[1] + (uv1[1] - uv0[1]) * a + (uv2[1] - uv0[1]) * b
        x = np.clip((np.mod(us, 1.0) * w).astype(np.int64), 0, w - 1)
        y = np.clip((np.mod(vs, 1.0) * h).astype(np.int64), 0, h - 1)
        out[k] = img[y, x, :3].mean(0)
    return out


def collect_emissive_lights(geometry: Geometry, materials: MaterialTable,
                            textures=None, texture_srgb=None) -> EmissiveLights:
    """Host-side light collection (the CPU count + GPU fill of
    LightPreparation.ixx:52-125 collapses to one vectorized pass). Pure
    numpy: eager device ops are pathologically slow over the axon tunnel,
    so scene build stays on the host and transfers once. When `textures`
    is given, textured emitters integrate their emissive map into
    radiance/power (LightPreparation.hlsl:88-127)."""
    pos = np.asarray(geometry.positions)  # no-op when numpy-backed
    ind = np.asarray(geometry.indices)
    v0, v1, v2 = pos[ind[:, 0]], pos[ind[:, 1]], pos[ind[:, 2]]
    num_tris = geometry.num_tris
    emissive = np.asarray(materials.emissive)[np.asarray(geometry.tri_material)]

    lum = emissive @ np.asarray([0.2126, 0.7152, 0.0722], np.float32)
    is_light = lum > 0.0
    idx = np.nonzero(is_light)[0].astype(np.int32)
    if idx.size == 0:
        z3 = np.zeros((1, 3), np.float32)
        return EmissiveLights(
            tri_index=np.zeros((1,), np.int32),
            v0=z3, e1=z3, e2=z3, normal=z3, radiance=z3,
            area=np.zeros((1,), np.float32),
            power=np.zeros((1,), np.float32),
            cdf=np.ones((1,), np.float32),
            tri_to_light=np.full((num_tris,), -1, np.int32),
            count=np.asarray(0, np.int32),
        )
    lv0 = v0[idx]
    le1 = v1[idx] - v0[idx]
    le2 = v2[idx] - v0[idx]
    cr = np.cross(le1, le2)
    crlen = np.maximum(np.linalg.norm(cr, axis=-1, keepdims=True), 1e-20)
    normal = cr / crlen
    area = 0.5 * crlen[:, 0]
    rad = emissive[idx]
    if textures:
        tex_idx = np.asarray(materials.texture_index)[
            np.asarray(geometry.tri_material), 1]  # emissive slot
        rad = rad * _average_emissive_texture(
            textures, texture_srgb, tex_idx, np.asarray(geometry.uv0),
            ind, idx)
    power = (rad @ np.asarray([0.2126, 0.7152, 0.0722], np.float32)) * area * np.pi
    cdf = np.cumsum(power) / max(float(power.sum()), 1e-20)
    tri_to_light = np.full((num_tris,), -1, np.int32)
    tri_to_light[idx] = np.arange(idx.size, dtype=np.int32)
    return EmissiveLights(
        tri_index=idx,
        v0=lv0, e1=le1, e2=le2,
        normal=normal.astype(np.float32),
        radiance=rad,
        area=area.astype(np.float32),
        power=power.astype(np.float32),
        cdf=cdf.astype(np.float32),
        tri_to_light=tri_to_light,
        count=np.asarray(idx.size, np.int32),
    )


def make_scene(geometry: Geometry, materials: MaterialTable,
               environment: EnvironmentLight | None = None,
               textures=None, texture_srgb=None) -> Scene:
    import jax

    env = environment if environment is not None else make_environment()
    scene = Scene(geometry, materials, env,
                  collect_emissive_lights(geometry, materials,
                                          textures, texture_srgb))
    # one bulk host->device transfer for the whole scene
    return jax.device_put(scene)
