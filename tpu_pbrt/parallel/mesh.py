"""Device-mesh pixel sharding.

The reference is single-GPU; its SIMT data parallelism over pixels
(reference: Source/Raytracing.ixx:228-249 DispatchRays(W,H,1)) is exactly
the axis we scale across TPU chips (SURVEY.md §2.4): the ray pool is sharded
over a 1-D `jax.sharding.Mesh` with `shard_map`, the scene + BVH are
replicated, and each chip path-traces its pixel tile independently — zero
per-bounce communication; the only collective is the implicit framebuffer
assembly at the output sharding boundary.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..models.scene import Scene
from ..passes import pathtrace
from ..render.camera import CameraData, generate_rays

PIXEL_AXIS = "px"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (PIXEL_AXIS,))


def render_sharded(tracer, scene: Scene, cam: CameraData, frame, *,
                   width: int, height: int,
                   settings: pathtrace.PathTraceSettings, mesh: Mesh):
    """Render one frame with the pixel dimension sharded over `mesh`.

    Row count must be divisible by the mesh size (pad the image if not);
    returns ((H, W, 3) radiance replicated layout-wise by JAX, rays traced).
    """
    n = mesh.devices.size
    assert (width * height) % n == 0, (
        f"pixel count {width * height} not divisible by mesh size {n}"
    )

    origin, direction, t_min, t_max = generate_rays(cam, width, height)
    px = jnp.tile(jnp.arange(width, dtype=jnp.uint32), height)
    py = jnp.repeat(jnp.arange(height, dtype=jnp.uint32), width)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(PIXEL_AXIS), P(PIXEL_AXIS), P(PIXEL_AXIS),
                  P(PIXEL_AXIS), P(PIXEL_AXIS), P(PIXEL_AXIS), P()),
        out_specs=(P(PIXEL_AXIS), P()),
        check_rep=False,
    )
    def shard_trace(scene_and_tracer, o, d, tmin, tmax, sx, sy, frm):
        trc, sc = scene_and_tracer
        rad, rays = pathtrace.render_sample_radiance(
            trc, sc, o, d, tmin, tmax, sx, sy, frm, settings
        )
        # total rays across chips (ICI psum — the only collective)
        rays = jax.lax.psum(rays, PIXEL_AXIS)
        return rad, rays

    radiance, rays = shard_trace(
        (tracer, scene), origin, direction, t_min, t_max, px, py,
        jnp.asarray(frame, jnp.uint32),
    )
    return radiance.to_array().reshape(height, width, 3), rays


def jit_render_sharded(settings: pathtrace.PathTraceSettings, mesh: Mesh,
                       width: int, height: int):
    """Jitted closure for the sharded frame function."""
    def fn(tracer, scene, cam, frame):
        return render_sharded(
            tracer, scene, cam, frame,
            width=width, height=height, settings=settings, mesh=mesh,
        )
    return jax.jit(fn)
