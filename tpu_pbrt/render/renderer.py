"""Renderer: ties scene -> BVH -> per-frame jitted render graph.

The TPU analogue of the reference's App frame orchestration
(reference: Source/App.cpp:573-654 Render / 1157-1329 RenderScene /
1506-1571 PostProcess): one jitted function per frame configuration, with
progressive accumulation for offline convergence and Halton camera jitter.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..models.scene import Scene
from ..ops import math as pmath
from ..ops import tonemap, tracer as tracer_mod, traverse, vec
from ..ops.sampling import camera_jitter
from ..passes import gbuffer as gbuffer_mod
from ..passes import pathtrace
from .camera import Camera, CameraData, generate_rays


@dataclasses.dataclass
class Renderer:
    scene: Scene
    width: int
    height: int
    settings: pathtrace.PathTraceSettings = dataclasses.field(
        default_factory=pathtrace.PathTraceSettings
    )

    def __post_init__(self):
        self.tracer = tracer_mod.build_for_scene(self.scene)
        self._render_frame = jax.jit(
            functools.partial(_render_frame, settings=self.settings),
            static_argnames=("width", "height", "with_gbuffer"),
        )

    def render(self, camera: Camera, frame_index: int = 0,
               jitter: bool = False) -> jnp.ndarray:
        """One frame of linear radiance, (H, W, 3)."""
        img, _ = self.render_with_stats(camera, frame_index, jitter)
        return img

    def render_with_stats(self, camera: Camera, frame_index: int = 0,
                          jitter: bool = False):
        """(radiance image, rays traced) — ray count feeds Mrays/s metrics."""
        jit = camera_jitter(frame_index, 64) if jitter else np.zeros(2, np.float32)
        cam = camera.data(jitter=jit)
        return self._render_frame(
            self.tracer, self.scene, cam,
            np.uint32(frame_index),
            width=self.width, height=self.height,
        )

    def render_accumulated(self, camera: Camera, frames: int,
                           jitter: bool = True) -> jnp.ndarray:
        """Progressive accumulation over `frames` (offline converged render —
        stands in for letting the reference app sit still and accumulate)."""
        acc = jnp.zeros((self.height, self.width, 3))
        for f in range(frames):
            acc = acc + self.render(camera, f, jitter=jitter)
        return acc / frames

    def render_mean(self, camera: Camera, frames: int,
                    frame_offset: int = 0) -> jnp.ndarray:
        """Average of `frames` un-jittered frames computed inside ONE jit
        (a fori over the frame index) — per-call dispatch overhead is paid
        once, which matters for Monte-Carlo-heavy tests and offline runs."""
        cam = camera.data()

        def run(tracer, scene, cam):
            def body(i, acc):
                img, _ = _render_frame(
                    tracer, scene, cam,
                    (i + frame_offset).astype(jnp.uint32),
                    width=self.width, height=self.height,
                    settings=self.settings,
                )
                return acc + img
            acc = jax.lax.fori_loop(
                0, frames, body, jnp.zeros((self.height, self.width, 3)))
            return acc / frames

        return jax.jit(run)(self.tracer, self.scene, cam)

    def tonemapped(self, linear_hdr: jnp.ndarray, operator: str = "aces",
                   exposure: float = 1.0) -> np.ndarray:
        img = tonemap.apply(linear_hdr, operator, exposure)
        return np.asarray(tonemap.to_srgb8(img))


def _render_frame(tracer, scene: Scene, cam: CameraData, frame,
                  *, width: int, height: int,
                  settings: pathtrace.PathTraceSettings,
                  with_gbuffer: bool = False):
    """Frame graph: G-buffer (primary visibility) -> path trace reusing the
    primary hit — mirrors the reference pass wiring (App.cpp:1157-1329)."""
    origin, direction, t_min, t_max = generate_rays(cam, width, height)
    px = jnp.tile(jnp.arange(width, dtype=jnp.uint32), height)
    py = jnp.repeat(jnp.arange(height, dtype=jnp.uint32), width)

    pixel_u = (px.astype(jnp.float32) + 0.5 + cam.jitter[0]) / width
    pixel_v = (py.astype(jnp.float32) + 0.5 + cam.jitter[1]) / height
    with jax.named_scope("gbuffer"):
        gb = gbuffer_mod.generate(
            tracer, scene, cam, origin, direction, t_min, t_max,
            pixel_u, pixel_v, (width, height),
            cone_spread=settings.cone_spread,
        )
    fwd = vec.normalize(
        vec.Vec3(cam.forward[0], cam.forward[1], cam.forward[2])
    )
    primary = traverse.Hit(
        t=jnp.where(
            gb.valid,
            gb.depth / jnp.maximum(vec.dot(direction, fwd), 1e-8),
            jnp.inf,
        ),
        u=gb.bary_u, v=gb.bary_v, tri=gb.tri,
    )
    with jax.named_scope("pathtrace"):
        radiance, ray_count = pathtrace.render_sample_radiance(
            tracer, scene, origin, direction, t_min, t_max, px, py, frame,
            settings, primary_hit=primary,
        )
    ray_count = ray_count + origin.shape[0]  # the G-buffer primary rays
    out = radiance.to_array().reshape(height, width, 3)
    if with_gbuffer:
        return out, ray_count, gb
    return out, ray_count


def render_frame_sharc(tracer, scene: Scene, cam: CameraData, frame,
                       sharc_state, *, width: int, height: int,
                       settings: pathtrace.PathTraceSettings,
                       sharc_settings=None):
    """SHARC frame (reference: Source/Raytracing.ixx:114-148): a downscaled
    update trace fills the hash grid, resolve merges it, and the full-res
    trace queries the fresh cache; the state double-buffers across frames.

    Returns (radiance (H, W, 3), rays, new sharc state)."""
    from ..passes import sharc as sharc_mod

    s = sharc_settings or sharc_mod.SHARCSettings()
    ds = s.downscale
    uw, uh = max(width // ds, 1), max(height // ds, 1)

    # --- update pass at reduced resolution, jittered (Raytracing.hlsl:112)
    up_cam = cam
    uo, ud, utmin, utmax = generate_rays(up_cam, uw, uh)
    upx = jnp.tile(jnp.arange(uw, dtype=jnp.uint32), uh)
    upy = jnp.repeat(jnp.arange(uh, dtype=jnp.uint32), uw)
    upd_settings = dataclasses.replace(settings, bounces=min(settings.bounces, 4))
    keys, records, valid = pathtrace.trace_sharc_update(
        tracer, scene, uo, ud, utmin, utmax, upx, upy, frame, upd_settings,
        s, cam.position,
    )
    new_state = None
    from ..passes import sharc as sharc_mod2

    new_state = sharc_mod2.resolve(sharc_state, keys, records, valid, s)

    # --- full-res query render
    origin, direction, t_min, t_max = generate_rays(cam, width, height)
    px = jnp.tile(jnp.arange(width, dtype=jnp.uint32), height)
    py = jnp.repeat(jnp.arange(height, dtype=jnp.uint32), width)
    q_settings = dataclasses.replace(settings, sharc_mode="query")
    radiance, _, _, rays = pathtrace.trace(
        tracer, scene, origin, direction, t_min, t_max, px, py, frame,
        q_settings, sharc_state=new_state, sharc_settings=s,
        camera_pos=cam.position,
    )
    img = radiance.to_array().reshape(height, width, 3)
    rays = rays + uw * uh * (upd_settings.bounces + 1)
    return img, rays, new_state
