"""The application frame graph: every pass composed, history carried.

Capability mirror of the reference application core (reference:
Source/App.cpp:573-654 Render -> 1157-1329 RenderScene -> 1506-1571
PostProcessGraphics, with the Previous<->Current history swap at
App.cpp:629-634). Per frame, all inside one jit:

  1. jittered rays at render resolution (Halton, App.cpp:550-561)
  2. G-buffer (primary visibility + motion)
  3. ReSTIR DI -> (diffuse, specular) direct lighting      [optional]
  4. SHARC update at 1/downscale resolution + resolve      [optional]
  5. path trace (indirect; external-DI demux; SHARC query) [1 SPP default]
  6. composite direct + indirect
  7. denoise: demodulate -> temporal accumulate -> à-trous -> remodulate
  8. TAA resolve/upscale to output resolution (+ sharpen)
  9. bloom + tonemap -> display-ready linear or sRGB

The vendor NN stack (DLSS/XeSS/NIS/NRD) maps to the classical equivalents
per SURVEY.md §2.3: TAA upscale, sharpen, SVGF-class denoiser.
"""

from __future__ import annotations

import dataclasses
import os
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models.scene import Scene
from ..ops import tonemap, tracer as tracer_mod, traverse, vec
from ..ops.sampling import camera_jitter
from ..ops.vec import Vec3
from ..passes import bloom as bloom_mod
from ..passes import denoise as denoise_mod
from ..passes import gbuffer as gbuffer_mod
from ..passes import pathtrace
from ..passes import regir as regir_mod
from ..passes import restir as restir_mod
from ..passes import sharc as sharc_mod
from ..passes import taa as taa_mod
from ..utils import config as config_mod
from .camera import Camera, CameraData, generate_rays


# module-level so deployments with memory/time budget can raise it
SHARC_CAPACITY_CAP = 22


class FrameHistory(NamedTuple):
    """Cross-frame state (the reference's Previous* texture set)."""
    denoiser: denoise_mod.DenoiserState
    taa: taa_mod.TAAState
    restir: restir_mod.ReSTIRState
    sharc: sharc_mod.SHARCState


@dataclasses.dataclass
class App:
    """Owns scene + settings + history; `tick()` renders one frame
    (reference: App::Tick, App.cpp:150-192)."""
    scene: Scene
    camera: Camera
    settings: config_mod.GraphicsSettings
    textures: tuple | None = None  # (images, srgb flags) from the loader

    def __post_init__(self):
        s = self.settings
        self.out_w, self.out_h = s.width, s.height
        scale = s.post_processing.super_resolution_scale
        self.render_w = max(int(self.out_w * scale) // 2 * 2, 2)
        self.render_h = max(int(self.out_h * scale) // 2 * 2, 2)
        self.camera.aspect = self.out_w / self.out_h
        # the camera keeps its own FoV; settings.vertical_fov_deg applies
        # only when the caller built the camera from settings (__main__)

        tex, tex_srgb = (self.textures if self.textures else (None, None))
        self.tracer = tracer_mod.build_for_scene(
            self.scene, textures=tex, texture_srgb=tex_srgb)
        # the update-pool-only resolve (passes/sharc.py) costs O(P log P)
        # sorts + one row scatter regardless of capacity, so the reference
        # default 2^22 (Source/SHARC.ixx:48-57) ships as-is; above the cap
        # only table memory grows (~45 B/entry), clamped loudly.
        if s.raytracing.sharc_capacity_log2 > SHARC_CAPACITY_CAP:
            import warnings

            warnings.warn(
                f"sharc_capacity_log2={s.raytracing.sharc_capacity_log2} "
                f"clamped to {SHARC_CAPACITY_CAP} (per-frame sort cost; "
                f"raise tpu_pbrt.render.app.SHARC_CAPACITY_CAP to override)",
                stacklevel=2)
        self.sharc_settings = sharc_mod.SHARCSettings(
            capacity_log2=min(s.raytracing.sharc_capacity_log2,
                              SHARC_CAPACITY_CAP),
            scene_scale=s.raytracing.sharc_scene_scale,
            downscale=s.raytracing.sharc_downscale,
            roughness_threshold=s.raytracing.sharc_roughness_threshold,
        )
        self.restir_settings = restir_mod.ReSTIRSettings(
            initial_light_samples=s.raytracing.restir_local_light_samples,
            initial_brdf_samples=s.raytracing.restir_brdf_samples,
            local_light_mode=s.raytracing.restir_local_light_mode,
            temporal=s.raytracing.restir_temporal,
            spatial=s.raytracing.restir_spatial,
            temporal_bias_correction=(
                s.raytracing.restir_temporal_bias_correction),
            spatial_bias_correction=(
                s.raytracing.restir_spatial_bias_correction),
        )
        # ReGIR_RIS is the reference's default local-light mode
        # (MyAppData.h:212); the grid build is skipped when the scene has
        # no local lights — there is nothing to presample and the initial
        # sampler's power-CDF fallback is exact in that case — and, below
        # `regir_min_lights`, when the power-CDF draw IS already the
        # distribution the grid approximates (chained RIS over few lights
        # directly): presampling cannot reduce variance there and the
        # per-surface cell fetch cost ~25% of the flagship frame on a
        # 2-emitter Cornell (PARITY round-4 defaults A/B).
        n_local = int(np.asarray(self.scene.lights.count))
        self.regir_settings = (regir_mod.ReGIRSettings(
            cells_per_axis=s.raytracing.regir_cells_per_axis,
            lights_per_cell=s.raytracing.regir_lights_per_cell,
            build_candidates=s.raytracing.regir_build_candidates,
            cell_size=s.raytracing.regir_cell_size,
        ) if (s.raytracing.regir and n_local > 0
              and n_local >= s.raytracing.regir_min_lights) else None)
        self.pt_settings = pathtrace.PathTraceSettings(
            bounces=s.raytracing.bounces,
            samples_per_pixel=s.raytracing.samples_per_pixel,
            russian_roulette=s.raytracing.russian_roulette,
            # NEE stays on for secondary vertices — external_di only routes
            # the FIRST vertex's direct light through ReSTIR; BSDF-only
            # secondary direct would make the indirect signal spiky and the
            # denoiser/TAA would eat the outliers (energy loss)
            next_event_estimation=True,
            external_di=s.raytracing.restir_di,
            sharc_mode="query" if s.raytracing.sharc else "off",
            compaction_schedule=self._valid_schedule(
                s.raytracing.compaction_schedule),
            cone_spread=(self.camera.pixel_cone_spread(self.render_h)
                         if self.tracer.textured else 0.0),
        )
        self.history = self.reset_history()
        self.frame_index = 0
        self._step = jax.jit(self._frame)
        # discontinuity detection (reference: m_resetHistory,
        # App.cpp:677-689 — camera cuts / settings changes clear every
        # temporal buffer): remember the pose and a settings fingerprint
        pos = np.asarray(self.scene.geometry.positions)
        self._scene_diag = float(
            np.linalg.norm(pos.max(0) - pos.min(0))) if pos.size else 1.0
        self._last_pose = None
        self._settings_fp = repr(config_mod._to_dict(self.settings))

    # a teleport moves more than this fraction of the scene diagonal in one
    # tick, or swings the view by more than ~30 degrees
    TELEPORT_FRACTION = 0.15
    CUT_COS_ANGLE = 0.866

    def _check_discontinuity(self) -> bool:
        """True when the camera jumped or the settings changed since the
        last tick — the temporal history is then invalid and must reset
        (the reference's m_resetHistory triggers, App.cpp:677-689)."""
        fp = repr(config_mod._to_dict(self.settings))
        if fp != self._settings_fp:
            self._settings_fp = fp
            return True
        r, u, f = self.camera.directions()
        fn = np.asarray(f, np.float64)
        fn = fn / max(np.linalg.norm(fn), 1e-12)
        pose = (np.asarray(self.camera.position, np.float64).copy(), fn)
        last, self._last_pose = self._last_pose, pose
        if last is None:
            return False
        jump = np.linalg.norm(pose[0] - last[0])
        turn = float(np.dot(pose[1], last[1]))
        return (jump > self.TELEPORT_FRACTION * self._scene_diag
                or turn < self.CUT_COS_ANGLE)

    def _valid_schedule(self, schedule) -> tuple:
        """Trim compaction folds the internal-resolution pool can't honor
        (each fold halves the pool, so R must divide by 2**len)."""
        schedule = tuple(schedule)
        r = self.render_w * self.render_h
        while schedule and r % (2 ** len(schedule)):
            schedule = schedule[:-1]
        return schedule

    def reset_history(self) -> FrameHistory:
        """The reference's history reset on discontinuities
        (App.cpp:677-689 m_resetHistory)."""
        return FrameHistory(
            denoiser=denoise_mod.init_state(self.render_h, self.render_w),
            taa=taa_mod.init_state(self.out_h, self.out_w),
            restir=restir_mod.ReSTIRState.empty(
                self.render_w * self.render_h,
                pairwise=(self.restir_settings.temporal_bias_correction
                          != "basic")),
            sharc=sharc_mod.init_state(self.sharc_settings),
        )

    def tick(self, dt: float = 1 / 60):
        """Render one frame; returns (display linear (out_h, out_w, 3),
        rays traced)."""
        if self._check_discontinuity():
            self.history = self.reset_history()
        jit = (camera_jitter(self.frame_index, 64)
               if self.settings.camera_jitter else np.zeros(2, np.float32))
        cam = self.camera.data(jitter=jit)
        self.camera.snapshot_previous()
        out, rays, self.history = self._step(
            self.tracer, self.scene, cam, np.uint32(self.frame_index),
            self.history)
        self.frame_index += 1
        return out, rays

    def tonemapped_frame(self, dt: float = 1 / 60) -> np.ndarray:
        out, _ = self.tick(dt)
        return np.asarray(tonemap.to_srgb8(out))

    # ------------------------------------------------------------------
    def _debug_view(self, which: str, gb, cam: CameraData, rw, rh):
        """(out_h, out_w, 3) hashed-id coloring of SHARC voxels or ReGIR
        cells at the primary hit, dimmed by a simple n.v shade so geometry
        stays readable (the reference lerps the debug color over the
        shaded result the same way)."""
        from ..ops import rng as rng_mod

        if which == "sharc_voxels":
            key = sharc_mod.voxel_key(gb.position, gb.geometric_normal,
                                      cam.position, self.sharc_settings).lo
        else:  # regir_cells
            rs = self.regir_settings or regir_mod.ReGIRSettings()
            grid = regir_mod.ReGIRGrid(
                light=jnp.zeros((1,), jnp.int32),
                w=jnp.zeros((1,)),
                center=jnp.asarray(cam.position, jnp.float32))
            cell, inside = regir_mod.cell_of(grid, rs, gb.position)
            key = cell.astype(jnp.uint32)
        h1, h2, h3, _ = rng_mod.pcg4d(
            key, key >> jnp.uint32(8), key >> jnp.uint32(16),
            jnp.zeros_like(key))
        scale = jnp.float32(1.0 / 0xFFFFFFFF)
        fwd = vec.normalize(Vec3(cam.forward[0], cam.forward[1],
                                 cam.forward[2]))
        ndotv = jnp.abs(vec.dot(gb.shading_normal, fwd))
        shade = jnp.where(gb.valid, 0.35 + 0.65 * ndotv, 0.0)
        r_ = h1.astype(jnp.float32) * scale
        g_ = h2.astype(jnp.float32) * scale
        b_ = h3.astype(jnp.float32) * scale
        if which == "regir_cells":
            # out-of-grid surfaces (power-CDF fallback zone) render gray
            r_ = jnp.where(inside, r_, 0.4)
            g_ = jnp.where(inside, g_, 0.4)
            b_ = jnp.where(inside, b_, 0.4)
        img = jnp.stack([r_ * shade, g_ * shade, b_ * shade],
                        -1).reshape(rh, rw, 3)
        if (rw, rh) != (self.out_w, self.out_h):
            img = taa_mod._upscale_bilinear(img, self.out_h, self.out_w)
        return img

    def _frame(self, tracer, scene, cam: CameraData, frame,
               history: FrameHistory):
        s = self.settings
        rw, rh = self.render_w, self.render_h
        rays_total = jnp.zeros((), jnp.float32)

        origin, direction, t_min, t_max = generate_rays(cam, rw, rh)
        px = jnp.tile(jnp.arange(rw, dtype=jnp.uint32), rh)
        py = jnp.repeat(jnp.arange(rh, dtype=jnp.uint32), rw)
        pixel_u = (px.astype(jnp.float32) + 0.5 + cam.jitter[0]) / rw
        pixel_v = (py.astype(jnp.float32) + 0.5 + cam.jitter[1]) / rh

        # --- G-buffer
        with jax.named_scope("gbuffer"):
            gb = gbuffer_mod.generate(tracer, scene, cam, origin, direction,
                                      t_min, t_max, pixel_u, pixel_v,
                                      (rw, rh),
                                      cone_spread=self.pt_settings.cone_spread)
        rays_total = rays_total + rw * rh
        view = -direction

        # --- debug visualizations replace the shaded output
        # (reference: SHARC voxel coloring Raytracing.hlsl:279-284, ReGIR
        # cell visualization DIFinalShading.hlsl:69-75)
        if s.raytracing.debug_view != "none":
            img = self._debug_view(s.raytracing.debug_view, gb, cam, rw, rh)
            return img, rays_total, history

        # --- ReSTIR DI
        restir_state = history.restir
        if s.raytracing.restir_di:
            regir = None
            if self.regir_settings is not None:
                with jax.named_scope("regir"):
                    regir = (regir_mod.build(scene, cam.position, frame,
                                             self.regir_settings),
                             self.regir_settings)
            with jax.named_scope("restir"):
                ((di_diff, di_spec), restir_state,
                 restir_rays) = restir_mod.render_direct_lighting(
                    scene, gb, view, tracer, history.restir, px, py, frame,
                    rw, rh, self.restir_settings, regir=regir,
                    cam_pos=cam.position, cam_prev=cam.prev_position)
            di = di_diff + di_spec
            di_valid = (di.x > 0.0) | (di.y > 0.0) | (di.z > 0.0)
            rays_total = rays_total + restir_rays
        else:
            di = Vec3.zeros((rw * rh,))
            di_valid = jnp.zeros((rw * rh,), bool)

        # --- SHARC update + resolve
        sharc_state = history.sharc
        if s.raytracing.sharc:
            ds = self.sharc_settings.downscale
            uw, uh = max(rw // ds, 2), max(rh // ds, 2)
            uo, ud, ut0, ut1 = generate_rays(cam, uw, uh)
            upx = jnp.tile(jnp.arange(uw, dtype=jnp.uint32), uh)
            upy = jnp.repeat(jnp.arange(uh, dtype=jnp.uint32), uw)
            upd = dataclasses.replace(
                self.pt_settings, bounces=min(s.raytracing.bounces, 4),
                sharc_mode="off", external_di=False)
            with jax.named_scope("sharc_update"):
                keys, records, valid = pathtrace.trace_sharc_update(
                    tracer, scene, uo, ud, ut0, ut1, upx, upy, frame, upd,
                    self.sharc_settings, cam.position)
            with jax.named_scope("sharc_resolve"):
                # auto: full sorted resolve up to 2^20 capacity (r4f A/B:
                # 9.87 vs 9.09 fps at 2^20 — the sorted canonical table
                # beats the pool resolve when the sort fits the budget);
                # the update-pool-only resolve above that (it is what
                # makes the reference's 2^22 capacity affordable).
                mode = os.environ.get("TPU_PBRT_SHARC_RESOLVE", "auto")
                if mode == "auto":
                    mode = ("sorted"
                            if history.sharc.key_lo.shape[0] <= (1 << 20)
                            else "pool")
                resolve_fn = (sharc_mod.resolve_sorted
                              if mode == "sorted" else sharc_mod.resolve)
                sharc_state = resolve_fn(history.sharc, keys, records,
                                         valid, self.sharc_settings)
            rays_total = rays_total + uw * uh * (upd.bounces + 1)

        # --- path trace (indirect + env; DI handled above when enabled)
        fwd = vec.normalize(Vec3(cam.forward[0], cam.forward[1],
                                 cam.forward[2]))
        primary = traverse.Hit(
            t=jnp.where(gb.valid,
                        gb.depth / jnp.maximum(vec.dot(direction, fwd), 1e-8),
                        jnp.inf),
            u=gb.bary_u, v=gb.bary_v, tri=gb.tri)
        with jax.named_scope("pathtrace"):
            radiance, rays = pathtrace.render_sample_radiance(
                tracer, scene, origin, direction, t_min, t_max, px, py,
                frame, self.pt_settings, primary_hit=primary,
                sharc_state=sharc_state if s.raytracing.sharc else None,
                sharc_settings=(self.sharc_settings
                                if s.raytracing.sharc else None),
                camera_pos=cam.position,
                di_valid=di_valid,
            )
        rays_total = rays_total + rays
        signal = radiance + di

        img = signal.to_array().reshape(rh, rw, 3)

        # --- denoise (demodulate -> temporal -> à-trous -> remodulate)
        denoiser_state = history.denoiser
        if s.post_processing.denoiser != "none":
            nov = jnp.clip(-vec.dot(gb.shading_normal, direction), 0.0, 1.0)
            albedo = denoise_mod.demodulation_albedo(
                gb.base_color.to_array().reshape(rh, rw, 3),
                gb.metallic.reshape(rh, rw),
                gb.roughness.reshape(rh, rw), nov.reshape(rh, rw))
            motion = jnp.stack([gb.motion_x.reshape(rh, rw),
                                gb.motion_y.reshape(rh, rw)], -1)
            with jax.named_scope("denoise"):
                img, denoiser_state = denoise_mod.denoise_frame(
                    history.denoiser, img, albedo, gb.depth.reshape(rh, rw),
                    gb.shading_normal.to_array().reshape(rh, rw, 3), motion,
                    iterations=s.post_processing.denoiser_iterations)
        else:
            motion = jnp.stack([gb.motion_x.reshape(rh, rw),
                                gb.motion_y.reshape(rh, rw)], -1)

        # --- TAA upscale to output resolution
        taa_state = history.taa
        if s.post_processing.upscaler != "none":
            with jax.named_scope("taa"):
                img, taa_state = taa_mod.resolve(
                    history.taa, img, motion, self.out_h, self.out_w)
                if s.post_processing.sharpness > 0:
                    img = taa_mod.sharpen(img, s.post_processing.sharpness)
        elif (rw, rh) != (self.out_w, self.out_h):
            img = taa_mod._upscale_bilinear(img, self.out_h, self.out_w)

        # --- lens fx + bloom + tonemap (App.cpp:1769-1803; the
        # reference's pass order puts chromatic aberration before bloom)
        with jax.named_scope("bloom_tonemap"):
            if s.post_processing.chromatic_aberration > 0.0:
                from ..passes import postfx

                img = postfx.chromatic_aberration(
                    img, s.post_processing.chromatic_aberration)
            if s.post_processing.bloom:
                img = bloom_mod.apply(img, s.post_processing.bloom_strength)
            img = tonemap.apply(img, s.post_processing.tonemap_operator,
                                s.post_processing.exposure,
                                s.post_processing.hdr_paper_white_nits,
                                s.post_processing.hdr_color_rotation)

        history = FrameHistory(denoiser=denoiser_state, taa=taa_state,
                               restir=restir_state, sharc=sharc_state)
        return img, rays_total, history
