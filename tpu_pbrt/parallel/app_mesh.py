"""Multi-chip FULL frame graph: G-buffer + ReSTIR DI + SHARC + path trace
sharded over the pixel rows, post-processing replicated.

Extends the bare sharded path tracer (parallel/mesh.py) to the complete
App pipeline (SURVEY.md §2.4 plan; reference single-GPU frame:
Source/App.cpp:573-654). Sharding layout:

  * scene / tracer / camera / SHARC table: replicated
  * main pixel pool + ReSTIR reservoirs: sharded by ROWS of the render
    target (P("px") on the flat pixel axis — row-contiguous, so each
    chip's tile is a horizontal band)
  * ReSTIR temporal/spatial reuse runs per-tile with a HALO EXCHANGE:
    one ppermute each way ships ceil(spatial_radius) boundary rows of
    the packed tap array to the adjacent shards, so seam pixels resample
    true neighbor-tile reservoirs (no tile-edge bias; temporal taps
    whose reprojection exceeds the halo fall back to rejection, the
    same as any disocclusion)
  * SHARC update pool: sharded; the per-vertex records are all-gathered
    over ICI before the sort+segment-reduce resolve so every chip holds
    the identical resolved cache (the cache is read-only during query)
  * the SVGF denoiser (temporal + à-trous) runs SHARDED with the same
    halo contract: the temporal reprojection exchanges 8 boundary rows
    (beyond-halo reprojection = disocclusion), each à-trous iteration
    exchanges its own 2*step rows — filtered bands are bit-identical to
    the single-device filter (the replicated post tail measured 31% of
    frame FLOPs before this; tools/mesh_overhead.py)
  * TAA upscale / bloom / tonemap: replicated on the assembled image
    (bloom is a global pyramid; both are cheap relative to tracing)

The only collectives: ppermutes for the ReSTIR + denoiser halos, one
all_gather for SHARC records, one all_gather at the radiance boundary
(implicit via out_specs), one psum for ray stats.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops import tonemap, traverse, vec
from ..ops.vec import Vec3
from ..passes import bloom as bloom_mod
from ..passes import denoise as denoise_mod
from ..passes import gbuffer as gbuffer_mod
from ..passes import pathtrace
from ..passes import regir as regir_mod
from ..passes import restir as restir_mod
from ..passes import sharc as sharc_mod
from ..passes import taa as taa_mod
from ..render.camera import generate_rays
from .mesh import PIXEL_AXIS


def _valid_schedule(schedule, r_local):
    schedule = tuple(schedule)
    while schedule and r_local % (2 ** len(schedule)):
        schedule = schedule[:-1]
    return schedule


def jit_app_sharded(app, mesh: Mesh):
    """Build the jitted sharded frame step for an App.

    Returns fn(tracer, scene, cam, frame, history) -> (img, rays, history)
    with history.restir sharded over the mesh and everything else
    replicated — same signature/semantics as App._frame."""
    n = int(mesh.devices.size)
    s = app.settings
    rw, rh = app.render_w, app.render_h
    assert rh % n == 0, f"render height {rh} not divisible by mesh size {n}"
    rows_local = rh // n
    r_local = rows_local * rw

    pt_settings = dataclasses.replace(
        app.pt_settings,
        compaction_schedule=_valid_schedule(
            app.pt_settings.compaction_schedule, r_local))

    ds = app.sharc_settings.downscale
    uw, uh = max(rw // ds, 2), max(rh // ds, 2)
    upool = uw * uh
    upad = (-upool) % n
    upool_p = upool + upad

    pairwise_t = app.restir_settings.temporal_bias_correction != "basic"
    spec_state = restir_mod.ReSTIRState(
        reservoir=restir_mod.Reservoir(*([P(PIXEL_AXIS)] * 6)),
        depth=P(PIXEL_AXIS),
        normal=Vec3(P(PIXEL_AXIS), P(PIXEL_AXIS), P(PIXEL_AXIS)),
        surface=P(PIXEL_AXIS) if pairwise_t else P(),
    )
    spec_denoiser = denoise_mod.DenoiserState(
        *([P(PIXEL_AXIS)] * 5))   # (H, W, ...) row bands

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), spec_state, P(), spec_denoiser),
        out_specs=(P(PIXEL_AXIS), P(), spec_state, P(), spec_denoiser,
                   P(PIXEL_AXIS)),
        check_rep=False,
    )
    def heavy(tracer_scene, cam, frame, restir_state, sharc_state,
              denoiser_state):
        tracer, scene = tracer_scene
        shard = jax.lax.axis_index(PIXEL_AXIS)
        rays_total = jnp.zeros((), jnp.float32)

        # --- local pixel tile (a band of rows)
        row0 = shard * rows_local
        px = jnp.tile(jnp.arange(rw, dtype=jnp.uint32), rows_local)
        py_local = jnp.repeat(jnp.arange(rows_local, dtype=jnp.uint32), rw)
        py = py_local + row0.astype(jnp.uint32)
        pixel_u = (px.astype(jnp.float32) + 0.5 + cam.jitter[0]) / rw
        pixel_v = (py.astype(jnp.float32) + 0.5 + cam.jitter[1]) / rh
        ndc_x = pixel_u * 2.0 - 1.0
        ndc_y = 1.0 - pixel_v * 2.0
        origin, direction, t_min, t_max = generate_rays(
            cam, rw, rh, ndc=(ndc_x, ndc_y))

        gb = gbuffer_mod.generate(tracer, scene, cam, origin, direction,
                                  t_min, t_max, pixel_u, pixel_v, (rw, rh),
                                  cone_spread=app.pt_settings.cone_spread)
        rays_total = rays_total + r_local
        view = -direction

        # --- ReSTIR DI (per-tile reuse + halo exchange at tile seams:
        # one ppermute each way of the packed tap rows lets seam pixels
        # read true neighbor-tile reservoirs instead of rejecting them)
        if s.raytracing.restir_di:
            pad = max(int(np.ceil(app.restir_settings.spatial_radius)), 1)
            pad = min(pad, rows_local)

            def halo_extend(packed):
                top = packed[:pad * rw]
                bot = packed[-pad * rw:]
                up = jax.lax.ppermute(          # my top halo = above's bottom
                    bot, PIXEL_AXIS, [(i, i + 1) for i in range(n - 1)])
                dn = jax.lax.ppermute(          # my bottom halo = below's top
                    top, PIXEL_AXIS, [(i + 1, i) for i in range(n - 1)])
                return jnp.concatenate([up, packed, dn], axis=0)

            halo = {"extend": halo_extend, "pad": pad,
                    "row0": row0.astype(jnp.float32), "total_h": rh}
            # ReGIR grid: world-space and pixel-independent, so each chip
            # builds the identical grid from replicated inputs (65k-lane
            # build; cheaper than shipping it over ICI)
            regir = None
            if app.regir_settings is not None:
                regir = (regir_mod.build(scene, cam.position, frame,
                                         app.regir_settings),
                         app.regir_settings)
            ((di_diff, di_spec), restir_state,
             restir_rays) = restir_mod.render_direct_lighting(
                scene, gb, view, tracer, restir_state, px, py, frame,
                rw, rows_local, app.restir_settings, py_grid=py_local,
                cam_pos=cam.position, cam_prev=cam.prev_position,
                halo=halo, regir=regir)
            di = di_diff + di_spec
            di_valid = (di.x > 0.0) | (di.y > 0.0) | (di.z > 0.0)
            rays_total = rays_total + restir_rays
        else:
            di = Vec3.zeros((r_local,))
            di_valid = jnp.zeros((r_local,), bool)

        # --- SHARC: sharded update pool -> all_gather -> replicated resolve
        if s.raytracing.sharc:
            chunk = upool_p // n
            flat0 = shard * chunk
            uflat = flat0 + jnp.arange(chunk, dtype=jnp.uint32)
            uvalid_px = uflat < upool
            upx = jnp.where(uvalid_px, uflat % uw, 0).astype(jnp.uint32)
            upy = jnp.where(uvalid_px, uflat // uw, 0).astype(jnp.uint32)
            uu = (upx.astype(jnp.float32) + 0.5) / uw
            uv = (upy.astype(jnp.float32) + 0.5) / uh
            uo, ud, ut0, ut1 = generate_rays(
                cam, uw, uh, ndc=(uu * 2.0 - 1.0, 1.0 - uv * 2.0))
            upd = dataclasses.replace(
                pt_settings, bounces=min(s.raytracing.bounces, 4),
                sharc_mode="off", external_di=False,
                compaction_schedule=())
            keys, records, valid = pathtrace.trace_sharc_update(
                tracer, scene, uo, ud, ut0,
                jnp.where(uvalid_px, ut1, -jnp.inf), upx, upy, frame, upd,
                app.sharc_settings, cam.position)
            # ICI all_gather: every chip resolves the identical cache
            keys = sharc_mod.VoxelKey(
                lo=jax.lax.all_gather(keys.lo, PIXEL_AXIS).reshape(-1),
                hi=jax.lax.all_gather(keys.hi, PIXEL_AXIS).reshape(-1))
            valid = jax.lax.all_gather(valid, PIXEL_AXIS).reshape(-1)
            records = Vec3(
                jax.lax.all_gather(records.x, PIXEL_AXIS).reshape(-1),
                jax.lax.all_gather(records.y, PIXEL_AXIS).reshape(-1),
                jax.lax.all_gather(records.z, PIXEL_AXIS).reshape(-1),
            )
            sharc_state = sharc_mod.resolve(sharc_state, keys, records,
                                            valid, app.sharc_settings)
            rays_total = rays_total + chunk * (upd.bounces + 1)

        # --- path trace the tile
        fwd = vec.normalize(Vec3(cam.forward[0], cam.forward[1],
                                 cam.forward[2]))
        primary = traverse.Hit(
            t=jnp.where(gb.valid,
                        gb.depth / jnp.maximum(vec.dot(direction, fwd),
                                               1e-8),
                        jnp.inf),
            u=gb.bary_u, v=gb.bary_v, tri=gb.tri)
        radiance, rays = pathtrace.render_sample_radiance(
            tracer, scene, origin, direction, t_min, t_max, px, py, frame,
            pt_settings, primary_hit=primary,
            sharc_state=sharc_state if s.raytracing.sharc else None,
            sharc_settings=(app.sharc_settings
                            if s.raytracing.sharc else None),
            camera_pos=cam.position,
            di_valid=di_valid,
        )
        rays_total = rays_total + rays
        signal = radiance + di

        img_local = signal.to_array().reshape(rows_local, rw, 3)
        motion_local = jnp.stack([gb.motion_x.reshape(rows_local, rw),
                                  gb.motion_y.reshape(rows_local, rw)], -1)

        # --- denoiser: sharded with per-iteration halo exchange (the
        # replicated post tail measured 31% of frame FLOPs on the virtual
        # mesh — tools/mesh_overhead.py; the denoiser is nearly all of it)
        if s.post_processing.denoiser != "none":
            def extend2d(x, pad):
                """Band + `pad` neighbor rows each side; edge replication
                at the global top/bottom (matches jnp.pad mode='edge').
                Multi-band pads (tiny test images) take a tiled
                all_gather + clamped row slice instead of multi-hop
                permutes — same values, never hit at production sizes."""
                if pad >= rows_local:
                    full = jax.lax.all_gather(x, PIXEL_AXIS, axis=0,
                                              tiled=True)
                    idx = jnp.clip(
                        jnp.arange(-pad, rows_local + pad) + row0, 0,
                        rh - 1)
                    return full[idx]
                top, bot = x[:pad], x[rows_local - pad:]
                up = jax.lax.ppermute(
                    bot, PIXEL_AXIS, [(i, i + 1) for i in range(n - 1)])
                dn = jax.lax.ppermute(
                    top, PIXEL_AXIS, [(i + 1, i) for i in range(n - 1)])
                up = jnp.where(shard == 0,
                               jnp.broadcast_to(x[0:1], up.shape), up)
                dn = jnp.where(shard == n - 1,
                               jnp.broadcast_to(x[-1:], dn.shape), dn)
                return jnp.concatenate([up, x, dn], axis=0)

            nov = jnp.clip(vec.dot(gb.shading_normal, view), 0.0, 1.0)
            albedo_local = denoise_mod.demodulation_albedo(
                gb.base_color.to_array().reshape(rows_local, rw, 3),
                gb.metallic.reshape(rows_local, rw),
                gb.roughness.reshape(rows_local, rw),
                nov.reshape(rows_local, rw))
            halo_dn = {"extend2d": extend2d,
                       "pad": min(8, rows_local - 1),
                       "row0": row0.astype(jnp.float32), "total_h": rh}
            img_local, denoiser_state = denoise_mod.denoise_frame(
                denoiser_state, img_local, albedo_local,
                gb.depth.reshape(rows_local, rw),
                gb.shading_normal.to_array().reshape(rows_local, rw, 3),
                motion_local,
                iterations=s.post_processing.denoiser_iterations,
                halo=halo_dn)

        return (img_local, jax.lax.psum(rays_total, PIXEL_AXIS),
                restir_state, sharc_state, denoiser_state, motion_local)

    def step(tracer, scene, cam, frame, history):
        img, rays, restir_state, sharc_state, denoiser_state, motion = heavy(
            (tracer, scene), cam, frame, history.restir, history.sharc,
            history.denoiser)
        img = img.reshape(rh, rw, 3)
        motion = motion.reshape(rh, rw, 2)

        # --- replicated post tail: TAA upscale + bloom + tonemap
        taa_state = history.taa
        if s.post_processing.upscaler != "none":
            img, taa_state = taa_mod.resolve(
                history.taa, img, motion, app.out_h, app.out_w)
            if s.post_processing.sharpness > 0:
                img = taa_mod.sharpen(img, s.post_processing.sharpness)
        elif (rw, rh) != (app.out_w, app.out_h):
            img = taa_mod._upscale_bilinear(img, app.out_h, app.out_w)
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

        from ..render.app import FrameHistory

        history = FrameHistory(denoiser=denoiser_state, taa=taa_state,
                               restir=restir_state, sharc=sharc_state)
        return img, rays, history

    return jax.jit(step)
