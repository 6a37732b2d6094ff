"""The wavefront path tracer (fully SoA).

TPU re-design of the reference's raygen megakernel
(reference: Shaders/Raytracing.hlsl:103-415): the per-thread
SPP-loop x bounce-loop with early breaks becomes a `lax.fori_loop` over a
fixed bounce count carrying an *active mask* over the whole ray pool —
terminated lanes idle instead of exiting (SURVEY.md §7 hard part #3:
fixed-size pools + masks). All vectors and colors are `Vec3`
structure-of-arrays: (R,3) AoS math measured ~90x slower on v5e (3-wide
minor axis wastes 125/128 TPU vector lanes).

Estimator semantics match the reference:
  * miss -> environment radiance, terminate       (Raytracing.hlsl:241-259)
  * emission picked up on every hit               (:317-321)
  * one-sample-MIS 3-lobe BSDF: throughput *= f(lobe)/pdf(lobe) (:323-346)
  * Russian roulette after bounce 3 on max-component throughput (:348-356)
  * luminance cutoff on throughput                (:361-364)
  * non-finite sample guard                       (:377)

Direct lighting: one-light NEE with balance-heuristic MIS (the standalone
path); the ReSTIR DI pass composites on top exactly like the reference's
`IsDIEnabled` demux.
"""

from __future__ import annotations

import dataclasses
import os as _os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..models.material import MaterialTable
from ..models.scene import Scene, environment_radiance
from ..ops import bxdf, rng, shade_table, vec
from ..ops.traverse import Hit
from ..ops.vec import Vec3

# Fusion-stage isolation: without barriers XLA fuses the dense traversal /
# fetch / shadow sweeps into the surrounding shade chain and the resulting
# mega-fusions run ~1.6-2.3x slower than the same sweeps isolated
# (tools/r4g_loopbench.py, v5e, 2M lanes: 4.97 -> 4.19 ms per bounce with
# barriers on a bounce-shaped toy body; frame level 48.86 -> 41.25 ms,
# tools/r4g_ptframe.py). Stage outputs are passed through
# lax.optimization_barrier at the scope boundaries; env-gated for A/B.
STAGE_BARRIERS = _os.environ.get("TPU_PBRT_STAGE_BARRIERS", "1") == "1"
# extra isolation of the pure-VPU shade stages (bsdf sample, NEE light
# fetch) — staged separately for the frame-level A/B
STAGE_BARRIERS_SHADE = _os.environ.get(
    "TPU_PBRT_STAGE_BARRIERS_SHADE", "0") == "1"


def _bar(x):
    """optimization_barrier over a pytree (no-op when disabled)."""
    if not STAGE_BARRIERS:
        return x
    return lax.optimization_barrier(x)


def _bar_shade(x):
    if not STAGE_BARRIERS_SHADE:
        return x
    return lax.optimization_barrier(x)


@dataclasses.dataclass(frozen=True)
class PathTraceSettings:
    """Static (compile-time) knobs, defaults from the reference config
    (reference: Source/MyAppData.h:183-188 — 8 bounces, 1 SPP, RR on)."""
    bounces: int = 8
    samples_per_pixel: int = 1
    russian_roulette: bool = True
    rr_start_bounce: int = 3
    throughput_threshold: float = 1e-3
    # One-light NEE with balance-heuristic MIS. The reference's base path
    # tracer relies on the ReSTIR DI pass for direct light instead
    # (Raytracing.hlsl:150-163).
    next_event_estimation: bool = True
    # SHARC radiance cache (reference: Raytracing.hlsl SHARC_QUERY
    # permutation): "off" | "query". Query terminates paths into cached
    # radiance once the blur footprint covers a voxel (:261-289).
    sharc_mode: str = "off"
    # Direct lighting supplied externally (the ReSTIR DI pass): skip the
    # first vertex's NEE and zero the bounce-1 emission where DI is valid
    # (reference: Raytracing.hlsl:150-163, 302 `isDIValid` demux).
    external_di: bool = False
    # Exact live-lane ray counting costs one cross-pool reduction per
    # bounce (~1.4 ms per 2M lanes on v5e); off by default — the returned
    # count is then a static upper bound (pool x queries). bench.py turns
    # it on for honest Mrays/s.
    count_rays: bool = False
    # Stochastic pool compaction: at the START of each listed bounce the
    # ray pool is folded in half (lane i paired with lane i+R/2, ONE
    # survivor kept — a fair coin with 2x throughput reweighting when both
    # are alive; population-control splitting-in-reverse, unbiased). Every
    # later bounce then costs half as much. Schedule folds where the
    # expected live fraction is < ~50% (after Russian roulette starts, or
    # after open-scene miss attrition); earlier folds stay unbiased but
    # trade real samples for speed (more variance). Entries must be
    # strictly increasing, in [1, bounces]; the pool size must be
    # divisible by 2**len(schedule). Default off.
    compaction_schedule: tuple = ()
    # Ray-cone angle (radians) of one pixel — enables mip-aware texture
    # sampling (footprint = cone_spread * path length at each hit;
    # replaces the reference's hardware SampleGrad mip selection). 0 = off
    # (level-0 bilinear). Renderer/App fill this from the camera.
    cone_spread: float = 0.0


class _PathState(NamedTuple):
    active: jnp.ndarray       # (R,) bool
    origin: Vec3
    direction: Vec3
    t_min: jnp.ndarray        # (R,)
    t_max: jnp.ndarray        # (R,)
    throughput: Vec3
    radiance: Vec3
    # first-bounce info for denoiser demux (Raytracing.hlsl:235-239)
    first_lobe: jnp.ndarray   # (R,) i32, -1 until set
    first_hit_t: jnp.ndarray  # (R,)
    # per-LANE rays-traced counter: folds pairwise-sum (no cross-pool
    # reduction per bounce — ONE reduce at frame end yields the total)
    ray_count: jnp.ndarray    # (R,) f32
    # MIS bookkeeping for BSDF-sampled emission vs NEE
    prev_bsdf_pdf: jnp.ndarray  # (R,) solid-angle pdf of the ray's direction
    # SHARC query: accumulated roughness along the path (Raytracing.hlsl:366)
    rough_accum: jnp.ndarray    # (R,)
    # accumulated path length up to the CURRENT ray's origin (ray-cone mips)
    path_t: jnp.ndarray         # (R,)


def _bsdf_from_attrs(attrs: shade_table.ShadeAttrs) -> bxdf.BSDF:
    """BSDF from the packed shade-table row (material constants were folded
    into the per-triangle table — zero extra gathers)."""
    return bxdf.make_bsdf(attrs.base_color, attrs.metallic, attrs.roughness,
                          attrs.ior, attrs.transmission, attrs.is_front_face)


def _bank_add(bank: Vec3, idx, rad: Vec3) -> Vec3:
    """Scatter-free radiance banking for folded pools.

    The fold keeps pair structure — after any number of folds, a pool
    lane p still satisfies idx[p] ≡ p (mod pool size) — so tiling the
    folded pool back to full size lines every folded lane up under its
    original pixel, turning the scatter-add into an elementwise masked
    add. TPU scatter measured ~8 ms per bank at a 2M-lane 1080p pool
    (serialized); this is a ~1 ms fusion.
    """
    r0 = bank.x.shape[0]
    reps = r0 // idx.shape[0]
    lane = jnp.arange(r0, dtype=jnp.int32)
    m = jnp.tile(idx, reps) == lane
    return Vec3(bank.x + jnp.where(m, jnp.tile(rad.x, reps), 0.0),
                bank.y + jnp.where(m, jnp.tile(rad.y, reps), 0.0),
                bank.z + jnp.where(m, jnp.tile(rad.z, reps), 0.0))


def _fold_half(state: _PathState, px, py, idx, di_valid,
               frame, sample_offset, bounce):
    """Stochastic pool compaction: pair lane i with lane i+R/2, keep ONE.

    Population control (splitting in reverse — the dual of Russian
    roulette): if both lanes of a pair are alive, a fair coin picks the
    survivor and its throughput DOUBLES (E[2T_keep · C_keep] =
    E[T_i·C_i] + E[T_j·C_j] — unbiased); if exactly one is alive it
    survives with weight 1 (no variance added); dead pairs stay dead.
    Every bounce after the fold costs half as much — on a lock-step
    vector machine this is the only way masked-off lanes stop costing
    time. The caller must bank `state.radiance` per-pixel BEFORE folding
    (lane→pixel identity is lost) and reset it to zero.

    Replaces compaction via sorting: a sort + 14 state gathers measured
    ~105 ms per 2M lanes on v5e, while this fold is pure elementwise
    selects (~1 ms). The coin rides the low half's pixel RNG stream at
    slot 3 (slots 0-2 are used by shading).
    """
    r = state.active.shape[0]
    h = r // 2
    a_lo, a_hi = state.active[:h], state.active[h:]
    both = a_lo & a_hi
    coin = rng.uniform4(px[:h], py[:h], frame,
                        sample_offset * 64 + 3 + bounce * 8)[0] < 0.5
    take_hi = (a_hi & ~a_lo) | (both & coin)

    # the per-lane ray counter folds by PAIR SUM (total preserved with no
    # cross-pool reduction), not by survivor selection
    rc_fold = state.ray_count[:h] + state.ray_count[h:]

    def sel(a):
        if a.ndim >= 1 and a.shape[0] == r:
            return jnp.where(take_hi, a[h:], a[:h])
        return a  # per-pool scalars pass through

    state = jax.tree.map(sel, state)
    state = state._replace(
        ray_count=rc_fold,
        throughput=state.throughput * jnp.where(both, 2.0, 1.0))
    return (state, sel(jnp.asarray(px)), sel(jnp.asarray(py)), sel(idx),
            None if di_valid is None else sel(jnp.asarray(di_valid)))


def trace(
    tracer,
    scene: Scene,
    origin: Vec3,
    direction: Vec3,
    t_min,
    t_max,
    px: jnp.ndarray,
    py: jnp.ndarray,
    frame,
    settings: PathTraceSettings,
    sample_offset: int = 0,
    primary_hit: Hit | None = None,
    sharc_state=None,
    sharc_settings=None,
    camera_pos=None,
    di_valid=None,
):
    """Trace one sample per pool entry; returns (radiance: Vec3, first_lobe,
    first_hit_t, ray_count). px/py feed the per-pixel RNG stream
    (Shaders/Raytracing.hlsl:108). `primary_hit` (if given) supplies the
    bounce-0 hit from the G-buffer pass instead of retracing."""
    r = origin.shape[0]
    schedule = tuple(settings.compaction_schedule)
    if schedule:
        assert list(schedule) == sorted(set(schedule)), schedule
        assert 1 <= schedule[0] and schedule[-1] <= settings.bounces, schedule
        assert r % (2 ** len(schedule)) == 0, (r, schedule)

    def draw(px, py, bounce, slot):
        counter = (sample_offset * 64 + slot) + bounce * 8
        return rng.uniform4(px, py, frame, counter)

    state = _PathState(
        active=jnp.ones((r,), bool),
        origin=origin,
        direction=direction,
        t_min=jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,)),
        t_max=jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,)),
        throughput=Vec3.full(1.0, (r,)),
        radiance=Vec3.zeros((r,)),
        first_lobe=jnp.full((r,), -1, jnp.int32),
        first_hit_t=jnp.full((r,), jnp.inf),
        ray_count=jnp.zeros((r,), jnp.float32),
        prev_bsdf_pdf=jnp.zeros((r,)),
        rough_accum=jnp.zeros((r,)),
        path_t=jnp.zeros((r,)),
    )

    zero3 = Vec3.splat(0.0)

    def shade(bounce, state: _PathState, hit: Hit,
              px, py, di_valid, attrs=None) -> _PathState:
        """Everything after traversal: miss env, emission MIS, NEE, BSDF
        sample, RR, cutoff, continuation ray. px/py/di_valid are explicit
        (not closures) so compaction can hand in the folded pool's views.
        `attrs` (if given) is the pre-fetched ShadeAttrs from the fused
        traverse+fetch megakernel — skips the separate fetch."""
        r = state.t_min.shape[0]
        is_hit = hit.mask & state.active

        # --- hit shading: ONE packed row-gather of the compact
        # bounce-column subset (textures applied inside when present)
        if attrs is None:
            with jax.named_scope("fetch"):
                fp = None
                if settings.cone_spread > 0.0:
                    fp = settings.cone_spread * (
                        state.path_t + jnp.maximum(hit.t, 0.0))
                attrs = shade_table.fetch_bounce(
                    tracer.shade_table, jnp.maximum(hit.tri, 0),
                    state.origin, state.direction, atlas=tracer.atlas,
                    footprint=fp,
                )
        attrs = _bar(attrs)
        b = _bsdf_from_attrs(attrs)
        emission = attrs.emission

        # --- miss: environment light, terminate (Raytracing.hlsl:241-259)
        env = environment_radiance(scene.environment, state.direction)

        # --- SHARC query: terminate into cached radiance when the path
        # footprint covers the voxel (Raytracing.hlsl:261-289)
        if settings.sharc_mode == "query":
            from . import sharc as sharc_mod

            front_flat = vec.where(attrs.is_front_face, attrs.flat_normal,
                                   -attrs.flat_normal)
            key = sharc_mod.voxel_key(attrs.position, front_flat,
                                      camera_pos, sharc_settings)
            cached, found = sharc_mod.query(sharc_state, key)
            fp_ok = sharc_mod.footprint_valid(
                hit.t, state.rough_accum, attrs.position, camera_pos,
                sharc_settings)
            use_cache = is_hit & found & fp_ok & (bounce > 0)
            radiance = state.radiance + vec.where(
                use_cache, state.throughput * cached, Vec3.splat(0.0))
            # cached lanes contribute nothing else at this vertex
            is_hit = is_hit & ~use_cache
            radiance = radiance + vec.where(
                state.active & ~hit.mask, state.throughput * env, zero3)
        else:
            radiance = state.radiance + vec.where(
                state.active & ~hit.mask, state.throughput * env, zero3)

        # --- emission pickup, MIS-weighted against NEE when enabled
        if settings.next_event_estimation:
            cos_l = attrs.light_cos
            p_l_sa = jnp.where(
                cos_l > 1e-6,
                attrs.light_pdf_area * hit.t * hit.t
                / jnp.maximum(cos_l, 1e-6), 0.0,
            )
            denom = state.prev_bsdf_pdf + p_l_sa
            w_emit = jnp.where(
                (bounce == 0) | (denom <= 0.0),
                1.0,
                state.prev_bsdf_pdf / jnp.maximum(denom, 1e-20),
            )
        else:
            w_emit = 1.0
        if settings.external_di:
            # ReSTIR owns the first vertex's direct light: kill bounce-1
            # emission where DI was produced (Raytracing.hlsl:302)
            w_emit = jnp.where((bounce == 1) & di_valid, 0.0, w_emit)
        radiance = radiance + vec.where(
            is_hit, state.throughput * (emission * w_emit), zero3
        )

        sv = bxdf.make_surface_vectors(
            attrs.is_front_face, attrs.flat_normal, attrs.shading_normal
        )
        v = -state.direction
        weights = bxdf.lobe_weights(b, sv, v)

        # --- next-event estimation: one power-sampled light, shadow ray,
        # balance-heuristic MIS against the BSDF strategy
        nee_rays = jnp.zeros((r,), jnp.float32)
        if settings.next_event_estimation:
            u3 = draw(px, py, bounce, 2)
            ls = _bar_shade(shade_table.fetch_light(
                tracer.light_table, tracer.light_cdf,
                u3[0], u3[1], u3[2],
            ))
            to_l = ls.position - attrs.position
            dist = vec.length(to_l)
            wi = to_l * (1.0 / jnp.maximum(dist, 1e-8))
            cos_light = -vec.dot(ls.normal, wi)
            pdf_sa = jnp.where(
                cos_light > 1e-6,
                ls.pdf_area * dist * dist / jnp.maximum(cos_light, 1e-6),
                0.0,
            )
            f_d, f_s = bxdf.evaluate_combined(b, sv, wi, v, weights)
            f_nee = f_d + f_s
            p_b = bxdf.pdf_combined(b, sv, wi, v, weights)
            valid_nee = (
                is_hit
                & (scene.lights.count > 0)
                & (pdf_sa > 0.0)
                & ((f_nee.x > 0.0) | (f_nee.y > 0.0) | (f_nee.z > 0.0))
            )
            if settings.external_di:
                valid_nee = valid_nee & ~((bounce == 0) & di_valid)
            shadow_o = vec.safe_spawn_offset(
                attrs.position, attrs.flat_normal, wi
            )
            with jax.named_scope("shadow"):
                occluded = _bar(tracer.any_hit(
                    *_bar((shadow_o, wi)), 0.0,
                    jnp.where(valid_nee, dist * (1.0 - 1e-3), -jnp.inf),
                ))
            w_mis = pdf_sa / jnp.maximum(pdf_sa + p_b, 1e-20)
            contrib = (
                state.throughput * f_nee * ls.radiance
                * (w_mis / jnp.maximum(pdf_sa, 1e-20))
            )
            radiance = radiance + vec.where(
                valid_nee & ~occluded, contrib, zero3
            )
            if settings.count_rays:
                nee_rays = valid_nee.astype(jnp.float32)

        # --- BSDF sampling (Raytracing.hlsl:323-346)
        with jax.named_scope("bsdf"):
            u4 = draw(px, py, bounce, 0)
            l, lobe, valid = bxdf.sample(b, sv, v, u4)
            pdf = bxdf.pdf_sampled_lobe(b, sv, l, v, weights, lobe)
            f = bxdf.evaluate_sampled_lobe(b, sv, l, v, weights, lobe)
            l, lobe, valid, pdf, f = _bar_shade((l, lobe, valid, pdf, f))

        ok = valid & (pdf > 0.0) & ((f.x != 0.0) | (f.y != 0.0) | (f.z != 0.0))
        throughput = state.throughput * vec.where(
            ok, f * (1.0 / jnp.maximum(pdf, 1e-20)), Vec3.splat(1.0)
        )

        # --- Russian roulette (Raytracing.hlsl:348-356)
        if settings.russian_roulette:
            p = jnp.clip(vec.max_component(throughput), 0.0, 1.0)
            u_rr = draw(px, py, bounce, 1)[0]
            rr_on = bounce > settings.rr_start_bounce
            rr_kill = rr_on & (u_rr >= p)
            rr_scale = jnp.where(rr_on & ~rr_kill,
                                 1.0 / jnp.maximum(p, 1e-8), 1.0)
            throughput = throughput * rr_scale
        else:
            rr_kill = jnp.zeros((r,), bool)

        # --- luminance cutoff (Raytracing.hlsl:361-364)
        cut = vec.luminance(throughput) <= settings.throughput_threshold

        active = is_hit & ok & ~rr_kill & ~cut

        # --- continuation ray (Raytracing.hlsl:219-224)
        new_origin = vec.safe_spawn_offset(attrs.position, attrs.flat_normal, l)

        first = (bounce == 0) & is_hit
        first_lobe = jnp.where(first, lobe, state.first_lobe)
        first_hit_t = jnp.where(first, hit.t, state.first_hit_t)

        # claimed BSDF pdf of the sampled direction for next-hit MIS: the
        # true marginal of the one-sample lobe scheme is the combined pdf
        if settings.next_event_estimation:
            next_pdf = bxdf.pdf_combined(b, sv, l, v, weights)
        else:
            next_pdf = pdf

        if settings.count_rays:
            # per-lane, elementwise (no cross-pool reduction per bounce)
            new_count = (state.ray_count + nee_rays
                         + state.active.astype(jnp.float32))
        else:
            # static bound accounted for in Python at the end of `trace`
            new_count = state.ray_count
        return _PathState(
            active=active,
            origin=vec.where(is_hit, new_origin, state.origin),
            direction=vec.where(is_hit, l, state.direction),
            t_min=jnp.zeros((r,)),
            t_max=jnp.full((r,), jnp.inf),
            throughput=vec.where(is_hit, throughput, state.throughput),
            radiance=radiance,
            first_lobe=first_lobe,
            first_hit_t=first_hit_t,
            ray_count=new_count,
            prev_bsdf_pdf=jnp.where(is_hit, next_pdf, state.prev_bsdf_pdf),
            rough_accum=jnp.where(
                is_hit,
                state.rough_accum + jnp.where(
                    lobe == bxdf.LOBE_DIFFUSE, 1.0, b.roughness),
                state.rough_accum,
            ),
            path_t=jnp.where(is_hit, state.path_t + hit.t, state.path_t),
        )

    def make_body(px, py, di_valid):
        """Bounce body bound to one pool's pixel streams/DI mask — rebuilt
        after each compaction fold so the closures track the halved pool."""
        fused = tracer.supports_fused_shade()

        def bounce_body(bounce, state: _PathState):
            # inactive lanes traverse with an empty interval so their walk
            # degenerates to nothing (cheap lock-step idling)
            if fused:
                with jax.named_scope("traverse_shade"):
                    hit, attrs = tracer.closest_hit_shade(
                        state.origin, state.direction, state.t_min,
                        jnp.where(state.active, state.t_max, -jnp.inf),
                    )
                return shade(bounce, state, hit, px, py, di_valid,
                             attrs=attrs)
            with jax.named_scope("traverse"):
                hit = _bar(tracer.closest_hit(
                    state.origin, state.direction, state.t_min,
                    jnp.where(state.active, state.t_max, -jnp.inf),
                ))
            return shade(bounce, state, hit, px, py, di_valid)
        return bounce_body

    # bounce 0 can reuse an externally supplied primary hit (the G-buffer
    # pass result — the reference reconstructs the primary surface instead
    # of retracing, Raytracing.hlsl:118-163)
    start = 0
    if primary_hit is not None:
        state = shade(0, state, primary_hit, px, py, di_valid)
        # the primary was traced by the G-buffer pass, not here — keep the
        # ray counter honest (only NEE shadow rays at bounce 0 count)
        if settings.count_rays:
            state = state._replace(ray_count=state.ray_count - 1.0)
        start = 1

    bounce_body = make_body(px, py, di_valid)
    bank = idx = first_lobe = first_hit_t = None
    for k, end in enumerate(list(schedule) + [settings.bounces + 1]):
        if end > start:
            state = lax.fori_loop(start, end, bounce_body, state)
            start = end
        if k >= len(schedule):
            break
        # --- stochastic compaction at bounce `end`: bank this pool's
        # radiance into per-pixel slots (the fold discards lane identity),
        # then halve the pool and rebind the bounce body to it.
        cur = vec.where(vec.all_finite(state.radiance), state.radiance,
                        Vec3.splat(0.0))
        if bank is None:
            # first fold: lane == pixel, banking is elementwise (no scatter)
            bank = cur
            idx = jnp.arange(r, dtype=jnp.int32)
            first_lobe, first_hit_t = state.first_lobe, state.first_hit_t
        else:
            bank = _bank_add(bank, idx, cur)
        state = state._replace(
            radiance=Vec3.zeros((state.active.shape[0],)))
        state, px, py, idx, di_valid = _fold_half(
            state, px, py, idx, di_valid, frame, sample_offset, end)
        bounce_body = make_body(px, py, di_valid)

    # total rays: ONE cross-pool reduction per frame (exact mode), or the
    # static bound from the fold schedule (pool size per traced bounce)
    if settings.count_rays:
        total_rays = jnp.sum(state.ray_count)
    else:
        per = 2 if settings.next_event_estimation else 1
        pools = 0
        pool, b0 = r, 0
        for end in list(schedule) + [settings.bounces + 1]:
            pools += (end - b0) * pool
            pool, b0 = pool // 2, end
        total_rays = jnp.asarray(
            float(pools * per - (r if primary_hit is not None else 0)),
            jnp.float32)

    # non-finite guard (Raytracing.hlsl:377)
    rad = vec.where(vec.all_finite(state.radiance), state.radiance,
                    Vec3.splat(0.0))
    if bank is None:
        return rad, state.first_lobe, state.first_hit_t, total_rays
    rad = _bank_add(bank, idx, rad)
    return rad, first_lobe, first_hit_t, total_rays


def render_sample_radiance(
    tracer, scene: Scene, origin: Vec3, direction: Vec3, t_min, t_max,
    px, py, frame, settings: PathTraceSettings,
    primary_hit: Hit | None = None, **trace_kwargs,
):
    """Average `samples_per_pixel` independent path samples
    (Raytracing.hlsl:191,377)."""
    spp = settings.samples_per_pixel

    def one(s, carry):
        acc, rays = carry
        rad, _, _, rc = trace(
            tracer, scene, origin, direction, t_min, t_max, px, py, frame,
            settings, sample_offset=s, primary_hit=primary_hit,
            **trace_kwargs,
        )
        return acc + rad, rays + rc

    if spp == 1:
        rad, _, _, rc = trace(tracer, scene, origin, direction, t_min, t_max,
                              px, py, frame, settings,
                              primary_hit=primary_hit, **trace_kwargs)
        return rad, rc
    (acc, rays) = lax.fori_loop(
        0, spp, one,
        (Vec3.zeros((origin.shape[0],)), jnp.zeros((), jnp.float32)),
    )
    return acc * (1.0 / spp), rays


def trace_sharc_update(
    tracer, scene: Scene, origin: Vec3, direction: Vec3, t_min, t_max,
    px, py, frame, settings: PathTraceSettings, sharc_settings, camera_pos,
):
    """The SHARC_UPDATE permutation (reference: Raytracing.hlsl:203-316,
    306-316): a short path trace at reduced resolution whose per-vertex
    radiance estimates feed the hash-grid resolve.

    Returns (keys (B+1, R) u32, radiance records Vec3 of (B+1, R), valid
    (B+1, R)): per vertex b, L(b) = (sum of contributions from b onward) /
    throughput(b) — what SharcUpdateHit accumulates with its running
    throughput. Roughness is floored to the SHARC threshold so the cache
    trains on diffuse-ish transport (:307). The loop is statically
    unrolled (update passes use few bounces at 1/downscale^2 rays)."""
    from . import sharc as sharc_mod

    r = origin.shape[0]
    zero3 = Vec3.splat(0.0)

    def draw(bounce, slot):
        return rng.uniform4(px, py, frame, 7000 + slot + bounce * 8)

    active = jnp.ones((r,), bool)
    o, d = origin, direction
    tmin = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    throughput = Vec3.full(1.0, (r,))

    keys, contribs, thrs, valids = [], [], [], []

    fused = tracer.supports_fused_shade()
    for bounce in range(settings.bounces + 1):
        if fused:
            hit, attrs = tracer.closest_hit_shade(
                o, d, tmin, jnp.where(active, tmax, -jnp.inf))
        else:
            hit = tracer.closest_hit(o, d, tmin,
                                     jnp.where(active, tmax, -jnp.inf))
            attrs = shade_table.fetch_bounce(
                tracer.shade_table, jnp.maximum(hit.tri, 0), o, d,
                atlas=tracer.atlas)
        is_hit = hit.mask & active
        b = _bsdf_from_attrs(attrs)
        b = b._replace(roughness=jnp.maximum(
            b.roughness, sharc_settings.roughness_threshold))

        front_flat = vec.where(attrs.is_front_face, attrs.flat_normal,
                               -attrs.flat_normal)
        key = sharc_mod.voxel_key(attrs.position, front_flat, camera_pos,
                                  sharc_settings)

        # vertex contribution: emission + one-light NEE (throughput-scaled)
        contrib = vec.where(is_hit, throughput * attrs.emission, zero3)
        sv = bxdf.make_surface_vectors(
            attrs.is_front_face, attrs.flat_normal, attrs.shading_normal)
        view = -d
        weights = bxdf.lobe_weights(b, sv, view)
        u3 = draw(bounce, 2)
        ls = shade_table.fetch_light(
            tracer.light_table, tracer.light_cdf, u3[0], u3[1], u3[2])
        to_l = ls.position - attrs.position
        dist = vec.length(to_l)
        wi = to_l * (1.0 / jnp.maximum(dist, 1e-8))
        cos_light = -vec.dot(ls.normal, wi)
        pdf_sa = jnp.where(
            cos_light > 1e-6,
            ls.pdf_area * dist * dist / jnp.maximum(cos_light, 1e-6), 0.0)
        f_d, f_s = bxdf.evaluate_combined(b, sv, wi, view, weights)
        f_nee = f_d + f_s
        ok_nee = is_hit & (scene.lights.count > 0) & (pdf_sa > 0.0)
        shadow_o = vec.safe_spawn_offset(attrs.position, attrs.flat_normal, wi)
        occluded = tracer.any_hit(
            shadow_o, wi, 0.0,
            jnp.where(ok_nee, dist * (1.0 - 1e-3), -jnp.inf))
        contrib = contrib + vec.where(
            ok_nee & ~occluded,
            throughput * f_nee * ls.radiance
            * (1.0 / jnp.maximum(pdf_sa, 1e-20)),
            zero3)

        keys.append(key)
        contribs.append(contrib)
        thrs.append(throughput)
        valids.append(is_hit)

        # continuation
        u4 = draw(bounce, 0)
        l, lobe, valid = bxdf.sample(b, sv, view, u4)
        pdf = bxdf.pdf_sampled_lobe(b, sv, l, view, weights, lobe)
        f = bxdf.evaluate_sampled_lobe(b, sv, l, view, weights, lobe)
        ok = valid & (pdf > 0.0)
        throughput = throughput * vec.where(
            ok, f * (1.0 / jnp.maximum(pdf, 1e-20)), Vec3.splat(1.0))
        active = is_hit & ok
        o = vec.safe_spawn_offset(attrs.position, attrs.flat_normal, l)
        d = vec.where(is_hit, l, d)
        tmin = jnp.zeros((r,))
        tmax = jnp.full((r,), jnp.inf)

    nb = len(keys)
    key_arr = sharc_mod.VoxelKey(
        lo=jnp.stack([k.lo for k in keys]),         # (B+1, R)
        hi=jnp.stack([k.hi for k in keys]))
    valid_arr = jnp.stack(valids)
    contrib_arr = Vec3(
        jnp.stack([c.x for c in contribs]),
        jnp.stack([c.y for c in contribs]),
        jnp.stack([c.z for c in contribs]),
    )
    thr_arr = Vec3(
        jnp.stack([t.x for t in thrs]),
        jnp.stack([t.y for t in thrs]),
        jnp.stack([t.z for t in thrs]),
    )
    # suffix sums over the bounce axis: S_b = sum_{k >= b} c_k
    def suffix(x):
        return jnp.flip(jnp.cumsum(jnp.flip(x, 0), 0), 0)

    s = Vec3(suffix(contrib_arr.x), suffix(contrib_arr.y),
             suffix(contrib_arr.z))
    inv = Vec3(
        1.0 / jnp.maximum(thr_arr.x, 1e-6),
        1.0 / jnp.maximum(thr_arr.y, 1e-6),
        1.0 / jnp.maximum(thr_arr.z, 1e-6),
    )
    records = s * inv
    return (sharc_mod.VoxelKey(lo=key_arr.lo.reshape(-1),
                               hi=key_arr.hi.reshape(-1)),
            Vec3(records.x.reshape(-1), records.y.reshape(-1),
                 records.z.reshape(-1)),
            valid_arr.reshape(-1))
