"""ReSTIR DI correctness: reservoir math + agreement with ground-truth
direct lighting."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pbrt.models.cornell import make_cornell_box, make_cornell_camera
from tpu_pbrt.ops import tracer as tracer_mod, vec
from tpu_pbrt.passes import gbuffer as gbuffer_mod
from tpu_pbrt.passes import restir
from tpu_pbrt.render.camera import generate_rays


W = H = 32


@pytest.fixture(scope="module")
def setup():
    scene = make_cornell_box()
    cam = make_cornell_camera(W, H).data()
    trc = tracer_mod.build_for_scene(scene)
    o, d, tmin, tmax = generate_rays(cam, W, H)
    px = jnp.tile(jnp.arange(W, dtype=jnp.uint32), H)
    py = jnp.repeat(jnp.arange(H, dtype=jnp.uint32), W)
    pu = (px.astype(jnp.float32) + 0.5) / W
    pv = (py.astype(jnp.float32) + 0.5) / H
    gb = gbuffer_mod.generate(trc, scene, cam, o, d, tmin, tmax, pu, pv,
                              (W, H))
    view = -d
    return scene, trc, gb, view, px, py


def reference_direct(scene, trc, gb, view, px, py, frames=400):
    """Ground-truth direct lighting by brute-force light sampling (the same
    estimator ReSTIR must converge to)."""
    from tpu_pbrt.passes import lights as lights_mod
    from tpu_pbrt.ops import bxdf, rng

    b = restir._surface_from_gbuffer(scene, gb, view)[0]
    sv = restir._surface_from_gbuffer(scene, gb, view)[1]
    acc = np.zeros((gb.depth.shape[0], 3))
    for f in range(frames):
        u3 = rng.uniform4(px, py, 7777 + f, 0)
        ls = lights_mod.sample(scene.lights, u3)
        to_l = ls.position - gb.position
        dist = vec.length(to_l)
        wi = to_l * (1.0 / jnp.maximum(dist, 1e-8))
        cos_l = jnp.maximum(-vec.dot(ls.normal, wi), 0.0)
        pdf_sa = ls.pdf_area * dist * dist / jnp.maximum(cos_l, 1e-6)
        w = bxdf.lobe_weights(b, sv, view)
        fd, fs = bxdf.evaluate_combined(b, sv, wi, view, w)
        origin = vec.safe_spawn_offset(gb.position, gb.flat_normal, wi)
        live = gb.valid & (cos_l > 1e-6)
        occ = trc.any_hit(origin, wi, 0.0,
                          jnp.where(live, dist * (1 - 1e-3), -jnp.inf))
        contrib = (fd + fs) * ls.radiance * (1.0 / jnp.maximum(pdf_sa, 1e-20))
        out = vec.where(live & ~occ & (pdf_sa > 0), contrib, vec.Vec3.splat(0.0))
        acc += np.asarray(out.to_array())
    return acc / frames


class TestReservoir:
    def test_merge_selects_proportionally(self):
        import jax

        n = 1 << 15
        res = restir.Reservoir.empty(n)
        key = jax.random.PRNGKey(0)
        # two candidates with weights 1 and 3 -> second picked 75%
        u1 = jax.random.uniform(key, (n,))
        res = restir._merge(res, jnp.zeros((n,), jnp.int32),
                            jnp.zeros((n,)), jnp.zeros((n,)),
                            jnp.ones((n,)), u1)
        u2 = jax.random.uniform(jax.random.PRNGKey(1), (n,))
        res = restir._merge(res, jnp.ones((n,), jnp.int32),
                            jnp.zeros((n,)), jnp.zeros((n,)),
                            3.0 * jnp.ones((n,)), u2)
        frac1 = float((res.light == 1).mean())
        assert abs(frac1 - 0.75) < 0.02
        np.testing.assert_allclose(np.asarray(res.m), 2.0)
        np.testing.assert_allclose(np.asarray(res.w_sum), 4.0)

    def test_initial_sampling_valid(self, setup):
        scene, trc, gb, view, px, py = setup
        res, _ = restir.initial_sampling(
            scene, gb, view, trc, px, py, 0, restir.ReSTIRSettings())
        s = restir.ReSTIRSettings()
        # every candidate counts toward M — light AND BRDF samples
        assert bool(jnp.all(
            res.m == s.initial_light_samples + s.initial_brdf_samples))
        assert bool(jnp.all(jnp.isfinite(res.w)))
        assert float(res.w.max()) > 0  # someone sees the light


class TestConvergence:
    def test_restir_matches_reference_direct(self, setup):
        scene, trc, gb, view, px, py = setup
        ref = reference_direct(scene, trc, gb, view, px, py, frames=300)

        settings = restir.ReSTIRSettings(spatial_samples=2)
        state = restir.ReSTIRState.empty(gb.depth.shape[0])
        acc = np.zeros_like(ref)
        frames = 60
        for f in range(frames):
            (diff, spec), state, _ = restir.render_direct_lighting(
                scene, gb, view, trc, state, px, py, f, W, H, settings)
            acc += np.asarray((diff + spec).to_array())
        got = acc / frames

        # compare means over lit pixels (reservoir reuse is slightly biased
        # by design — the reference's "basic" mode; tolerance reflects that)
        mask = ref.mean(-1) > 0.01
        rel = abs(got[mask].mean() / ref[mask].mean() - 1.0)
        assert rel < 0.15, (got[mask].mean(), ref[mask].mean())

    def test_restir_lower_variance_than_one_light_sample(self, setup):
        scene, trc, gb, view, px, py = setup
        from tpu_pbrt.passes import lights as lights_mod
        from tpu_pbrt.ops import bxdf, rng

        settings = restir.ReSTIRSettings()
        state = restir.ReSTIRState.empty(gb.depth.shape[0])
        outs = []
        for f in range(12):
            (diff, spec), state, _ = restir.render_direct_lighting(
                scene, gb, view, trc, state, px, py, f, W, H, settings)
            outs.append(np.asarray((diff + spec).to_array()))
        restir_var = np.stack(outs[4:]).var(0).mean()

        naive = []
        for f in range(8):
            b, sv = restir._surface_from_gbuffer(scene, gb, view)
            u3 = rng.uniform4(px, py, 999 + f, 0)
            ls = lights_mod.sample(scene.lights, u3)
            to_l = ls.position - gb.position
            dist = vec.length(to_l)
            wi = to_l * (1.0 / jnp.maximum(dist, 1e-8))
            cos_l = jnp.maximum(-vec.dot(ls.normal, wi), 0.0)
            pdf_sa = ls.pdf_area * dist * dist / jnp.maximum(cos_l, 1e-6)
            w = bxdf.lobe_weights(b, sv, view)
            fd, fs = bxdf.evaluate_combined(b, sv, wi, view, w)
            origin = vec.safe_spawn_offset(gb.position, gb.flat_normal, wi)
            live = gb.valid & (cos_l > 1e-6)
            occ = trc.any_hit(origin, wi, 0.0,
                              jnp.where(live, dist * (1 - 1e-3), -jnp.inf))
            contrib = (fd + fs) * ls.radiance * (1.0 / jnp.maximum(pdf_sa, 1e-20))
            out = vec.where(live & ~occ & (pdf_sa > 0), contrib,
                            vec.Vec3.splat(0.0))
            naive.append(np.asarray(out.to_array()))
        naive_var = np.stack(naive).var(0).mean()
        assert restir_var < 0.5 * naive_var, (restir_var, naive_var)


class TestBiasCorrection:
    def _run_spatial(self, setup, mode, frames=80):
        scene, trc, gb, view, px, py = setup
        cam_pos = make_cornell_camera(W, H).data().position
        settings = restir.ReSTIRSettings(
            spatial_samples=2, spatial_bias_correction=mode,
            temporal=False)  # isolate the spatial-reuse estimator
        state = restir.ReSTIRState.empty(gb.depth.shape[0])
        acc = np.zeros((gb.depth.shape[0], 3))
        for f in range(frames):
            (diff, spec), state, _ = restir.render_direct_lighting(
                scene, gb, view, trc, state, px, py, f, W, H, settings,
                cam_pos=cam_pos)
            acc += np.asarray((diff + spec).to_array())
        return acc / frames

    def test_pairwise_reduces_edge_bias(self, setup):
        """Spatial reuse with basic 1/M weighting darkens at geometric
        discontinuities (neighbor samples unrepresentable at the center
        still count toward M); pairwise MIS weighting must cut that error
        (reference bias-correction modes, MyAppData.h:227-246)."""
        scene, trc, gb, view, px, py = setup
        ref = reference_direct(scene, trc, gb, view, px, py, frames=300)

        basic = self._run_spatial(setup, "basic")
        pairwise = self._run_spatial(setup, "pairwise")

        # focus on depth-edge pixels, where basic 1/M is biased
        depth = np.asarray(gb.depth).reshape(H, W)
        d = np.where(np.isfinite(depth), depth, 1e3)
        grad = np.maximum(np.abs(np.diff(d, axis=0, prepend=d[:1])),
                          np.abs(np.diff(d, axis=1, prepend=d[:, :1])))
        edge = (grad > 0.05 * np.maximum(d, 1e-3)).reshape(-1)
        lit = ref.mean(-1) > 0.02
        m = edge & lit
        assert m.sum() > 20, "no edge pixels found"

        err_basic = np.abs(basic[m].mean(-1) / ref[m].mean(-1) - 1.0).mean()
        err_pair = np.abs(pairwise[m].mean(-1) / ref[m].mean(-1) - 1.0).mean()
        # pairwise must be strictly better at edges (with slack for MC noise)
        assert err_pair < err_basic * 0.9 + 0.01, (err_pair, err_basic)
        # and globally it must stay consistent with the reference
        overall = np.abs(pairwise[lit].mean() / ref[lit].mean() - 1.0)
        assert overall < 0.15, overall

    def test_raytraced_mode_runs(self, setup):
        scene, trc, gb, view, px, py = setup
        out = self._run_spatial(setup, "raytraced", frames=8)
        assert np.isfinite(out).all()
        assert out.mean() > 0.0

    def test_temporal_pairwise_runs(self, setup):
        scene, trc, gb, view, px, py = setup
        cam_pos = make_cornell_camera(W, H).data().position
        settings = restir.ReSTIRSettings(
            temporal_bias_correction="pairwise", spatial=False)
        state = restir.ReSTIRState.empty(gb.depth.shape[0], pairwise=True)
        acc = np.zeros((gb.depth.shape[0], 3))
        for f in range(12):
            (diff, spec), state, _ = restir.render_direct_lighting(
                scene, gb, view, trc, state, px, py, f, W, H, settings,
                cam_pos=cam_pos, cam_prev=cam_pos)
            acc += np.asarray((diff + spec).to_array())
        out = acc / 12
        assert np.isfinite(out).all() and out.mean() > 0.0


class TestTapRows:
    def test_reflect_edges_mirrors_instead_of_rejecting(self):
        """Spatial taps outside the view reflect across the edge
        (RAB_ClampSamplePositionIntoView, RTXDIAppBridge.hlsli:112-135)."""
        w, h = 8, 4
        packed = jnp.arange(w * h, dtype=jnp.float32)[:, None] * jnp.ones(
            (1, 8))
        x = jnp.asarray([-2.0, 9.0, 3.0])
        y = jnp.asarray([1.0, 1.0, -1.0])
        tap, in_b = restir._tap_rows(packed, x, y, w, h,
                                     reflect_edges=True)
        assert bool(in_b.all())
        got = np.asarray(tap["rows"][:, 0])
        # x=-2 -> 2; x=9 -> 2*8-9-1=6; y=-1 -> 1
        np.testing.assert_array_equal(got, [1 * w + 2, 1 * w + 6,
                                            1 * w + 3])
        # without reflection the same taps are rejected
        _, in_b2 = restir._tap_rows(packed, x, y, w, h)
        np.testing.assert_array_equal(np.asarray(in_b2),
                                      [False, False, False])

    def test_reflect_edges_halo_global_rows(self):
        """Under a halo, reflection happens in GLOBAL rows: shard 0's
        y=-1 tap reflects to global row 1 = local row 1."""
        w, h = 4, 4          # tile of 4 rows in a 16-row image
        pad = 2
        packed = (jnp.arange((h + 2 * pad) * w, dtype=jnp.float32)[:, None]
                  * jnp.ones((1, 8)))
        halo = {"pad": pad, "row0": jnp.float32(0.0), "total_h": 16}
        tap, in_b = restir._tap_rows(
            packed, jnp.asarray([0.0]), jnp.asarray([-1.0]), w, h,
            halo=halo, reflect_edges=True)
        assert bool(in_b.all())
        # reflected local row 1 -> extended row 1+pad = 3
        np.testing.assert_array_equal(np.asarray(tap["rows"][:, 0]),
                                      [3 * w + 0])


def test_uniform_local_light_mode_unbiased():
    """'uniform' candidate mode estimates the same DI as power-RIS
    (README settings tree: Local Light Mode Uniform | Power RIS)."""
    scene = make_cornell_box()
    trc = tracer_mod.build_for_scene(scene)
    w = h = 48
    cam = make_cornell_camera(w, h).data()
    o, d, t0, t1 = generate_rays(cam, w, h)
    px = jnp.tile(jnp.arange(w, dtype=jnp.uint32), h)
    py = jnp.repeat(jnp.arange(h, dtype=jnp.uint32), w)
    u = (px.astype(jnp.float32) + 0.5) / w
    v = (py.astype(jnp.float32) + 0.5) / h
    gb = gbuffer_mod.generate(trc, scene, cam, o, d, t0, t1, u, v, (w, h))
    view = -d

    means = {}
    for mode in ("power_ris", "uniform"):
        st = restir.ReSTIRState.empty(w * h)
        acc = 0.0
        s = restir.ReSTIRSettings(temporal=False, spatial=False,
                                  initial_brdf_samples=0,
                                  initial_light_samples=8,
                                  local_light_mode=mode)
        for f in range(24):
            (di_d, di_s), st, _ = restir.render_direct_lighting(
                scene, gb, view, trc, st, px, py, jnp.uint32(f), w, h, s)
            di = di_d + di_s
            acc = acc + float(np.asarray(
                (di.x + di.y + di.z)).mean())
        means[mode] = acc / 24
    assert means["uniform"] == pytest.approx(means["power_ris"], rel=0.1), \
        means


def test_tap_rows_uniform_shift_matches_gather():
    """The uniform-offset fast path (reflect-padded dynamic-slice shift)
    must reproduce the per-lane gather EXACTLY — including screen-edge
    reflection and out-of-range offsets (fallback)."""
    import numpy as np
    from tpu_pbrt.passes import restir as rst

    r = np.random.RandomState(9)
    h, w, c = 13, 17, 8
    packed = jnp.asarray(r.uniform(0, 1, (h * w, c)).astype(np.float32))
    px = jnp.asarray(np.tile(np.arange(w), h).astype(np.float32))
    py = jnp.asarray(np.repeat(np.arange(h), w).astype(np.float32))
    for (dx, dy) in [(0.0, 0.0), (3.2, -2.7), (-16.0, 12.0),
                     (0.49, 0.51), (200.0, 0.0)]:  # last: pad overflow
        x = px + dx
        y = py + dy
        for refl in (False, True):
            ref_t, ref_b = rst._tap_rows(packed, x, y, w, h,
                                         reflect_edges=refl)
            got_t, got_b = rst._tap_rows(packed, x, y, w, h,
                                         reflect_edges=refl,
                                         base_xy=(px, py))
            np.testing.assert_array_equal(np.asarray(got_b),
                                          np.asarray(ref_b))
            valid = np.asarray(ref_b)
            np.testing.assert_allclose(
                np.asarray(got_t["rows"])[valid],
                np.asarray(ref_t["rows"])[valid], rtol=0, atol=0)
    # non-uniform offsets take the gather branch (trivially exact)
    xj = px + jnp.asarray(r.uniform(-3, 3, h * w).astype(np.float32))
    yj = py + jnp.asarray(r.uniform(-3, 3, h * w).astype(np.float32))
    ref_t, _ = rst._tap_rows(packed, xj, yj, w, h, reflect_edges=True)
    got_t, _ = rst._tap_rows(packed, xj, yj, w, h, reflect_edges=True,
                             base_xy=(px, py))
    np.testing.assert_array_equal(np.asarray(got_t["rows"]),
                                  np.asarray(ref_t["rows"]))
