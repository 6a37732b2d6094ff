"""G-buffer, denoiser, TAA, bloom pass tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pbrt.models.cornell import make_cornell_box, make_cornell_camera
from tpu_pbrt.passes import bloom, denoise, taa
from tpu_pbrt.passes.pathtrace import PathTraceSettings
from tpu_pbrt.render.renderer import Renderer


@pytest.fixture(scope="module")
def cornell_gbuffer():
    import jax
    from tpu_pbrt.models.cornell import make_cornell_box, make_cornell_camera
    from tpu_pbrt.ops import math as pmath, tracer as tracer_mod
    from tpu_pbrt.passes import gbuffer as gbuffer_mod
    from tpu_pbrt.render.camera import generate_rays

    w = h = 32
    scene = make_cornell_box()
    cam_ctl = make_cornell_camera(w, h)
    cam = cam_ctl.data()
    trc = tracer_mod.build_for_scene(scene)
    o, d, tmin, tmax = generate_rays(cam, w, h)
    px = jnp.tile(jnp.arange(w, dtype=jnp.float32), h)
    py = jnp.repeat(jnp.arange(h, dtype=jnp.float32), w)
    pu = (px + 0.5) / w
    pv = (py + 0.5) / h
    gb = gbuffer_mod.generate(trc, scene, cam, o, d, tmin, tmax, pu, pv, (w, h))
    return gb, scene, cam, (w, h)


class TestGBuffer:
    def test_all_pixels_hit_closed_box(self, cornell_gbuffer):
        gb, _, _, _ = cornell_gbuffer
        assert bool(jnp.all(gb.valid))

    def test_depth_positive_finite(self, cornell_gbuffer):
        gb, _, _, _ = cornell_gbuffer
        d = np.asarray(gb.depth)
        assert (d > 0).all() and np.isfinite(d).all()

    def test_static_camera_zero_motion(self, cornell_gbuffer):
        gb, _, _, _ = cornell_gbuffer
        np.testing.assert_allclose(np.asarray(gb.motion_x), 0.0, atol=0.02)
        np.testing.assert_allclose(np.asarray(gb.motion_y), 0.0, atol=0.02)

    def test_normals_unit(self, cornell_gbuffer):
        gb, _, _, _ = cornell_gbuffer
        n = np.linalg.norm(np.asarray(gb.shading_normal.to_array()), axis=-1)
        np.testing.assert_allclose(n, 1.0, atol=1e-4)

    def test_reprojection_roundtrip(self, cornell_gbuffer):
        """project_to_uv(position) must recover the pixel the ray came from."""
        from tpu_pbrt.passes.gbuffer import project_to_uv

        gb, scene, cam, (w, h) = cornell_gbuffer
        uu, vv = project_to_uv(cam, gb.position)
        px = np.tile(np.arange(w), h)
        py = np.repeat(np.arange(h), w)
        np.testing.assert_allclose(np.asarray(uu), (px + 0.5) / w, atol=2e-3)
        np.testing.assert_allclose(np.asarray(vv), (py + 0.5) / h, atol=2e-3)


class TestDenoise:
    def test_temporal_accumulation_reduces_noise(self):
        import jax

        h = w = 48
        key = jax.random.PRNGKey(0)
        truth = jnp.ones((h, w, 3)) * 0.5
        depth = jnp.ones((h, w))
        normal = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (h, w, 1))
        motion = jnp.zeros((h, w, 2))
        state = denoise.init_state(h, w)
        for f in range(16):
            noisy = truth + jax.random.normal(jax.random.PRNGKey(f), (h, w, 3)) * 0.3
            acc, var, state = denoise.temporal_accumulate(
                state, noisy, depth, normal, motion
            )
        err_acc = float(jnp.abs(acc - truth).mean())
        err_one = float(jnp.abs(noisy - truth).mean())
        assert err_acc < 0.4 * err_one

    def test_disocclusion_resets_history(self):
        h = w = 16
        state = denoise.init_state(h, w)
        c = jnp.ones((h, w, 3))
        depth = jnp.ones((h, w))
        normal = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (h, w, 1))
        motion = jnp.zeros((h, w, 2))
        _, _, state = denoise.temporal_accumulate(state, c, depth, normal, motion)
        _, _, state = denoise.temporal_accumulate(state, c, depth, normal, motion)
        assert float(state.history_len.max()) >= 2
        # now a big depth change everywhere -> history invalid -> len resets to 1
        _, _, state2 = denoise.temporal_accumulate(
            state, c, depth * 10.0, normal, motion
        )
        np.testing.assert_allclose(np.asarray(state2.history_len), 1.0)

    def test_atrous_smooths_flat_region(self):
        import jax

        h = w = 32
        noisy = 0.5 + jax.random.normal(jax.random.PRNGKey(1), (h, w, 3)) * 0.2
        depth = jnp.ones((h, w))
        normal = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (h, w, 1))
        var = jnp.full((h, w), 0.04)
        out = denoise.atrous_filter(noisy, var, depth, normal, iterations=3)
        assert float(out.std()) < 0.3 * float(noisy.std())

    def test_atrous_preserves_depth_edges(self):
        h = w = 32
        color = jnp.concatenate(
            [jnp.zeros((h, w // 2, 3)), jnp.ones((h, w // 2, 3))], axis=1
        )
        depth = jnp.concatenate(
            [jnp.ones((h, w // 2)), jnp.full((h, w // 2), 5.0)], axis=1
        )
        normal = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (h, w, 1))
        var = jnp.full((h, w), 0.01)
        out = denoise.atrous_filter(color, var, depth, normal, iterations=3)
        # the two sides must stay separated
        left = float(out[:, : w // 2 - 2].mean())
        right = float(out[:, w // 2 + 2 :].mean())
        assert left < 0.1 and right > 0.9

    def test_full_denoise_on_cornell(self):
        w = h = 32
        scene = make_cornell_box()
        cam = make_cornell_camera(w, h)
        r = Renderer(scene, w, h, PathTraceSettings(bounces=2))
        state = denoise.init_state(h, w)
        outs = []
        for f in range(6):
            img, _, gb = r._render_frame(
                r.tracer, scene, cam.data(), jnp.asarray(f, jnp.uint32),
                width=w, height=h, with_gbuffer=True,
            )
            albedo = denoise.demodulation_albedo(
                gb.base_color.to_array().reshape(h, w, 3),
                gb.metallic.reshape(h, w),
                gb.roughness.reshape(h, w),
                jnp.clip(gb.depth.reshape(h, w) * 0.0 + 0.8, 0.0, 1.0),
            )
            motion = jnp.stack(
                [gb.motion_x.reshape(h, w), gb.motion_y.reshape(h, w)], -1
            )
            out, state = denoise.denoise_frame(
                state, img, albedo, gb.depth.reshape(h, w),
                gb.shading_normal.to_array().reshape(h, w, 3),
                motion, iterations=2,
            )
            outs.append(np.asarray(out))
        assert np.isfinite(outs[-1]).all()
        # temporal variance after warmup must be far below 1-spp variance
        raw = [np.asarray(r.render(cam, f)) for f in range(6, 10)]
        assert np.stack(outs[-3:]).var(0).mean() < 0.5 * np.stack(raw).var(0).mean()


class TestTAA:
    def test_taa_converges_static(self):
        import jax

        h = w = 24
        truth = jnp.tile(jnp.linspace(0, 1, w)[None, :, None], (h, 1, 3))
        state = taa.init_state(h, w)
        motion = jnp.zeros((h, w, 2))
        for f in range(20):
            noisy = truth + jax.random.normal(jax.random.PRNGKey(f), (h, w, 3)) * 0.1
            out, state = taa.resolve(state, noisy, motion, h, w)
        assert float(jnp.abs(out - truth).mean()) < 0.035

    def test_taa_upscales(self):
        h = w = 16
        state = taa.init_state(h * 2, w * 2)
        color = jnp.ones((h, w, 3)) * 0.5
        out, state = taa.resolve(state, color, jnp.zeros((h, w, 2)), h * 2, w * 2)
        assert out.shape == (h * 2, w * 2, 3)
        np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-5)

    def test_sharpen_bounded(self):
        import jax

        img = jax.random.uniform(jax.random.PRNGKey(2), (16, 16, 3))
        out = taa.sharpen(img, 0.5)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


class TestBloom:
    def test_bloom_preserves_flat_energy(self):
        img = jnp.full((64, 64, 3), 0.25)
        out = bloom.apply(img, strength=0.05)
        np.testing.assert_allclose(np.asarray(out).mean(), 0.25, rtol=0.35)

    def test_bloom_spreads_highlight(self):
        img = jnp.zeros((64, 64, 3)).at[32, 32].set(100.0)
        out = bloom.apply(img, strength=0.5)
        # energy leaks to neighbors
        assert float(out[32, 36].sum()) > 0.0
        assert float(out[32, 32].sum()) < 300.0

    def test_bloom_finite(self):
        import jax

        img = jax.random.uniform(jax.random.PRNGKey(3), (48, 80, 3)) * 10
        out = bloom.apply(img)
        assert bool(jnp.isfinite(out).all())
