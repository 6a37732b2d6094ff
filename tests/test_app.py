"""Full frame-graph (App) tests: the benchmark config #5 pipeline —
ReSTIR DI + SHARC + denoise + TAA + bloom + tonemap at 1 SPP."""

import numpy as np
import pytest

from tpu_pbrt.models.cornell import make_cornell_box, make_cornell_camera
from tpu_pbrt.render.app import App
from tpu_pbrt.utils import config


def make_app(**over):
    s = config.GraphicsSettings()
    s.width = over.pop("width", 32)
    s.height = over.pop("height", 32)
    s.raytracing.bounces = over.pop("bounces", 3)
    s.raytracing.sharc_capacity_log2 = 12
    s.raytracing.sharc_scene_scale = 10.0
    for k, v in over.pop("rt", {}).items():
        setattr(s.raytracing, k, v)
    for k, v in over.pop("pp", {}).items():
        setattr(s.post_processing, k, v)
    s.check()
    scene = make_cornell_box()
    cam = make_cornell_camera(s.width, s.height)
    return App(scene=scene, camera=cam, settings=s)


@pytest.fixture(scope="module")
def default_app():
    # one shared config -> one full-pipeline compile for the whole module
    # (tonemap/bloom off so quantitative tests can reuse it; display encode
    # is exercised via ops/tonemap directly)
    return make_app(pp={"tonemap_operator": "none", "bloom": False})


class TestFullPipeline:
    def test_default_pipeline_runs(self, default_app):
        from tpu_pbrt.ops import tonemap

        app = default_app
        for _ in range(3):
            img, rays = app.tick()
        a = np.asarray(img)
        assert a.shape == (32, 32, 3)
        assert np.isfinite(a).all()
        assert a.mean() > 0.01
        assert float(rays) > 32 * 32
        display = np.asarray(tonemap.to_srgb8(tonemap.aces_filmic(img)))
        assert display.dtype == np.uint8

    def test_temporal_stability(self, default_app):
        """With every temporal system on, consecutive frames of a static
        scene must converge to low frame-to-frame variance at 1 SPP."""
        app = default_app
        frames = [np.asarray(app.tick()[0]) for _ in range(8)]
        early = np.abs(frames[1] - frames[2]).mean()
        late = np.abs(frames[-2] - frames[-1]).mean()
        assert late < early * 0.9 or late < 0.02, (early, late)

    def test_plain_pt_mode(self):
        app = make_app(rt={"restir_di": False, "sharc": False},
                       pp={"denoiser": "none", "upscaler": "none",
                           "bloom": False})
        img, _ = app.tick()
        assert np.isfinite(np.asarray(img)).all()

    def test_super_resolution_scale(self):
        app = make_app(width=16, height=16, bounces=1,
                       rt={"restir_di": False, "sharc": False},
                       pp={"super_resolution_scale": 0.5,
                           "denoiser": "none", "bloom": False})
        assert app.render_w == 8 and app.render_h == 8
        img, _ = app.tick()
        assert np.asarray(img).shape == (16, 16, 3)

    def test_reset_history(self, default_app):
        app = default_app
        app.history = app.reset_history()
        img, _ = app.tick()
        assert np.isfinite(np.asarray(img)).all()

    def test_auto_history_reset_on_teleport(self, default_app):
        """A camera cut must clear the temporal history automatically
        (reference: m_resetHistory, App.cpp:677-689) — no ghost trail."""
        app = default_app
        app.history = app.reset_history()
        for _ in range(4):
            app.tick()
        assert float(np.max(np.asarray(app.history.denoiser.history_len))) > 1
        # teleport: move by more than TELEPORT_FRACTION * scene diagonal
        app.camera.position = app.camera.position + np.asarray(
            [0.6 * app._scene_diag, 0.0, 0.0], np.float32)
        app.tick()
        # history was rebuilt from scratch this frame: max length is 1
        assert float(np.max(np.asarray(
            app.history.denoiser.history_len))) <= 1.0
        assert np.asarray(app.history.restir.reservoir.m).max() >= 0
        # move the camera back so later tests in the module see the
        # original framing (fixture is module-scoped)
        app.camera.position = app.camera.position - np.asarray(
            [0.6 * app._scene_diag, 0.0, 0.0], np.float32)
        app.tick()

    def test_auto_history_reset_on_settings_change(self):
        app = make_app(pp={"tonemap_operator": "none", "bloom": False})
        for _ in range(3):
            app.tick()
        assert float(np.max(np.asarray(app.history.denoiser.history_len))) > 1
        app.settings.post_processing.exposure = 2.0
        app.tick()
        assert float(np.max(np.asarray(
            app.history.denoiser.history_len))) <= 1.0

    def test_di_composition_matches_reference_estimator(self, default_app):
        """ReSTIR-composited direct+indirect should sit near the plain
        NEE path tracer's converged mean (both unbiased-ish for this
        scene). Uses the shared app (denoise/TAA on — they converge to the
        same mean for a static camera)."""
        app = default_app
        acc = None
        n = 16
        for _ in range(n):
            img, _ = app.tick()
            a = np.asarray(img)
            acc = a if acc is None else acc + a
        composed = (acc / n).mean()

        from tpu_pbrt.passes.pathtrace import PathTraceSettings
        from tpu_pbrt.render.renderer import Renderer

        scene = make_cornell_box()
        cam = make_cornell_camera(32, 32)
        r = Renderer(scene, 32, 32, PathTraceSettings(bounces=3))
        ref = np.asarray(r.render_mean(cam, 16)).mean()
        # denoiser+TAA carry a small darkening bias on spiky 1-SPP input
        assert abs(composed / ref - 1.0) < 0.45, (composed, ref)


def test_debug_nans_sanitizer_raises():
    """utils/debug.py: jax_debug_nans wiring catches a NaN-producing op
    (the debug-layer/DRED analogue; SURVEY §5)."""
    import jax
    import jax.numpy as jnp
    import pytest as _pytest

    from tpu_pbrt.utils import debug as debug_mod

    debug_mod.enable_debug()
    try:
        with _pytest.raises(Exception):
            jax.jit(lambda x: jnp.log(x) * 0.0 + jnp.sqrt(x))(
                jnp.float32(-1.0)).block_until_ready()
    finally:
        jax.config.update("jax_debug_nans", False)


def test_chromatic_aberration_and_color_rotations():
    """postfx chromatic aberration shifts R/B radially; all three HDR
    color rotations are available (MyAppData.h:316-320)."""
    import jax.numpy as jnp
    import numpy as np

    from tpu_pbrt.passes import postfx
    from tpu_pbrt.ops import tonemap

    img = jnp.zeros((32, 64, 3)).at[16, 48, :].set(1.0)
    out = np.asarray(postfx.chromatic_aberration(img, 0.03))
    # green unchanged; red pulled outward (toward larger x), blue inward
    assert out[16, 48, 1] == 1.0
    rx = np.argmax(out[16, :, 0])
    bx = np.argmax(out[16, :, 2])
    assert rx < 48 < bx or out[16, 48, 0] < 1.0  # red sampled inward
    assert bx <= 48

    x = jnp.asarray([[0.2, 0.5, 0.9]])
    for rot in ("rec709_to_rec2020", "dcip3d65_to_rec2020",
                "rec709_to_dcip3d65"):
        y = np.asarray(tonemap.apply(x, "st2084", 1.0, 200.0, rot))
        assert np.isfinite(y).all() and (y >= 0).all() and (y <= 1).all()

    # rows of every rotation matrix sum to ~1 (white maps to white)
    for m in tonemap.ROTATIONS.values():
        np.testing.assert_allclose(np.asarray(m).sum(1), 1.0, atol=2e-3)
