"""North-star quality regression gate (BASELINE.json): SSIM of the
reconstructed golden scene against the reference golden screenshot.

The number of record is `tools/golden_ssim.py <frames> <prefix> app` on
the TPU (480x360 full frame, PARITY.md) — the golden frame IS the 1-SPP
ReSTIR + SHARC + denoise + TAA flagship config, so this CPU gate renders
through the SAME App frame graph (small res, few ticks) rather than the
plain accumulating Renderer the rounds 1-4 gate used. The assertion
bound leaves noise margin and exists to catch regressions in framing,
palette, foreground layout, exposure handling, denoiser quality, or
global illumination, not to track the absolute target (the reference's
scene assets are not shipped; models/golden.py reconstructs them from
the screenshot — see its docstring)."""

import numpy as np

from tpu_pbrt.utils.image import read_png, ssim

GOLDEN = "/root/reference/Screenshots/Cornell Box.png"


def test_golden_scene_ssim_floor_app_graph():
    from PIL import Image

    from tpu_pbrt.models.golden import make_golden_scene, make_golden_camera
    from tpu_pbrt.ops import tonemap as tm
    from tpu_pbrt.render.app import App
    from tpu_pbrt.utils.config import GraphicsSettings

    w, h = 160, 120
    ref = read_png(GOLDEN)             # full frame: black bars included
    ref_small = np.asarray(
        Image.fromarray(ref).resize((w, h), Image.LANCZOS), np.float32
    ) / 255.0

    s = GraphicsSettings()
    s.width, s.height = w, h
    s.post_processing.tonemap_operator = "none"   # linear out; swept below
    s.post_processing.bloom = False
    s.post_processing.super_resolution_scale = 1.0  # quality protocol
    s.check()
    scene = make_golden_scene()
    app = App(scene, make_golden_camera(w, h), s)
    out = None
    for _ in range(32):
        out, _ = app.tick()
    linear = np.asarray(out)
    assert np.isfinite(linear).all()

    best = 0.0
    for e in (0.08, 0.10, 0.125):
        ours = np.asarray(tm.to_srgb8(tm.aces_filmic(linear, e)),
                          np.float32) / 255.0
        best = max(best, float(ssim(ours, ref_small)))
    assert best > FLOOR, f"golden app-graph SSIM regressed: {best:.4f}"


FLOOR = 0.55  # measured 0.647 (48f) at 160x120 with the round-5 defaults
#               (aces 0.10); 32f sits within a few points — noise margin
