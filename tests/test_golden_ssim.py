"""North-star quality regression gate (BASELINE.json): SSIM of a converged
render of the reconstructed golden scene against the reference golden
screenshot.

The full measurement is `tools/golden_ssim.py` (v5e, 480x360 full-frame,
recorded in PARITY.md). This CPU gate runs a light configuration
(160x120, 32 frames) — the assertion bound leaves noise margin and exists
to catch regressions in framing, palette, foreground layout, exposure
handling, or global illumination, not to track the absolute target (the
reference's scene assets are not shipped; models/golden.py reconstructs
them from the screenshot — see its docstring)."""

import numpy as np

from tpu_pbrt.utils.image import read_png, ssim

GOLDEN = "/root/reference/Screenshots/Cornell Box.png"


def test_golden_scene_ssim_floor():
    from PIL import Image

    from tpu_pbrt.models.golden import make_golden_scene, make_golden_camera
    from tpu_pbrt.passes.pathtrace import PathTraceSettings
    from tpu_pbrt.render.renderer import Renderer

    w, h = 160, 120
    ref = read_png(GOLDEN)             # full frame: side bars included
    ref_small = np.asarray(
        Image.fromarray(ref).resize((w, h), Image.LANCZOS), np.float32
    ) / 255.0

    scene = make_golden_scene()
    cam = make_golden_camera(w, h)
    r = Renderer(scene, w, h, PathTraceSettings(bounces=5))
    hdr = np.asarray(r.render_mean(cam, 32))
    best = 0.0
    for e in (0.18, 0.22, 0.27):
        ours = np.asarray(r.tonemapped(hdr, operator="reinhard",
                                       exposure=e), np.float32) / 255.0
        best = max(best, float(ssim(ours, ref_small)))
    assert best > FLOOR, f"golden SSIM regressed: {best:.4f}"


FLOOR = 0.40  # measured 0.4619 at this config with the round-3
#               silhouette-descent layout defaults (noise margin)
