"""North-star quality regression gate (BASELINE.json): SSIM of a converged
Cornell render against the reference golden screenshot.

The full measurement is `tools/golden_ssim.py 1024` (v5e, recorded in
PARITY.md: 0.3819 at 480x270 / exposure 3.0). This CPU gate runs a light
configuration (160x90, 24 frames) whose measured value is 0.259 — the
assertion bound leaves noise margin and exists to catch regressions in
layout, palette, exposure handling, or global illumination, not to track
the absolute target (the reference's foreground assets are not shipped,
see tools/golden_ssim.py docstring)."""

import numpy as np

from tpu_pbrt.utils.image import read_png, ssim

GOLDEN = "/root/reference/Screenshots/Cornell Box.png"


def test_cornell_golden_ssim_floor():
    from PIL import Image

    from tpu_pbrt.models.cornell import make_cornell_box, make_cornell_camera
    from tpu_pbrt.passes.pathtrace import PathTraceSettings
    from tpu_pbrt.render.renderer import Renderer

    w, h = 160, 90
    ref = read_png(GOLDEN)[180:1260]   # crop the letterbox bars
    ref_small = np.asarray(
        Image.fromarray(ref).resize((w, h), Image.LANCZOS), np.float32
    ) / 255.0

    scene = make_cornell_box()
    cam = make_cornell_camera(w, h)
    r = Renderer(scene, w, h, PathTraceSettings(bounces=4))
    hdr = np.asarray(r.render_mean(cam, 24))
    ours = np.asarray(r.tonemapped(hdr, exposure=3.0), np.float32) / 255.0

    val = float(ssim(ours, ref_small))
    assert val > 0.22, f"golden SSIM regressed: {val:.4f} (measured 0.259)"
