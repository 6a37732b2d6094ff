"""North-star quality gate (BASELINE.json): converged render of the
reconstructed golden scene vs the reference golden screenshot
/root/reference/Screenshots/Cornell Box.png.

The reference repo does NOT ship its scene assets (App.cpp:129 loads
Assets/Scenes/Default.json, which is absent), so models/golden.py
reconstructs the screenshot's content procedurally: camera solved from
back-wall corner columns (3.5 m behind the opening, vfov 75.2), Cornell
shell, mirror-black tall block, low-poly metallic bunny, perforated ball
luminaire on a wooden base. The comparison is FULL-FRAME at the
reference's 4:3 aspect (480x360) — the black side bars are part of the
framing and are compared too.

Usage: python tools/golden_ssim.py [frames] [out_prefix] [pt|app]
`pt` (default) accumulates the converged path-traced estimator; `app`
runs the FULL flagship frame graph (ReSTIR DI + SHARC + denoise + TAA +
bloom + tonemap — the golden frame IS the flagship config) for `frames`
ticks with a static camera and scores the final displayed frame.
Writes /tmp/<prefix>_ours.png, /tmp/<prefix>_ref.png, prints SSIM JSON.
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("TPU_PBRT_CPU"):
    # the preconfigured axon platform's default wins over JAX_PLATFORMS
    # (see tests/conftest.py) and its backend init BLOCKS when the TPU
    # tunnel is down — force the CPU protocol explicitly
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

W, H = 480, 360


def render_converged(frames):
    from tpu_pbrt.models.golden import make_golden_scene, make_golden_camera
    from tpu_pbrt.passes.pathtrace import PathTraceSettings
    from tpu_pbrt.render.renderer import Renderer

    scene = make_golden_scene()
    cam = make_golden_camera(W, H)
    r = Renderer(scene, W, H,
                 PathTraceSettings(bounces=6, samples_per_pixel=1))
    hdr = r.render_accumulated(cam, frames=frames)
    return np.asarray(hdr), r


def render_app_graph(frames, scene=None):
    """LINEAR final frame of the full App graph after `frames` ticks.

    Display calibration (bloom strength + exposure + tonemap) is swept
    separately on the returned linear frame via `post_score_grid` — it is
    a pure tail after TAA (render/app.py `bloom_tonemap` scope), so
    rendering once per scene and re-posting is exact and saves an
    app-graph recompile per calibration pair."""
    from tpu_pbrt.models.golden import make_golden_scene, make_golden_camera
    from tpu_pbrt.render.app import App
    from tpu_pbrt.utils.config import GraphicsSettings

    s = GraphicsSettings()
    s.width, s.height = W, H
    s.post_processing.tonemap_operator = "none"
    s.post_processing.bloom = False
    # quality protocol: full internal resolution (the 0.5 default is the
    # realtime perf config; TAA-upscaled 2x is visibly softer than the
    # reference screenshot and costs SSIM structure)
    s.post_processing.super_resolution_scale = 1.0
    s.check()
    if scene is None:
        scene = make_golden_scene()
    cam = make_golden_camera(W, H)
    app = App(scene, cam, s)
    out = None
    for _ in range(frames):
        out, _ = app.tick()
    return np.asarray(out)


def post_score_grid(linear_hdr, ref_small,
                    exposures=(0.08, 0.10, 0.125, 0.15, 0.18, 0.22, 0.27),
                    blooms=(0.0, 0.05, 0.08, 0.11),
                    operators=("reinhard", "aces")):
    """Sweep display calibration over a LINEAR rendered frame: bloom →
    tonemap → sRGB8, exposure/strength as TRACED scalars so the whole
    grid shares one jit per operator (the reference app defaults to ACES,
    MyAppData.h tonemap default; the golden screenshot's curve is
    unknown, so both film curves are tried).
    Returns (best_ssim, (operator, exposure), bloom, img8)."""
    import jax
    import jax.numpy as jnp

    from tpu_pbrt.ops import tonemap as tm
    from tpu_pbrt.passes import bloom as bloom_mod
    from tpu_pbrt.utils.image import ssim

    curves = {"reinhard": tm.reinhard, "aces": tm.aces_filmic}

    @functools.partial(jax.jit, static_argnums=3)
    def post(img, exposure, strength, op):
        img = bloom_mod.apply(img, strength)
        return tm.to_srgb8(curves[op](img, exposure))

    img = jnp.asarray(linear_hdr)
    best = (-1.0, None, None, None)
    for op in operators:
        for bl in blooms:
            for exp in exposures:
                ours8 = np.asarray(post(img, exp, bl, op))
                val = ssim(np.asarray(ours8, np.float32) / 255.0, ref_small)
                if val > best[0]:
                    best = (float(val), (op, exp), bl, ours8)
    return best


def ssim_map_report(ours_path: str):
    """Where does the comparison lose? Writes /tmp/<name>_ssimmap.png
    (dark = mismatch) and prints a 4x6 region table of local SSIM means,
    so tuning targets regions instead of the scalar."""
    from PIL import Image

    from tpu_pbrt.utils.image import read_png, ssim_map, write_png

    ref = read_png("/root/reference/Screenshots/Cornell Box.png")
    ref_small = np.asarray(
        Image.fromarray(ref).resize((W, H), Image.LANCZOS),
        np.float32) / 255.0
    ours = np.asarray(read_png(ours_path), np.float32) / 255.0
    if ours.shape[:2] != (H, W):
        ours = np.asarray(Image.fromarray(
            (ours * 255).astype(np.uint8)).resize((W, H), Image.LANCZOS),
            np.float32) / 255.0
    m = ssim_map(ours, ref_small)
    out = os.path.splitext(os.path.basename(ours_path))[0] + "_ssimmap.png"
    write_png(f"/tmp/{out}",
              (np.clip(m, 0, 1) * 255).astype(np.uint8)[..., None].repeat(
                  3, axis=-1))
    rows, cols = 4, 6
    mh, mw = m.shape[0] // rows, m.shape[1] // cols
    table = [[round(float(np.mean(
        m[r * mh:(r + 1) * mh, c * mw:(c + 1) * mw])), 3)
        for c in range(cols)] for r in range(rows)]
    print(json.dumps({"ssim": round(float(np.mean(m)), 4),
                      "region_table_4x6": table,
                      "map": f"/tmp/{out}"}))


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "map":
        ssim_map_report(sys.argv[2] if len(sys.argv) > 2
                        else "/tmp/golden_ours.png")
        return
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    prefix = sys.argv[2] if len(sys.argv) > 2 else "golden"
    graph = sys.argv[3] if len(sys.argv) > 3 else "pt"

    if graph == "app":
        from tpu_pbrt.utils.image import read_png, write_png
        from PIL import Image

        ref = read_png("/root/reference/Screenshots/Cornell Box.png")
        ref_small = np.asarray(
            Image.fromarray(ref).resize((W, H), Image.LANCZOS),
            np.float32) / 255.0
        linear = render_app_graph(frames)
        best = post_score_grid(linear, ref_small)
        write_png(f"/tmp/{prefix}_app_ours.png", best[3])
        print(json.dumps({"ssim_vs_reference_golden": round(best[0], 4),
                          "graph": "app", "exposure": best[1],
                          "bloom_strength": best[2], "frames": frames,
                          "res": [W, H]}))
        return

    from PIL import Image
    import jax.numpy as jnp

    from tpu_pbrt.utils.image import read_png, ssim, write_png
    from tpu_pbrt.passes import bloom as bloom_mod

    ref = read_png("/root/reference/Screenshots/Cornell Box.png")
    ref_small = np.asarray(
        Image.fromarray(ref).resize((W, H), Image.LANCZOS), np.float32
    ) / 255.0

    hdr, r = render_converged(frames)

    # the reference screenshot's display exposure/bloom strength are
    # unpublished — sweep ours and report the best match (display
    # calibration, not content)
    best = (-1.0, None, None, None)
    for bl in (0.0, 0.06, 0.1, 0.15):
        h2 = np.asarray(bloom_mod.apply(jnp.asarray(hdr), bl)) if bl \
            else hdr
        for exp in (0.12, 0.15, 0.18, 0.22, 0.27, 0.33):
            ours8 = r.tonemapped(h2, operator="reinhard", exposure=exp)
            val = ssim(np.asarray(ours8, np.float32) / 255.0, ref_small)
            if val > best[0]:
                best = (val, exp, bl, ours8)

    write_png(f"/tmp/{prefix}_ours.png", best[3])
    write_png(f"/tmp/{prefix}_ref.png", (ref_small * 255).astype(np.uint8))

    print(json.dumps({"ssim_vs_reference_golden": round(best[0], 4),
                      "exposure": best[1], "bloom": best[2],
                      "frames": frames, "res": [W, H],
                      "note": "reconstructed golden scene "
                              "(reference assets not in repo)"}))


if __name__ == "__main__":
    main()
