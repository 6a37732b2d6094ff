"""Golden-scene material sweep through the FULL app graph on TPU.

The round-3 SSIM map (tools/golden_ssim.py map) localizes the remaining
loss in the foreground: the reference bunny is polished metal with
strong red/green facet reflections, while our 0.45 roughness (ranked on
NOISY low-frame CPU renders, which biases against mirror materials) is
washed-out white. The app graph's denoiser removes that bias — rank
smooth-material variants on the denoised output.

Self-bounded (fixed variant list x fixed frames), exits cleanly, ONE TPU
process. Usage: python tools/g3_app_sweep.py [frames] [WxH] [names]
(WxH defaults to 480x360 — pass e.g. 240x180 for the CPU protocol;
names: comma-separated variant filter, e.g. base,light-neutral.)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("TPU_PBRT_CPU"):
    # axon's platform default wins over JAX_PLATFORMS and blocks when the
    # TPU tunnel is down (tests/conftest.py note) — force CPU explicitly
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

W, H = 480, 360


_REF_SMALL = None


def _ref_small():
    global _REF_SMALL
    if _REF_SMALL is None:
        from PIL import Image

        from tpu_pbrt.utils.image import read_png

        ref = read_png("/root/reference/Screenshots/Cornell Box.png")
        _REF_SMALL = np.asarray(
            Image.fromarray(ref).resize((W, H), Image.LANCZOS),
            np.float32) / 255.0
    return _REF_SMALL


_APPS = {}


def render_variant(scene_kwargs, frames):
    """Render the variant ONCE (linear output) and sweep the display
    calibration on the frame via golden_ssim.post_score_grid — the
    bloom/exposure/tonemap tail is pure post (render/app.py), so this is
    exact and costs one app jit per geometry SHAPE signature (scene and
    tracer are traced args of App._step, so same-shape variants reuse
    the compile by swapping them in) instead of one per calibration
    pair."""
    import jax

    from golden_ssim import post_score_grid

    from tpu_pbrt.models.golden import make_golden_camera, make_golden_scene
    from tpu_pbrt.ops import tracer as tracer_mod
    from tpu_pbrt.render.app import App
    from tpu_pbrt.utils.config import GraphicsSettings

    scene_kwargs = dict(scene_kwargs)
    settings_kwargs = scene_kwargs.pop("_settings", {})
    scene = make_golden_scene(**scene_kwargs)
    sig = tuple((leaf.shape, str(leaf.dtype))
                for leaf in jax.tree_util.tree_leaves(scene))
    sig = (sig, tuple(sorted(settings_kwargs.items())))
    app = _APPS.get(sig)
    if app is None:
        s = GraphicsSettings()
        s.width, s.height = W, H
        s.post_processing.tonemap_operator = "none"
        s.post_processing.bloom = False
        # quality protocol: full internal res (see golden_ssim)
        s.post_processing.super_resolution_scale = 1.0
        for k, v in settings_kwargs.items():
            obj = s
            parts = k.split(".")
            for p in parts[:-1]:
                obj = getattr(obj, p)
            setattr(obj, parts[-1], v)
        s.check()
        app = App(scene, make_golden_camera(W, H), s)
        _APPS[sig] = app
    else:
        app.scene = scene
        app.tracer = tracer_mod.build_for_scene(scene)
        app.camera = make_golden_camera(W, H)
        app.camera.aspect = app.out_w / app.out_h
        app.history = app.reset_history()
        app.frame_index = 0
        app._last_pose = None
    out = None
    for _ in range(frames):
        out, _ = app.tick()
    val, e, b, ours8 = post_score_grid(np.asarray(out), _ref_small())
    return val, e, b, ours8


def region_report(ours8):
    """Per-region RGB means (ours vs reference): red wall, green wall,
    floor, back wall — the color-matching diagnostics."""
    ref = _ref_small() * 255.0
    ours = np.asarray(ours8, np.float32)
    # fractions of the 480x360 frame so the report tracks any WxH
    fr = {"red_wall": (0.125, 0.271, 0.333, 0.722),
          "green_wall": (0.750, 0.896, 0.333, 0.722),
          "floor": (0.417, 0.583, 0.833, 0.972),
          "back_wall": (0.4375, 0.5625, 0.278, 0.444)}
    regions = {k: (int(fx0 * W), int(fx1 * W), int(fy0 * H), int(fy1 * H))
               for k, (fx0, fx1, fy0, fy1) in fr.items()}
    out = {}
    for name, (x0, x1, y0, y1) in regions.items():
        out[name] = {
            "ref": [round(float(v), 1)
                    for v in ref[y0:y1, x0:x1].mean((0, 1))],
            "ours": [round(float(v), 1)
                     for v in ours[y0:y1, x0:x1].mean((0, 1))]}
    return out


# the pre-silhouette-descent placement (now superseded as defaults) —
# kept as an A/B variant so the denoised TPU rank can veto the bake
_OLD_LAYOUT = {
    "bunny_center": (405.0, 215.0), "bunny_yaw": 0.0,
    "bunny_head_up": 1.0, "bunny_ear_tilt": -26.0, "bunny_ear_len": 1.0,
    "block_center": (185.0, 420.0), "block_rot": -17.0,
    "ball_center": (86.0, 200.0), "ball_radius": 62.0,
    "light_scale": 1.0,
}


def main():
    global W, H
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    if len(sys.argv) > 2:
        W, H = (int(v) for v in sys.argv[2].split("x"))
    variants = [
        ("base", {}),
        ("bunny-mirror15", {"bunny_roughness": 0.15}),
        ("bunny-mirror25", {"bunny_roughness": 0.25}),
        ("bunny-mirror35", {"bunny_roughness": 0.35}),
        ("ball-mirror25", {"ball_roughness": 0.25}),
        ("both-mirror", {"bunny_roughness": 0.2, "ball_roughness": 0.3}),
        # geometry candidates (CPU low-frame ranking is unreliable on
        # mirror materials — rank them here on the denoised graph):
        ("ball-faceholes", {"face_hole_deg": 10.0}),
        ("ball-hole2", {"hole2_deg": 7.0}),
        ("bunny-jitter", {"bunny_jitter": 0.10}),
        ("bunny-jitter-mirror", {"bunny_jitter": 0.10,
                                 "bunny_roughness": 0.25}),
        # base now IS the silhouette-descent layout; A/B against the
        # old placement and the ear-pose alternatives
        ("layout-old", _OLD_LAYOUT),
        ("tall-ears", {"bunny_ear_len": 1.0}),
        ("all-in", {"bunny_roughness": 0.25, "ball_roughness": 0.3,
                    "bunny_jitter": 0.10, "face_hole_deg": 10.0}),
        # Color-descent step 1 (CPU 240x180x96f, full-res+aces protocol,
        # 2026-08-19): base 0.6699 -> light-neutral 0.6752 -> light-cool
        # 0.6778 -> walls-desat 0.6813 -> cool-desat 0.6841 (winner,
        # BAKED as models/golden.py defaults). Step-2 levers from
        # cool-desat's residual regions: floor reads (+7.7,+6.7,+0.3)
        # bright-warm, back wall (-5.5,-7.8,-8.4) dark — floor and back
        # wall now carry independent tints.
        ("floor-dim", {"floor_tint": (0.93, 0.93, 1.0)}),
        ("back-bright", {"back_tint": (1.05, 1.07, 1.08)}),
        ("floor-back", {"floor_tint": (0.93, 0.93, 1.0),
                        "back_tint": (1.05, 1.07, 1.08)}),
        ("floor-back2", {"floor_tint": (0.90, 0.90, 1.0),
                         "back_tint": (1.08, 1.10, 1.12)}),
        # Round-4: the 0.7268 app-mode frame's walls carry low-frequency
        # mottle the 2-iteration à-trous cannot reach (reference
        # NRD-class denoisers run ~5 levels) — rank deeper chains, plus
        # coarser SHARC voxels (smoother GI) and the combo with the
        # mirror-bunny candidate
        ("dn4", {"_settings": {"post_processing.denoiser_iterations": 4}}),
        ("dn5", {"_settings": {"post_processing.denoiser_iterations": 5}}),
        ("sharc-coarse", {"_settings": {"raytracing.sharc_scene_scale":
                                        25.0}}),
        ("dn5-mirror", {"bunny_roughness": 0.25,
                        "_settings": {
                            "post_processing.denoiser_iterations": 5}}),
        ("dn5-all", {"bunny_roughness": 0.25, "ball_roughness": 0.3,
                     "_settings": {
                         "post_processing.denoiser_iterations": 5,
                         "raytracing.sharc_scene_scale": 25.0}}),
        # Round-4h: side-by-side vs the screenshot (see PARITY) shows
        # (a) the black slab's reflection is a faint smudge — as black
        # METAL the reflection is tinted to 5%; the reference reads as
        # piano-black dielectric (untinted Fresnel) or dark chrome;
        # (b) our ceiling is washed bright where the reference's is dim.
        ("block-dielectric", {"block_metallic": 0.0,
                              "block_base": (0.02, 0.02, 0.022),
                              "block_rough": 0.02}),
        ("block-chrome30", {"block_base": (0.30, 0.30, 0.32),
                            "block_rough": 0.03}),
        ("block-chrome50", {"block_base": (0.50, 0.50, 0.52),
                            "block_rough": 0.05}),
        ("ceil-dim", {"ceil_tint": (0.85, 0.85, 0.88)}),
        ("ceil-dim2", {"ceil_tint": (0.70, 0.70, 0.74)}),
        ("block-ceil", {"block_metallic": 0.0,
                        "block_base": (0.02, 0.02, 0.022),
                        "block_rough": 0.02,
                        "ceil_tint": (0.85, 0.85, 0.88)}),
        # Round-5: the 480x360 side-by-side crops (PARITY round-5 notes)
        # show four content deltas the map localizes to the 0.22-0.53
        # regions: (a) our head floats HIGH with a neck gap — reference
        # head is tucked low/forward; (b) ears read LONG, nearly
        # body-length, fanned over the back; (c) the reference ball's
        # holes GLOW (core lights them) and cast dapples on the red wall
        # — ours are dark pits; (d) reference facets are large and
        # IRREGULAR with mirror-contrast — ours read as a regular
        # geodesic dome.
        ("pose-tuck", {"bunny_head_up": 0.7}),
        ("pose-ears", {"bunny_ear_len": 1.3}),
        ("pose-both", {"bunny_head_up": 0.7, "bunny_ear_len": 1.3}),
        ("core-glow30", {"core_radiance": (30.0, 29.5, 31.0)}),
        ("core-glow60", {"core_radiance": (60.0, 59.0, 62.0)}),
        ("r5-combo", {"bunny_head_up": 0.7, "bunny_ear_len": 1.3,
                      "bunny_jitter": 0.10, "bunny_roughness": 0.25,
                      "core_radiance": (30.0, 29.5, 31.0),
                      "block_base": (0.30, 0.30, 0.32),
                      "block_rough": 0.03}),
        ("r5-combo-chrome50", {"bunny_head_up": 0.7, "bunny_ear_len": 1.3,
                               "bunny_jitter": 0.10,
                               "bunny_roughness": 0.25,
                               "core_radiance": (30.0, 29.5, 31.0),
                               "block_base": (0.50, 0.50, 0.52),
                               "block_rough": 0.05}),
        # Round-5b: ceil-dim + pose-tuck baked; the residual bunny-region
        # loss tracks BRIGHTNESS (a pure metal mirrors the dark room; the
        # screenshot bunny reads as bright semi-diffuse silver, and its
        # mirror-block reflection is bright BECAUSE the bunny is) — sweep
        # the metallic/roughness plane around brighter semi-diffuse
        # points
        ("bunny-semi50", {"bunny_metallic": 0.5, "bunny_roughness": 0.5,
                          "bunny_base": (0.85, 0.85, 0.84)}),
        ("bunny-semi70", {"bunny_metallic": 0.7, "bunny_roughness": 0.4,
                          "bunny_base": (0.88, 0.88, 0.87)}),
        ("bunny-diffuse", {"bunny_metallic": 0.25,
                           "bunny_roughness": 0.6,
                           "bunny_base": (0.82, 0.82, 0.81)}),
        ("bunny-semi50-jit", {"bunny_metallic": 0.5,
                              "bunny_roughness": 0.5,
                              "bunny_base": (0.85, 0.85, 0.84),
                              "bunny_jitter": 0.10}),
        ("bunny-big", {"bunny_scale": 105.0}),
        ("bunny-small", {"bunny_scale": 86.0}),
    ]
    if len(sys.argv) > 3:
        keep = set(sys.argv[3].split(","))
        variants = [v for v in variants if v[0] in keep]
    # calibration (exposure x bloom) is swept on the rendered linear
    # frame (one post jit), so variants cost ONE app render each and the
    # grid can be wide — see golden_ssim.post_score_grid defaults.
    best_overall = (-1.0, None)
    for name, kw in variants:
        val, e, b, ours8 = render_variant(kw, frames)
        row = {"v": name, "ssim": round(val, 4), "exposure": e,
               "bloom": b, "frames": frames}
        if val > best_overall[0] or len(variants) <= 8:
            row["regions"] = region_report(ours8)
        if val > best_overall[0]:
            best_overall = (val, name)
        print(json.dumps(row), flush=True)
    print(json.dumps({"BEST": best_overall[1],
                      "ssim": round(best_overall[0], 4)}), flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
