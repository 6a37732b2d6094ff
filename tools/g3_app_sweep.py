"""Golden-scene material sweep through the FULL app graph on TPU.

The round-3 SSIM map (tools/golden_ssim.py map) localizes the remaining
loss in the foreground: the reference bunny is polished metal with
strong red/green facet reflections, while our 0.45 roughness (ranked on
NOISY low-frame CPU renders, which biases against mirror materials) is
washed-out white. The app graph's denoiser removes that bias — rank
smooth-material variants on the denoised output.

Self-bounded (fixed variant list x fixed frames), exits cleanly, ONE TPU
process. Usage: python tools/g3_app_sweep.py [frames]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

W, H = 480, 360


def render_variant(scene_kwargs, frames, exposures, blooms):
    from PIL import Image

    from tpu_pbrt.models.golden import make_golden_camera, make_golden_scene
    from tpu_pbrt.ops import tonemap as tm
    from tpu_pbrt.render.app import App
    from tpu_pbrt.utils.config import GraphicsSettings
    from tpu_pbrt.utils.image import read_png, ssim

    ref = read_png("/root/reference/Screenshots/Cornell Box.png")
    ref_small = np.asarray(
        Image.fromarray(ref).resize((W, H), Image.LANCZOS),
        np.float32) / 255.0

    best = (-1.0, None, None)
    scene = make_golden_scene(**scene_kwargs)
    for exposure in exposures:
        for bl in blooms:
            s = GraphicsSettings()
            s.width, s.height = W, H
            s.post_processing.tonemap_operator = "reinhard"
            s.post_processing.exposure = exposure
            s.post_processing.bloom_strength = bl
            s.check()
            cam = make_golden_camera(W, H)
            app = App(scene, cam, s)
            out = None
            for _ in range(frames):
                out, _ = app.tick()
            ours8 = np.asarray(tm.to_srgb8(out))
            val = ssim(np.asarray(ours8, np.float32) / 255.0, ref_small)
            if val > best[0]:
                best = (val, exposure, bl)
    return best


_SIL_LAYOUT = {
    "bunny_center": (382.0, 205.0), "bunny_yaw": -8.0,
    "bunny_head_up": 1.15, "bunny_ear_tilt": 36.0, "bunny_ear_len": 0.6,
    "block_center": (200.0, 435.0), "block_rot": -25.0,
    "ball_center": (98.0, 158.0), "ball_radius": 56.0,
    "light_scale": 1.1,
}


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 192
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
        # refined layout from tools/g3_silhouette.py (noise-free
        # G-buffer edge chamfer 0.54 -> 1.18 with light added; the
        # noisy CPU SSIM cannot resolve it — rank on denoised output)
        ("layout-sil", _SIL_LAYOUT),
        ("layout-sil-defears", {**_SIL_LAYOUT, "bunny_ear_len": 1.0,
                                "bunny_ear_tilt": -26.0,
                                "bunny_head_up": 1.0}),
        ("layout-sil-mirror", {**_SIL_LAYOUT, "bunny_roughness": 0.25}),
        ("layout-sil-all", {**_SIL_LAYOUT, "bunny_roughness": 0.25,
                            "ball_roughness": 0.3, "bunny_jitter": 0.10,
                            "face_hole_deg": 10.0}),
        # analytic wall-color correction from the denoised CPU render's
        # per-region means vs the reference (red wall G 1.21x too high,
        # green wall G 0.82x too low)
        ("layout-sil-walls", {**_SIL_LAYOUT,
                              "red_color": (0.77, 0.035, 0.045),
                              "green_color": (0.12, 0.55, 0.17)}),
    ]
    # calibration pinned to the round-3 best (exposure ~0.18, bloom
    # ~0.08): material RANKING is robust to small exposure shifts, and
    # every (exposure, bloom) pair costs a fresh compile + render.
    # 0.15 added for the light_scale=1.1 layout variants (+21% flux).
    exposures = (0.18, 0.15)
    blooms = (0.08,)
    for name, kw in variants:
        val, e, b = render_variant(kw, frames, exposures, blooms)
        print(json.dumps({"v": name, "ssim": round(val, 4),
                          "exposure": e, "bloom": b, "frames": frames}),
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
