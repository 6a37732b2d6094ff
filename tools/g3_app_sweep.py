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
        # base now IS the silhouette-descent layout; A/B against the
        # old placement and the ear-pose alternatives
        ("layout-old", _OLD_LAYOUT),
        ("tall-ears", {"bunny_ear_len": 1.0}),
        ("all-in", {"bunny_roughness": 0.25, "ball_roughness": 0.3,
                    "bunny_jitter": 0.10, "face_hole_deg": 10.0}),
    ]
    # calibration: the light_scale=1.1 defaults peak near 0.10-0.125 on
    # the 240x180 CPU protocol; material RANKING is robust to small
    # exposure shifts, and every (exposure, bloom) pair costs a fresh
    # compile + render. 0.10 covers the new layout's CPU optimum, 0.15
    # the old layout's optimum shifted by the flux change.
    exposures = (0.10, 0.12, 0.15)
    blooms = (0.08,)
    for name, kw in variants:
        val, e, b = render_variant(kw, frames, exposures, blooms)
        print(json.dumps({"v": name, "ssim": round(val, 4),
                          "exposure": e, "bloom": b, "frames": frames}),
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
