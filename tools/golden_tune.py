"""Iterate golden-scene parameters against the reference screenshot on
the TPU (256 frames @480x360 ~ 8 s each). Prints SSIM per variant.

Usage: python tools/golden_tune.py [n_frames]
"""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def render(scene_kwargs, frames=256, w=480, h=360, bounces=6):
    from tpu_pbrt.models.golden import make_golden_scene, make_golden_camera
    from tpu_pbrt.passes.pathtrace import PathTraceSettings
    from tpu_pbrt.render.renderer import Renderer
    scene = make_golden_scene(**scene_kwargs)
    cam = make_golden_camera(w, h)
    r = Renderer(scene, w, h, PathTraceSettings(bounces=bounces))
    hdr = r.render_accumulated(cam, frames=frames)
    return np.asarray(hdr), r


def score(hdr, r, ref_small, exposures=(0.8, 1.0, 1.25, 1.5, 2.0, 2.5)):
    from tpu_pbrt.utils.image import ssim
    best = (-1.0, None, None)
    for e in exposures:
        img = np.asarray(r.tonemapped(hdr, exposure=e), np.float32) / 255.0
        v = ssim(img, ref_small)
        if v > best[0]:
            best = (v, e, img)
    return best


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from tpu_pbrt.utils.image import read_png
    ref = read_png("/root/reference/Screenshots/Cornell Box.png")
    ref_small = np.asarray(
        Image.fromarray(ref).resize((480, 360), Image.LANCZOS),
        np.float32) / 255.0

    variants = {
        "base": {},
        "bunny-big": {"bunny_scale": 108.0},
        "bunny-small": {"bunny_scale": 85.0},
        "bunny-back": {"bunny_center": (390.0, 250.0)},
        "bunny-yaw": {"bunny_yaw": 18.0},
        "light-dim": {"light_radiance": (10.0, 9.5, 8.2)},
        "light-bright": {"light_radiance": (24.0, 23.0, 20.0)},
    }
    for name, kw in variants.items():
        t0 = time.time()
        hdr, r = render(kw, frames=frames)
        v, e, img = score(hdr, r, ref_small)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            f"/tmp/gt_{name}.png")
        print(json.dumps({"variant": name, "ssim": round(v, 4),
                          "exposure": e,
                          "sec": round(time.time() - t0, 1)}))


if __name__ == "__main__":
    main()
