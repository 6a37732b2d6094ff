"""Command-line renderer — the headless Main.cpp/message-pump equivalent.

Usage:
    python -m tpu_pbrt [scene.json] [--output out.png] [--frames N]
                       [--settings settings.json] [--width W --height H]
                       [--accumulate] [--dump-settings path]

Without a scene file the built-in Cornell Box renders (the reference's
golden config scene, README.md:59-64). The settings JSON mirrors the
reference's persisted graphics settings (utils/config.py).
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="tpu_pbrt", description="TPU-native physically based raytracer")
    parser.add_argument("scene", nargs="?", default=None,
                        help="scene JSON (reference schema); default: Cornell Box")
    parser.add_argument("--output", "-o", default="render.png")
    parser.add_argument("--frames", "-n", type=int, default=16,
                        help="frames to run (temporal systems warm up)")
    parser.add_argument("--settings", default=None,
                        help="graphics settings JSON (defaults otherwise)")
    parser.add_argument("--width", type=int, default=None)
    parser.add_argument("--height", type=int, default=None)
    parser.add_argument("--accumulate", action="store_true",
                        help="average all frames (offline convergence) "
                             "instead of keeping the last")
    parser.add_argument("--dump-settings", default=None,
                        help="write the effective settings JSON and exit")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend")
    parser.add_argument("--debug-nans", action="store_true",
                        help="numerical sanitizer: raise at the first "
                             "NaN produced by any pass (debug-layer "
                             "analogue; also TPU_PBRT_DEBUG_NANS=1)")
    args = parser.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tpu_pbrt.utils import debug as debug_mod

    if args.debug_nans:
        debug_mod.enable_debug()
    else:
        debug_mod.maybe_enable_from_env()

    from tpu_pbrt.utils import config as config_mod

    settings = (config_mod.load(args.settings) if args.settings
                else config_mod.GraphicsSettings())
    if args.width:
        settings.width = args.width
    if args.height:
        settings.height = args.height
    settings.check()

    if args.dump_settings:
        config_mod.save(settings, args.dump_settings)
        print(f"settings written to {args.dump_settings}")
        return 0

    import numpy as np

    textures = None
    if args.scene:
        from tpu_pbrt.models.scene_json import build_scene, load_scene_desc

        scene, camera, textures = build_scene(load_scene_desc(args.scene))
        if not textures[0]:
            textures = None
        camera.aspect = settings.width / settings.height
        camera.vertical_fov_deg = settings.vertical_fov_deg
    else:
        from tpu_pbrt.models.cornell import (make_cornell_box,
                                             make_cornell_camera)

        scene = make_cornell_box()
        camera = make_cornell_camera(settings.width, settings.height)

    from tpu_pbrt.ops import tonemap
    from tpu_pbrt.render.app import App
    from tpu_pbrt.utils.image import write_png

    app = App(scene=scene, camera=camera, settings=settings,
              textures=textures)
    print(f"render {settings.width}x{settings.height} "
          f"({app.render_w}x{app.render_h} internal), "
          f"{settings.raytracing.bounces} bounces, "
          f"ReSTIR={settings.raytracing.restir_di} "
          f"SHARC={settings.raytracing.sharc} -> {args.output}")

    acc = None
    t0 = time.time()
    total_rays = 0.0
    for f in range(args.frames):
        img, rays = app.tick()
        total_rays += float(rays)
        if args.accumulate:
            a = np.asarray(img)
            acc = a if acc is None else acc + a
    out = (acc / args.frames) if args.accumulate else np.asarray(img)
    dt = time.time() - t0
    print(f"{args.frames} frames in {dt:.1f}s "
          f"({args.frames / dt:.2f} fps wall, "
          f"{total_rays / dt / 1e6:.1f} Mrays/s wall)")

    write_png(args.output, np.asarray(tonemap.to_srgb8(out)))
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
