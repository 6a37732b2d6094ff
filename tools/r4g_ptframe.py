"""Fast 1080p PT-frame slope timer (bench.py cornell config) for kernel /
fusion iteration — ~2 min per run instead of the full 12-min bench."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
from jax import lax


def main():
    from tpu_pbrt.models.cornell import make_cornell_box, make_cornell_camera
    from tpu_pbrt.ops import tracer as tracer_mod
    from tpu_pbrt.passes.pathtrace import PathTraceSettings
    from tpu_pbrt.render.renderer import _render_frame

    print("devices:", jax.devices(), flush=True)
    scene = make_cornell_box()
    trc = tracer_mod.build_for_scene(scene)
    settings = PathTraceSettings(bounces=8, samples_per_pixel=1,
                                 count_rays=True,
                                 compaction_schedule=(4, 5, 6))
    cam = make_cornell_camera(1920, 1080).data()

    def run_n(n):
        @jax.jit
        def run(c):
            def body(i, acc):
                img, rays = _render_frame(trc, scene, c,
                                          i.astype(jnp.uint32),
                                          width=1920, height=1080,
                                          settings=settings)
                return acc + img[::64, ::64].sum() + rays * 0.0
            return lax.fori_loop(0, n, body, jnp.zeros(()))
        return run

    lo, hi = run_n(1), run_n(4)
    float(lo(cam)); float(hi(cam))
    t0 = time.perf_counter(); float(lo(cam)); t1 = time.perf_counter()
    float(hi(cam)); t2 = time.perf_counter()
    ms = ((t2 - t1) - (t1 - t0)) / 3 * 1000.0
    rays = 7965161
    print(f"PT frame: {ms:.2f} ms  ->  {rays / ms / 1000.0:.1f} Mrays/s",
          flush=True)


if __name__ == "__main__":
    main()
