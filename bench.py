"""Benchmark harness — prints ONE JSON line with the headline metric.

Metric (BASELINE.json): Mrays/sec/chip on the Cornell Box at 1080p, 1 SPP,
8-bounce default config. Baseline north star: 500 Mrays/sec/chip on v5e.
Ray count is the *actual* number of closest-hit queries issued by live path
lanes (counted inside the integrator), not pool-size x bounces.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tpu_pbrt.models.cornell import make_cornell_box, make_cornell_camera
    from tpu_pbrt.passes.pathtrace import PathTraceSettings
    from tpu_pbrt.render.renderer import Renderer

    width, height = 1920, 1080
    warmup, iters = 2, 8

    scene = make_cornell_box()
    cam = make_cornell_camera(width, height)
    renderer = Renderer(
        scene, width, height,
        PathTraceSettings(bounces=8, samples_per_pixel=1),
    )

    # warmup / compile
    for f in range(warmup):
        img, rays = renderer.render_with_stats(cam, f, jitter=True)
    img.block_until_ready()

    total_rays = 0.0
    t0 = time.perf_counter()
    for f in range(iters):
        img, rays = renderer.render_with_stats(cam, warmup + f, jitter=True)
        total_rays += float(rays)
    img.block_until_ready()
    elapsed = time.perf_counter() - t0

    mrays_per_sec = total_rays / elapsed / 1e6
    fps = iters / elapsed
    baseline = 500.0  # Mrays/sec/chip target (BASELINE.json north_star)

    print(json.dumps({
        "metric": "Mrays/sec/chip (Cornell 1080p, 1 SPP, 8 bounces)",
        "value": round(mrays_per_sec, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays_per_sec / baseline, 4),
        "extra": {
            "fps_1080p_1spp": round(fps, 2),
            "rays_per_frame": round(total_rays / iters),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
