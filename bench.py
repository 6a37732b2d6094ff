"""Benchmark harness — prints ONE JSON line with the headline metric.

Metric (BASELINE.json): Mrays/sec/chip on the Cornell Box at 1080p, 1 SPP,
8-bounce default config. Baseline north star: 500 Mrays/sec/chip on v5e.
Ray count is the *actual* number of closest-hit queries issued by live path
lanes (counted inside the integrator), not pool-size x bounces.
"""

import json
import time


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpu_pbrt.models.cornell import make_cornell_box, make_cornell_camera
    from tpu_pbrt.ops import tracer as tracer_mod
    from tpu_pbrt.passes.pathtrace import PathTraceSettings
    from tpu_pbrt.render.renderer import _render_frame

    width, height = 1920, 1080
    scene = make_cornell_box()
    trc = tracer_mod.build_for_scene(scene)
    cam = make_cornell_camera(width, height).data()
    settings = PathTraceSettings(bounces=8, samples_per_pixel=1,
                                 count_rays=True)

    # Frames are batched inside one jit (a fori over the frame index) so
    # the metric reflects sustained device throughput; single-call timings
    # through the tunneled runtime are dominated by dispatch overhead.
    def frames(n):
        def run(c):
            def body(i, carry):
                acc, rays = carry
                img, rc = _render_frame(
                    trc, scene, c, i.astype(jnp.uint32),
                    width=width, height=height, settings=settings,
                )
                return acc + img[::64, ::64].sum(), rays + rc
            return lax.fori_loop(0, n, body, (0.0, 0.0))
        return jax.jit(run)

    f_lo, f_hi = frames(1), frames(5)
    # compile + warm
    float(f_lo(cam)[0]); float(f_hi(cam)[0])

    def best_time(f):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _, rays = f(cam)
            rays = float(rays)
            best = min(best, time.perf_counter() - t0)
        return best, rays

    t_lo, rays_lo = best_time(f_lo)
    t_hi, rays_hi = best_time(f_hi)
    per_frame = (t_hi - t_lo) / 4
    rays_per_frame = (rays_hi - rays_lo) / 4

    mrays_per_sec = rays_per_frame / per_frame / 1e6
    fps = 1.0 / per_frame
    baseline = 500.0  # Mrays/sec/chip target (BASELINE.json north_star)

    print(json.dumps({
        "metric": "Mrays/sec/chip (Cornell 1080p, 1 SPP, 8 bounces)",
        "value": round(mrays_per_sec, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays_per_sec / baseline, 4),
        "extra": {
            "fps_1080p_1spp": round(fps, 2),
            "ms_per_frame": round(per_frame * 1e3, 1),
            "rays_per_frame": round(rays_per_frame),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
