"""Benchmark harness — prints ONE JSON line with the headline metric.

Metric (BASELINE.json): Mrays/sec/chip on the Cornell Box at 1080p, 1 SPP,
8-bounce default config. Baseline north star: 500 Mrays/sec/chip on v5e.
Ray count is the *actual* number of closest-hit queries issued by live path
lanes (counted inside the integrator), not pool-size x bounces.
"""

import json
import os
import sys
import time


def main(config: str = "cornell"):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpu_pbrt.models.cornell import make_cornell_box, make_cornell_camera
    from tpu_pbrt.ops import tracer as tracer_mod
    from tpu_pbrt.passes.pathtrace import PathTraceSettings
    from tpu_pbrt.render.renderer import _render_frame

    width, height = 1920, 1080
    if config == "cornell-bxdf":
        # BASELINE config #2: full metallic/roughness BxDF blocks, 4 SPP
        from tpu_pbrt.models.cornell import MAT_GLASS, MAT_METAL

        scene = make_cornell_box(tall_block_material=MAT_METAL,
                                 short_block_material=MAT_GLASS)
        settings = PathTraceSettings(bounces=8, samples_per_pixel=4,
                                     count_rays=True,
                                     compaction_schedule=(4, 5, 6))
        label = "Cornell metal/glass 1080p, 4 SPP, 8 bounces"
    elif config == "sphere":
        # BASELINE config #3 stand-in: 25k-tri mesh via the blocked tracer
        import numpy as _np
        from tpu_pbrt.models.material import make_table
        from tpu_pbrt.models.mesh import build_geometry
        from tpu_pbrt.models.scene import make_environment, make_scene

        nu, nv = 160, 80
        theta = _np.linspace(0, _np.pi, nv)
        phi = _np.linspace(0, 2 * _np.pi, nu, endpoint=False)
        tt, pp = _np.meshgrid(theta, phi, indexing="ij")
        pos = _np.stack([_np.sin(tt) * _np.cos(pp), _np.cos(tt),
                         _np.sin(tt) * _np.sin(pp)], -1).reshape(-1, 3)
        idx = []
        for i in range(nv - 1):
            for j in range(nu):
                a = i * nu + j
                b = i * nu + (j + 1) % nu
                c = (i + 1) * nu + j
                e = (i + 1) * nu + (j + 1) % nu
                idx += [[a, b, c], [b, e, c]]
        geometry = build_geometry([{
            "positions": pos.astype(_np.float32),
            "normals": pos.astype(_np.float32),
            "indices": _np.asarray(idx, _np.int32), "material": 0,
        }])
        mats = make_table([{"base_color": (0.7, 0.5, 0.3, 1.0),
                            "roughness": 0.4, "metallic": 0.8}])
        scene = make_scene(geometry, mats, make_environment())
        settings = PathTraceSettings(bounces=4, samples_per_pixel=1,
                                     count_rays=True)
        label = "25k-tri sphere 1080p, 1 SPP, 4 bounces (blocked tracer)"
    elif config == "cornell-nofold":
        # default config without stochastic pool compaction (A/B reference)
        scene = make_cornell_box()
        settings = PathTraceSettings(bounces=8, samples_per_pixel=1,
                                     count_rays=True)
        label = "Cornell 1080p, 1 SPP, 8 bounces, no compaction"
    else:
        scene = make_cornell_box()
        # Stochastic pool compaction once Russian roulette starts (live
        # fractions measured: ~44% entering bounce 4, <=8% at 5, <=5% at
        # 6): bounces 4..8 run at 1/2, 1/4, then 1/8 pool. Unbiased
        # (tests/test_compaction.py); costs 3% of counted rays. Measured
        # ladder (v5e 1080p): off 40.5 / (5,6) 45.1 / (4,5,6) 50.2 /
        # (3,4,5,6) 54.1 Mrays/s — the last kills 10% of real samples, so
        # the default stays aligned with the reference's own RR variance
        # tolerance (rr_start_bounce=3). Override via BENCH_FOLD="3,4,5,6".
        fold = tuple(int(x) for x in
                     os.environ.get("BENCH_FOLD", "4,5,6").split(",") if x)
        settings = PathTraceSettings(bounces=8, samples_per_pixel=1,
                                     count_rays=True,
                                     compaction_schedule=fold)
        label = "Cornell 1080p, 1 SPP, 8 bounces"
    trc = tracer_mod.build_for_scene(scene)
    cam = make_cornell_camera(width, height).data()

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
        "metric": f"Mrays/sec/chip ({label})",
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
    main(sys.argv[1] if len(sys.argv) > 1 else "cornell")
