"""Minimal on-chip smoke test for the fused bounce megakernel
(ops/trace_shade_fused.py): tiny cornell PT through the production
trace(), fused vs unfused, compared numerically. Run FIRST after any
kernel change, before the bench queue."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def render(fused: bool, n=256):
    from tpu_pbrt.ops import trace_shade_fused
    trace_shade_fused.TRACE_FUSED = fused

    from tpu_pbrt.models.cornell import make_cornell_box, make_cornell_camera
    from tpu_pbrt.ops import tracer as tracer_mod
    from tpu_pbrt.passes.pathtrace import PathTraceSettings, trace
    from tpu_pbrt.render.camera import generate_rays

    scene = make_cornell_box()
    tr = tracer_mod.build_for_scene(scene, kind="dense")
    cam = make_cornell_camera(n, n).data()
    settings = PathTraceSettings(bounces=4, count_rays=True)

    def f(frame):
        o, d, t0, t1 = generate_rays(cam, n, n)
        px = jnp.tile(jnp.arange(n, dtype=jnp.uint32), n)
        py = jnp.repeat(jnp.arange(n, dtype=jnp.uint32), n)
        rad, _, _, rays = trace(tr, scene, o, d, t0, t1, px, py,
                                frame, settings)
        return jnp.stack([rad.x, rad.y, rad.z]), rays

    img, rays = jax.jit(f)(jnp.uint32(0))
    img = np.asarray(img)
    print(f"fused={fused}: mean={img.mean():.6f} finite={np.isfinite(img).all()}"
          f" rays={float(rays):.0f}", flush=True)
    return img


def main():
    print("devices:", jax.devices(), flush=True)
    a = render(True)
    b = render(False)
    d = np.abs(a - b)
    print(f"max|fused-unfused|={d.max():.3e}  mean={d.mean():.3e}", flush=True)
    ok = np.isfinite(a).all() and d.max() < 1e-3
    print("SMOKE", "PASS" if ok else "FAIL", flush=True)


if __name__ == "__main__":
    main()
