"""Isolated per-pool costs of the current culled traversal on the sphere
workload: primary/bounce closest, shadow any, mostly-dead pools."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_pbrt.ops import traverse_culled as tc
from tpu_pbrt.ops.vec import Vec3
from diag_culled import sphere_tris, bench_rays, slope_time


def main():
    v0, v1, v2 = sphere_tris()
    tris = tc.prepare(v0, v1, v2)
    R = 2 ** 21

    cases = []
    o, d, t0, t1 = bench_rays(R, kind="primary")
    cases.append(("primary 2M closest", tc.closest_hit, (o, d, t0, t1)))

    o2, d2, t02, t12 = bench_rays(R, kind="bounce")
    # mostly-dead bounce pool: 95% lanes dead (t1=-inf), dead contiguous
    n_live = R // 20
    t1dead = jnp.concatenate([t12[:n_live],
                              jnp.full((R - n_live,), -jnp.inf)])
    cases.append(("bounce 2M all-live closest", tc.closest_hit,
                  (o2, d2, t02, t12)))
    cases.append(("bounce 2M 5%-live closest", tc.closest_hit,
                  (o2, d2, t02, t1dead)))
    cases.append(("shadow 2M 5%-live any", tc.any_hit,
                  (o2, d2, t02, t1dead)))
    # compacted pool: 256k lanes, all live
    Rc = R // 8
    oc = Vec3(o2.x[:Rc], o2.y[:Rc], o2.z[:Rc])
    dc = Vec3(d2.x[:Rc], d2.y[:Rc], d2.z[:Rc])
    cases.append(("bounce 256k all-live closest", tc.closest_hit,
                  (oc, dc, t02[:Rc], t12[:Rc])))

    for name, fn, args in cases:
        t_ms = slope_time(jax.jit(fn), tris, *args, iters=4)
        print(f"{name}: {t_ms:.1f} ms")


if __name__ == "__main__":
    main()
