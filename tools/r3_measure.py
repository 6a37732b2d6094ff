"""Round-3 post-recovery measurement batch (one process, clean exits,
NO external kills): culled traversal diagnostics + U1 sweep, then the
bench sphere configs. Writes progress lines immediately."""
import sys, os, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpu_pbrt.ops import traverse_culled as tc
from diag_culled import sphere_tris, bench_rays, slope_time


def main():
    v0, v1, v2 = sphere_tris()
    tris = tc.prepare(v0, v1, v2)
    R = 2 ** 21
    pools = {k: bench_rays(R, kind=k) for k in ("primary", "bounce")}

    # mostly-dead pool
    o2, d2, t02, t12 = pools["bounce"]
    n_live = R // 20
    t1dead = jnp.concatenate([t12[:n_live],
                              jnp.full((R - n_live,), -jnp.inf)])

    for u1 in (16, 8, 12):
        tc.U1 = u1
        for kind in ("primary", "bounce"):
            o, d, t0, t1 = pools[kind]
            fn = jax.jit(lambda tr, a, b, c, dd, _u1=u1: tc.closest_hit(
                tr, a, b, c, dd))  # fresh cache per u1 via default arg
            t_ms = slope_time(fn, tris, o, d, t0, t1, iters=4)
            print(json.dumps({"cfg": f"U1={u1} {kind}",
                              "ms": round(t_ms, 1),
                              "mrays": round(R / t_ms / 1e3, 1)}),
                  flush=True)
        if u1 == 16:
            fn = jax.jit(lambda tr, a, b, c, dd: tc.closest_hit(
                tr, a, b, c, dd))
            t_ms = slope_time(fn, tris, o2, d2, t02, t1dead, iters=4)
            print(json.dumps({"cfg": "U1=16 bounce-5%live",
                              "ms": round(t_ms, 1)}), flush=True)
            fn = jax.jit(lambda tr, a, b, c, dd: tc.any_hit(
                tr, a, b, c, dd))
            t_ms = slope_time(fn, tris, o2, d2, t02, t1dead, iters=4)
            print(json.dumps({"cfg": "U1=16 shadow-5%live any",
                              "ms": round(t_ms, 1)}), flush=True)


if __name__ == "__main__":
    main()
