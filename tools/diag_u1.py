"""Sweep U1 (pass-1 blocks per chunk) for full culled query time."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from tpu_pbrt.ops import traverse_culled as tc
from diag_culled import sphere_tris, bench_rays, slope_time


def main():
    v0, v1, v2 = sphere_tris()
    tris = tc.prepare(v0, v1, v2)
    R = 2 ** 21
    pools = {k: bench_rays(R, kind=k) for k in ("primary", "bounce")}
    for u1 in (4, 6, 8, 12, 16):
        tc.U1 = u1
        for kind, (o, d, t0, t1) in pools.items():
            t_ms = slope_time(jax.jit(tc.closest_hit), tris, o, d, t0, t1,
                              iters=4)
            print(f"U1={u1:2d} {kind}: {t_ms:6.1f} ms "
                  f"-> {R/t_ms/1e3:6.1f} Mrays/s")


if __name__ == "__main__":
    main()
