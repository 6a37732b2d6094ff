"""Minimal big-scene query measurement (round-5e): closest_hit + any_hit
on the 25k-tri bench sphere at shipping defaults, primary + bounce ray
classes — 4 jits total, chosen over the full bench frame because cold
REMOTE compiles of the whole 4-bounce sphere frame exceed 45 min on the
fresh image while a single 2M-ray query compiles in minutes. Directly
comparable to the recorded r4h/r5 diag rows (same ray generators, same
slope timing). One TPU process, self-exiting."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from tpu_pbrt.ops import traverse_culled as tc
from tpu_pbrt.ops.vec import Vec3
from diag_culled import sphere_tris, bench_rays, slope_time


def main():
    v0, v1, v2 = sphere_tris()
    tris = tc.prepare(v0, v1, v2)
    R = 2 ** 21
    print(f"blocks={tris.block_min.shape[0]} rays={R} U1={tc.U1} "
          f"U2={tc.U2} qg={tc.QUERY_GATHER} cg={tc.CASCADE_GATHER}",
          flush=True)
    for kind in ("primary", "bounce"):
        o, d, t0, t1 = bench_rays(R, kind=kind)
        args = (o.x, o.y, o.z, d.x, d.y, d.z, t0, t1)

        def ch(ox, oy, oz, dx, dy, dz, a, b):
            h = tc.closest_hit(tris, Vec3(ox, oy, oz),
                               Vec3(dx, dy, dz), a, b)
            return h.t.sum() + h.tri.sum()

        def ah(ox, oy, oz, dx, dy, dz, a, b):
            return tc.any_hit(tris, Vec3(ox, oy, oz),
                              Vec3(dx, dy, dz), a, b).sum()

        t0c = time.perf_counter()
        tch = slope_time(jax.jit(ch), *args, iters=3)
        c1 = time.perf_counter() - t0c
        t0c = time.perf_counter()
        tah = slope_time(jax.jit(ah), *args, iters=3)
        c2 = time.perf_counter() - t0c
        print(f"  {kind}: closest {tch:6.1f} ms "
              f"({R / tch / 1000:.1f} Mrays/s, compile+run {c1:.0f}s)  "
              f"any {tah:6.1f} ms ({R / tah / 1000:.1f} Mrays/s, "
              f"compile+run {c2:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
