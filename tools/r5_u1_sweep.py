"""Round-5 U1 sweep under entry ranking: full closest_hit + any_hit on
the 25k-tri bench sphere, preselect off (flat slab) — picks the shipping
U1. r5c re-run rationale: the head-gather cascade made small uncovered
sets nearly free, so the optimum may sit far BELOW the pre-gather pick
(pass-1 MT work is linear in U1: 64*U1 tris swept per ray). One TPU
process, self-exiting."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from tpu_pbrt.ops import traverse_culled as tc
from tpu_pbrt.ops.vec import Vec3
from diag_culled import sphere_tris, bench_rays, slope_time


def main():
    v0, v1, v2 = sphere_tris()
    tris = tc.prepare(v0, v1, v2)
    R = 2 ** 21
    print(f"blocks={tris.block_min.shape[0]} rays={R} rank={tc.RANK}",
          flush=True)
    for kind in ("primary", "bounce"):
        o, d, t0, t1 = bench_rays(R, kind=kind)
        args = (o.x, o.y, o.z, d.x, d.y, d.z, t0, t1)
        for u1, u2 in ((4, 64), (6, 64), (8, 64), (12, 64),
                       (4, 16), (6, 16), (8, 32)):
            tc.U1 = u1
            tc.U2 = u2

            def ch(ox, oy, oz, dx, dy, dz, a, b):
                h = tc.closest_hit(tris, Vec3(ox, oy, oz),
                                   Vec3(dx, dy, dz), a, b)
                return h.t.sum() + h.tri.sum()

            def ah(ox, oy, oz, dx, dy, dz, a, b):
                return tc.any_hit(tris, Vec3(ox, oy, oz),
                                  Vec3(dx, dy, dz), a, b).sum()

            tch = slope_time(jax.jit(ch), *args, iters=3)
            tah = slope_time(jax.jit(ah), *args, iters=3)
            print(f"  {kind} U1={u1} U2={u2}: closest {tch:6.1f} ms "
                  f"({R / tch / 1000:.1f} Mrays/s)  any {tah:6.1f} ms "
                  f"({R / tah / 1000:.1f} Mrays/s)", flush=True)
    tc.U1 = int(os.environ.get("TPU_PBRT_CULLED_U1", "12"))
    tc.U2 = int(os.environ.get("TPU_PBRT_CULLED_U2", "64"))


if __name__ == "__main__":
    main()
