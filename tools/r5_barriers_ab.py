"""A/B the staged chunk-query stage barriers (TPU_PBRT_CULLED_BARRIERS,
commit e192113): full closest_hit + any_hit on the 25k-tri bench sphere
with the barrier seams off/on, shipping defaults otherwise. One TPU
process, self-exiting; adopt-or-delete by these numbers."""
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
    print(f"blocks={tris.block_min.shape[0]} rays={R} U1={tc.U1}",
          flush=True)
    for kind in ("primary", "bounce"):
        o, d, t0, t1 = bench_rays(R, kind=kind)
        args = (o.x, o.y, o.z, d.x, d.y, d.z, t0, t1)
        for barriers in (False, True):
            tc.CHUNK_BARRIERS = barriers

            def ch(ox, oy, oz, dx, dy, dz, a, b):
                h = tc.closest_hit(tris, Vec3(ox, oy, oz),
                                   Vec3(dx, dy, dz), a, b)
                return h.t.sum() + h.tri.sum()

            def ah(ox, oy, oz, dx, dy, dz, a, b):
                return tc.any_hit(tris, Vec3(ox, oy, oz),
                                  Vec3(dx, dy, dz), a, b).sum()

            tch = slope_time(jax.jit(ch), *args, iters=3)
            tah = slope_time(jax.jit(ah), *args, iters=3)
            print(f"  {kind} barriers={int(barriers)}: "
                  f"closest {tch:6.1f} ms ({R / tch / 1000:.1f} Mrays/s)"
                  f"  any {tah:6.1f} ms ({R / tah / 1000:.1f} Mrays/s)",
                  flush=True)
    tc.CHUNK_BARRIERS = os.environ.get(
        "TPU_PBRT_CULLED_BARRIERS", "0") == "1"


if __name__ == "__main__":
    main()
