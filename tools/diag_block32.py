"""BLOCK=32 vs 64 for the culled query: half-size Morton blocks cut the
swept-triangle waste (per-ray mask ~3.7 blocks@64 = 237 tris vs the
chunk-union top-U1 sweep of U1*64 = 1024) at the cost of 2x the slab
tests. U1 scales with the finer granularity. 4 compiles, self-bounded,
one TPU process."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from tpu_pbrt.ops import traverse_culled as tc
from diag_culled import sphere_tris, bench_rays, slope_time


def main():
    v0, v1, v2 = sphere_tris()
    R = 2 ** 21
    pools = {k: bench_rays(R, kind=k) for k in ("primary", "bounce")}
    for block, u1 in ((64, 16), (32, 24), (32, 32), (32, 48)):
        tc.BLOCK = block
        tc.U1 = u1
        tris = tc.prepare(v0, v1, v2)
        for kind, (o, d, t0, t1) in pools.items():
            t_ms = slope_time(jax.jit(tc.closest_hit), tris, o, d, t0, t1,
                              iters=4)
            print(f"BLOCK={block} U1={u1:2d} {kind}: {t_ms:6.1f} ms "
                  f"-> {R/t_ms/1e3:6.1f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
