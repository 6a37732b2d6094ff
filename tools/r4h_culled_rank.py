"""Culled pass-1 ranking A/B on the 25k-tri bench sphere: count vs
nearest-entry block selection x U1 in {8, 12, 16}. Slope-timed pass-1
sweeps (uncovered counts shown) plus full closest_hit for the best two.
One TPU process, self-exiting."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpu_pbrt.ops import traverse_culled as tc
from tpu_pbrt.ops.bvh import morton3d
from tpu_pbrt.ops.vec import Vec3
from diag_culled import sphere_tris, bench_rays, slope_time


def main():
    v0, v1, v2 = sphere_tris()
    tris = tc.prepare(v0, v1, v2)
    R = 2 ** 21
    o, d, t0, t1 = bench_rays(R, kind="primary")
    print(f"blocks={tris.block_min.shape[0]} rays={R}", flush=True)

    def sorted_args():
        touched = tc._touched(tris, o.x, o.y, o.z, d.x, d.y, d.z, t0, t1)
        octant = ((d.x >= 0).astype(jnp.uint32)
                  + 2 * (d.y >= 0).astype(jnp.uint32)
                  + 4 * (d.z >= 0).astype(jnp.uint32))
        code = morton3d(jnp.stack([o.x, o.y, o.z], -1), tris.lo, tris.hi)
        skey = ((octant << jnp.uint32(27))
                | (code >> jnp.uint32(5))).astype(jnp.int32)
        skey = skey | jnp.where(touched, 0, 1 << 30)
        dkey = morton3d(jnp.stack([d.x, d.y, d.z], -1),
                        jnp.float32(-1.0), jnp.float32(1.0)).astype(jnp.int32)
        rid0 = jnp.arange(R, dtype=jnp.int32)
        (_, _, _, ox, oy, oz, dx, dy, dz, st0, st1) = lax.sort(
            (skey, dkey, rid0, o.x, o.y, o.z, d.x, d.y, d.z, t0, t1),
            dimension=0, num_keys=3)
        return ox, oy, oz, dx, dy, dz, st0, st1, jnp.sum(
            touched.astype(jnp.int32))

    sa_dev = jax.jit(sorted_args)()
    n_live = int(np.asarray(sa_dev[8]))
    sa = tuple(jax.device_put(x) for x in sa_dev[:8])
    print(f"n_live={n_live}", flush=True)

    for rank in ("count", "entry"):
        tc.RANK = rank
        for u in (4, 6, 8, 12, 16):
            def f_sweep(ox, oy, oz, dx, dy, dz, t0, t1, u=u):
                key, rid, occ, unc = tc._sweep(
                    tris, ox, oy, oz, dx, dy, dz, t0, t1, u, False,
                    n_live=jnp.int32(n_live), preselect=False)
                return key.astype(jnp.uint32).sum(), unc.sum()

            js = jax.jit(f_sweep)
            _, unc = js(*sa)
            t_ms = slope_time(js, *sa, iters=4)
            print(f"sweep1 rank={rank} U1={u}: {t_ms:6.1f} ms  "
                  f"n_unc={int(unc)}", flush=True)

    # full closest_hit: count/U1=16 (shipping) vs entry at each U1
    import time

    def full(rank, u):
        tc.RANK = rank
        old_u1 = tc.U1
        tc.U1 = u

        def f(ox, oy, oz, dx, dy, dz, t0, t1):
            hit = tc.closest_hit(tris, Vec3(ox, oy, oz), Vec3(dx, dy, dz),
                                 t0, t1)
            return hit.t.sum() + hit.tri.sum()

        js = jax.jit(f)
        float(js(*sa))
        t_ms = slope_time(js, *sa, iters=3)
        tc.U1 = old_u1
        print(f"closest_hit rank={rank} U1={u}: {t_ms:6.1f} ms "
              f"({R / t_ms / 1000.0:.1f} Mrays/s)", flush=True)

    full("count", 16)
    full("entry", 16)
    full("entry", 12)
    full("entry", 8)
    full("entry", 6)


if __name__ == "__main__":
    main()
