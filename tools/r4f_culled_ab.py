"""Culled-tracer structure A/B on the 25k-tri bench sphere: superblock
pre-select ON vs OFF (direct all-block slab + single top_k), U1 and GROUP
variants — slope-timed pass-1 sweeps plus full closest_hit per preselect
mode. One TPU process, self-exiting. Decides the sphere-regression fix
(12.86 -> 7.07 Mrays/s, VERDICT r3 item 3)."""
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
    print(f"blocks={tris.block_min.shape[0]} supers="
          f"{tris.super_min.shape[0]} rays={R}", flush=True)

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

    # keep args DEVICE-RESIDENT: numpy args re-upload 64 MB per call
    # through the ~130 MB/s axon tunnel (~0.5 s/call), which poisoned every
    # r4_culled_diag stage number (they measured the tunnel, not compute)
    sa_dev = jax.jit(sorted_args)()
    n_live = int(np.asarray(sa_dev[8]))
    sa = tuple(jax.device_put(x) for x in sa_dev[:8])
    print(f"n_live={n_live}", flush=True)

    variants = [
        dict(preselect=True, u=16, group=64),    # shipping default
        dict(preselect=False, u=16, group=64),
        dict(preselect=False, u=16, group=256),
        dict(preselect=False, u=24, group=256),
        dict(preselect=True, u=16, group=256),
    ]
    for v in variants:
        def f_sweep(ox, oy, oz, dx, dy, dz, t0, t1, v=v):
            key, rid, occ, unc = tc._sweep(
                tris, ox, oy, oz, dx, dy, dz, t0, t1, v["u"], False,
                n_live=jnp.int32(n_live), preselect=v["preselect"],
                group=v["group"])
            return key.astype(jnp.uint32).sum(), unc.sum()

        js = jax.jit(f_sweep)
        _, unc = js(*sa[:8])
        t_ms = slope_time(js, *sa[:8], iters=4)
        print(f"sweep1 pre={int(v['preselect'])} U1={v['u']} "
              f"g={v['group']}: {t_ms:.1f} ms  n_unc={int(unc)}",
              flush=True)

    # full closest_hit per preselect mode (module-default U1/GROUP)
    for pre in (True, False):
        tc.PRESELECT = pre

        def f_full(ox, oy, oz, dx, dy, dz, t0, t1):
            hit = tc.closest_hit(tris, Vec3(ox, oy, oz), Vec3(dx, dy, dz),
                                 t0, t1)
            return hit.t.sum()

        jf = jax.jit(f_full)
        dev_raw = tuple(jax.device_put(x)
                        for x in (o.x, o.y, o.z, d.x, d.y, d.z, t0, t1))
        t_ms = slope_time(jf, *dev_raw, iters=4)
        print(f"closest_hit full pre={int(pre)}: {t_ms:.1f} ms  "
              f"({R / t_ms / 1e3:.1f} Mrays/s)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
