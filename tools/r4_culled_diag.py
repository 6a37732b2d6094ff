"""Round-4 phase split of the culled tracer on the 25k-tri sphere bench
workload: where did 12.86 -> 7.07 Mrays/s go, and what does each stage of
`_query` cost now? Slope timing, self-exiting, ONE TPU process.

Stages timed independently (each as its own jit, same sorted inputs):
  touched   — superblock slab prepass
  sort      — coherence sort (octant + Morton keys)
  sweep1    — pass-1 chunk sweep at U1 (bounded while over live head)
  full      — closest_hit end to end (includes cascade + unsort)
  any       — any_hit end to end (the NEE shadow path)
Also reports n_touched / n_uncovered so the cascade's load is visible.
"""
import sys, os, json
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
    nb = tris.block_min.shape[0]
    ns = tris.super_min.shape[0]
    R = 2 ** 21
    o, d, t0, t1 = bench_rays(R, kind="primary")
    print(f"blocks={nb} supers={ns} rays={R}", flush=True)

    # --- stage: touched
    def f_touched(ox, oy, oz, dx, dy, dz, t0, t1):
        return tc._touched(tris, ox, oy, oz, dx, dy, dz, t0, t1)

    args = (o.x, o.y, o.z, d.x, d.y, d.z, t0, t1)
    jt = jax.jit(f_touched)
    n_touched = int(np.asarray(jt(*args)).sum())
    t_ms = slope_time(jt, *args)
    print(f"touched: {t_ms:.1f} ms  n_touched={n_touched}", flush=True)

    # --- stage: coherence sort
    def f_sort(ox, oy, oz, dx, dy, dz, t0, t1):
        touched = tc._touched(tris, ox, oy, oz, dx, dy, dz, t0, t1)
        octant = ((dx >= 0).astype(jnp.uint32)
                  + 2 * (dy >= 0).astype(jnp.uint32)
                  + 4 * (dz >= 0).astype(jnp.uint32))
        code = morton3d(jnp.stack([ox, oy, oz], -1), tris.lo, tris.hi)
        skey = ((octant << jnp.uint32(27))
                | (code >> jnp.uint32(5))).astype(jnp.int32)
        skey = skey | jnp.where(touched, 0, 1 << 30)
        dkey = morton3d(jnp.stack([dx, dy, dz], -1),
                        jnp.float32(-1.0), jnp.float32(1.0)).astype(jnp.int32)
        rid0 = jnp.arange(R, dtype=jnp.int32)
        out = lax.sort((skey, dkey, rid0, ox, oy, oz, dx, dy, dz, t0, t1),
                       dimension=0, num_keys=3)
        return out[2]

    t_ms = slope_time(jax.jit(f_sort), *args)
    print(f"touched+sort: {t_ms:.1f} ms", flush=True)

    # --- stage: pass-1 sweep on sorted rays
    def sorted_args():
        touched = tc._touched(tris, *args)
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

    sa = jax.jit(sorted_args)()
    sa = tuple(np.asarray(x) for x in sa)
    n_live = int(sa[8])

    for u1, ks_extra in ((8, 2), (12, 2), (16, 2), (24, 2),
                         (16, 4), (16, 8), (24, 6), (32, 8)):
        def f_sweep(ox, oy, oz, dx, dy, dz, t0, t1, u1=u1, ke=ks_extra):
            return tc._sweep(tris, ox, oy, oz, dx, dy, dz, t0, t1,
                             u1, False, n_live=jnp.int32(n_live),
                             ks_extra=ke)[3]

        js = jax.jit(f_sweep)
        n_unc = int(np.asarray(js(*sa[:8])).sum())
        t_ms = slope_time(js, *sa[:8])
        print(f"sweep1 U1={u1} ks+{ks_extra}: {t_ms:.1f} ms  "
              f"n_unc={n_unc}", flush=True)

    # --- end to end
    def f_full(ox, oy, oz, dx, dy, dz, t0, t1):
        h = tc.closest_hit(tris, Vec3(ox, oy, oz), Vec3(dx, dy, dz), t0, t1)
        return h.t

    t_ms = slope_time(jax.jit(f_full), *args)
    mrays = R / (t_ms / 1e3) / 1e6
    print(f"closest_hit full: {t_ms:.1f} ms  ({mrays:.1f} Mrays/s)",
          flush=True)

    def f_any(ox, oy, oz, dx, dy, dz, t0, t1):
        return tc.any_hit(tris, Vec3(ox, oy, oz), Vec3(dx, dy, dz), t0, t1)

    t_ms = slope_time(jax.jit(f_any), *args)
    print(f"any_hit full: {t_ms:.1f} ms", flush=True)

    # secondary-class rays (sphere-surface origins, random directions):
    # the bounce workload the frame actually pays for
    o2, d2, s0, s1 = bench_rays(R, kind="secondary")
    t_ms = slope_time(jax.jit(f_full), o2.x, o2.y, o2.z,
                        d2.x, d2.y, d2.z, s0, s1)
    mrays = R / (t_ms / 1e3) / 1e6
    print(f"closest_hit secondary: {t_ms:.1f} ms  ({mrays:.1f} Mrays/s)",
          flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
