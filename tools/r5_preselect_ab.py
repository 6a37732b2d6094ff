"""Round-5 preselect A/B: entry-ranked SUPERBLOCK pre-level vs flat
block slab, on the 25k-tri bench sphere and the 101k-tri helmet-100k
grid. Full closest_hit/any_hit slope timings plus pass-1 uncovered
rates (the r4f preselect regression signature was 37% uncovered).
One TPU process, self-exiting."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpu_pbrt.ops import traverse_culled as tc
from tpu_pbrt.ops.bvh import morton3d
from tpu_pbrt.ops.vec import Vec3
from diag_culled import bench_rays, slope_time


def grid_tris(nu, nv):
    theta = np.linspace(0, np.pi, nv)
    phi = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    tt, pp = np.meshgrid(theta, phi, indexing="ij")
    pos = np.stack([np.sin(tt) * np.cos(pp), np.cos(tt),
                    np.sin(tt) * np.sin(pp)], -1).reshape(-1, 3)
    i = np.arange(nv - 1)[:, None]
    j = np.arange(nu)[None, :]
    a = (i * nu + j).ravel()
    b = (i * nu + (j + 1) % nu).ravel()
    c = ((i + 1) * nu + j).ravel()
    e = ((i + 1) * nu + (j + 1) % nu).ravel()
    idx = np.concatenate([np.stack([a, b, c], -1), np.stack([b, e, c], -1)])
    v = pos.astype(np.float32)
    return v[idx[:, 0]], v[idx[:, 1]], v[idx[:, 2]]


def uncovered_rate(tris, o, d, t0, t1, preselect):
    """Pass-1 uncovered fraction over touched rays (sorted pool)."""
    r = o.x.shape[0]
    touched = tc._touched(tris, o.x, o.y, o.z, d.x, d.y, d.z, t0, t1)
    octant = ((d.x >= 0).astype(jnp.uint32)
              + 2 * (d.y >= 0).astype(jnp.uint32)
              + 4 * (d.z >= 0).astype(jnp.uint32))
    code = morton3d(jnp.stack([o.x, o.y, o.z], -1), tris.lo, tris.hi)
    skey = ((octant << jnp.uint32(27)) | (code >> jnp.uint32(5))).astype(
        jnp.int32) | jnp.where(touched, 0, 1 << 30)
    dkey = morton3d(jnp.stack([d.x, d.y, d.z], -1),
                    jnp.float32(-1.0), jnp.float32(1.0)).astype(jnp.int32)
    rid0 = jnp.arange(r, dtype=jnp.int32)
    (_, _, _, ox, oy, oz, dx, dy, dz, st0, st1) = lax.sort(
        (skey, dkey, rid0, o.x, o.y, o.z, d.x, d.y, d.z, t0, t1),
        dimension=0, num_keys=3)
    _, _, _, unc = tc._sweep(tris, ox, oy, oz, dx, dy, dz, st0, st1,
                             tc.U1, False, preselect=preselect)
    nt = jnp.sum(touched.astype(jnp.int32))
    return jnp.sum(unc.astype(jnp.int32)), nt


def run(label, v0, v1, v2):
    tris = tc.prepare(v0, v1, v2)
    nb = tris.block_min.shape[0]
    ns = tris.super_min.shape[0]
    R = 2 ** 21
    print(f"--- {label}: tris={v0.shape[0]} blocks={nb} supers={ns} "
          f"rays={R}", flush=True)
    for kind in ("primary", "bounce"):
        o, d, t0, t1 = bench_rays(R, kind=kind)
        for pre in (False, True):
            ur = jax.jit(lambda a, b, c, e: uncovered_rate(
                tris, a, b, c, e, pre))
            nu_, nt_ = ur(o, d, t0, t1)
            print(f"  {kind} pre={int(pre)} uncovered "
                  f"{int(nu_)}/{int(nt_)} "
                  f"({100.0 * int(nu_) / max(int(nt_), 1):.2f}%)",
                  flush=True)
            tc.PRESELECT = pre

            def ch(ox, oy, oz, dx, dy, dz, a, b):
                h = tc.closest_hit(tris, Vec3(ox, oy, oz),
                                   Vec3(dx, dy, dz), a, b)
                return h.t.sum() + h.tri.sum()

            def ah(ox, oy, oz, dx, dy, dz, a, b):
                return tc.any_hit(tris, Vec3(ox, oy, oz),
                                  Vec3(dx, dy, dz), a, b).sum()

            args = (o.x, o.y, o.z, d.x, d.y, d.z, t0, t1)
            tch = slope_time(jax.jit(ch), *args, iters=3)
            tah = slope_time(jax.jit(ah), *args, iters=3)
            print(f"  {kind} pre={int(pre)} closest {tch:7.1f} ms "
                  f"({R / tch / 1000:.1f} Mrays/s)  any {tah:7.1f} ms "
                  f"({R / tah / 1000:.1f} Mrays/s)", flush=True)
    tc.PRESELECT = False


def main():
    t0 = time.time()
    v0, v1, v2 = grid_tris(160, 80)
    run("sphere-25k", v0, v1, v2)
    v0, v1, v2 = grid_tris(320, 160)
    run("helmet-100k-grid", v0, v1, v2)
    print(f"total {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
