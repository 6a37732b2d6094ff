"""Measure chunk-union / coverage stats under the REAL stable sort used
by traverse_culled, on primary + bounce rays (25k-tri sphere)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpu_pbrt.ops import traverse_culled as tc
from tpu_pbrt.ops.bvh import morton3d
from tpu_pbrt.ops.vec import Vec3
from diag_culled import sphere_tris, bench_rays


def main():
    v0, v1, v2 = sphere_tris()
    tris = tc.prepare(v0, v1, v2)
    nb = tris.block_min.shape[0]
    R = 2 ** 21

    for kind in ("primary", "bounce"):
        o, d, t0, t1 = bench_rays(R, kind=kind)

        def stats(o, d, t0, t1):
            rp = o.x.shape[0]
            rid0 = jnp.arange(rp, dtype=jnp.int32)
            octant = ((d.x >= 0).astype(jnp.uint32)
                      + 2 * (d.y >= 0).astype(jnp.uint32)
                      + 4 * (d.z >= 0).astype(jnp.uint32))
            code = morton3d(jnp.stack([o.x, o.y, o.z], -1), tris.lo, tris.hi)
            skey = ((octant << jnp.uint32(27)) | (code >> jnp.uint32(5))
                    ).astype(jnp.int32)
            (_, _, ox, oy, oz, dx, dy, dz, tt0, tt1) = lax.sort(
                (skey, rid0, o.x, o.y, o.z, d.x, d.y, d.z, t0, t1),
                dimension=0, num_keys=2)

            nc = rp // tc.CHUNK

            def chunk_stats(c):
                ov = Vec3(c[0], c[1], c[2])
                dv = Vec3(c[3], c[4], c[5])
                m = tc._slab_mask(ov, dv, c[6], c[7], tris.block_min,
                                  tris.block_max)        # (B, CHUNK)
                per_ray = m.sum(0)                       # blocks per ray
                union = m.any(1).sum()                   # chunk union size
                counts = m.sum(1).astype(jnp.int32)
                k = min(tc.U1, nb)
                _, chosen = lax.top_k(counts, k)
                iota_b = lax.broadcasted_iota(jnp.int32, (k, nb), 1)
                in_chosen = (iota_b == chosen[:, None]).any(0)
                unc = jnp.any(m & ~in_chosen[:, None], axis=0)
                return per_ray.mean(), union, unc.sum()

            def per_group(args):
                return jax.vmap(chunk_stats)(jnp.stack(list(args), axis=1))

            ch = lambda a: a.reshape(nc // 64, 64, tc.CHUNK)
            pr, un, uc = lax.map(per_group, tuple(
                ch(a) for a in (ox, oy, oz, dx, dy, dz, tt0, tt1)))
            return pr.reshape(-1), un.reshape(-1), uc.reshape(-1)

        pr, un, uc = jax.jit(stats)(o, d, t0, t1)
        pr, un, uc = map(np.asarray, (pr, un, uc))
        print(f"{kind}: blocks/ray mean {pr.mean():.2f}; chunk union "
              f"mean {un.mean():.1f} p50 {np.percentile(un, 50):.0f} "
              f"p90 {np.percentile(un, 90):.0f} p99 {np.percentile(un, 99):.0f} "
              f"max {un.max()}; unc@U1={tc.U1}: {uc.sum()} "
              f"({uc.sum()/R:.3%}) rays, {np.mean(uc > 0):.3%} chunks")


if __name__ == "__main__":
    main()
