"""Time culled _query with cascade stages selectively disabled, and count
unc after pass1 with/without nearest-block-boosted selection."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import tpu_pbrt.ops.traverse_culled as tc
from tpu_pbrt.ops.vec import Vec3
from diag_culled import sphere_tris, bench_rays, slope_time


def main():
    v0, v1, v2 = sphere_tris()
    tris = tc.prepare(v0, v1, v2)
    R = 2 ** 21

    real_cond = lax.cond

    def run_with(n_stages):
        """n_stages: how many cascade conds stay enabled (0..3)."""
        count = [0]

        def fake_cond(pred, tfn, ffn, *ops):
            count[0] += 1
            if count[0] <= n_stages:
                return real_cond(pred, tfn, ffn, *ops)
            return ffn(*ops)

        def f(o, d, t0, t1):
            count[0] = 0
            lax_cond_orig = tc.lax.cond
            tc.lax.cond = fake_cond
            try:
                return tc.closest_hit(tris, o, d, t0, t1)
            finally:
                tc.lax.cond = lax_cond_orig

        return f

    for kind in ("primary", "bounce"):
        o, d, t0, t1 = bench_rays(R, kind=kind)
        for n in (0, 1, 2):
            # note: _touched/_sweep group-skip conds are called through
            # lax.cond inside lax.map bodies — those are traced via
            # tc.lax.cond too. Count order: map-body conds trace once per
            # lax.map call, cascade conds after. Simpler: patch only at
            # the _query level is messy; instead time full and accept.
            pass
        t_full = slope_time(jax.jit(tc.closest_hit), tris, o, d, t0, t1,
                            iters=4)
        print(f"{kind}: full {t_full:.1f} ms")

    # unc counts with nearest-boost selection variants
    for kind in ("primary", "bounce"):
        o, d, t0, t1 = bench_rays(R, kind=kind)

        def unc_count(boost, u1):
            def f(o, d, t0, t1):
                rp = o.x.shape[0]
                rid0 = jnp.arange(rp, dtype=jnp.int32)
                from tpu_pbrt.ops.bvh import morton3d
                octant = ((d.x >= 0).astype(jnp.uint32)
                          + 2 * (d.y >= 0).astype(jnp.uint32)
                          + 4 * (d.z >= 0).astype(jnp.uint32))
                code = morton3d(jnp.stack([o.x, o.y, o.z], -1),
                                tris.lo, tris.hi)
                skey = ((octant << jnp.uint32(27))
                        | (code >> jnp.uint32(5))).astype(jnp.int32)
                (_, _, ox, oy, oz, dx, dy, dz, tt0, tt1) = lax.sort(
                    (skey, rid0, o.x, o.y, o.z, d.x, d.y, d.z, t0, t1),
                    dimension=0, num_keys=2)
                nc = rp // tc.CHUNK
                nb = tris.block_min.shape[0]

                def chunk(c):
                    ov = Vec3(c[0], c[1], c[2])
                    dv = Vec3(c[3], c[4], c[5])
                    mask, mlo = tc._slab_mask(ov, dv, c[6], c[7],
                                              tris.block_min, tris.block_max)
                    counts = mask.sum(axis=1).astype(jnp.int32)
                    if boost:
                        # each ray's nearest masked block gets +8 weight
                        lo_m = jnp.where(mask, mlo, jnp.inf)
                        nearest = jnp.argmin(lo_m, axis=0)     # (CHUNK,)
                        near_oh = (lax.broadcasted_iota(
                            jnp.int32, mask.shape, 0) == nearest[None, :])
                        near_oh = near_oh & mask.any(0)[None, :]
                        counts = counts + 8 * near_oh.sum(1).astype(jnp.int32)
                    _, chosen = lax.top_k(counts, u1)
                    iota_b = lax.broadcasted_iota(jnp.int32, (u1, nb), 1)
                    in_ch = (iota_b == chosen[:, None]).any(0)
                    missed = mask & ~in_ch[:, None]
                    # approximate early-exit: hit t unknown here; use the
                    # TRUE chunk-sweep hit via full query? too heavy —
                    # report coverage-only unc (upper bound)
                    return jnp.any(missed, axis=0)

                def per_group(args):
                    return jax.vmap(chunk)(jnp.stack(list(args), axis=1))

                ch = lambda a: a.reshape(nc // 64, 64, tc.CHUNK)
                unc = lax.map(per_group, tuple(
                    ch(a) for a in (ox, oy, oz, dx, dy, dz, tt0, tt1)))
                return unc.reshape(-1).sum()
            return f

        for boost in (False, True):
            for u1 in (12, 16):
                n = int(jax.jit(unc_count(boost, u1))(o, d, t0, t1))
                print(f"{kind}: coverage-unc boost={boost} U1={u1}: "
                      f"{n} ({n/R:.3%})")


if __name__ == "__main__":
    main()
