"""Phase split of culled pass-1 + CHUNK/U1 variants (2M primary rays,
25k-tri sphere)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpu_pbrt.ops import traverse_culled as tc
from tpu_pbrt.ops.vec import Vec3
from diag_culled import sphere_tris, bench_rays, slope_time


def main():
    v0, v1, v2 = sphere_tris()
    tris = tc.prepare(v0, v1, v2)
    nb = tris.block_min.shape[0]
    R = 2 ** 21
    o, d, t0, t1 = bench_rays(R, kind="primary")
    ox, oy, oz = o.x, o.y, o.z
    dx, dy, dz = d.x, d.y, d.z

    def phase_fn(stage, u):
        def f(ox, oy, oz, dx, dy, dz, t0, t1):
            nc = R // tc.CHUNK
            g = 64

            def per_group(args):
                def one(c):
                    ov = Vec3(c[0], c[1], c[2])
                    dv = Vec3(c[3], c[4], c[5])
                    mask, mlo = tc._slab_mask(ov, dv, c[6], c[7],
                                              tris.block_min, tris.block_max)
                    counts = mask.sum(axis=1).astype(jnp.int32)
                    if stage == "slab":
                        return counts.sum()
                    k = min(u, nb)
                    _, chosen = lax.top_k(counts, k)
                    if stage == "topk":
                        return chosen.sum()
                    iota_b = lax.broadcasted_iota(jnp.int32, (k, nb), 1)
                    onehot = (iota_b == chosen[:, None])
                    fetched = lax.dot_general(
                        onehot.astype(jnp.float32), tris.table,
                        (((1,), (0,)), ((), ())),
                        precision=lax.Precision.HIGHEST)
                    if stage == "fetch":
                        return fetched.sum()
                    rows = fetched.reshape(k * tc.BLOCK, tc.COLS)
                    from tpu_pbrt.ops.traverse_dense import _mt_chunk_T
                    t, _, _ = _mt_chunk_T(ov, dv, rows[:, 0:3], rows[:, 3:6],
                                          rows[:, 6:9], c[6], c[7])
                    return t.min(axis=0)

                return jax.vmap(one)(jnp.stack(list(args), axis=1))

            ch = lambda a: a.reshape(nc // g, g, tc.CHUNK)
            out = lax.map(per_group, tuple(
                ch(a) for a in (ox, oy, oz, dx, dy, dz, t0, t1)))
            return out

        return f

    for stage in ("slab", "topk", "fetch", "mt"):
        t_ms = slope_time(jax.jit(phase_fn(stage, 12)),
                          ox, oy, oz, dx, dy, dz, t0, t1, iters=6)
        print(f"pass1 through {stage} (U1=12): {t_ms:.1f} ms")

    for u in (8, 16, 24):
        t_ms = slope_time(jax.jit(phase_fn("mt", u)),
                          ox, oy, oz, dx, dy, dz, t0, t1, iters=6)
        print(f"pass1 full (U1={u}): {t_ms:.1f} ms")


if __name__ == "__main__":
    main()
