"""U1 sweep with the production dir-key sort: unc%% + full query time."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from tpu_pbrt.ops import traverse_culled as tc
from tpu_pbrt.ops.bvh import morton3d
from diag_culled import sphere_tris, bench_rays, slope_time

def main():
    v0, v1, v2 = sphere_tris()
    tris = tc.prepare(v0, v1, v2)
    R = 2 ** 21
    pools = {k: bench_rays(R, kind=k) for k in ("primary", "bounce")}

    def stats(o, d, t0, t1, u1):
        r = o.x.shape[0]
        octant = ((d.x >= 0).astype(jnp.uint32) + 2*(d.y >= 0).astype(jnp.uint32)
                  + 4*(d.z >= 0).astype(jnp.uint32))
        code = morton3d(jnp.stack([o.x, o.y, o.z], -1), tris.lo, tris.hi)
        skey = ((octant << jnp.uint32(27)) | (code >> jnp.uint32(5))).astype(jnp.int32)
        dkey = morton3d(jnp.stack([d.x, d.y, d.z], -1),
                        jnp.float32(-1.0), jnp.float32(1.0)).astype(jnp.int32)
        rid0 = jnp.arange(r, dtype=jnp.int32)
        (_, _, _, ox, oy, oz, dx, dy, dz, tt0, tt1) = lax.sort(
            (skey, dkey, rid0, o.x, o.y, o.z, d.x, d.y, d.z, t0, t1),
            dimension=0, num_keys=3)
        _, _, _, unc1 = tc._sweep(tris, ox, oy, oz, dx, dy, dz, tt0, tt1, u1, False)
        return unc1.sum()

    for u1 in (8, 12, 16):
        tc.U1 = u1
        for kind, (o, d, t0, t1) in pools.items():
            n1 = int(jax.jit(stats, static_argnums=4)(o, d, t0, t1, u1))
            t_ms = slope_time(jax.jit(tc.closest_hit), tris, o, d, t0, t1, iters=4)
            print(f"U1={u1:2d} {kind}: unc={n1} ({n1/R:.3%})  full {t_ms:6.1f} ms "
                  f"-> {R/t_ms/1e3:6.1f} Mrays/s", flush=True)

if __name__ == "__main__":
    main()
