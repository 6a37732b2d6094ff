"""Diagnose traverse_culled phase costs + uncovered fractions on the
25k-tri sphere bench workload (real TPU). Slope timing."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpu_pbrt.ops import traverse_culled as tc
from tpu_pbrt.ops.vec import Vec3


def sphere_tris():
    nu, nv = 160, 80
    theta = np.linspace(0, np.pi, nv)
    phi = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    tt, pp = np.meshgrid(theta, phi, indexing="ij")
    pos = np.stack([np.sin(tt) * np.cos(pp), np.cos(tt),
                    np.sin(tt) * np.sin(pp)], -1).reshape(-1, 3)
    idx = []
    for i in range(nv - 1):
        for j in range(nu):
            a = i * nu + j
            b = i * nu + (j + 1) % nu
            c = (i + 1) * nu + j
            e = (i + 1) * nu + (j + 1) % nu
            idx += [[a, b, c], [b, e, c]]
    idx = np.asarray(idx, np.int32)
    v = pos.astype(np.float32)
    return v[idx[:, 0]], v[idx[:, 1]], v[idx[:, 2]]


def bench_rays(r, seed=0, kind="primary"):
    rng = np.random.default_rng(seed)
    if kind == "primary":
        # camera at (0,0,3) looking at origin — screen-ordered (coherent-ish)
        o = np.tile(np.float32([0, 0, 3.0]), (r, 1))
        side = int(np.ceil(np.sqrt(r)))
        ys, xs = np.meshgrid(np.linspace(-0.5, 0.5, side),
                             np.linspace(-0.5, 0.5, side), indexing="ij")
        d = np.stack([xs.ravel()[:r], ys.ravel()[:r],
                      np.full(r, -1.0)], -1).astype(np.float32)
    else:
        # bounce-like: origins on the sphere, cosine-ish directions
        n = rng.normal(size=(r, 3)).astype(np.float32)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        o = n * 1.001
        d = (n + 0.8 * rng.normal(size=(r, 3)).astype(np.float32))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return (Vec3(*(jnp.asarray(o[:, i]) for i in range(3))),
            Vec3(*(jnp.asarray(d[:, i]) for i in range(3))),
            jnp.full((r,), 1e-3), jnp.full((r,), jnp.inf))


def slope_time(fn, *args, iters=8):
    def rep(n):
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn(*args)
        jax.block_until_ready(r)
        return time.perf_counter() - t0
    rep(1)  # compile
    a = min(rep(1) for _ in range(3))
    b = min(rep(1 + iters) for _ in range(3))
    return (b - a) / iters * 1000  # ms


def main():
    v0, v1, v2 = sphere_tris()
    tris = tc.prepare(v0, v1, v2)
    nb = tris.block_min.shape[0]
    print(f"tris={v0.shape[0]} blocks={nb}")

    R = 2 ** 21  # ~2M rays like the 1080p bench
    for kind in ("primary", "bounce"):
        o, d, t0, t1 = bench_rays(R, kind=kind)

        # uncovered fractions: instrument pass1 via _sweep after the sort
        def stats(o, d, t0, t1):
            r = o.x.shape[0]
            octant = ((d.x >= 0).astype(jnp.uint32)
                      + 2 * (d.y >= 0).astype(jnp.uint32)
                      + 4 * (d.z >= 0).astype(jnp.uint32))
            from tpu_pbrt.ops.bvh import morton3d
            code = morton3d(jnp.stack([o.x, o.y, o.z], -1), tris.lo, tris.hi)
            skey = ((octant << jnp.uint32(27)) | (code >> jnp.uint32(5))
                    ).astype(jnp.int32)
            rid0 = jnp.arange(r, dtype=jnp.int32)
            ops = lax.sort((skey, rid0, o.x, o.y, o.z, d.x, d.y, d.z,
                            t0, t1), dimension=0, num_keys=2)
            _, _, ox, oy, oz, dx, dy, dz, tt0, tt1 = ops
            _, _, _, unc1 = tc._sweep(tris, ox, oy, oz, dx, dy, dz, tt0, tt1,
                                      tc.U1, False)
            # pass2 on compacted uncovered
            pool2 = max((r // 8) // tc.CHUNK * tc.CHUNK, tc.CHUNK)
            (_, ox2, oy2, oz2, dx2, dy2, dz2, tt02, tt12) = lax.sort(
                ((~unc1).astype(jnp.int32), ox, oy, oz, dx, dy, dz, tt0, tt1),
                dimension=0, num_keys=1)
            sl = slice(0, pool2)
            _, _, _, unc2 = tc._sweep(tris, ox2[sl], oy2[sl], oz2[sl],
                                      dx2[sl], dy2[sl], dz2[sl],
                                      tt02[sl], tt12[sl], tc.U2, False)
            n1 = unc1.sum()
            overflow = jnp.maximum(n1 - pool2, 0)
            return n1, unc2.sum() + overflow
        n1, n2 = jax.jit(stats)(o, d, t0, t1)
        print(f"{kind}: unc after pass1 = {int(n1)} ({int(n1)/R:.4%}), "
              f"after pass2 = {int(n2)} ({int(n2)/R:.4%})")

        full = slope_time(jax.jit(tc.closest_hit), tris, o, d, t0, t1,
                          iters=3)
        print(f"{kind}: full closest_hit {full:.1f} ms "
              f"-> {R/full/1e3:.1f} Mrays/s")

        # phase timings
        def p1_only(o, d, t0, t1):
            r = o.x.shape[0]
            return tc._sweep(tris, o.x, o.y, o.z, d.x, d.y, d.z, t0, t1,
                             tc.U1, False)[0]
        t_p1 = slope_time(jax.jit(p1_only), o, d, t0, t1)
        print(f"{kind}: pass1 sweep only {t_p1:.1f} ms "
              f"-> {R/t_p1/1e3:.1f} Mrays/s")

        def sort_only(o, d, t0, t1):
            skey = (d.x >= 0).astype(jnp.int32)
            return lax.sort((skey, o.x, o.y, o.z, d.x, d.y, d.z, t0, t1),
                            dimension=0, num_keys=1)[1]
        t_s = slope_time(jax.jit(sort_only), o, d, t0, t1)
        print(f"{kind}: one 9-operand sort {t_s:.1f} ms")

        if os.environ.get("DIAG_DENSE"):
            def dense_all(o, d, t0, t1):
                return tc._dense_all(tris, o.x, o.y, o.z, d.x, d.y, d.z,
                                     t0, t1, False)[0]
            t_d = slope_time(jax.jit(dense_all), o, d, t0, t1, iters=2)
            print(f"{kind}: dense_all catch-all {t_d:.1f} ms")


if __name__ == "__main__":
    main()
