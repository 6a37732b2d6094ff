"""Megakernel micro-benchmark: slope-time ops/trace_shade_fused vs the
unfused XLA dense path at 2M lanes on the real chip, sweeping the lane
tile size. Fast iteration (~2 min) instead of full 12-min bench runs."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpu_pbrt.models.cornell import make_cornell_box
from tpu_pbrt.ops import shade_table, trace_shade_fused as tsf
from tpu_pbrt.ops import tracer as tracer_mod, traverse_dense
from tpu_pbrt.ops.vec import Vec3

R = 2 ** 21


def rays(seed=1):
    r = np.random.RandomState(seed)
    o = r.uniform(-0.9, 0.9, (R, 3)).astype(np.float32) * [1, 1, 1]
    o[:, 1] = o[:, 1] * 0.45 + 0.5
    d = r.uniform(-1, 1, (R, 3)).astype(np.float32)
    d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-6)
    return (Vec3(*[jnp.asarray(np.ascontiguousarray(o[:, i]))
                   for i in range(3)]),
            Vec3(*[jnp.asarray(np.ascontiguousarray(d[:, i]))
                   for i in range(3)]))


def slope(f, *args, iters=3):
    """Time n=1 vs n=1+iters of a scalar-reduced fori_loop (axon rule:
    only slope timing is trustworthy)."""
    import time

    def run(n):
        def body(i, acc):
            return acc + f(*args, jnp.uint32(i))
        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    j = jax.jit(run, static_argnums=())
    lo = jax.jit(lambda: run(1))
    hi = jax.jit(lambda: run(1 + iters))
    float(lo()); float(hi())            # compile both
    t0 = time.perf_counter(); float(lo()); t1 = time.perf_counter()
    float(hi()); t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / iters * 1000.0


def main():
    print("devices:", jax.devices(), flush=True)
    scene = make_cornell_box()
    tr = tracer_mod.build_for_scene(scene, kind="dense")
    o, d = rays()
    t0v = jnp.zeros((R,))
    t1v = jnp.full((R,), jnp.inf)
    sub = tr.shade_table[:, jnp.asarray(shade_table._BOUNCE_COLS, jnp.int32)]

    def xla_pair(o, d, t0, t1, salt):
        hit = traverse_dense.closest_hit(tr.accel, o, d, t0, t1)
        attrs = shade_table.fetch_bounce(
            tr.shade_table, jnp.maximum(hit.tri, 0), o, d)
        return (hit.t * 0).sum() + attrs.position.x.sum() + salt * 0.0

    def fused_pair(o, d, t0, t1, salt):
        hit, attrs = tsf.closest_hit_shade(tr.accel, sub, o, d, t0, t1)
        return (hit.t * 0).sum() + attrs.position.x.sum() + salt * 0.0

    def xla_any(o, d, t0, t1, salt):
        occ = traverse_dense.any_hit(tr.accel, o, d, t0, t1)
        return occ.sum().astype(jnp.float32) + salt * 0.0

    def fused_any(o, d, t0, t1, salt):
        occ = tsf.any_hit(tr.accel, o, d, t0, t1)
        return occ.sum().astype(jnp.float32) + salt * 0.0

    t = slope(xla_any, o, d, t0v, t1v)
    print(f"any_hit  XLA dense               : {t:7.2f} ms", flush=True)
    t = slope(xla_pair, o, d, t0v, t1v)
    print(f"closest+fetch XLA dense          : {t:7.2f} ms", flush=True)
    for tile in (2048, 4096, 8192):
        tsf.TILE_OVERRIDE = tile
        t = slope(fused_any, o, d, t0v, t1v)
        print(f"any_hit  fused tile={tile:5d}      : {t:7.2f} ms",
              flush=True)
        t = slope(fused_pair, o, d, t0v, t1v)
        print(f"closest+fetch fused tile={tile:5d} : {t:7.2f} ms",
              flush=True)
    tsf.TILE_OVERRIDE = None


if __name__ == "__main__":
    main()
