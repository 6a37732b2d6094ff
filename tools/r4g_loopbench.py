"""Why do the dense sweeps run 1.6-2.3x slower inside the bounce loop
than isolated? (tools/r4g_kbench.py vs bench.py breakdown). Hypothesis:
XLA fuses the sweep with the surrounding shade chain into mega-fusions
that spill. A/B: a bounce-shaped fori_loop body, plain vs
optimization_barrier-isolated stages."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpu_pbrt.models.cornell import make_cornell_box
from tpu_pbrt.ops import shade_table
from tpu_pbrt.ops import tracer as tracer_mod, traverse_dense
from tpu_pbrt.ops.vec import Vec3

R = 2 ** 21
BOUNCES = 4


def rays(seed=1):
    r = np.random.RandomState(seed)
    o = r.uniform(-0.9, 0.9, (R, 3)).astype(np.float32)
    o[:, 1] = o[:, 1] * 0.45 + 0.5
    d = r.uniform(-1, 1, (R, 3)).astype(np.float32)
    d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-6)
    return (Vec3(*[jnp.asarray(np.ascontiguousarray(o[:, i]))
                   for i in range(3)]),
            Vec3(*[jnp.asarray(np.ascontiguousarray(d[:, i]))
                   for i in range(3)]))


def slope(f, *args, iters=2):
    def run(n):
        def body(i, acc):
            return acc + f(*args, jnp.uint32(i))
        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    lo = jax.jit(lambda: run(1))
    hi = jax.jit(lambda: run(1 + iters))
    float(lo()); float(hi())
    t0 = time.perf_counter(); float(lo()); t1 = time.perf_counter()
    float(hi()); t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / iters * 1000.0


def main():
    print("devices:", jax.devices(), flush=True)
    scene = make_cornell_box()
    tr = tracer_mod.build_for_scene(scene, kind="dense")
    o0, d0 = rays()

    def make_loop(barrier: bool):
        def bb(x):
            return lax.optimization_barrier(x) if barrier else x

        def f(ox, oy, oz, dx, dy, dz, salt):
            o = Vec3(ox, oy, oz)
            d = Vec3(dx, dy, dz)
            state = (o.x, o.y, o.z, d.x, d.y, d.z,
                     jnp.zeros((R,)), jnp.float32(salt) * 0.0)

            def body(b, st):
                ox, oy, oz, dx, dy, dz, acc, s = st
                o = Vec3(ox, oy, oz)
                d = Vec3(dx, dy, dz)
                hit = traverse_dense.closest_hit(
                    tr.accel, o, d, jnp.zeros((R,)), jnp.full((R,), jnp.inf))
                hit = jax.tree.map(bb, hit)
                attrs = shade_table.fetch_bounce(
                    tr.shade_table, jnp.maximum(hit.tri, 0), o, d)
                p = jax.tree.map(bb, attrs.position)
                n = attrs.shading_normal
                # fake shade: reflect + accumulate (stands in for BSDF)
                dd = d - n * (2.0 * (d.x * n.x + d.y * n.y + d.z * n.z))
                occ = traverse_dense.any_hit(
                    tr.accel, p, n, jnp.zeros((R,)),
                    jnp.where(hit.tri >= 0, 10.0, -jnp.inf))
                acc = acc + jnp.where(occ, 0.25, 1.0) * attrs.base_color.x
                return (p.x, p.y, p.z, dd.x, dd.y, dd.z, acc, s)

            st = lax.fori_loop(0, BOUNCES, body, state)
            return st[6].sum() + st[7]
        return f

    for barrier in (False, True):
        f = make_loop(barrier)
        t = slope(f, o0.x, o0.y, o0.z, d0.x, d0.y, d0.z)
        per = t / BOUNCES
        print(f"barrier={int(barrier)}: {t:7.2f} ms / {BOUNCES} bounces "
              f"= {per:6.2f} ms per bounce (isolated floor ~3.2)",
              flush=True)


if __name__ == "__main__":
    main()
