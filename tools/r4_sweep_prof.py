"""Profile ONE culled pass-1 sweep (new SoA layout) and print the top
device ops: the r4 diag measured the SoA repack 3x SLOWER than the
tri-major layout at identical shapes/semantics (U1=24 ks+2: 859 ->
2666 ms per 2M-ray sweep) — name the op that ate it. Self-exiting, one
TPU process.
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpu_pbrt.ops import traverse_culled as tc
from tpu_pbrt.ops.bvh import morton3d
from diag_culled import sphere_tris, bench_rays


def main():
    v0, v1, v2 = sphere_tris()
    tris = tc.prepare(v0, v1, v2)
    R = 2 ** 21
    o, d, t0, t1 = bench_rays(R, kind="primary")

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

    sa = tuple(np.asarray(x) for x in jax.jit(sorted_args)())
    n_live = int(sa[8])

    def f_sweep(ox, oy, oz, dx, dy, dz, t0, t1):
        return tc._sweep(tris, ox, oy, oz, dx, dy, dz, t0, t1,
                         24, False, n_live=jnp.int32(n_live),
                         ks_extra=2)[0].astype(jnp.uint32).sum()

    js = jax.jit(f_sweep)
    js(*sa[:8]).block_until_ready()          # compile
    tracedir = "/tmp/tpu_pbrt_sweep_prof"
    os.system(f"rm -rf {tracedir}")
    with jax.profiler.trace(tracedir):
        for _ in range(2):
            js(*sa[:8]).block_until_ready()

    tot = defaultdict(float)
    for p in glob.glob(f"{tracedir}/plugins/profile/*/*.trace.json.gz"):
        ev = json.loads(gzip.open(p).read().decode())["traceEvents"]
        for e in ev:
            if e.get("ph") == "X" and "dur" in e:
                name = e.get("name", "?")
                args = e.get("args", {})
                if "run_id" in args or name.startswith("jit_"):
                    continue
                tot[name] += e["dur"]
    rows = sorted(tot.items(), key=lambda kv: -kv[1])[:18]
    for name, us in rows:
        print(f"{us:12.0f}  {name[:110]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
