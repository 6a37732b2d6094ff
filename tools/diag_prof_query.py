"""Profile one culled closest_hit (5%-live bounce pool) and aggregate
device op durations by name/category."""
import sys, os, glob, gzip, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from collections import defaultdict
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpu_pbrt.ops import traverse_culled as tc
from tpu_pbrt.ops.vec import Vec3
from diag_culled import sphere_tris, bench_rays


def main():
    v0, v1, v2 = sphere_tris()
    tris = tc.prepare(v0, v1, v2)
    R = 2 ** 21
    o, d, t0, t1 = bench_rays(R, kind="bounce")
    n_live = R // 20
    t1 = jnp.concatenate([t1[:n_live], jnp.full((R - n_live,), -jnp.inf)])

    @jax.jit
    def run(o, d, t0, t1):
        def body(i, acc):
            h = tc.closest_hit(tris, o, d, t0 + i * 0.0, t1)
            return acc + h.t[::4096].sum()
        return lax.fori_loop(0, 4, body, jnp.zeros(()))

    float(run(o, d, t0, t1))  # compile
    tracedir = "/tmp/prof_query"
    os.system(f"rm -rf {tracedir}")
    with jax.profiler.trace(tracedir):
        float(run(o, d, t0, t1))

    paths = sorted(glob.glob(f"{tracedir}/plugins/profile/*/*trace.json.gz"))
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    by = defaultdict(float)
    total = 0.0
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "")
        if name.startswith(("jit_", "while")) or name in ("run",):
            continue
        cat = e.get("args", {}).get("hlo_category", "")
        if not cat:
            continue  # host events
        base = name.split(".")[0]
        by[f"{base} [{cat}]"] += e["dur"]
        total += e["dur"]
    print(f"total device us (4 iters): {total:.0f}  "
          f"-> {total/4/1000:.1f} ms/query")
    for k, v in sorted(by.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {v/4/1000:8.2f} ms/query  {k}")


if __name__ == "__main__":
    main()
