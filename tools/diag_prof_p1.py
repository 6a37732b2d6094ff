"""Profile the pass-1 culled sweep (all-live primary pool) by HLO op."""
import sys, os, glob, gzip, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from collections import defaultdict
import jax
import jax.numpy as jnp
from jax import lax

from tpu_pbrt.ops import traverse_culled as tc
from diag_culled import sphere_tris, bench_rays


def main():
    v0, v1, v2 = sphere_tris()
    tris = tc.prepare(v0, v1, v2)
    R = 2 ** 21
    o, d, t0, t1 = bench_rays(R, kind="primary")

    @jax.jit
    def run(o, d, t0, t1):
        def body(i, acc):
            k, _, _, _ = tc._sweep(tris, o.x, o.y, o.z, d.x, d.y, d.z,
                                   t0 + i * 0.0, t1, tc.U1, False)
            return acc + k[::4096].astype(jnp.float32).sum()
        return lax.fori_loop(0, 4, body, jnp.zeros(()))

    float(run(o, d, t0, t1))  # compile
    tracedir = "/tmp/prof_p1"
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
            continue
        base = name.split(".")[0]
        by[f"{base} [{cat}]"] += e["dur"]
        total += e["dur"]
    print(f"total device us (4 iters): {total:.0f}  "
          f"-> {total/4/1000:.1f} ms/sweep")
    for k, v in sorted(by.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {v/4/1000:8.2f} ms/sweep  {k}")


if __name__ == "__main__":
    main()
