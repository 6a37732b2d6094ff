"""Sharded-frame-graph overhead analysis on the virtual 8-device mesh.

VERDICT r2 weak item 10 asked for a measurement of the sharded 1080p
graph's overhead beyond the toy-shape equivalence test: what the
collectives ship per frame, and how large the replicated post tail is
relative to the sharded heavy section. Running the 1080p graph on the
CPU mesh would measure CPU, not TPU — so this tool measures the two
things that ARE platform-independent:

  1. the collective inventory of the compiled sharded step (op kind +
     shape + bytes, from the optimized HLO), with an ICI-time estimate
     at v5e link bandwidth, and
  2. the FLOP split between the sharded heavy section and the
     replicated post tail (XLA cost analysis), i.e. the Amdahl
     replicated fraction.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
         python tools/mesh_overhead.py [height width]
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import json

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")   # axon default wins over env
import jax.numpy as jnp

from tpu_pbrt.models.cornell import make_cornell_box, make_cornell_camera
from tpu_pbrt.parallel.app_mesh import jit_app_sharded
from tpu_pbrt.parallel.mesh import make_mesh
from tpu_pbrt.render.app import App
from tpu_pbrt.utils.config import GraphicsSettings

# v5e ICI: 2-D torus, ~186 GB/s aggregate per chip (scaling-book class
# number); a 1-D ring all_gather of N bytes costs ~N*(n-1)/n per link.
ICI_GBPS = 186.0

DTYPE_BYTES = {"f32": 4, "f16": 2, "bf16": 2, "s32": 4, "u32": 4,
               "pred": 1, "s8": 1, "u8": 1, "f64": 8, "u64": 8, "s64": 8}


def shape_bytes(sig: str) -> int:
    """Bytes of one HLO shape signature like 'f32[8,129600]'."""
    m = re.match(r"(\w+)\[([\d,]*)\]", sig)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES.get(dt, 4)


def collect(hlo: str):
    rows = []
    for line in hlo.splitlines():
        ls = line.strip()
        m = re.match(
            r"%?\S+ = (\(?[^)=]*\)?) (all-gather|all-reduce|"
            r"collective-permute|all-to-all|reduce-scatter)", ls)
        if not m:
            continue
        out_sig, kind = m.groups()
        sigs = re.findall(r"\w+\[[\d,]*\]", out_sig)
        nbytes = sum(shape_bytes(s) for s in sigs)
        rows.append({"op": kind, "out": out_sig.strip()[:80],
                     "bytes": nbytes})
    return rows


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 1080
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    devs = jax.devices()
    assert len(devs) >= 8, "needs the 8-device virtual mesh"
    mesh = make_mesh(devs[:8])
    n = 8

    s = GraphicsSettings()
    s.width, s.height = w, h
    # native internal res: row bands must divide the mesh (540 does not);
    # also the heavier, more informative sharding case
    s.post_processing.super_resolution_scale = 1.0
    s.check()
    scene = make_cornell_box()
    cam = make_cornell_camera(w, h)
    app = App(scene, cam, s)
    step = jit_app_sharded(app, mesh)

    lowered = step.lower(app.tracer, scene, cam.data(), np.uint32(1),
                         app.history)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    rows = collect(hlo)
    total = sum(r["bytes"] for r in rows)
    # ring collectives ship (n-1)/n of the payload over each chip's links
    ici_ms = total * (n - 1) / n / (ICI_GBPS * 1e9) * 1e3

    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))

    # Post-tail split. The SVGF denoiser is SHARDED over the pixel mesh
    # since the halo-exchange commit (passes/denoise.py halo kwargs via
    # parallel/app_mesh.py), so the replicated tail is only
    # TAA+sharpen+bloom+tonemap; the denoiser cost is reported separately
    # as the (sharded) heavy-post figure.
    from tpu_pbrt.passes import bloom as bloom_mod
    from tpu_pbrt.passes import denoise as denoise_mod
    from tpu_pbrt.passes import taa as taa_mod
    from tpu_pbrt.ops import tonemap

    def _flops(fn, *args):
        c = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return float(c.get("flops", 0.0))

    def denoise_only(img, albedo, depth, normal, motion, dstate):
        return denoise_mod.denoise_frame(
            dstate, img, albedo, depth, normal, motion,
            iterations=s.post_processing.denoiser_iterations)

    def post(img, motion, tstate):
        img, tstate = taa_mod.resolve(tstate, img, motion, app.out_h,
                                      app.out_w)
        img = taa_mod.sharpen(img, s.post_processing.sharpness)
        img = bloom_mod.apply(img, s.post_processing.bloom_strength)
        return tonemap.apply(img, "aces", s.post_processing.exposure), \
            tstate

    rw, rh = app.render_w, app.render_h
    img = jnp.zeros((rh, rw, 3))
    dflops = _flops(denoise_only, img, img, jnp.zeros((rh, rw)), img,
                    jnp.zeros((rh, rw, 2)), app.history.denoiser)
    pflops = _flops(post, img, jnp.zeros((rh, rw, 2)), app.history.taa)

    by_kind = {}
    for r in rows:
        by_kind.setdefault(r["op"], [0, 0])
        by_kind[r["op"]][0] += 1
        by_kind[r["op"]][1] += r["bytes"]

    report = {
        "render": f"{rw}x{rh} -> {app.out_w}x{app.out_h}",
        "mesh": n,
        "collectives": {k: {"count": c, "MB": round(b / 1e6, 2)}
                        for k, (c, b) in sorted(by_kind.items())},
        "total_MB_per_frame": round(total / 1e6, 2),
        "est_ici_ms_v5e": round(ici_ms, 3),
        "flops_per_frame_G": round(flops / 1e9, 2),
        "denoiser_flops_G_sharded": round(dflops / 1e9, 2),
        "replicated_post_flops_G": round(pflops / 1e9, 2),
        "replicated_post_fraction": round(pflops / max(flops, 1.0), 4),
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
