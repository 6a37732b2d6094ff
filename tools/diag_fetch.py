"""Measure one-hot shade-table fetch variants at 2M lanes (the 'fetch
41%' slice of the 1080p PT frame). Slope timing, self-exiting, one TPU
process. Variants: dot precision (HIGHEST=6-pass vs HIGH=3-pass vs
DEFAULT=1-pass bf16), split precision (positions exact, materials 3-pass),
bf16 onehot operand. Also reports max abs error vs the HIGHEST fetch so
precision decisions are data, not guesswork."""
import sys, os, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpu_pbrt.models.cornell import make_cornell_box
from tpu_pbrt.ops import tracer as tracer_mod
from tpu_pbrt.ops import shade_table as st
from diag_culled import slope_time

R = 2 ** 21


def main():
    scene = make_cornell_box()
    trc = tracer_mod.build_for_scene(scene)
    table = trc.shade_table                      # (T, 64)
    tp = table.shape[0]
    print(f"table {table.shape}", flush=True)

    cols = jnp.asarray(st._BOUNCE_COLS, jnp.int32)
    sub = table[:, cols]                         # (T, 30)
    pos_cols = jnp.arange(9, dtype=jnp.int32)    # p0,e1,e2 inside sub
    mat_cols = jnp.arange(9, sub.shape[1], dtype=jnp.int32)

    rng = np.random.default_rng(0)
    slot = jnp.asarray(rng.integers(0, tp, R, dtype=np.int32))

    def onehot_f32(s):
        return (s[None, :] == jnp.arange(tp, dtype=jnp.int32)[:, None]
                ).astype(jnp.float32)

    def dot_prec(tab, prec):
        def f(s):
            oh = onehot_f32(s)
            return lax.dot_general(
                tab, oh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
        return f

    variants = {
        "highest_30c": dot_prec(sub, lax.Precision.HIGHEST),
        "high_30c": dot_prec(sub, lax.Precision.HIGH),
        "default_30c": dot_prec(sub, lax.Precision.DEFAULT),
    }

    def split(s):
        oh = onehot_f32(s)
        p = lax.dot_general(sub[:, :9], oh, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST)
        m = lax.dot_general(sub[:, 9:], oh, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGH)
        return jnp.concatenate([p, m], axis=0)
    variants["split_9H6_21H3"] = split

    def bf16_oh(s):
        oh = (s[None, :] == jnp.arange(tp, dtype=jnp.int32)[:, None]
              ).astype(jnp.bfloat16)
        return lax.dot_general(
            sub.astype(jnp.bfloat16), oh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    variants["bf16_both"] = bf16_oh

    # Pallas VMEM-resident fetch: no (T, R) one-hot in HBM
    variants["pallas_30c"] = lambda s: st._fetch_rows_pallas(sub, s)
    variants["pallas_64c"] = lambda s: st._fetch_rows_pallas(table, s)

    # plain row gather baseline (the thing one-hot beat 7x in round 1)
    variants["row_gather"] = lambda s: sub[s].T

    # round-4 fused dot+unpack kernel (returns the post-unpack block, so
    # err columns don't apply — time only)
    from tpu_pbrt.ops.vec import Vec3 as _V3
    _o = _V3(*(jnp.full((R,), 275.0) for _ in range(3)))
    _d = _V3(jnp.zeros((R,)), jnp.zeros((R,)), jnp.ones((R,)))
    variants["fused_unpack"] = lambda s: st._fetch_bounce_fused_pallas(
        sub, s, _o, _d)

    ref = None
    for name, f in variants.items():
        fn = jax.jit(f)
        out = np.asarray(fn(slot))
        if ref is None:
            ref = out
        if out.shape == ref.shape:
            err_pos = float(np.abs(out[:9] - ref[:9]).max())
            err_mat = float(np.abs(out[9:] - ref[9:]).max())
        else:
            err_pos = err_mat = -1.0   # different column set (64c)
        t_ms = slope_time(fn, slot, iters=8)
        print(json.dumps({"variant": name, "ms": round(t_ms, 2),
                          "err_pos": err_pos, "err_mat": err_mat}),
              flush=True)

    # full fetch_bounce for context (dot + unpack + re-intersect)
    from tpu_pbrt.ops.vec import Vec3
    o = Vec3(*(jnp.zeros((R,)) for _ in range(3)))
    d = Vec3(jnp.zeros((R,)), jnp.zeros((R,)), jnp.ones((R,)))
    fb = jax.jit(lambda s: st.fetch_bounce(table, s, o, d).position.x)
    t_ms = slope_time(fb, slot, iters=8)
    print(json.dumps({"variant": "fetch_bounce_full", "ms": round(t_ms, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
