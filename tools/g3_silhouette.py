"""Noise-free golden-scene silhouette alignment (CPU, no Monte Carlo).

SSIM against the reference screenshot is dominated by FOREGROUND
SILHOUETTE mismatch (the round-3 SSIM map localizes the loss on the
bunny/ball/block outlines), but ranking geometry through noisy
low-frame path-traced renders is slow and biased. This tool scores
placement directly: one G-buffer frame gives exact per-object masks
(no noise), and a symmetric blurred-edge chamfer score measures how
well each object's outline lands on the reference's edges.

score(obj) = 0.5 * mean over OUR edge pixels of blur(ref_edges)
           + 0.5 * mean over REF edge pixels (in the object's dilated
             ROI) of blur(our_edges)

Maximized by coordinate descent over the golden-scene placement
parameters. Runs entirely on CPU in one process (one jit cache; only
vertex data changes between candidates).

Usage: python tools/g3_silhouette.py [--apply]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from PIL import Image  # noqa: E402

W, H = 480, 360
BUNNY, BALL, BLOCK, LIGHT = 4, 5, 3, 1


def _blur(x, r=3):
    """Separable box blur, r iterations (approximates Gaussian)."""
    for _ in range(r):
        x = (np.roll(x, 1, 0) + x + np.roll(x, -1, 0)) / 3.0
        x = (np.roll(x, 1, 1) + x + np.roll(x, -1, 1)) / 3.0
    return x


def _edges(x):
    gx = np.abs(np.diff(x, axis=1, append=x[:, -1:]))
    gy = np.abs(np.diff(x, axis=0, append=x[-1:]))
    return gx + gy


def _mask_edges(m):
    return _edges(m.astype(np.float32)) > 0.5


def _dilate(m, it=12):
    m = m.copy()
    for _ in range(it):
        m = (m | np.roll(m, 1, 0) | np.roll(m, -1, 0)
             | np.roll(m, 1, 1) | np.roll(m, -1, 1))
    return m


class Scorer:
    def __init__(self):
        ref = Image.open(
            "/root/reference/Screenshots/Cornell Box.png").convert("L")
        ref = np.asarray(ref.resize((W, H), Image.LANCZOS), np.float32)
        e = _edges(ref)
        e = np.clip(e, 0.0, 40.0) / 40.0          # saturate hard edges
        self.ref_e = e
        self.ref_eb = _blur(e, 3)
        self.ref_epix = e > 0.25
        self._gb = None

    def gbuffer_oid(self, **scene_kwargs):
        from tpu_pbrt.models.golden import (make_golden_camera,
                                            make_golden_scene)
        from tpu_pbrt.ops import tracer as tracer_mod
        from tpu_pbrt.passes import gbuffer
        from tpu_pbrt.render.camera import generate_rays

        scene = make_golden_scene(**scene_kwargs)
        cam = make_golden_camera(W, H)
        tr = tracer_mod.build_for_scene(scene)
        cd = cam.data()
        o, d, tmin, tmax = generate_rays(cd, W, H)
        u = ((jnp.arange(W * H) % W).astype(jnp.float32) + 0.5) / W
        v = ((jnp.arange(W * H) // W).astype(jnp.float32) + 0.5) / H
        gb = gbuffer.generate(tr, scene, cd, o, d, tmin, tmax, u, v, (W, H))
        oid = np.asarray(gb.object_id).reshape(H, W)
        valid = np.asarray(gb.valid).reshape(H, W)
        return np.where(valid, oid, -1)

    def score_object(self, oid, obj):
        m = oid == obj
        if m.sum() < 20:
            return 0.0
        ours_e = _mask_edges(m)
        ours_eb = _blur(ours_e.astype(np.float32), 3)
        roi = _dilate(m, 12)
        ref_in_roi = self.ref_epix & roi
        a = float(self.ref_eb[ours_e].mean()) if ours_e.any() else 0.0
        b = (float(ours_eb[ref_in_roi].mean() / max(ours_eb.max(), 1e-9))
             if ref_in_roi.any() else 0.0)
        return 0.5 * a + 0.5 * b

    def score(self, objs=(BUNNY, BALL, BLOCK), **kw):
        oid = self.gbuffer_oid(**kw)
        return {o: self.score_object(oid, o) for o in objs}


def coordinate_descent(base, params, objs, rounds=2):
    """params: list of (name, values-to-try). Greedy per-parameter."""
    sc = Scorer()
    cur = dict(base)
    ref = sc.score(objs=objs, **cur)
    cur_total = sum(ref.values())
    print(json.dumps({"start": cur, "scores": ref,
                      "total": round(cur_total, 4)}), flush=True)
    for r in range(rounds):
        for name, values in params:
            best_v, best_t = cur.get(name), cur_total
            for v in values:
                trial = dict(cur)
                trial[name] = v
                s = sc.score(objs=objs, **trial)
                t = sum(s.values())
                if t > best_t:
                    best_v, best_t = v, t
            if best_v != cur.get(name):
                cur[name] = best_v
                cur_total = best_t
                print(json.dumps({"round": r, "set": {name: best_v},
                                  "total": round(best_t, 4)}), flush=True)
    print(json.dumps({"final": cur, "total": round(cur_total, 4)}),
          flush=True)
    return cur


def main():
    # refinement from the round-3 coarse-descent winner
    # (0.5428 -> 0.6246; see commit message for the coarse grid)
    base = {"bunny_center": (390.0, 215.0), "block_rot": -25.0,
            "ball_center": (98.0, 170.0), "block_center": (200.0, 420.0),
            "ball_radius": 56.0}
    params = [
        ("bunny_center", [(375.0, 215.0), (382.0, 215.0), (390.0, 215.0),
                          (398.0, 215.0), (390.0, 230.0), (390.0, 200.0),
                          (375.0, 230.0)]),
        ("bunny_scale", [88.0, 95.0, 102.0]),
        ("bunny_yaw", [-8.0, 0.0, 8.0]),
        ("block_center", [(193.0, 420.0), (200.0, 420.0), (207.0, 420.0),
                          (200.0, 435.0), (200.0, 405.0)]),
        ("block_rot", [-29.0, -25.0, -21.0, -13.0]),
        ("ball_center", [(92.0, 170.0), (98.0, 170.0), (104.0, 170.0),
                         (98.0, 158.0), (98.0, 182.0)]),
        ("ball_radius", [52.0, 56.0, 60.0]),
        ("light_scale", [0.9, 1.0, 1.1, 1.2, 1.3]),
    ]
    coordinate_descent(base, params, objs=(BUNNY, BALL, BLOCK, LIGHT),
                       rounds=2)


if __name__ == "__main__":
    main()
