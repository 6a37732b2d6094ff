"""Round-5 bunny placement by direct mask IoU (CPU, noise-free).

The g3 chamfer score is MYOPIC on the bunny: the reference bunny's
interior is dense with facet edges, so the chamfer rewards shrinking our
outline INTO the facet soup (the round-4 "tuck everything" drift) and
penalizes the visually-correct placement. This tool scores IoU between
our G-buffer bunny mask and a hand-traced polygon of the screenshot's
bunny silhouette (/tmp cache or inline below) — re-projecting the traced
screen extent gives floor contact z ~ 50-90 classic units and ~290 units
total height, far from the round-4 (z=205, scale 95) pose.

Usage: python tools/r5_bunny_iou.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
from PIL import Image, ImageDraw

from g3_silhouette import Scorer, BUNNY

W, H = 480, 360
# hand-traced from Screenshots/Cornell Box.png at 480x360 (grid overlay)
POLY = [(249, 180), (240, 228), (243, 250), (238, 268), (240, 300),
        (250, 332), (262, 340), (285, 345), (315, 345), (340, 338),
        (358, 322), (362, 300), (355, 280), (335, 258), (318, 243),
        (305, 245), (300, 235), (295, 228), (302, 178), (295, 172),
        (283, 225), (268, 228), (262, 232), (255, 182)]


def ref_mask():
    im = Image.new("L", (W, H), 0)
    ImageDraw.Draw(im).polygon(POLY, fill=255)
    return np.asarray(im) > 127


def main():
    sc = Scorer()
    ref = ref_mask()

    def iou(**kw):
        oid = sc.gbuffer_oid(**kw)
        m = oid == BUNNY
        inter = (m & ref).sum()
        union = (m | ref).sum()
        return inter / max(union, 1)

    base = {
        "bunny_center": (385.0, 95.0), "bunny_scale": 118.0,
        "bunny_yaw": -8.0, "bunny_ear_len": 0.9, "bunny_head_up": 0.9,
        "bunny_ear_tilt": (-10.0, 14.0), "bunny_back_up": 1.0,
        "bunny_haunch": 1.1,
    }
    params = [
        ("bunny_center", [(385.0, 95.0), (375.0, 95.0), (395.0, 95.0),
                          (385.0, 75.0), (385.0, 115.0), (375.0, 75.0),
                          (395.0, 115.0), (385.0, 135.0)]),
        ("bunny_scale", [105.0, 112.0, 118.0, 125.0, 132.0]),
        ("bunny_ear_len", [0.7, 0.9, 1.1, 1.3]),
        ("bunny_head_up", [0.75, 0.9, 1.0, 1.1]),
        ("bunny_ear_tilt", [(-10.0, 14.0), (-4.0, 8.0), (-16.0, 22.0),
                            (0.0, 16.0), (-10.0, 28.0)]),
        ("bunny_back_up", [0.9, 1.0, 1.12]),
        ("bunny_haunch", [1.0, 1.1, 1.2, 1.3]),
        ("bunny_yaw", [-16.0, -8.0, 0.0, 8.0]),
    ]
    cur = dict(base)
    best = iou(**cur)
    print(json.dumps({"start_iou": round(best, 4)}), flush=True)
    for r in range(3):
        for name, values in params:
            bv, bs = cur.get(name), best
            for v in values:
                trial = dict(cur)
                trial[name] = v
                s = iou(**trial)
                if s > bs:
                    bv, bs = v, s
            if bv != cur.get(name):
                cur[name] = bv
                best = bs
                print(json.dumps({"round": r, "set": {name: bv},
                                  "iou": round(bs, 4)}), flush=True)
    print(json.dumps({"final": cur, "iou": round(best, 4)}), flush=True)


if __name__ == "__main__":
    main()
