"""Round-5 bunny-silhouette descent (CPU, noise-free chamfer).

The round-5b SSIM map + silhouette overlay localize the residual on the
BUNNY outline: the reference (ref Screenshots/Cornell Box.png) shows a
wide-V of upright ears (outer ear forward, inner swept back), a high
back arch and a large rear haunch; the baked round-4 pose (ear_len 0.6,
head_up 0.7, tilt 36 both ears) tucks the ears almost flat. Descend the
extended shape knobs (per-ear tilt, back_up, haunch) plus placement on
the g3 chamfer score, bunny + block objects (the bunny occludes the
block edge).

Usage: python tools/r5_bunny_descent.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from g3_silhouette import coordinate_descent, BUNNY, BLOCK, BALL


def main():
    base = {
        "bunny_center": (382.0, 205.0), "bunny_scale": 95.0,
        "bunny_yaw": -8.0, "bunny_ear_len": 0.6, "bunny_head_up": 0.7,
        "bunny_ear_tilt": 36.0, "bunny_back_up": 1.0, "bunny_haunch": 1.0,
    }
    params = [
        ("bunny_ear_tilt", [36.0, (-20.0, 28.0), (-12.0, 36.0),
                            (-25.0, 18.0), (0.0, 30.0), (-18.0, 45.0)]),
        ("bunny_ear_len", [0.6, 0.8, 1.0, 1.2]),
        ("bunny_head_up", [0.7, 0.85, 1.0, 1.15]),
        ("bunny_back_up", [1.0, 1.12, 1.25]),
        ("bunny_haunch", [1.0, 1.15, 1.3]),
        ("bunny_scale", [88.0, 95.0, 102.0, 110.0]),
        ("bunny_center", [(382.0, 205.0), (374.0, 205.0), (390.0, 205.0),
                          (382.0, 190.0), (382.0, 220.0), (374.0, 190.0)]),
        ("bunny_yaw", [-16.0, -8.0, 0.0, 8.0]),
    ]
    coordinate_descent(base, params, objs=(BUNNY, BLOCK, BALL), rounds=2)


if __name__ == "__main__":
    main()
