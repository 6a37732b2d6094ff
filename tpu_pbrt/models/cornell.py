"""Built-in Cornell Box (the reference's golden config scene,
reference: README.md:59-64, Screenshots/Cornell Box.png; BASELINE.json
configs #1/#2/#5).

Classic Cornell geometry (552.8-unit box, short and tall blocks, area light
in the ceiling) scaled to meters, right-handed, +Y up, camera looking +Z.
"""

from __future__ import annotations

import numpy as np

from .material import make_table
from .mesh import build_geometry
from .scene import Scene, make_environment, make_scene
from ..render.camera import Camera

_S = 0.01  # classic units -> meters

MAT_WHITE = 0
MAT_RED = 1
MAT_GREEN = 2
MAT_LIGHT = 3
MAT_METAL = 4
MAT_GLASS = 5


def _quad(p0, p1, p2, p3, material, object_id, flip=False):
    """Two triangles with consistent winding; normal from the winding."""
    p = np.asarray([p0, p1, p2, p3], np.float32) * _S
    n = np.cross(p[1] - p[0], p[3] - p[0])
    n = n / np.linalg.norm(n)
    if flip:
        n = -n
        idx = np.asarray([[0, 3, 2], [0, 2, 1]], np.int32)
    else:
        idx = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    return {
        "positions": p,
        "normals": np.tile(n, (4, 1)).astype(np.float32),
        "indices": idx,
        "material": material,
        "object": object_id,
    }


def _box(lo, hi, rot_deg_y, center_xz, material, object_id):
    """Axis-aligned box rotated about Y then translated in XZ (classic
    Cornell blocks are y-rotated boxes)."""
    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    c, s = np.cos(np.radians(rot_deg_y)), np.sin(np.radians(rot_deg_y))
    rot = np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    half = (hi - lo) / 2

    corners = []
    for dx in (-1, 1):
        for dy in (-1, 1):
            for dz in (-1, 1):
                corners.append(half * [dx, dy, dz])
    corners = np.asarray(corners, np.float32) @ rot.T
    corners[:, 0] += center_xz[0]
    corners[:, 1] += half[1]
    corners[:, 2] += center_xz[1]

    # faces as quads (outward winding); corner order: (x,y,z) in {-,+}^3
    # index = 4*ix + 2*iy + iz
    faces = [
        (0, 1, 3, 2),  # -x
        (4, 6, 7, 5),  # +x
        (0, 4, 5, 1),  # -y
        (2, 3, 7, 6),  # +y
        (0, 2, 6, 4),  # -z
        (1, 5, 7, 3),  # +z
    ]
    meshes = []
    for f in faces:
        q = corners[list(f)]
        n = np.cross(q[1] - q[0], q[3] - q[0])
        n = n / np.linalg.norm(n)
        meshes.append({
            "positions": (q * _S).astype(np.float32),
            "normals": np.tile(n, (4, 1)).astype(np.float32),
            "indices": np.asarray([[0, 1, 2], [0, 2, 3]], np.int32),
            "material": material,
            "object": object_id,
        })
    return meshes


def make_cornell_box(light_radiance=(17.0, 12.0, 4.0),
                     tall_block_material=MAT_WHITE,
                     short_block_material=MAT_WHITE) -> Scene:
    """Classic Cornell Box; materials for the blocks are configurable so the
    full-BxDF benchmark config (#2: metal/glass blocks) reuses the scene."""
    meshes = []
    # interior walls: normals point inward
    meshes.append(_quad([0, 0, 0], [552.8, 0, 0], [552.8, 0, 559.2], [0, 0, 559.2], MAT_WHITE, 0, flip=True))   # floor, +y
    meshes.append(_quad([0, 548.8, 0], [0, 548.8, 559.2], [556, 548.8, 559.2], [556, 548.8, 0], MAT_WHITE, 0, flip=True))  # ceiling, -y
    meshes.append(_quad([0, 0, 559.2], [552.8, 0, 559.2], [552.8, 548.8, 559.2], [0, 548.8, 559.2], MAT_WHITE, 0, flip=True))  # back, -z
    # reference golden shot orientation: red LEFT, green RIGHT
    # (reference: Screenshots/Cornell Box.png)
    meshes.append(_quad([552.8, 0, 0], [552.8, 0, 559.2], [552.8, 548.8, 559.2], [552.8, 548.8, 0], MAT_GREEN, 0))  # right wall, -x
    meshes.append(_quad([0, 0, 0], [0, 548.8, 0], [0, 548.8, 559.2], [0, 0, 559.2], MAT_RED, 0))                    # left wall, +x
    # area light slightly below the ceiling, facing down (-y)
    meshes.append(_quad([213, 548.0, 227], [343, 548.0, 227], [343, 548.0, 332], [213, 548.0, 332], MAT_LIGHT, 1))
    # blocks
    meshes += _box([0, 0, 0], [165, 165, 165], -18.0, (185, 169), short_block_material, 2)
    meshes += _box([0, 0, 0], [165, 330, 165], 16.5, (368, 351), tall_block_material, 3)

    geometry = build_geometry(meshes)
    materials = make_table([
        {"base_color": (0.73, 0.73, 0.73, 1.0), "roughness": 1.0},
        {"base_color": (0.65, 0.05, 0.05, 1.0), "roughness": 1.0},
        {"base_color": (0.12, 0.45, 0.15, 1.0), "roughness": 1.0},
        {"base_color": (0.78, 0.78, 0.78, 1.0), "roughness": 1.0,
         "emissive_color": light_radiance, "emissive_strength": 1.0},
        {"base_color": (0.95, 0.93, 0.88, 1.0), "metallic": 1.0, "roughness": 0.1},
        {"base_color": (1.0, 1.0, 1.0, 1.0), "roughness": 0.02,
         "transmission": 1.0, "ior": 1.5},
    ])
    # the box is closed: environment = black constant
    env = make_environment(color=(0.0, 0.0, 0.0, 1.0))
    return make_scene(geometry, materials, env)


def make_cornell_camera(width: int, height: int) -> Camera:
    cam = Camera()
    cam.position = np.asarray([278, 273, -800], np.float32) * _S
    cam.vertical_fov_deg = 38.0
    cam.aspect = width / height
    return cam
