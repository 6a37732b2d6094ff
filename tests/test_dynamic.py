"""Rigid instance transforms + node animation + per-frame accel refresh
(reference: Source/Scene.ixx:195-231,365-380, Source/Animation.ixx:119-144).
A scene with a moving NON-skinned object must render at its animated
position with correct object motion vectors."""

import numpy as np
import pytest

from tpu_pbrt.models.gltf import (AnimationChannel, AnimationClip, MeshData,
                                  Model, Node, Primitive)
from tpu_pbrt.models import animation as anim_mod
from tpu_pbrt.passes.pathtrace import PathTraceSettings
from tpu_pbrt.render.camera import Camera
from tpu_pbrt.render.dynamic import DynamicRenderer, RigidObject

W = H = 64


def box_primitive(size=0.5, material=0):
    s = size
    corners = np.array(
        [[x, y, z] for x in (-s, s) for y in (-s, s) for z in (-s, s)],
        np.float32)
    faces = []
    normals = []
    pos = []
    for axis in range(3):
        for sign in (-1.0, 1.0):
            quad = [c for c in corners if c[axis] * sign > 0]
            quad = np.asarray(quad, np.float32)
            # order the 4 corners into a consistent winding
            u_ax, v_ax = [a for a in range(3) if a != axis]
            order = np.lexsort((quad[:, v_ax], quad[:, u_ax]))
            quad = quad[order]
            base = len(pos)
            pos.extend(quad)
            n = np.zeros(3, np.float32)
            n[axis] = sign
            normals.extend([n] * 4)
            faces += [[base, base + 1, base + 2], [base + 1, base + 3,
                                                   base + 2]]
    pos = np.asarray(pos, np.float32)
    return Primitive(
        positions=pos,
        normals=np.asarray(normals, np.float32),
        tangents=np.tile(np.asarray([1, 0, 0, 1], np.float32), (len(pos), 1)),
        uv0=np.zeros((len(pos), 2), np.float32),
        uv1=np.zeros((len(pos), 2), np.float32),
        indices=np.asarray(faces, np.int32),
        material=material,
    )


def make_model(prim, materials, animations=()):
    return Model(
        meshes=[MeshData(primitives=[prim])],
        nodes=[Node(name="root", children=[], translation=np.zeros(3),
                    rotation=np.asarray([0, 0, 0, 1], np.float32),
                    scale=np.ones(3), matrix=None, mesh=0)],
        scene_roots=[0],
        materials=materials,
        textures=[], texture_srgb=[],
        animations=list(animations),
    )


def translate(t):
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = t
    return m


def look_at_camera():
    cam = Camera()
    cam.position = np.asarray([0, 0, -6], np.float32)  # +z forward
    cam.aspect = W / H
    return cam


def slide_clip(speed=(2.0, 0.0, 0.0), duration=4.0):
    times = np.asarray([0.0, duration], np.float32)
    values = np.asarray([[0, 0, 0], np.asarray(speed) * duration], np.float32)
    return AnimationClip(
        name="slide",
        channels=[AnimationChannel(node=0, path="translation",
                                   times=times, values=values)],
        duration=duration)


@pytest.fixture(scope="module")
def renderer():
    mover = make_model(box_primitive(0.6, 0), [{"base_color": (0.8, 0.2, 0.2, 1)}],
                       [slide_clip()])
    floor = make_model(box_primitive(0.5, 0), [{"base_color": (0.6, 0.6, 0.6, 1)}])
    objects = [
        RigidObject(model=mover, transform=translate([-1.5, 0.5, 0.0]),
                    player=anim_mod.AnimationPlayer(mover.animations)),
        RigidObject(model=floor,
                    transform=np.diag([8.0, 0.2, 8.0, 1.0]).astype(np.float32)
                    @ translate([0, -5.0, 0])),
    ]
    return DynamicRenderer(objects, W, H,
                           PathTraceSettings(bounces=2,
                                             samples_per_pixel=1))


def mover_mask(r, gb):
    tri_obj = np.asarray(r.scene.geometry.tri_object)
    tri = np.asarray(gb.tri)
    return (tri >= 0) & (tri_obj[np.maximum(tri, 0)] == 0)


def test_moving_object_renders_and_moves(renderer):
    cam = look_at_camera()
    centers = []
    for f in range(4):
        img, rays, gb = renderer.render(cam, f, dt=0.25, with_gbuffer=True)
        m = mover_mask(renderer, gb).reshape(H, W)
        assert m.any(), "mover not visible"
        xs = np.nonzero(m)[1]
        centers.append(xs.mean())
        assert np.isfinite(np.asarray(img)).all()
    # the box slides +x; its pixel footprint must march across the screen
    assert centers[-1] > centers[0] + 2.0, centers


def test_mover_motion_vectors_nonzero(renderer):
    cam = look_at_camera()
    img, rays, gb = renderer.render(cam, 10, dt=0.25, with_gbuffer=True)
    m = mover_mask(renderer, gb)
    motion = np.abs(np.asarray(gb.motion_x))[m]
    assert m.any()
    # screen-space motion on the mover: non-zero for most of its pixels
    assert (motion > 1e-3).mean() > 0.5, motion.mean()

    # static floor pixels carry ~zero motion
    tri = np.asarray(gb.tri)
    tri_obj = np.asarray(renderer.scene.geometry.tri_object)
    floor = (tri >= 0) & (tri_obj[np.maximum(tri, 0)] == 1)
    if floor.any():
        fm = np.abs(np.asarray(gb.motion_x))[floor]
        assert np.median(fm) < 1e-2


def test_moving_emissive_light_tracks():
    """NEE must follow a moving emitter (device light-table refresh)."""
    lamp = make_model(box_primitive(0.4, 0),
                      [{"base_color": (1, 1, 1, 1),
                        "emissive_color": (1.0, 1.0, 1.0),
                        "emissive_strength": 40.0}],
                      [slide_clip(speed=(3.0, 0.0, 0.0))])
    floor = make_model(box_primitive(0.5, 0),
                       [{"base_color": (0.7, 0.7, 0.7, 1)}])
    objects = [
        RigidObject(model=lamp, transform=translate([-3.0, 2.0, 0.0]),
                    player=anim_mod.AnimationPlayer(lamp.animations)),
        RigidObject(model=floor,
                    transform=np.diag([10.0, 0.2, 10.0, 1.0]).astype(np.float32)
                    @ translate([0, -10.0, 0])),
    ]
    from tpu_pbrt.models.scene import make_environment

    r = DynamicRenderer(
        objects, W, H, PathTraceSettings(bounces=2, samples_per_pixel=1),
        environment=make_environment(color=(0, 0, 0, 1)))  # black env
    cam = look_at_camera()

    def floor_brightness(img, gb, left):
        half = np.asarray(img)[:, : W // 2] if left else np.asarray(img)[:, W // 2:]
        return float(half.mean())

    img0, _, gb0 = r.render(cam, 0, dt=0.0, with_gbuffer=True)
    for f in range(1, 9):
        img1, _, gb1 = r.render(cam, f, dt=0.25, with_gbuffer=True)
    # after sliding 6 units right, the bright side of the floor flips
    l0, r0 = floor_brightness(img0, gb0, True), floor_brightness(img0, gb0, False)
    l1, r1 = floor_brightness(img1, gb1, True), floor_brightness(img1, gb1, False)
    assert l0 > r0, (l0, r0)
    assert r1 > l1, (l1, r1)
