"""Skeletal animation: clip sampling, palettes, GEMM skinning, per-frame
refit (BASELINE config #4)."""

import base64
import json

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_pbrt.models import animation as anim_mod
from tpu_pbrt.models import gltf
from tpu_pbrt.passes import skinning


def make_skinned_gltf(path):
    """A 2-bone vertical strip: bottom verts bound to joint 0 (static),
    top verts to joint 1 which a 1-second clip translates +1 in X."""
    positions = np.asarray(
        [[-0.5, 0, 0], [0.5, 0, 0], [-0.5, 1, 0], [0.5, 1, 0]], np.float32)
    normals = np.tile(np.asarray([[0, 0, 1]], np.float32), (4, 1))
    joints = np.asarray([[0, 0, 0, 0]] * 2 + [[1, 0, 0, 0]] * 2, np.uint16)
    weights = np.asarray([[1, 0, 0, 0]] * 4, np.float32)
    indices = np.asarray([0, 1, 2, 1, 3, 2], np.uint16)
    # inverse-bind: joint1 rests at (0,1,0) -> IBM translates by (0,-1,0)
    ibm0 = np.eye(4, dtype=np.float32)
    ibm1 = np.eye(4, dtype=np.float32)
    ibm1[1, 3] = -1.0
    # glTF stores matrices column-major
    ibm = np.stack([ibm0.T.reshape(16), ibm1.T.reshape(16)])
    times = np.asarray([0.0, 1.0], np.float32)
    trans = np.asarray([[0, 1, 0], [1, 1, 0]], np.float32)  # joint1 node

    blob = b"".join([
        positions.tobytes(), normals.tobytes(), joints.tobytes(),
        weights.tobytes(), indices.tobytes(), ibm.tobytes(),
        times.tobytes(), trans.tobytes(),
    ])
    sizes = (48, 48, 32, 64, 12, 128, 8, 24)
    off = [0]
    for b in sizes:
        off.append(off[-1] + b)
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1, 2]}],
        "nodes": [
            {"mesh": 0, "skin": 0},
            {"name": "root"},                          # joint 0
            {"name": "tip", "translation": [0, 1, 0]},  # joint 1
        ],
        "skins": [{"joints": [1, 2], "inverseBindMatrices": 5}],
        "animations": [{
            "channels": [{"sampler": 0,
                          "target": {"node": 2, "path": "translation"}}],
            "samplers": [{"input": 6, "output": 7,
                          "interpolation": "LINEAR"}],
        }],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "JOINTS_0": 2,
                           "WEIGHTS_0": 3},
            "indices": 4,
        }]}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": off[i], "byteLength": b}
            for i, b in enumerate(sizes)
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5123, "count": 4, "type": "VEC4"},
            {"bufferView": 3, "componentType": 5126, "count": 4, "type": "VEC4"},
            {"bufferView": 4, "componentType": 5123, "count": 6, "type": "SCALAR"},
            {"bufferView": 5, "componentType": 5126, "count": 2, "type": "MAT4"},
            {"bufferView": 6, "componentType": 5126, "count": 2, "type": "SCALAR"},
            {"bufferView": 7, "componentType": 5126, "count": 2, "type": "VEC3"},
        ],
        "buffers": [{
            "byteLength": len(blob),
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(blob).decode(),
        }],
    }
    with open(path, "w") as f:
        json.dump(doc, f)
    return path


@pytest.fixture()
def skinned_model(tmp_path):
    return gltf.load(make_skinned_gltf(str(tmp_path / "arm.gltf")))


class TestAnimationSampling:
    def test_clip_lerp(self, skinned_model):
        clip = skinned_model.animations[0]
        pose = anim_mod.sample_clip(clip, 0.5)
        np.testing.assert_allclose(pose[2]["translation"], [0.5, 1, 0],
                                   atol=1e-6)

    def test_clip_clamps_ends(self, skinned_model):
        clip = skinned_model.animations[0]
        assert anim_mod.sample_clip(clip, -1.0)[2]["translation"][0] == 0.0
        assert anim_mod.sample_clip(clip, 5.0)[2]["translation"][0] == 1.0

    def test_player_advances_and_wraps(self, skinned_model):
        p = anim_mod.AnimationPlayer(skinned_model.animations)
        p.tick(0.25)
        assert p.time == pytest.approx(0.25)
        p.tick(0.9)  # wraps the 1s clip
        assert p.time == pytest.approx(0.15)

    def test_palette_identity_at_rest(self, skinned_model):
        world = anim_mod.global_transforms(skinned_model, {})
        pal = anim_mod.skinning_palette(skinned_model, 0, world)
        # joint 0 at origin: identity row-major 3x4
        np.testing.assert_allclose(
            pal[0], [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0], atol=1e-6)


class TestSkinning:
    def test_weight_matrix(self):
        joints = np.asarray([[0, 1, 0, 0]], np.int32)
        weights = np.asarray([[0.6, 0.2, 0, 0]], np.float32)  # renormalized
        w = skinning.build_weight_matrix(joints, weights, 2)
        np.testing.assert_allclose(w, [[0.75, 0.25]], atol=1e-6)

    def test_gemm_skinning_matches_reference_math(self, skinned_model):
        prim = skinned_model.meshes[0].primitives[0]
        w = skinning.build_weight_matrix(prim.joints, prim.weights, 2)
        pose = anim_mod.sample_clip(skinned_model.animations[0], 1.0)
        world = anim_mod.global_transforms(skinned_model, pose)
        pal = anim_mod.skinning_palette(skinned_model, 0, world)
        posed, n, t = skinning.skin_vertices(
            jnp.asarray(w), jnp.asarray(pal),
            jnp.asarray(prim.positions), jnp.asarray(prim.normals),
            jnp.asarray(prim.tangents))
        posed = np.asarray(posed)
        # bottom verts static, top verts moved +1 x (IBM cancels rest pose)
        np.testing.assert_allclose(posed[:2], prim.positions[:2], atol=1e-5)
        np.testing.assert_allclose(
            posed[2:], prim.positions[2:] + [1, 0, 0], atol=1e-5)
        # normals stay unit
        np.testing.assert_allclose(np.linalg.norm(np.asarray(n), axis=-1),
                                   1.0, atol=1e-5)


class TestAnimatedRender:
    def test_refit_tracks_animation(self, skinned_model, tmp_path):
        """Render the animated strip; rays must hit it at the *posed*
        location each frame (per-frame tracer refit, config #4)."""
        from tpu_pbrt.models.material import make_table
        from tpu_pbrt.models.mesh import build_geometry
        from tpu_pbrt.models.scene import make_environment, make_scene
        from tpu_pbrt.render.animated import AnimatedRenderer, prepare_skinned
        from tpu_pbrt.render.camera import Camera

        prim = skinned_model.meshes[0].primitives[0]
        geometry = build_geometry([{
            "positions": prim.positions, "normals": prim.normals,
            "indices": prim.indices, "material": 0,
        }])
        mats = make_table([{"base_color": (0.9, 0.2, 0.2, 1.0),
                            "roughness": 1.0}])
        scene = make_scene(geometry, mats,
                           make_environment((0.5, 0.5, 0.5, 1.0)))
        obj = prepare_skinned(skinned_model)
        cam = Camera()
        cam.position = np.asarray([0.0, 0.5, -3.0], np.float32)

        r = AnimatedRenderer(scene, obj, 32, 32)
        img0, _ = r.render(cam, 0, dt=0.0)
        img1, _ = r.render(cam, 1, dt=0.999)  # nearly end of clip: +1 x
        a = np.asarray(img0)
        b = np.asarray(img1)
        assert np.isfinite(a).all() and np.isfinite(b).all()
        # the strip is darker than the gray sky in green; its column-wise
        # center of mass must shift right as the top edge swings +1 in x
        mask0 = np.maximum(0.5 - a[..., 1], 0.0).sum(0)
        mask1 = np.maximum(0.5 - b[..., 1], 0.0).sum(0)
        assert mask0.sum() > 0.1 and mask1.sum() > 0.1  # strip visible
        com0 = (mask0 * np.arange(32)).sum() / mask0.sum()
        com1 = (mask1 * np.arange(32)).sum() / mask1.sum()
        assert com1 > com0 + 1.0, (com0, com1)
