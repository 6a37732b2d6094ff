"""glTF loader, JSON scene schema, config system tests (synthetic assets —
no network access, so we author tiny glTF/GLB files on the fly)."""

import base64
import json
import struct

import numpy as np
import pytest

from tpu_pbrt.models import gltf
from tpu_pbrt.models.scene_json import (
    build_scene, load_scene_desc, parse_quaternion,
)
from tpu_pbrt.utils import config


def make_quad_gltf(path, binpath=None, glb=False, with_texture=False,
                   base_dir=None, emissive=True):
    """A unit quad in XY with normals, UVs, a PBR material, and optionally a
    2x2 PNG base-color texture."""
    positions = np.asarray(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32)
    normals = np.tile(np.asarray([[0, 0, 1]], np.float32), (4, 1))
    uvs = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    indices = np.asarray([0, 1, 2, 0, 2, 3], np.uint16)

    blob = b"".join([
        positions.tobytes(), normals.tobytes(), uvs.tobytes(),
        indices.tobytes(),
    ])

    buffer_views = [
        {"buffer": 0, "byteOffset": 0, "byteLength": 48},
        {"buffer": 0, "byteOffset": 48, "byteLength": 48},
        {"buffer": 0, "byteOffset": 96, "byteLength": 32},
        {"buffer": 0, "byteOffset": 128, "byteLength": 12},
    ]
    accessors = [
        {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3",
         "min": [-1, -1, 0], "max": [1, 1, 0]},
        {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC3"},
        {"bufferView": 2, "componentType": 5126, "count": 4, "type": "VEC2"},
        {"bufferView": 3, "componentType": 5123, "count": 6, "type": "SCALAR"},
    ]
    material = {
        "pbrMetallicRoughness": {
            "baseColorFactor": [0.8, 0.2, 0.1, 1.0],
            "metallicFactor": 0.3,
            "roughnessFactor": 0.7,
        },
        "extensions": {
            "KHR_materials_ior": {"ior": 1.33},
            "KHR_materials_transmission": {"transmissionFactor": 0.5},
        },
    }
    if emissive:
        material["emissiveFactor"] = [1.0, 0.5, 0.25]
        material["extensions"]["KHR_materials_emissive_strength"] = {
            "emissiveStrength": 4.0}
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": [1.0, 2.0, 3.0]}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
            "indices": 3, "material": 0,
        }]}],
        "materials": [material],
        "bufferViews": buffer_views,
        "accessors": accessors,
    }

    if with_texture:
        from PIL import Image
        import io

        img = Image.fromarray(
            np.asarray([[[255, 0, 0, 255], [0, 255, 0, 255]],
                        [[0, 0, 255, 255], [255, 255, 255, 255]]], np.uint8))
        bio = io.BytesIO()
        img.save(bio, "PNG")
        png = bio.getvalue()
        doc["images"] = [{"uri": "data:image/png;base64," +
                          base64.b64encode(png).decode()}]
        doc["textures"] = [{"source": 0}]
        material["pbrMetallicRoughness"]["baseColorTexture"] = {"index": 0}

    if glb:
        js = json.dumps(doc | {"buffers": [{"byteLength": len(blob)}]}).encode()
        js += b" " * ((4 - len(js) % 4) % 4)
        blob_p = blob + b"\x00" * ((4 - len(blob) % 4) % 4)
        total = 12 + 8 + len(js) + 8 + len(blob_p)
        with open(path, "wb") as f:
            f.write(struct.pack("<III", 0x46546C67, 2, total))
            f.write(struct.pack("<II", len(js), 0x4E4F534A))
            f.write(js)
            f.write(struct.pack("<II", len(blob_p), 0x004E4942))
            f.write(blob_p)
    else:
        doc["buffers"] = [{
            "byteLength": len(blob),
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(blob).decode(),
        }]
        with open(path, "w") as f:
            json.dump(doc, f)
    return path


class TestGltf:
    def test_load_gltf_data_uri(self, tmp_path):
        p = make_quad_gltf(str(tmp_path / "quad.gltf"))
        model = gltf.load(p)
        prim = model.meshes[0].primitives[0]
        assert prim.positions.shape == (4, 3)
        assert prim.indices.shape == (2, 3)
        np.testing.assert_allclose(prim.normals[:, 2], 1.0)
        # tangents generated from UVs
        assert prim.tangents.shape == (4, 4)
        np.testing.assert_allclose(
            np.abs(prim.tangents[:, 0]), 1.0, atol=1e-5)

    def test_load_glb(self, tmp_path):
        p = make_quad_gltf(str(tmp_path / "quad.glb"), glb=True)
        model = gltf.load(p)
        assert model.meshes[0].primitives[0].positions.shape == (4, 3)
        assert model.nodes[0].translation[1] == 2.0

    def test_material_extensions(self, tmp_path):
        """KHR emissive_strength / ior / transmission
        (GLTFHelpers.ixx:451-455)."""
        p = make_quad_gltf(str(tmp_path / "quad.gltf"))
        model = gltf.load(p)
        m = model.materials[0]
        assert m["base_color"] == (0.8, 0.2, 0.1, 1.0)
        assert m["ior"] == 1.33
        assert m["transmission"] == 0.5
        assert m["emissive_strength"] == 4.0

    def test_texture_decode(self, tmp_path):
        p = make_quad_gltf(str(tmp_path / "quad.gltf"), with_texture=True)
        model = gltf.load(p)
        assert len(model.textures) == 1
        assert model.textures[0].shape == (2, 2, 4)
        assert model.texture_srgb[0] is True
        assert model.materials[0]["texture_index"][0] == 0

    def test_world_flatten_applies_node_transform(self, tmp_path):
        p = make_quad_gltf(str(tmp_path / "quad.gltf"))
        model = gltf.load(p)
        meshes = gltf.to_geometry_meshes(model)
        # node translation (1,2,3) applied
        np.testing.assert_allclose(
            meshes[0]["positions"].mean(0), [1, 2, 3], atol=1e-5)


class TestSceneJson:
    def write_scene(self, tmp_path, extra=None):
        make_quad_gltf(str(tmp_path / "quad.gltf"))
        desc = {
            "Camera": {
                "Position": {"X": 0.0, "Y": 1.0, "Z": -5.0},
                "Rotation": {"Yaw": 10.0},
            },
            "EnvironmentLight": {"Color": {"R": 0.1, "G": 0.2, "B": 0.3,
                                           "A": 1.0}},
            "Models": {"Quad": "quad.gltf"},
            "RenderObjects": [
                {"Name": "one", "Model": "Quad",
                 "Transform": {"Translation": {"X": 2.0},
                               "Scale": {"X": 2, "Y": 2, "Z": 2}}},
            ],
        }
        if extra:
            desc.update(extra)
        p = tmp_path / "scene.json"
        p.write_text(json.dumps(desc))
        return str(p)

    def test_parse_and_resolve(self, tmp_path):
        p = self.write_scene(tmp_path)
        desc = load_scene_desc(p)
        assert desc.camera_position[2] == -5.0
        assert desc.models["Quad"].endswith("quad.gltf")
        assert "/" in desc.models["Quad"]  # resolved to absolute

    def test_missing_model_reference_raises(self, tmp_path):
        p = self.write_scene(tmp_path, extra={
            "RenderObjects": [{"Name": "bad", "Model": "Nope"}]})
        with pytest.raises(RuntimeError, match="RenderObject bad.*Nope"):
            load_scene_desc(p)

    def test_quaternion_ypr_vs_xyzw(self):
        q1 = parse_quaternion({"X": 0, "Y": 0, "Z": 0, "W": 1})
        np.testing.assert_allclose(q1, [0, 0, 0, 1])
        q2 = parse_quaternion({"Yaw": 90.0})
        # 90-degree yaw: y = sin(45), w = cos(45)
        np.testing.assert_allclose(
            np.abs(q2), [0, np.sin(np.pi / 4), 0, np.cos(np.pi / 4)],
            atol=1e-6)

    def test_build_scene_end_to_end(self, tmp_path):
        from tpu_pbrt.passes.pathtrace import PathTraceSettings
        from tpu_pbrt.render.renderer import Renderer

        p = self.write_scene(tmp_path)
        scene, camera, _ = build_scene(load_scene_desc(p))
        assert scene.geometry.num_tris == 2
        camera.aspect = 1.0
        r = Renderer(scene, 16, 16, PathTraceSettings(bounces=1))
        img = np.asarray(r.render(camera, 0))
        assert np.isfinite(img).all()
        assert img.max() > 0  # env light or emissive visible


class TestConfig:
    def test_defaults_match_reference(self):
        s = config.GraphicsSettings()
        assert s.raytracing.bounces == 8
        assert s.raytracing.samples_per_pixel == 1
        assert s.raytracing.russian_roulette
        assert s.raytracing.restir_di
        assert s.raytracing.sharc
        assert s.raytracing.sharc_downscale == 4
        assert s.raytracing.sharc_scene_scale == 50.0
        assert s.post_processing.bloom_strength == 0.05
        assert s.post_processing.tonemap_operator == "aces"
        assert s.post_processing.hdr_paper_white_nits == 200.0

    def test_clamping(self):
        s = config.GraphicsSettings()
        s.raytracing.bounces = 10_000
        s.post_processing.bloom_strength = -3.0
        s.check()
        assert s.raytracing.bounces == config.MAX_BOUNCES
        assert s.post_processing.bloom_strength == 0.0

    def test_json_roundtrip(self, tmp_path):
        p = str(tmp_path / "settings.json")
        s = config.GraphicsSettings()
        s.raytracing.bounces = 4
        s.post_processing.tonemap_operator = "reinhard"
        config.save(s, p)
        s2 = config.load(p)
        assert s2.raytracing.bounces == 4
        assert s2.post_processing.tonemap_operator == "reinhard"

    def test_load_missing_gives_defaults(self, tmp_path):
        s = config.load(str(tmp_path / "absent.json"))
        assert s.raytracing.bounces == 8


class TestTextures:
    def test_atlas_bilinear_sampling(self):
        import jax.numpy as jnp
        from tpu_pbrt.ops import texture as tex_mod

        # 2x2 texture: distinct corners
        img = np.zeros((2, 2, 4), np.float32)
        img[0, 0] = [1, 0, 0, 1]
        img[0, 1] = [0, 1, 0, 1]
        img[1, 0] = [0, 0, 1, 1]
        img[1, 1] = [1, 1, 1, 1]
        atlas = tex_mod.build_atlas([img])
        ti = jnp.zeros((4,), jnp.int32)
        # texel centers
        u = jnp.asarray([0.25, 0.75, 0.25, 0.75])
        v = jnp.asarray([0.25, 0.25, 0.75, 0.75])
        rgb, a = tex_mod.sample_bilinear(atlas, ti, u, v)
        got = np.asarray(rgb.to_array())
        np.testing.assert_allclose(got[0], [1, 0, 0], atol=1e-5)
        np.testing.assert_allclose(got[1], [0, 1, 0], atol=1e-5)
        np.testing.assert_allclose(got[2], [0, 0, 1], atol=1e-5)
        np.testing.assert_allclose(got[3], [1, 1, 1], atol=1e-5)
        # midpoint blends all four
        rgb, _ = tex_mod.sample_bilinear(
            atlas, ti[:1], jnp.asarray([0.5]), jnp.asarray([0.5]))
        np.testing.assert_allclose(np.asarray(rgb.to_array())[0],
                                   [0.5, 0.5, 0.5], atol=1e-5)

    def test_wrap_repeat(self):
        import jax.numpy as jnp
        from tpu_pbrt.ops import texture as tex_mod

        img = np.zeros((1, 2, 4), np.float32)
        img[0, 0] = [1, 0, 0, 1]
        img[0, 1] = [0, 1, 0, 1]
        atlas = tex_mod.build_atlas([img])
        rgb, _ = tex_mod.sample_bilinear(
            atlas, jnp.zeros((2,), jnp.int32),
            jnp.asarray([0.25, 1.25]), jnp.asarray([0.5, 0.5]))
        got = np.asarray(rgb.to_array())
        np.testing.assert_allclose(got[0], got[1], atol=1e-5)

    def test_textured_scene_renders(self, tmp_path):
        """End-to-end: a textured quad through the full loader + renderer;
        the base-color texture must show up in the image."""
        import jax.numpy as jnp
        from tpu_pbrt.models.scene_json import build_scene, load_scene_desc
        from tpu_pbrt.ops import tracer as tracer_mod
        from tpu_pbrt.passes.pathtrace import PathTraceSettings
        from tpu_pbrt.render.renderer import Renderer

        make_quad_gltf(str(tmp_path / "quad.gltf"), with_texture=True,
                       emissive=False)
        desc = {
            "Camera": {"Position": {"X": 1.0, "Y": 2.0, "Z": 0.5}},
            "EnvironmentLight": {"Color": {"R": 1, "G": 1, "B": 1, "A": 1}},
            "Models": {"Quad": "quad.gltf"},
            "RenderObjects": [{"Name": "q", "Model": "Quad"}],
        }
        p = tmp_path / "scene.json"
        p.write_text(json.dumps(desc))
        scene, camera, textures = build_scene(load_scene_desc(str(p)))
        camera.aspect = 1.0

        r = Renderer(scene, 32, 32, PathTraceSettings(bounces=1))
        # swap in a textured tracer
        r.tracer = tracer_mod.build_for_scene(
            scene, textures=textures[0], texture_srgb=textures[1])
        img = np.asarray(r.render_accumulated(camera, frames=6))
        assert np.isfinite(img).all()
        # the 2x2 texture modulates base color per quadrant: the green/red
        # channel ratio must vary across the image (texture visible)
        ratio = img[..., 1] / np.maximum(img[..., 0], 1e-6)
        assert ratio.max() - ratio.min() > 0.2, (ratio.min(), ratio.max())


class TestMsftTextureDds:
    def test_msft_texture_dds_extension(self, tmp_path):
        """textures[].extensions.MSFT_texture_dds.source overrides the
        standard source and routes through the native DDS decoder
        (reference: Source/GLTFHelpers.ixx:451)."""
        import struct as _struct

        p = make_quad_gltf(str(tmp_path / "quad.gltf"), with_texture=True)
        doc = json.load(open(p))
        # BC1 solid-white 4x4 block wrapped in a DDS container
        block = bytes([0xFF, 0xFF, 0xFF, 0xFF, 0, 0, 0, 0])
        header = _struct.pack("<4I", 0x20534444, 124, 0x1007, 4)
        header += _struct.pack("<I", 4) + _struct.pack("<3I", 0, 0, 0)
        header += b"\0" * 44
        header += _struct.pack("<2I", 32, 0x4) + b"DXT1"
        header += _struct.pack("<5I", 0, 0, 0, 0, 0)
        header += _struct.pack("<5I", 0x1000, 0, 0, 0, 0)
        dds_bytes = header + block
        doc["images"].append({
            "uri": "data:image/vnd-ms.dds;base64,"
                   + base64.b64encode(dds_bytes).decode(),
            "mimeType": "image/vnd-ms.dds",
        })
        doc["textures"][0]["extensions"] = {
            "MSFT_texture_dds": {"source": 1}}
        json.dump(doc, open(p, "w"))

        model = gltf.load(p)
        assert len(model.textures) == 1
        tex = model.textures[0]
        assert tex.shape == (4, 4, 4)
        assert (tex[..., :3] == 255).all()
