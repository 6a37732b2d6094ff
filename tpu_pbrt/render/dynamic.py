"""Rigid-instance dynamic scenes: node animation + per-frame accel refresh.

Capability mirror of the reference's dynamic-scene machinery (reference:
Source/Scene.ixx:195-231 `Refresh` — per-instance previous/current
object->world recomputed each frame; Source/Scene.ixx:365-380 — TLAS
rebuild per frame; Source/Animation.ixx:119-144 — node-hierarchy walk).
A scene with a moving NON-skinned object renders correctly, with object
motion vectors for the denoiser/TAA.

TPU re-design: geometry stays object-local in one vertex pool; each
(render object, mesh node) pair is a row of a rigid transform palette.
Per frame:

  host: animation clips advance -> hierarchy walk (tiny, O(nodes)) ->
        palette rows = objectTransform x nodeGlobal   (current + previous)
  device (one jit): rigid "skinning" GEMM (one-hot weights — an instance
        transform IS a 1-joint skin) -> posed world soup -> accel refit +
        shade-table geometry/motion refresh + emissive-light-table refresh
        -> render

The light table refresh recomputes area/power/CDF on device so moving or
scaling emitters keep correct NEE weighting (reference re-runs
LightPreparation per frame, App.cpp:1095-1115).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..models import animation as anim_mod
from ..models.gltf import Model
from ..models.material import make_table
from ..models.mesh import build_geometry
from ..models.scene import Scene, make_environment, make_scene
from ..ops import shade_table as shade_mod
from ..ops import tracer as tracer_mod
from ..passes import pathtrace, skinning
from .camera import Camera
from .renderer import _render_frame


@dataclasses.dataclass
class RigidObject:
    """One render object: a model instance with an optional animation.
    (RenderObject analogue, Source/Scene.ixx:43-73.)"""
    model: Model
    transform: np.ndarray                       # (4, 4) object->world
    player: anim_mod.AnimationPlayer | None = None


class DynamicRenderer:
    """Owns a set of rigid objects; `render()` steps animations and draws
    one frame with per-frame accel/table refresh (App.cpp:613-622 flow)."""

    def __init__(self, objects: list[RigidObject], width: int, height: int,
                 settings: pathtrace.PathTraceSettings | None = None,
                 environment=None, materials: list[dict] | None = None):
        self.objects = objects
        self.width = width
        self.height = height
        self.settings = settings or pathtrace.PathTraceSettings()

        # --- assemble the object-local vertex pool; palette row per
        # (object, mesh node)
        meshes = []
        self._rows = []        # (object index, node index) per palette row
        row_vert_counts = []
        mats: list[dict] = list(materials) if materials else []
        mat_offsets = []
        for obj in objects:
            mat_offsets.append(len(mats))
            mats.extend(obj.model.materials)
        if not mats:
            mats = [{}]

        for oi, obj in enumerate(objects):
            for ni, node in enumerate(obj.model.nodes):
                if node.mesh is None:
                    continue
                self._rows.append((oi, ni))
                nverts = 0
                for prim in obj.model.meshes[node.mesh].primitives:
                    meshes.append({
                        "positions": prim.positions,
                        "normals": prim.normals,
                        "tangents": prim.tangents,
                        "uv0": prim.uv0,
                        "indices": prim.indices,
                        "material": mat_offsets[oi] + prim.material,
                        "object": oi,
                    })
                    nverts += len(prim.positions)
                row_vert_counts.append(nverts)
        geometry = build_geometry(meshes)
        table = make_table(mats)
        env = environment if environment is not None else make_environment()
        # light collection runs on the BIND pose; per-frame refresh keeps
        # positions/power current on device
        self.scene: Scene = make_scene(geometry, table, env)
        self.tracer = tracer_mod.build_for_scene(self.scene)

        # one-hot rigid weights: vertex -> its palette row
        rows_per_vertex = np.repeat(
            np.arange(len(self._rows), dtype=np.int32),
            np.asarray(row_vert_counts, np.int64))
        self._w = jnp.asarray(skinning.build_weight_matrix(
            rows_per_vertex[:, None],
            np.ones((rows_per_vertex.shape[0], 1), np.float32),
            max(len(self._rows), 1)))
        self._pos = jnp.asarray(np.asarray(geometry.positions, np.float32))
        self._nrm = jnp.asarray(np.asarray(geometry.normals, np.float32))
        self._tan = jnp.asarray(np.asarray(geometry.tangents, np.float32))
        ind = np.asarray(geometry.indices, np.int32)
        self._i0 = jnp.asarray(ind[:, 0])
        self._i1 = jnp.asarray(ind[:, 1])
        self._i2 = jnp.asarray(ind[:, 2])
        self._light_tri = jnp.asarray(
            np.asarray(self.scene.lights.tri_index, np.int32))
        self._prev_palette: np.ndarray | None = None

        self._step = jax.jit(functools.partial(
            _dynamic_frame, width=width, height=height,
            settings=self.settings))
        self._step_gb = jax.jit(functools.partial(
            _dynamic_frame, width=width, height=height,
            settings=self.settings, with_gbuffer=True))

    # ------------------------------------------------------------------
    def palettes(self, dt: float) -> np.ndarray:
        """Advance animations; (Rows, 12) current object->world palette
        (Scene::Refresh analogue — per-instance transforms recomputed on
        the host each frame, Scene.ixx:195-231)."""
        worlds: dict[int, dict[int, np.ndarray]] = {}
        for oi, obj in enumerate(self.objects):
            pose = {}
            if obj.player is not None:
                obj.player.tick(dt)
                pose = obj.player.pose()
            worlds[oi] = anim_mod.global_transforms(obj.model, pose)
        out = np.zeros((max(len(self._rows), 1), 12), np.float32)
        for row, (oi, ni) in enumerate(self._rows):
            m = self.objects[oi].transform @ worlds[oi].get(
                ni, np.eye(4, dtype=np.float32))
            out[row] = m[:3, :].reshape(12)
        return out

    def render(self, camera: Camera, frame_index: int, dt: float = 1 / 60,
               with_gbuffer: bool = False):
        palette = self.palettes(dt)
        if self._prev_palette is None:
            self._prev_palette = palette
        step = self._step_gb if with_gbuffer else self._step
        result = step(
            self.tracer, self.scene, camera.data(), np.uint32(frame_index),
            jnp.asarray(palette), jnp.asarray(self._prev_palette),
            self._w, self._pos, self._nrm, self._tan,
            self._i0, self._i1, self._i2, self._light_tri,
        )
        self._prev_palette = palette
        return result


def _dynamic_frame(tracer, scene, cam, frame, palette, prev_palette,
                   weight_matrix, base_pos, base_nrm, base_tan,
                   i0, i1, i2, light_tri, *, width, height, settings,
                   with_gbuffer=False):
    """One jitted dynamic frame: rigid transform -> refit -> shade/light
    table refresh -> render."""
    posed, posed_n, _ = skinning.skin_vertices(
        weight_matrix, palette, base_pos, base_nrm, base_tan)
    prev_posed, _, _ = skinning.skin_vertices(
        weight_matrix, prev_palette, base_pos, base_nrm, base_tan)

    v0, v1, v2 = posed[i0], posed[i1], posed[i2]
    pv0, pv1, pv2 = prev_posed[i0], prev_posed[i1], prev_posed[i2]
    n0, n1, n2 = posed_n[i0], posed_n[i1], posed_n[i2]

    pad = tracer.shade_table.shape[0] - v0.shape[0]

    def padz(a):
        return jnp.concatenate([a, jnp.zeros((pad, 3), a.dtype)]) if pad else a

    table = shade_mod.update_geometry(
        tracer.shade_table,
        padz(v0), padz(v1 - v0), padz(v2 - v0),
        padz(n0), padz(n1), padz(n2),
        padz(pv0), padz(pv1 - pv0), padz(pv2 - pv0),
    )
    light_table, light_cdf, tri_lpdf = shade_mod.refresh_light_table(
        tracer.light_table, light_tri, v0, v1, v2,
        num_tris=table.shape[0])
    table = table.at[:, shade_mod._LPDF].set(tri_lpdf)

    new_tracer = tracer_mod.refit(
        tracer_mod.Tracer(tracer.kind, tracer.accel, table, light_table,
                          light_cdf, tracer.atlas,
                          alpha_test=tracer.alpha_test),
        v0, v1, v2)
    return _render_frame(new_tracer, scene, cam, frame,
                         width=width, height=height, settings=settings,
                         with_gbuffer=with_gbuffer)
