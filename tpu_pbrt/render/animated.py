"""Animated-scene rendering: per-frame skinning + tracer refit + render.

The TPU analogue of the reference's dynamic-scene frame step (reference:
Source/App.cpp:613-618 — SkinSkeletalMeshes + CreateAccelerationStructures
per frame when the scene isn't static; Source/Scene.ixx:233-380). Flow per
frame, all inside one jit:

  palettes (host numpy, tiny)  ->  LBS GEMM  ->  posed triangle soup
  -> dense-tracer refit + shade-table geometry refresh -> render

Matches BASELINE config #4 (skeletal animation + per-frame refit).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..models import animation as anim_mod
from ..models.gltf import Model
from ..models.scene import Scene
from ..ops import shade_table as shade_mod
from ..ops import tracer as tracer_mod

from ..passes import pathtrace, skinning
from .camera import Camera
from .renderer import _render_frame


@dataclasses.dataclass
class SkinnedObject:
    """One skinned model instance prepared for device skinning."""
    model: Model
    skin_index: int
    weight_matrix: np.ndarray   # (V, J)
    base_positions: np.ndarray  # (V, 3) mesh-local
    base_normals: np.ndarray    # (V, 3)
    base_tangents: np.ndarray   # (V, 4)
    indices: np.ndarray         # (T, 3)
    player: anim_mod.AnimationPlayer
    mesh_world: np.ndarray      # (4, 4) object->world


def prepare_skinned(model: Model, world: np.ndarray | None = None) -> SkinnedObject:
    """Collect the model's skinned primitives into one vertex pool."""
    pos, nrm, tan, idx, joints, weights = [], [], [], [], [], []
    voff = 0
    skin_index = 0
    for node in model.nodes:
        if node.mesh is None or node.skin is None:
            continue
        skin_index = node.skin
        for prim in model.meshes[node.mesh].primitives:
            if prim.joints is None:
                continue
            pos.append(prim.positions)
            nrm.append(prim.normals)
            tan.append(prim.tangents)
            idx.append(prim.indices + voff)
            joints.append(prim.joints)
            weights.append(prim.weights)
            voff += len(prim.positions)
    if not pos:
        raise ValueError("model has no skinned primitives")
    joints_all = np.concatenate(joints)
    weights_all = np.concatenate(weights)
    num_joints = len(model.skins[skin_index].joints)
    w = skinning.build_weight_matrix(joints_all, weights_all, num_joints)
    return SkinnedObject(
        model=model,
        skin_index=skin_index,
        weight_matrix=w,
        base_positions=np.concatenate(pos),
        base_normals=np.concatenate(nrm),
        base_tangents=np.concatenate(tan),
        indices=np.concatenate(idx),
        player=anim_mod.AnimationPlayer(model.animations),
        mesh_world=world if world is not None else np.eye(4, dtype=np.float32),
    )


class AnimatedRenderer:
    """Frame loop for a single skinned object + static scene materials."""

    def __init__(self, scene: Scene, obj: SkinnedObject, width: int,
                 height: int,
                 settings: pathtrace.PathTraceSettings | None = None):
        self.scene = scene
        self.obj = obj
        self.width = width
        self.height = height
        self.settings = settings or pathtrace.PathTraceSettings()
        self.tracer = tracer_mod.build_for_scene(scene)
        self._prev_palette = None

        i = obj.indices
        self._i0 = jnp.asarray(i[:, 0])
        self._i1 = jnp.asarray(i[:, 1])
        self._i2 = jnp.asarray(i[:, 2])
        self._w = jnp.asarray(obj.weight_matrix)
        self._pos = jnp.asarray(obj.base_positions)
        self._nrm = jnp.asarray(obj.base_normals)
        self._tan = jnp.asarray(obj.base_tangents)
        # padded-table row count (prepare() pads to the chunk size)
        self._pad = self.tracer.shade_table.shape[0] - i.shape[0]

        self._step = jax.jit(
            functools.partial(
                _animated_frame,
                width=width, height=height, settings=self.settings,
            ),
        )

    def palettes(self, dt: float) -> np.ndarray:
        """Advance animation and compute the (J, 12) palette (host)."""
        self.obj.player.tick(dt)
        pose = self.obj.player.pose()
        world = anim_mod.global_transforms(self.obj.model, pose)
        return anim_mod.skinning_palette(
            self.obj.model, self.obj.skin_index, world,
            mesh_world=None,
        )

    def render(self, camera: Camera, frame_index: int, dt: float = 1 / 60):
        palette = self.palettes(dt)
        if self._prev_palette is None:
            self._prev_palette = palette
        img, rays, tracer = self._step(
            self.tracer, self.scene, camera.data(),
            np.uint32(frame_index),
            jnp.asarray(palette), jnp.asarray(self._prev_palette),
            self._w, self._pos, self._nrm, self._tan,
            self._i0, self._i1, self._i2,
        )
        self._prev_palette = palette
        return img, rays


def _animated_frame(tracer, scene, cam, frame, palette, prev_palette,
                    weight_matrix, base_pos, base_nrm, base_tan,
                    i0, i1, i2, *, width, height, settings):
    """One jitted animated frame: skin -> refit -> shade-table refresh ->
    render."""
    with jax.named_scope("skin_refit"):
        posed, posed_n, _ = skinning.skin_vertices(
            weight_matrix, palette, base_pos, base_nrm, base_tan)
        prev_posed, _, _ = skinning.skin_vertices(
            weight_matrix, prev_palette, base_pos, base_nrm, base_tan)

        v0, v1, v2 = posed[i0], posed[i1], posed[i2]
        pv0, pv1, pv2 = prev_posed[i0], prev_posed[i1], prev_posed[i2]
        n0, n1, n2 = posed_n[i0], posed_n[i1], posed_n[i2]

        pad = tracer.shade_table.shape[0] - v0.shape[0]

        def padz(a):
            return (jnp.concatenate([a, jnp.zeros((pad, 3), a.dtype)])
                    if pad else a)

        table = shade_mod.update_geometry(
            tracer.shade_table,
            padz(v0), padz(v1 - v0), padz(v2 - v0),
            padz(n0), padz(n1), padz(n2),
            padz(pv0), padz(pv1 - pv0), padz(pv2 - pv0),
        )
        new_tracer = tracer_mod.refit(
            tracer_mod.Tracer(tracer.kind, tracer.accel, table,
                              tracer.light_table, tracer.light_cdf,
                              tracer.atlas, alpha_test=tracer.alpha_test),
            v0, v1, v2)
    img, rays = _render_frame(new_tracer, scene, cam, frame,
                              width=width, height=height, settings=settings)
    return img, rays, new_tracer
