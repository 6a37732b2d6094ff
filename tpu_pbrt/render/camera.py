"""Camera: FoV-scaled basis-vector ray generation + controller state.

Mirrors the reference camera (reference: Source/Camera.ixx:16-178,
Shaders/Camera.hlsli:27-63): ray direction = NDC.x * Right + NDC.y * Up +
Forward, where Right/Up are pre-scaled by tan(fov/2) (and aspect). The
thin-lens path uses a concentric-disk aperture sample. Previous-frame state
(for motion vectors / temporal passes) is carried alongside.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..ops import math as pmath
from ..ops import sampling
from ..ops import vec
from ..ops.vec import Vec3


class CameraData(NamedTuple):
    """Device-side camera constants (the `Camera` CB mirror,
    Shaders/Camera.hlsli:5-26)."""
    position: jnp.ndarray           # (3,)
    right: jnp.ndarray              # (3,) — scaled by tan(fov/2)*aspect
    up: jnp.ndarray                 # (3,) — scaled by tan(fov/2)
    forward: jnp.ndarray            # (3,) — unit
    prev_position: jnp.ndarray      # (3,)
    prev_right: jnp.ndarray
    prev_up: jnp.ndarray
    prev_forward: jnp.ndarray
    aperture_radius: jnp.ndarray    # () f32
    focus_distance: jnp.ndarray     # () f32
    near: jnp.ndarray               # () f32
    far: jnp.ndarray                # () f32
    jitter: jnp.ndarray             # (2,) pixel-fraction jitter


def _quat_rotate(q: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Rotate v by quaternion q = (x, y, z, w)."""
    u = q[:3]
    w = q[3]
    return 2.0 * np.dot(u, v) * u + (w * w - np.dot(u, u)) * v + 2.0 * w * np.cross(u, v)


def quat_from_yaw_pitch_roll(yaw: float, pitch: float, roll: float) -> np.ndarray:
    """Degrees -> XYZW quaternion, matching the reference's JSON convention
    (reference: Source/JSONConverters.ixx:17-27 accepts Yaw/Pitch/Roll)."""
    cy, sy = np.cos(np.radians(yaw) / 2), np.sin(np.radians(yaw) / 2)
    cp, sp = np.cos(np.radians(pitch) / 2), np.sin(np.radians(pitch) / 2)
    cr, sr = np.cos(np.radians(roll) / 2), np.sin(np.radians(roll) / 2)
    # intrinsic yaw (Y), pitch (X), roll (Z) — DirectXMath convention
    x = sp * cy * cr + cp * sy * sr
    y = cp * sy * cr - sp * cy * sr
    z = cp * cy * sr - sp * sy * cr
    w = cp * cy * cr + sp * sy * sr
    return np.array([x, y, z, w], dtype=np.float32)


@dataclasses.dataclass
class Camera:
    """Host-side camera controller (reference: Source/Camera.ixx:60-178)."""
    position: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float32))
    rotation: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0, 0, 0, 1], np.float32))  # XYZW
    vertical_fov_deg: float = 45.0
    aspect: float = 1.0
    near: float = 1e-3
    far: float = float("inf")
    aperture_radius: float = 0.0
    focus_distance: float = 1.0

    _prev: tuple | None = None

    def directions(self):
        fwd = _quat_rotate(self.rotation, np.array([0, 0, 1], np.float32))
        right = _quat_rotate(self.rotation, np.array([1, 0, 0], np.float32))
        up = _quat_rotate(self.rotation, np.array([0, 1, 0], np.float32))
        t = np.tan(np.radians(self.vertical_fov_deg) / 2)
        return right * t * self.aspect, up * t, fwd

    def pixel_cone_spread(self, height: int) -> float:
        """Ray-cone angle (radians) subtended by one pixel vertically —
        feeds mip LOD selection (the SampleGrad-derivative analogue)."""
        t = np.tan(np.radians(self.vertical_fov_deg) / 2)
        return float(2.0 * t / max(height, 1))

    def snapshot_previous(self):
        """Save current frame state as 'previous' (App.cpp:540-546)."""
        r, u, f = self.directions()
        self._prev = (self.position.copy(), r, u, f)

    def data(self, jitter=(0.0, 0.0)) -> CameraData:
        r, u, f = self.directions()
        if self._prev is None:
            self._prev = (self.position.copy(), r, u, f)
        pp, pr, pu, pf = self._prev
        # numpy-backed: CameraData crosses the jit boundary each frame; eager
        # jnp construction would issue ~13 device ops per frame (slow over
        # the axon tunnel), numpy transfers ride the jit call itself
        as32 = lambda x: np.asarray(x, np.float32)
        return CameraData(
            as32(self.position), as32(r), as32(u), as32(f),
            as32(pp), as32(pr), as32(pu), as32(pf),
            as32(self.aperture_radius), as32(self.focus_distance),
            as32(self.near), as32(self.far), as32(np.asarray(jitter)),
        )

    # ---- controller (WASD-style, App.cpp:850-1008 analogue) -------------
    def translate(self, delta_local: np.ndarray):
        r, u, f = self.directions()
        rn = r / np.linalg.norm(r)
        un = u / np.linalg.norm(u)
        self.position = self.position + (
            delta_local[0] * rn + delta_local[1] * un + delta_local[2] * f
        ).astype(np.float32)

    def look(self, yaw_deg: float, pitch_deg: float):
        dq = quat_from_yaw_pitch_roll(yaw_deg, pitch_deg, 0.0)
        q1, q2 = self.rotation, dq
        # Hamilton product q1 * q2 (apply dq in local space)
        x1, y1, z1, w1 = q1
        x2, y2, z2, w2 = q2
        self.rotation = np.array(
            [
                w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
                w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
                w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
                w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            ],
            dtype=np.float32,
        )
        self.rotation /= np.linalg.norm(self.rotation)


def generate_rays(cam: CameraData, width: int, height: int,
                  aperture_u: jnp.ndarray | None = None,
                  jitter: jnp.ndarray | None = None,
                  previous: bool = False,
                  ndc: tuple | None = None):
    """Primary rays for every pixel, flattened row-major, SoA.

    Pinhole when aperture_radius == 0, thin lens otherwise
    (reference: Shaders/Camera.hlsli:32-54). Returns
    (origin: Vec3, direction: Vec3, t_min, t_max) of (W*H,) components.
    `ndc=(ndc_x, ndc_y)` overrides the per-pixel grid — used by the
    sharded path to generate only a tile's rays."""
    if ndc is not None:
        ndc_x, ndc_y = ndc
        px = ndc_x  # only used for pool size below
    else:
        gx, gy = jnp.meshgrid(
            jnp.arange(width, dtype=jnp.float32),
            jnp.arange(height, dtype=jnp.float32),
            indexing="xy",
        )
        px = gx.ravel()
        py = gy.ravel()

        jit = cam.jitter if jitter is None else jitter
        # UV -> NDC (Shaders/Math.hlsli:7-15)
        ndc_x = (px + 0.5 + jit[0]) / width * 2.0 - 1.0
        ndc_y = 1.0 - (py + 0.5 + jit[1]) / height * 2.0

    pos, right, up, fwd = (
        (cam.prev_position, cam.prev_right, cam.prev_up, cam.prev_forward)
        if previous else (cam.position, cam.right, cam.up, cam.forward)
    )
    rightv = Vec3(right[0], right[1], right[2])
    upv = Vec3(up[0], up[1], up[2])
    fwdv = Vec3(fwd[0], fwd[1], fwd[2])
    posv = Vec3(pos[0], pos[1], pos[2])

    raw = rightv * ndc_x + upv * ndc_y + fwdv
    n = px.shape[0]

    if aperture_u is not None:
        from ..ops.bxdf import _sample_concentric_disk

        dx, dy = _sample_concentric_disk(aperture_u[:, 0], aperture_u[:, 1])
        rn = vec.normalize(rightv)
        un = vec.normalize(upv)
        offset = (rn * dx + un * dy) * cam.aperture_radius
        origin = offset + posv
        direction = vec.normalize(raw * cam.focus_distance - offset)
    else:
        ones = jnp.ones((n,), jnp.float32)
        origin = Vec3(pos[0] * ones, pos[1] * ones, pos[2] * ones)
        direction = vec.normalize(Vec3.splat(ones) * raw)

    fwd_unit = vec.normalize(fwdv)
    inv_cos = 1.0 / jnp.maximum(vec.dot(direction, fwd_unit), 1e-6)
    t_min = cam.near * inv_cos
    t_max = jnp.where(jnp.isinf(cam.far), jnp.inf, cam.far * inv_cos)
    return origin, direction, t_min, t_max
