"""NEE + MIS correctness: the NEE estimator and the BSDF-only estimator must
agree in expectation (unbiasedness), and NEE must cut variance."""

import math

import numpy as np
import pytest

from tpu_pbrt.models.material import make_table
from tpu_pbrt.models.mesh import build_geometry
from tpu_pbrt.models.scene import make_environment, make_scene
from tpu_pbrt.passes.pathtrace import PathTraceSettings
from tpu_pbrt.render.camera import Camera
from tpu_pbrt.render.renderer import Renderer


@pytest.fixture(scope="module")
def floor_light_scene():
    floor = {
        "positions": np.array([[-5, 0, -5], [5, 0, -5], [5, 0, 5], [-5, 0, 5]], np.float32),
        "normals": np.tile([0, 1, 0], (4, 1)).astype(np.float32),
        "indices": np.array([[0, 2, 1], [0, 3, 2]], np.int32),
        "material": 0,
    }
    light = {
        "positions": np.array([[-.5, 2, -.5], [.5, 2, -.5], [.5, 2, .5], [-.5, 2, .5]], np.float32),
        "normals": np.tile([0, -1, 0], (4, 1)).astype(np.float32),
        "indices": np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        "material": 1,
    }
    mats = make_table([
        {"base_color": (0.73, 0.73, 0.73, 1.0), "roughness": 1.0},
        {"base_color": (0.0, 0.0, 0.0, 1.0), "roughness": 1.0,
         "emissive_color": (10.0, 10.0, 10.0)},
    ])
    scene = make_scene(build_geometry([floor, light]), mats,
                       make_environment((0, 0, 0, 1.0)))
    cam = Camera()
    cam.position = np.array([0, 1.0, -3.0], np.float32)
    cam.vertical_fov_deg = 40.0
    cam.look(0.0, math.degrees(math.atan2(1.0, 3.0)))
    return scene, cam


def test_nee_unbiased_vs_bsdf_sampling(floor_light_scene):
    scene, cam = floor_light_scene
    r_naive = Renderer(scene, 8, 8, PathTraceSettings(
        bounces=1, next_event_estimation=False, russian_roulette=False))
    r_nee = Renderer(scene, 8, 8, PathTraceSettings(
        bounces=1, next_event_estimation=True, russian_roulette=False))
    naive = np.asarray(r_naive.render_mean(cam, 4000))
    nee = np.asarray(r_nee.render_mean(cam, 400))
    assert abs(nee.mean() / naive.mean() - 1.0) < 0.06, (nee.mean(), naive.mean())


def test_nee_matches_analytic_direct(floor_light_scene):
    """Direct lighting vs quadrature ground truth (Lambert): the renderer
    uses Burley diffuse, which at this grazing view sits ~12% above
    Lambert — accept [1.0, 1.25]."""
    scene, cam = floor_light_scene
    from tpu_pbrt.render.camera import generate_rays

    r_nee = Renderer(scene, 8, 8, PathTraceSettings(
        bounces=1, next_event_estimation=True, russian_roulette=False))
    nee = np.asarray(r_nee.render_mean(cam, 500))

    o3, d3, _, _ = generate_rays(cam.data(), 8, 8)
    o, d = np.asarray(o3.to_array()), np.asarray(d3.to_array())
    t = -o[:, 1] / d[:, 1]
    p = o + t[:, None] * d
    n = 100
    xs = np.linspace(-0.5 + 0.5 / n, 0.5 - 0.5 / n, n)
    gx, gz = np.meshgrid(xs, xs)
    lp = np.stack([gx.ravel(), np.full(n * n, 2.0), gz.ravel()], 1)

    def direct(q):
        w = lp - q
        dist = np.linalg.norm(w, axis=1)
        wn = w / dist[:, None]
        return (10.0 * (0.73 / np.pi) * wn[:, 1] * wn[:, 1] / dist ** 2 / (n * n)).sum()

    ana = np.array([direct(q) for q in p]).mean()
    ratio = nee[..., 0].mean() / ana
    assert 1.0 < ratio < 1.25, ratio


def test_nee_reduces_variance(floor_light_scene):
    scene, cam = floor_light_scene
    r_naive = Renderer(scene, 8, 8, PathTraceSettings(
        bounces=1, next_event_estimation=False, russian_roulette=False))
    r_nee = Renderer(scene, 8, 8, PathTraceSettings(
        bounces=1, next_event_estimation=True, russian_roulette=False))
    fn = np.stack([np.asarray(r_naive.render(cam, f)) for f in range(50)])
    fe = np.stack([np.asarray(r_nee.render(cam, f)) for f in range(50)])
    assert fe.var(axis=0).mean() < 0.25 * fn.var(axis=0).mean()
