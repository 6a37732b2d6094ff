"""Debug visualizations (SHARC voxel coloring / ReGIR cell viz) and the
many-light room builder."""

import numpy as np
import pytest

from tpu_pbrt.models.cornell import make_cornell_box, make_cornell_camera
from tpu_pbrt.render.app import App
from tpu_pbrt.utils.config import GraphicsSettings


def _settings(view):
    s = GraphicsSettings()
    s.width = s.height = 32
    s.raytracing.bounces = 1
    s.raytracing.debug_view = view
    s.raytracing.sharc = False
    s.raytracing.restir_di = False
    # grid sized so the Cornell box (±2.8, camera ~8 back) is inside
    s.raytracing.regir = True
    s.raytracing.regir_cell_size = 1.5
    s.post_processing.bloom = False
    s.check()
    return s


@pytest.mark.parametrize("view", ["sharc_voxels", "regir_cells"])
def test_debug_views_render(view):
    scene = make_cornell_box()
    cam = make_cornell_camera(32, 32)
    app = App(scene, cam, _settings(view))
    img, _ = app.tick()
    img = np.asarray(img)
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
    # many distinct hashed colors on geometry
    flat = img.reshape(-1, 3)
    lit = flat[(flat > 0).any(-1)]
    assert len(np.unique((lit * 255).astype(np.uint8), axis=0)) > 8


def test_debug_view_validated():
    s = GraphicsSettings()
    s.raytracing.debug_view = "bogus"
    s.check()
    assert s.raytracing.debug_view == "none"


def test_many_light_room_builds():
    from tpu_pbrt.models.manylight import make_many_light_room

    scene = make_many_light_room(n_side=4)
    assert int(scene.lights.count) == 32   # 16 emitter quads x 2 triangles
    p = np.asarray(scene.lights.power)
    assert (p > 0).all() and p.max() > p.min() * 1.5
