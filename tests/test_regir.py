"""ReGIR world-space light grid: build validity, cell addressing, and
unbiasedness of chained-RIS candidates vs plain power-CDF sampling
(reference: Shaders/ReGIRPresampling.hlsl, RTXDI ReGIR local-light path)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_pbrt.models.material import make_table
from tpu_pbrt.models.mesh import build_geometry
from tpu_pbrt.models.scene import make_environment, make_scene
from tpu_pbrt.ops import tracer as tracer_mod
from tpu_pbrt.ops.vec import Vec3
from tpu_pbrt.passes import regir, restir
from tpu_pbrt.passes import gbuffer as gbuffer_mod
from tpu_pbrt.render.camera import Camera, generate_rays


def many_light_scene(n_side=4):
    """A floor plus an n_side x n_side grid of ceiling emitters with
    varying power (the BASELINE many-light configuration in miniature)."""
    meshes = []
    mats = [{"base_color": [0.7, 0.7, 0.7, 1.0], "roughness": 0.8}]
    floor = {
        "positions": np.asarray(
            [[-10, 0, -10], [10, 0, -10], [10, 0, 10], [-10, 0, 10]],
            np.float32),
        "normals": np.tile(np.asarray([[0, 1, 0]], np.float32), (4, 1)),
        "uv0": np.zeros((4, 2), np.float32),
        "indices": np.asarray([[0, 1, 2], [0, 2, 3]], np.int32),
        "material": 0,
    }
    meshes.append(floor)
    k = 1
    for i in range(n_side):
        for j in range(n_side):
            cx = -6.0 + 4.0 * i
            cz = -6.0 + 4.0 * j
            s = 0.4
            mats.append({"emissive_color": [1.0, 0.8, 0.6],
                         "emissive_strength": 2.0 + 3.0 * ((i + j) % 4)})
            meshes.append({
                "positions": np.asarray(
                    [[cx - s, 6, cz - s], [cx + s, 6, cz - s],
                     [cx + s, 6, cz + s], [cx - s, 6, cz + s]], np.float32),
                "normals": np.tile(np.asarray([[0, -1, 0]], np.float32),
                                   (4, 1)),
                "uv0": np.zeros((4, 2), np.float32),
                # this winding's cross(e1, e2) points down (toward floor)
                "indices": np.asarray([[0, 1, 2], [0, 2, 3]], np.int32),
                "material": k,
            })
            k += 1
    geom = build_geometry(meshes)
    table = make_table(mats)
    return make_scene(geom, table,
                      make_environment(color=(0, 0, 0, 1.0)))


@pytest.fixture(scope="module")
def setup():
    scene = many_light_scene()
    trc = tracer_mod.build_for_scene(scene)
    cam = Camera(position=np.asarray([0, 4, -9], np.float32))
    cam.look(0.0, 35.0)   # positive pitch looks down at the floor
    w = h = 24
    camd = cam.data()
    o, d, tmin, tmax = generate_rays(camd, w, h)
    px = jnp.tile(jnp.arange(w, dtype=jnp.uint32), h)
    py = jnp.repeat(jnp.arange(h, dtype=jnp.uint32), w)
    pu = (px.astype(jnp.float32) + 0.5) / w
    pv = (py.astype(jnp.float32) + 0.5) / h
    gb = gbuffer_mod.generate(trc, scene, camd, o, d, tmin, tmax, pu, pv,
                              (w, h))
    return scene, trc, gb, -d, px, py


RS = regir.ReGIRSettings(cells_per_axis=8, lights_per_cell=8,
                         build_candidates=4, cell_size=3.0)


def test_build_fills_slots(setup):
    scene = setup[0]
    grid = regir.build(scene, np.zeros(3, np.float32), 0, RS)
    lights = np.asarray(grid.light)
    ws = np.asarray(grid.w)
    assert lights.shape == (8 ** 3 * 8,)
    filled = lights >= 0
    assert filled.mean() > 0.9
    assert (ws[filled] > 0).all()
    assert lights.max() < int(scene.lights.count)


def test_cell_addressing(setup):
    scene = setup[0]
    grid = regir.build(scene, np.zeros(3, np.float32), 0, RS)
    pos = Vec3(jnp.asarray([0.0, 100.0]), jnp.asarray([0.0, 0.0]),
               jnp.asarray([0.0, 0.0]))
    cell, inside = regir.cell_of(grid, RS, pos)
    assert bool(np.asarray(inside)[0])
    assert not bool(np.asarray(inside)[1])   # far outside the grid
    # center position -> middle cell
    c = int(np.asarray(cell)[0])
    assert 0 <= c < RS.num_cells


def test_regir_candidates_unbiased(setup):
    """Averaged DI from initial sampling must agree with the power-CDF-only
    estimator (chained RIS preserves unbiasedness)."""
    scene, trc, gb, view, px, py = setup
    s = restir.ReSTIRSettings(initial_light_samples=4,
                              initial_brdf_samples=0,
                              temporal=False, spatial=False,
                              initial_visibility=False,
                              boiling_filter=False)

    import jax

    from functools import partial

    @partial(jax.jit, static_argnums=0)
    def accum(regir_on, frames=150):
        def body(f, acc):
            grid = regir.build(scene, jnp.zeros(3), f, RS)
            res, _ = restir.initial_sampling(
                scene, gb, view, trc, px, py, f, s,
                regir=(grid, RS) if regir_on else None)
            d, sp, _ = restir.final_shading(scene, gb, view, trc, res)
            tot = d + sp
            return (acc[0] + tot.x, acc[1] + tot.y, acc[2] + tot.z)

        z = jnp.zeros_like(gb.depth)
        a = jax.lax.fori_loop(0, frames, body, (z, z, z))
        return jnp.stack(a, -1) / frames

    with_g = np.asarray(accum(True))
    without = np.asarray(accum(False))
    m_with = with_g.mean()
    m_without = without.mean()
    assert m_without > 1e-3       # scene actually lit
    assert abs(m_with - m_without) / m_without < 0.08, (m_with, m_without)


def test_regir_through_app_frame():
    """The full App frame graph runs with ReGIR enabled and produces a
    finite, lit image."""
    from tpu_pbrt.models.cornell import make_cornell_box, make_cornell_camera
    from tpu_pbrt.render.app import App
    from tpu_pbrt.utils.config import GraphicsSettings

    s = GraphicsSettings()
    s.width, s.height = 32, 32
    s.raytracing.bounces = 2
    s.raytracing.regir = True
    s.raytracing.regir_min_lights = 0  # force the grid on the 2-light box
    s.raytracing.regir_cells_per_axis = 4
    s.raytracing.regir_lights_per_cell = 4
    s.raytracing.regir_cell_size = 2.0
    s.raytracing.sharc = False
    s.post_processing.bloom = False
    s.check()
    scene = make_cornell_box()
    cam = make_cornell_camera(32, 32)
    app = App(scene, cam, s)
    assert app.regir_settings is not None  # min_lights=0 forces the grid
    img, _rays = app.tick()
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert img.mean() > 0.01


def test_regir_light_count_gate():
    """Grid presampling is skipped below regir_min_lights (the power-CDF
    draw is already exact there) and active at/above it — ReGIR cost must
    scale with light count, not burden 2-light scenes."""
    from tpu_pbrt.models.cornell import make_cornell_box, make_cornell_camera
    from tpu_pbrt.render.app import App
    from tpu_pbrt.utils.config import GraphicsSettings

    s = GraphicsSettings()
    s.width, s.height = 16, 16
    s.raytracing.sharc = False
    s.post_processing.bloom = False
    s.check()
    assert s.raytracing.regir  # shipping default stays ON
    scene = make_cornell_box()  # 2 local lights < regir_min_lights
    app = App(scene, make_cornell_camera(16, 16), s)
    assert app.regir_settings is None
    s2 = GraphicsSettings()
    s2.width, s2.height = 16, 16
    s2.raytracing.regir_min_lights = 2
    s2.check()
    app2 = App(scene, make_cornell_camera(16, 16), s2)
    assert app2.regir_settings is not None


def test_sample_from_rows_matches_sample():
    """The packed cell-row draw (one fetch + in-register slot select) is
    exactly the per-lane pool-gather `sample`."""
    from tpu_pbrt.models.cornell import make_cornell_box
    from tpu_pbrt.passes import regir

    rs = regir.ReGIRSettings(cells_per_axis=4, lights_per_cell=8,
                             build_candidates=4, cell_size=2.0)
    scene = make_cornell_box()
    grid = regir.build(scene, np.zeros(3, np.float32), 3, rs)
    r = np.random.RandomState(5)
    n = 700
    pos = Vec3(*[jnp.asarray(r.uniform(-6, 6, n).astype(np.float32))
                 for _ in range(3)])
    cell, inside = regir.cell_of(grid, rs, pos)
    u = jnp.asarray(r.uniform(0, 1, n).astype(np.float32))
    li_ref, w_ref = regir.sample(grid, rs, cell, inside, u)
    rows = regir.fetch_cell_rows(grid, rs, cell)
    li, w = regir.sample_from_rows(rows, rs, inside, u)
    np.testing.assert_array_equal(np.asarray(li), np.asarray(li_ref))
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), rtol=1e-6)
    assert (np.asarray(li_ref) >= 0).any()
