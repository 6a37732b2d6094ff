"""End-to-end Cornell Box render tests (golden-config sanity, SURVEY.md §4.2:
the 'fake backend' is JAX-on-CPU running the identical jitted code)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pbrt.models.cornell import make_cornell_box, make_cornell_camera
from tpu_pbrt.passes.pathtrace import PathTraceSettings
from tpu_pbrt.render.renderer import Renderer


@pytest.fixture(scope="module")
def cornell_render():
    w = h = 64
    scene = make_cornell_box()
    cam = make_cornell_camera(w, h)
    r = Renderer(scene, w, h, PathTraceSettings(bounces=3, samples_per_pixel=1))
    img = np.asarray(r.render_accumulated(cam, frames=8))
    return img


def test_finite_and_nonblack(cornell_render):
    img = cornell_render
    assert np.isfinite(img).all()
    assert img.mean() > 0.01


def test_color_bleed_sides(cornell_render):
    """Red wall on the left (x=0), green wall on the right (x=552.8) —
    the reference golden-shot orientation; camera looks +z, +x to image
    right."""
    img = cornell_render
    left = img[:, :12]
    right = img[:, -12:]
    assert left[..., 0].mean() > left[..., 1].mean()
    assert right[..., 1].mean() > right[..., 0].mean()


def test_light_is_brightest(cornell_render):
    img = cornell_render
    lum = img.mean(-1)
    # the ceiling light region (top-center rows) holds the max luminance
    ys, xs = np.unravel_index(np.argmax(lum), lum.shape)
    assert ys < img.shape[0] // 3, (ys, xs)
    assert lum.max() > 5.0  # emissive ~ (17, 12, 4)


def test_deterministic_same_frame(cornell_render):
    w = h = 32
    scene = make_cornell_box()
    cam = make_cornell_camera(w, h)
    r = Renderer(scene, w, h, PathTraceSettings(bounces=2, samples_per_pixel=1))
    a = np.asarray(r.render(cam, 5))
    b = np.asarray(r.render(cam, 5))
    np.testing.assert_array_equal(a, b)


def test_spp_reduces_variance():
    w = h = 32
    scene = make_cornell_box()
    cam = make_cornell_camera(w, h)
    r1 = Renderer(scene, w, h, PathTraceSettings(bounces=2, samples_per_pixel=1))
    r4 = Renderer(scene, w, h, PathTraceSettings(bounces=2, samples_per_pixel=4))
    # compare per-pixel variance across frames
    f1 = np.stack([np.asarray(r1.render(cam, f)) for f in range(6)])
    f4 = np.stack([np.asarray(r4.render(cam, f)) for f in range(6)])
    assert f4.var(axis=0).mean() < f1.var(axis=0).mean()
    # means agree (unbiasedness smoke check)
    np.testing.assert_allclose(f1.mean(), f4.mean(), rtol=0.15)


def test_ray_counter_positive():
    w = h = 16
    scene = make_cornell_box()
    cam = make_cornell_camera(w, h)
    r = Renderer(scene, w, h, PathTraceSettings(bounces=2, samples_per_pixel=1))
    _, rays = r.render_with_stats(cam, 0)
    # at least every pixel traces a primary ray
    assert float(rays) >= w * h


def test_fetch_rows_blocked_matches_gather():
    """Big-table block fetch == plain row gather, for coherent, scattered,
    and adversarial (many distinct blocks per chunk) slot patterns."""
    import numpy as np
    import jax.numpy as jnp
    from tpu_pbrt.ops import shade_table as st

    rng = np.random.default_rng(0)
    t, c = 3000, 12
    table = jnp.asarray(rng.normal(size=(t, c)).astype(np.float32))

    coherent = np.repeat(rng.integers(0, t - 130, 24), 128)[:2560]
    coherent = coherent + np.tile(np.arange(128), 20)
    scattered = rng.integers(0, t, 2560)
    stripes = (np.arange(2560) * 97) % t          # every lane new block
    for slots in (coherent, scattered, stripes):
        slots = np.asarray(slots, np.int32)
        got = np.asarray(st._fetch_rows_blocked(table, jnp.asarray(slots)))
        want = np.asarray(table)[slots].T
        np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_fetch_rows_pallas_matches_gather():
    """Pallas VMEM-resident fetch == plain row gather, bit-exact
    (HIGHEST-precision one-hot dot), incl. non-multiple T/C/R sizes
    (interpret mode on CPU)."""
    import numpy as np
    import jax.numpy as jnp
    from tpu_pbrt.ops import shade_table as st

    rng = np.random.default_rng(2)
    for t, c, r in ((37, 30, 1000), (512, 64, 257), (130, 7, 128)):
        table = jnp.asarray(rng.normal(size=(t, c)).astype(np.float32))
        slots = np.asarray(rng.integers(0, t, r), np.int32)
        got = np.asarray(st._fetch_rows_pallas(
            table, jnp.asarray(slots), interpret=True))
        np.testing.assert_allclose(got, np.asarray(table)[slots].T,
                                   rtol=0, atol=0)


def test_fetch_bounce_fused_matches_unfused():
    """The fused Pallas bounce-fetch (dot + unpack in-kernel) must
    reproduce the XLA fetch_bounce path on every ShadeAttrs field it
    populates (interpret mode on CPU; real scene table, hit-consistent
    and arbitrary slots)."""
    import numpy as np
    import jax.numpy as jnp
    from tpu_pbrt.models.cornell import make_cornell_box
    from tpu_pbrt.ops import shade_table as st
    from tpu_pbrt.ops import tracer as tracer_mod
    from tpu_pbrt.ops.vec import Vec3

    scene = make_cornell_box()
    trc = tracer_mod.build_for_scene(scene)
    table = trc.shade_table
    tp = table.shape[0]
    rng = np.random.default_rng(5)
    r = 700
    slot = jnp.asarray(rng.integers(0, tp, r, dtype=np.int32))
    o = Vec3(*(jnp.asarray(rng.normal(size=r) * 200 + 275, jnp.float32)
               for _ in range(3)))
    dn = rng.normal(size=(3, r))
    dn /= np.linalg.norm(dn, axis=0, keepdims=True)
    d = Vec3(*(jnp.asarray(c, jnp.float32) for c in dn))

    want = st.fetch_bounce(table, slot, o, d)
    sub = table[:, jnp.asarray(st._BOUNCE_COLS, jnp.int32)]
    got = st._fetch_bounce_fused(sub, slot, o, d, interpret=True)

    for name in ("position", "flat_normal", "shading_normal"):
        for ax in "xyz":
            np.testing.assert_allclose(
                np.asarray(getattr(getattr(got, name), ax)),
                np.asarray(getattr(getattr(want, name), ax)),
                rtol=0, atol=2e-5, err_msg=f"{name}.{ax}")
    for name in ("base_color", "emission"):
        for ax in "xyz":
            np.testing.assert_array_equal(
                np.asarray(getattr(getattr(got, name), ax)),
                np.asarray(getattr(getattr(want, name), ax)),
                err_msg=f"{name}.{ax}")
    for name in ("metallic", "roughness", "ior", "transmission",
                 "light_pdf_area", "tri"):
        np.testing.assert_array_equal(np.asarray(getattr(got, name)),
                                      np.asarray(getattr(want, name)),
                                      err_msg=name)
    np.testing.assert_allclose(np.asarray(got.light_cos),
                               np.asarray(want.light_cos),
                               rtol=0, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(got.is_front_face),
                                  np.asarray(want.is_front_face))


def test_fetch_rows_pallas_big_table():
    """The VMEM row-fetch kernel past the XLA one-hot cap (>512 rows, the
    round-5 FUSED_MAX_ROWS raise that rescued the animated config from
    the blocked sort/gather fetch) must stay an exact row select."""
    import numpy as np
    import jax.numpy as jnp
    from tpu_pbrt.ops import shade_table as st

    rng = np.random.default_rng(9)
    t, c = 5133, 30                                # animated-table scale
    table = jnp.asarray(rng.normal(size=(t, c)).astype(np.float32))
    slots = np.asarray(rng.integers(0, t, 2000), np.int32)
    got = np.asarray(st._fetch_rows_pallas(table, jnp.asarray(slots),
                                           interpret=True))
    np.testing.assert_array_equal(got, np.asarray(table)[slots].T)


def test_fetch_bounce_fused_big_table():
    """Fused bounce fetch on a >512-row table (FUSED_MAX_ROWS path):
    exact row select + unpack vs the XLA path."""
    import numpy as np
    import jax.numpy as jnp
    from tpu_pbrt.ops import shade_table as st
    from tpu_pbrt.ops.vec import Vec3

    rng = np.random.default_rng(11)
    tp, r = 1200, 600
    table = jnp.asarray(rng.normal(size=(tp, st.COLS)).astype(np.float32))
    slot = jnp.asarray(rng.integers(0, tp, r, dtype=np.int32))
    o = Vec3(*(jnp.asarray(rng.normal(size=r), jnp.float32)
               for _ in range(3)))
    dn = rng.normal(size=(3, r))
    dn /= np.linalg.norm(dn, axis=0, keepdims=True)
    d = Vec3(*(jnp.asarray(x, jnp.float32) for x in dn))
    sub = table[:, jnp.asarray(st._BOUNCE_COLS, jnp.int32)]
    got = st._fetch_bounce_fused(sub, slot, o, d, interpret=True)
    rows = np.asarray(table)[np.asarray(slot)]
    np.testing.assert_array_equal(np.asarray(got.metallic),
                                  rows[:, st._METAL])
    np.testing.assert_array_equal(np.asarray(got.base_color.x),
                                  rows[:, st._BASE])
    np.testing.assert_array_equal(np.asarray(got.tri),
                                  rows[:, st._TRI].astype(np.int32))


def test_fetch_rows_blocked_nonmultiple_sizes():
    import numpy as np
    import jax.numpy as jnp
    from tpu_pbrt.ops import shade_table as st

    rng = np.random.default_rng(1)
    t, c = 777, 7                                  # non-multiples
    table = jnp.asarray(rng.normal(size=(t, c)).astype(np.float32))
    slots = np.asarray(rng.integers(0, t, 1000), np.int32)
    got = np.asarray(st._fetch_rows_blocked(table, jnp.asarray(slots)))
    np.testing.assert_allclose(got, np.asarray(table)[slots].T,
                               rtol=0, atol=0)
