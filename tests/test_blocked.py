"""Blocked (packet) tracer: correctness vs brute force + ray sorting."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pbrt.ops import traverse, traverse_blocked
from tpu_pbrt.ops.vec import Vec3


def random_tris(key, n, spread=10.0, size=0.4):
    k1, k2, k3 = jax.random.split(key, 3)
    base = jax.random.uniform(k1, (n, 3), minval=-spread, maxval=spread)
    return (base, base + jax.random.normal(k2, (n, 3)) * size,
            base + jax.random.normal(k3, (n, 3)) * size)


def random_rays(key, r, spread=12.0):
    k1, k2 = jax.random.split(key)
    o = jax.random.uniform(k1, (r, 3), minval=-spread, maxval=spread)
    d = jax.random.normal(k2, (r, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


@pytest.mark.parametrize("n_tris", [64, 1000, 5000])
def test_blocked_matches_brute_force(n_tris):
    v0, v1, v2 = random_tris(jax.random.PRNGKey(n_tris), n_tris)
    o, d = random_rays(jax.random.PRNGKey(7), 512)
    tris = traverse_blocked.prepare(np.asarray(v0), np.asarray(v1),
                                    np.asarray(v2))
    got = traverse_blocked.closest_hit(
        tris, Vec3.from_array(o), Vec3.from_array(d), 0.0, jnp.inf,
        tile=256)
    want = traverse.brute_force_closest_hit(v0, v1, v2, o, d, 0.0, jnp.inf)
    np.testing.assert_array_equal(np.asarray(got.tri >= 0),
                                  np.asarray(want.tri >= 0))
    m = np.asarray(got.tri >= 0)
    np.testing.assert_allclose(np.asarray(got.t)[m], np.asarray(want.t)[m],
                               rtol=1e-4)


def test_blocked_any_hit():
    v0, v1, v2 = random_tris(jax.random.PRNGKey(3), 900)
    o, d = random_rays(jax.random.PRNGKey(4), 512)
    tris = traverse_blocked.prepare(np.asarray(v0), np.asarray(v1),
                                    np.asarray(v2))
    got = traverse_blocked.any_hit(tris, Vec3.from_array(o),
                                   Vec3.from_array(d), 0.0, 5.0, tile=256)
    want = traverse.brute_force_closest_hit(v0, v1, v2, o, d, 0.0, 5.0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want.tri >= 0))


def test_ray_sorting_roundtrip():
    o, d = random_rays(jax.random.PRNGKey(5), 2048)
    ov = Vec3.from_array(o)
    dv = Vec3.from_array(d)
    perm, inv = traverse_blocked.sort_rays(
        ov, dv, jnp.asarray([-12.0] * 3), jnp.asarray([12.0] * 3))
    # permute then inverse-permute restores order
    x = o[:, 0]
    np.testing.assert_allclose(np.asarray(x[perm][inv]), np.asarray(x))
    # sorted rays are octant-coherent: octant is non-decreasing
    ds = np.asarray(d)[np.asarray(perm)]
    octant = (ds[:, 0] >= 0) + 2 * (ds[:, 1] >= 0) + 4 * (ds[:, 2] >= 0)
    assert (np.diff(octant) >= 0).all()


def test_blocked_scene_render():
    """A bigger procedural scene (UV sphere ~ 5k tris) end-to-end through
    the blocked tracer (the Damaged-Helmet-class config #3 stand-in)."""
    from tpu_pbrt.models.material import make_table
    from tpu_pbrt.models.mesh import build_geometry
    from tpu_pbrt.models.scene import make_environment, make_scene
    from tpu_pbrt.ops import tracer as tracer_mod
    from tpu_pbrt.passes.pathtrace import PathTraceSettings
    from tpu_pbrt.render.camera import Camera
    from tpu_pbrt.render.renderer import Renderer

    nu, nv = 72, 36
    theta = np.linspace(0, np.pi, nv)
    phi = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    tt, pp = np.meshgrid(theta, phi, indexing="ij")
    pos = np.stack([np.sin(tt) * np.cos(pp), np.cos(tt),
                    np.sin(tt) * np.sin(pp)], -1).reshape(-1, 3)
    idx = []
    for i in range(nv - 1):
        for j in range(nu):
            a = i * nu + j
            b = i * nu + (j + 1) % nu
            c = (i + 1) * nu + j
            e = (i + 1) * nu + (j + 1) % nu
            idx += [[a, b, c], [b, e, c]]
    idx = np.asarray(idx, np.int32)
    geometry = build_geometry([{
        "positions": pos.astype(np.float32),
        "normals": pos.astype(np.float32),
        "indices": idx, "material": 0,
    }])
    mats = make_table([{"base_color": (0.7, 0.5, 0.3, 1.0),
                        "roughness": 0.4, "metallic": 0.8}])
    scene = make_scene(geometry, mats, make_environment())  # procedural sky
    assert geometry.num_tris > 2048  # above the dense window

    cam = Camera()
    cam.position = np.asarray([0, 0.3, -3.2], np.float32)
    # the shipping default above the dense window is now culled (r4h A/B);
    # force the blocked backend — this test covers that path end to end
    import os
    os.environ["TPU_PBRT_FORCE_TRACER"] = "blocked"
    try:
        r = Renderer(scene, 48, 48, PathTraceSettings(bounces=2))
    finally:
        del os.environ["TPU_PBRT_FORCE_TRACER"]
    assert r.tracer.kind == "blocked"
    img = np.asarray(r.render(cam, 0))
    assert np.isfinite(img).all()
    # sphere silhouette: center pixels darker/metal, corners = sky
    assert img[0, 0].sum() != pytest.approx(img[24, 24].sum(), rel=0.2)


def test_blocked_refit_matches_rebuild():
    """Skinned-BLAS analogue: a >2048-tri mesh deformed after build must
    trace exactly like a fresh build on the deformed soup (VERDICT r1:
    blocked refit was broken — tracer.refit crashed on BlockedTris)."""
    from tpu_pbrt.ops import tracer as tracer_mod

    v0, v1, v2 = random_tris(jax.random.PRNGKey(11), 4000)
    tris = traverse_blocked.prepare(np.asarray(v0), np.asarray(v1),
                                    np.asarray(v2))
    # deform: twist + translate (large enough to change every block AABB)
    def deform(v):
        ang = v[:, 1] * 0.2
        c, s = jnp.cos(ang), jnp.sin(ang)
        return jnp.stack([c * v[:, 0] - s * v[:, 2] + 1.5,
                          v[:, 1] * 1.1,
                          s * v[:, 0] + c * v[:, 2]], -1)

    w0, w1, w2 = deform(v0), deform(v1), deform(v2)
    refitted = jax.jit(traverse_blocked.refit)(tris, w0, w1, w2)

    o, d = random_rays(jax.random.PRNGKey(12), 512)
    got = traverse_blocked.closest_hit(
        refitted, Vec3.from_array(o), Vec3.from_array(d), 0.0, jnp.inf,
        tile=256)
    want = traverse.brute_force_closest_hit(w0, w1, w2, o, d, 0.0, jnp.inf)
    np.testing.assert_array_equal(np.asarray(got.tri >= 0),
                                  np.asarray(want.tri >= 0))
    m = np.asarray(got.tri >= 0)
    np.testing.assert_array_equal(np.asarray(got.tri)[m],
                                  np.asarray(want.tri)[m])
    np.testing.assert_allclose(np.asarray(got.t)[m], np.asarray(want.t)[m],
                               rtol=1e-4)

    # the tracer dispatch layer must route blocked refits here, not crash
    trc = tracer_mod.Tracer("blocked", tris)
    trc2 = tracer_mod.refit(trc, w0, w1, w2)
    got2 = trc2.closest_hit(Vec3.from_array(o), Vec3.from_array(d), 0.0,
                            jnp.inf)
    np.testing.assert_array_equal(np.asarray(got2.tri), np.asarray(got.tri))
