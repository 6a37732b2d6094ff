import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pbrt.ops import math as pmath
from tpu_pbrt.ops import packing, rng, sampling


def rand_unit(key, n):
    v = jax.random.normal(key, (n, 3))
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


class TestVectors:
    def test_normalize(self):
        v = jnp.asarray([[3.0, 0.0, 4.0]])
        n = pmath.normalize(v)
        np.testing.assert_allclose(np.asarray(n), [[0.6, 0.0, 0.8]], atol=1e-6)

    def test_reflect(self):
        i = jnp.asarray([[1.0, -1.0, 0.0]]) / np.sqrt(2)
        n = jnp.asarray([[0.0, 1.0, 0.0]])
        r = pmath.reflect(i, n)
        np.testing.assert_allclose(
            np.asarray(r), np.asarray([[1.0, 1.0, 0.0]]) / np.sqrt(2), atol=1e-6
        )

    def test_refract_straight_through_eta1(self):
        i = jnp.asarray([[0.0, -1.0, 0.0]])
        n = jnp.asarray([[0.0, 1.0, 0.0]])
        t, tir = pmath.refract(i, n, jnp.ones((1, 1)))
        assert not bool(tir[0])
        np.testing.assert_allclose(np.asarray(t), np.asarray(i), atol=1e-6)

    def test_refract_tir(self):
        # grazing ray from dense to sparse medium: total internal reflection
        d = pmath.normalize(jnp.asarray([[1.0, -0.1, 0.0]]))
        n = jnp.asarray([[0.0, 1.0, 0.0]])
        _, tir = pmath.refract(d, n, jnp.full((1, 1), 1.5))
        assert bool(tir[0])

    def test_orthonormal_basis(self):
        key = jax.random.PRNGKey(0)
        n = rand_unit(key, 256)
        t, b = pmath.orthonormal_basis(n)
        np.testing.assert_allclose(np.asarray(pmath.dot(t, n)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(pmath.dot(b, n)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(pmath.dot(t, b)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(pmath.length(t)), 1.0, atol=1e-5)
        # right-handed: cross(t, b) == n
        np.testing.assert_allclose(
            np.asarray(pmath.cross(t, b)), np.asarray(n), atol=1e-5
        )

    def test_local_world_roundtrip(self):
        key = jax.random.PRNGKey(1)
        n = rand_unit(key, 64)
        v = rand_unit(jax.random.PRNGKey(2), 64)
        t, b = pmath.orthonormal_basis(n)
        vl = pmath.to_local(t, b, n, v)
        vw = pmath.to_world(t, b, n, vl)
        np.testing.assert_allclose(np.asarray(vw), np.asarray(v), atol=1e-5)

    def test_uv_ndc(self):
        # center pixel of a 2x2 image -> NDC origin quadrant signs
        uv = pmath.calculate_uv(jnp.asarray([[0.0, 0.0]]), (2, 2))
        np.testing.assert_allclose(np.asarray(uv), [[0.25, 0.25]])
        ndc = pmath.calculate_ndc(uv)
        np.testing.assert_allclose(np.asarray(ndc), [[-0.5, 0.5]])

    def test_safe_spawn_offset_moves_off_surface(self):
        p = jnp.asarray([[1.0, 2.0, -3.0]])
        n = jnp.asarray([[0.0, 1.0, 0.0]])
        d = jnp.asarray([[0.0, 1.0, 0.0]])
        q = pmath.safe_spawn_offset(p, n, d)
        assert float(q[0, 1]) > 2.0
        d2 = jnp.asarray([[0.0, -1.0, 0.0]])
        q2 = pmath.safe_spawn_offset(p, n, d2)
        assert float(q2[0, 1]) < 2.0


class TestPacking:
    def test_oct_roundtrip(self):
        n = rand_unit(jax.random.PRNGKey(3), 4096)
        d = packing.oct_decode(packing.oct_encode(n))
        dots = np.asarray(pmath.dot(d, n))
        assert dots.min() > 1.0 - 1e-4

    def test_snorm16_roundtrip(self):
        x = jnp.linspace(-1, 1, 1001)
        y = packing.snorm16_decode(packing.snorm16_encode(x))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1.0 / 32767)


class TestRng:
    def test_uniform_range_and_mean(self):
        px = jnp.arange(1 << 14) % 128
        py = jnp.arange(1 << 14) // 128
        r = rng.PixelRng(px, py, 7)
        u = np.asarray(r.next4())
        assert u.min() >= 0.0 and u.max() < 1.0
        np.testing.assert_allclose(u.mean(), 0.5, atol=0.01)

    def test_streams_decorrelated(self):
        px = jnp.arange(4096) % 64
        py = jnp.arange(4096) // 64
        a = np.asarray(rng.uniform4(px, py, 0, 0)[0])
        b = np.asarray(rng.uniform4(px, py, 0, 1)[0])
        assert abs(np.corrcoef(a, b)[0, 1]) < 0.05

    def test_counter_advances(self):
        r = rng.PixelRng(jnp.asarray([3]), jnp.asarray([5]), 0)
        assert float(r.next1()[0]) != float(r.next1()[0])


class TestSampling:
    def test_halton_low_discrepancy(self):
        pts = np.stack([sampling.halton2d(i) for i in range(1, 257)])
        assert pts.min() >= 0 and pts.max() < 1
        np.testing.assert_allclose(pts.mean(axis=0), 0.5, atol=0.02)

    def test_cosine_hemisphere_distribution(self):
        u = jax.random.uniform(jax.random.PRNGKey(4), (1 << 16, 2))
        d = sampling.sample_cosine_hemisphere(u)
        assert float(d[:, 2].min()) >= 0.0
        # E[cos theta] for pdf cos/pi is 2/3
        np.testing.assert_allclose(float(d[:, 2].mean()), 2.0 / 3.0, atol=0.01)

    def test_concentric_disk_azimuthally_uniform(self):
        """Regression: a signed-radius bug folded the disk in half — verify
        all four quadrants are equally occupied and r^2 is uniform."""
        u = jax.random.uniform(jax.random.PRNGKey(14), (1 << 18, 2))
        d = np.asarray(sampling.sample_concentric_disk(u))
        quad = (d[:, 0] > 0).astype(int) * 2 + (d[:, 1] > 0).astype(int)
        frac = np.bincount(quad, minlength=4) / len(d)
        np.testing.assert_allclose(frac, 0.25, atol=0.01)
        np.testing.assert_allclose((d ** 2).sum(1).mean(), 0.5, atol=0.01)

    def test_cosine_hemisphere_off_axis_window(self):
        """Regression for the same fold bug: probability of hitting an
        off-axis solid-angle window must match quadrature ground truth."""
        u = jax.random.uniform(jax.random.PRNGKey(15), (1 << 19, 2))
        d = np.asarray(sampling.sample_cosine_hemisphere(u))
        s = 2.0 / np.maximum(d[:, 2], 1e-6)
        hit = (np.abs(0.067 + d[:, 0] * s) <= 0.5) & (
            np.abs(-0.213 + d[:, 1] * s) <= 0.5
        )
        np.testing.assert_allclose(hit.mean(), 0.0719, atol=0.004)

    def test_vndf_half_vectors_upper_hemisphere(self):
        key = jax.random.PRNGKey(5)
        u = jax.random.uniform(key, (8192, 2))
        v = rand_unit(jax.random.PRNGKey(6), 8192)
        v = v.at[:, 2].set(jnp.abs(v[:, 2]))  # viewer above surface
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        r = jnp.full((8192,), 0.5)
        h = sampling.sample_ggx_vndf(u, r, v)
        assert float(h[:, 2].min()) >= 0.0
        # VoH must be positive (visible normals)
        voh = np.asarray(pmath.dot(v, h))
        assert voh.min() > 0.0

    def test_vndf_pdf_integrates_to_one(self):
        # integrate pdf_L over the sphere by uniform MC; should be ~1
        n = 1 << 18
        u = jax.random.uniform(jax.random.PRNGKey(7), (n, 2))
        l = sampling.sample_uniform_sphere(u)
        v = jnp.broadcast_to(
            pmath.normalize(jnp.asarray([[0.3, 0.1, 0.9]])), (n, 3)
        )
        rough = jnp.full((n,), 0.6)
        h = pmath.normalize(l + v)
        noh = h[:, 2]
        pdf = sampling.ggx_vndf_pdf(v, noh, rough)
        # only reflections above the horizon are reachable
        pdf = jnp.where(l[:, 2] > -v[:, 2], pdf, 0.0)  # |L+V| != 0 guard
        integral = float(jnp.mean(pdf) * 4.0 * jnp.pi)
        assert abs(integral - 1.0) < 0.05

    def test_triangle_sampling_uniform(self):
        u = jax.random.uniform(jax.random.PRNGKey(8), (1 << 14, 2))
        b = pmath.sample_triangle(u)
        bn = np.asarray(b)
        assert (bn >= 0).all() and (bn.sum(-1) <= 1.0 + 1e-6).all()
        # centroid of uniform samples ~ (1/3, 1/3)
        np.testing.assert_allclose(bn.mean(axis=0), [1 / 3, 1 / 3], atol=0.01)
