"""BSDF correctness: white-furnace energy tests, PDF consistency, lobe
selection (SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pbrt.ops import bxdf, vec
from tpu_pbrt.ops.vec import Vec3


def make_state(n, base_color, metallic, roughness, ior=1.5, transmission=0.0,
               front=True):
    ones = jnp.ones((n,))
    b = bxdf.make_bsdf(
        Vec3(ones * base_color[0], ones * base_color[1], ones * base_color[2]),
        ones * metallic, ones * roughness, ones * ior, ones * transmission,
        jnp.full((n,), front),
    )
    normal = Vec3(jnp.zeros((n,)), jnp.zeros((n,)), ones)
    sv = bxdf.make_surface_vectors(jnp.full((n,), True), normal, normal)
    return b, sv


def estimator(b, sv, v, key, n):
    """One-sample-MIS estimate E[f/pdf] — the integrator's throughput."""
    u4 = tuple(jax.random.uniform(key, (4, n)))
    l, lobe, valid = bxdf.sample(b, sv, v, u4)
    w = bxdf.lobe_weights(b, sv, v)
    pdf = bxdf.pdf_sampled_lobe(b, sv, l, v, w, lobe)
    f = bxdf.evaluate_sampled_lobe(b, sv, l, v, w, lobe)
    ok = valid & (pdf > 0)
    tp = vec.where(ok, f * (1.0 / jnp.maximum(pdf, 1e-20)), Vec3.splat(0.0))
    return tp.to_array()


def _tile_unit(n, xyz):
    a = np.asarray(xyz, np.float32)
    a = a / np.linalg.norm(a)
    ones = jnp.ones((n,))
    return Vec3(ones * a[0], ones * a[1], ones * a[2])


def _rand_unit_vec3(key, n, up=False):
    v = jax.random.normal(key, (n, 3))
    if up:
        v = v.at[:, 2].set(jnp.abs(v[:, 2]) + 0.05)
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    return Vec3.from_array(v)


class TestFurnace:
    def test_diffuse_white_furnace(self):
        n = 1 << 16
        b, sv = make_state(n, (1.0, 1.0, 1.0), 0.0, 1.0)
        v = _tile_unit(n, (0.2, 0.1, 0.95))
        tp = estimator(b, sv, v, jax.random.PRNGKey(0), n)
        e = np.asarray(tp.mean(axis=0))
        # Burley diffuse is within a few % of unit albedo at normal-ish view
        assert 0.85 < e.mean() < 1.1, e

    def test_specular_energy_bounded(self):
        n = 1 << 16
        b, sv = make_state(n, (1.0, 1.0, 1.0), 1.0, 0.4)
        v = _tile_unit(n, (0.1, 0.0, 0.99))
        tp = estimator(b, sv, v, jax.random.PRNGKey(1), n)
        e = np.asarray(tp.mean(axis=0))
        # single-scatter GGX loses energy but must never create it
        assert (e < 1.02).all(), e
        assert (e > 0.5).all(), e

    def test_smooth_transmission_energy(self):
        n = 1 << 15
        b, sv = make_state(n, (1.0, 1.0, 1.0), 0.0, 0.05, ior=1.5,
                           transmission=1.0)
        v = _tile_unit(n, (0.0, 0.0, 1.0))
        tp = estimator(b, sv, v, jax.random.PRNGKey(2), n)
        e = np.asarray(tp.mean(axis=0))
        assert (e < 1.1).all(), e
        assert (e > 0.6).all(), e


class TestLobeSelection:
    def test_find_lobe_matches_weights(self):
        n = 1 << 16
        ones = jnp.ones((n,))
        w = bxdf.LobeWeights(ones * 0.5, ones * 0.3, ones * 0.2)
        u = jax.random.uniform(jax.random.PRNGKey(3), (n,))
        lobe = bxdf.find_lobe(w, u)
        counts = np.bincount(np.asarray(lobe), minlength=3) / (1 << 16)
        np.testing.assert_allclose(counts, [0.5, 0.3, 0.2], atol=0.01)

    def test_lobe_weights_sum_to_one(self):
        n = 512
        key = jax.random.PRNGKey(4)
        b, sv = make_state(n, (0.6, 0.5, 0.4), 0.3, 0.5, transmission=0.4)
        v = _rand_unit_vec3(key, n, up=True)
        w = bxdf.lobe_weights(b, sv, v)
        total = np.asarray(w.diffuse + w.specular + w.transmission)
        np.testing.assert_allclose(total, 1.0, atol=1e-5)

    def test_metal_has_no_transmission_weight(self):
        b, sv = make_state(8, (1.0, 0.8, 0.3), 1.0, 0.2, transmission=1.0)
        v = _tile_unit(8, (0.0, 0.0, 1.0))
        w = bxdf.lobe_weights(b, sv, v)
        np.testing.assert_allclose(np.asarray(w.transmission), 0.0, atol=1e-6)


class TestPdfConsistency:
    def test_combined_pdf_equals_weighted_sum(self):
        n = 4096
        b, sv = make_state(n, (0.7, 0.7, 0.7), 0.2, 0.6, transmission=0.0)
        key = jax.random.PRNGKey(5)
        v = _rand_unit_vec3(key, n, up=True)
        u4 = tuple(jax.random.uniform(jax.random.PRNGKey(6), (4, n)))
        l, lobe, valid = bxdf.sample(b, sv, v, u4)
        w = bxdf.lobe_weights(b, sv, v)
        combined = bxdf.pdf_combined(b, sv, l, v, w)
        per_lobe = sum(
            bxdf.pdf_sampled_lobe(
                b, sv, l, v, w, jnp.full((n,), k, jnp.int32)
            )
            for k in range(3)
        )
        # without transmission, combined == diffuse + specular weighted pdfs
        mask = np.asarray(valid)
        np.testing.assert_allclose(
            np.asarray(combined)[mask], np.asarray(per_lobe)[mask], rtol=1e-4
        )

    def test_f0_rule(self):
        """F0 = lerp(((ni-no)/(ni+no))^2, baseColor, metallic)
        (Shaders/BxDF.hlsli:65)."""
        b, _ = make_state(1, (0.5, 0.6, 0.7), 0.0, 0.5, ior=1.5)
        np.testing.assert_allclose(
            np.asarray(b.f0.to_array()[0]), ((1 - 1.5) / (1 + 1.5)) ** 2,
            rtol=1e-5,
        )
        b, _ = make_state(1, (0.5, 0.6, 0.7), 1.0, 0.5, ior=1.5)
        np.testing.assert_allclose(
            np.asarray(b.f0.to_array()[0]), [0.5, 0.6, 0.7], rtol=1e-6
        )

    def test_min_roughness_clamp(self):
        b, _ = make_state(1, (1.0, 1.0, 1.0), 0.0, 0.0)
        assert float(b.roughness[0]) == pytest.approx(bxdf.MIN_ROUGHNESS)
