"""BVH build + traversal correctness: brute-force O(N*R) ground truth
(SURVEY.md §4.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pbrt.ops import bvh as bvh_mod
from tpu_pbrt.ops import traverse
from tpu_pbrt.ops.vec import Vec3


def random_tris(key, n, spread=10.0, size=0.5):
    k1, k2, k3 = jax.random.split(key, 3)
    base = jax.random.uniform(k1, (n, 3), minval=-spread, maxval=spread)
    v0 = base
    v1 = base + jax.random.normal(k2, (n, 3)) * size
    v2 = base + jax.random.normal(k3, (n, 3)) * size
    return v0, v1, v2


def random_rays(key, r, spread=12.0):
    k1, k2 = jax.random.split(key)
    o = jax.random.uniform(k1, (r, 3), minval=-spread, maxval=spread)
    d = jax.random.normal(k2, (r, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


@pytest.mark.parametrize("n_tris", [1, 2, 7, 64, 500])
def test_closest_hit_matches_brute_force(n_tris):
    v0, v1, v2 = random_tris(jax.random.PRNGKey(n_tris), n_tris)
    o, d = random_rays(jax.random.PRNGKey(1000 + n_tris), 256)

    bvh = jax.jit(bvh_mod.build)(v0, v1, v2)
    got = traverse.closest_hit(bvh, Vec3.from_array(o), Vec3.from_array(d), 0.0, jnp.inf)
    want = traverse.brute_force_closest_hit(v0, v1, v2, o, d, 0.0, jnp.inf)

    hit_g = np.asarray(got.tri >= 0)
    hit_w = np.asarray(want.tri >= 0)
    np.testing.assert_array_equal(hit_g, hit_w)
    # same t (the same triangle may be reached in either order; t decides)
    np.testing.assert_allclose(
        np.asarray(got.t)[hit_g], np.asarray(want.t)[hit_w], rtol=1e-4
    )


def test_duplicate_morton_codes():
    """Coincident centroids (equal codes) must still build a valid tree."""
    v0 = jnp.zeros((16, 3))
    v1 = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (16, 1))
    v2 = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (16, 1))
    bvh = bvh_mod.build(v0, v1, v2)
    o = jnp.asarray([[0.25, 0.25, -1.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    hit = traverse.closest_hit(bvh, Vec3.from_array(o), Vec3.from_array(d), 0.0, jnp.inf)
    assert bool(hit.mask[0])
    np.testing.assert_allclose(float(hit.t[0]), 1.0, rtol=1e-5)


def test_any_hit_matches_brute_force():
    v0, v1, v2 = random_tris(jax.random.PRNGKey(3), 128)
    o, d = random_rays(jax.random.PRNGKey(4), 512)
    bvh = jax.jit(bvh_mod.build)(v0, v1, v2)
    got = traverse.any_hit(bvh, Vec3.from_array(o), Vec3.from_array(d), 0.0, 5.0)
    want = traverse.brute_force_closest_hit(v0, v1, v2, o, d, 0.0, 5.0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want.tri >= 0))


def test_refit_tracks_deformation():
    v0, v1, v2 = random_tris(jax.random.PRNGKey(5), 200)
    bvh = jax.jit(bvh_mod.build)(v0, v1, v2)

    # deform: stretch + translate
    s = jnp.asarray([1.5, 0.7, 1.2])
    t = jnp.asarray([0.3, -2.0, 1.0])
    w0, w1, w2 = v0 * s + t, v1 * s + t, v2 * s + t
    refitted = jax.jit(bvh_mod.refit)(bvh, w0, w1, w2)

    o, d = random_rays(jax.random.PRNGKey(6), 256)
    got = traverse.closest_hit(refitted, Vec3.from_array(o), Vec3.from_array(d), 0.0, jnp.inf)
    want = traverse.brute_force_closest_hit(w0, w1, w2, o, d, 0.0, jnp.inf)
    np.testing.assert_array_equal(np.asarray(got.tri >= 0), np.asarray(want.tri >= 0))
    mask = np.asarray(got.tri >= 0)
    np.testing.assert_allclose(
        np.asarray(got.t)[mask], np.asarray(want.t)[mask], rtol=1e-4
    )


def test_bvh_aabbs_contain_triangles():
    v0, v1, v2 = random_tris(jax.random.PRNGKey(7), 300)
    bvh = bvh_mod.build(v0, v1, v2)
    root_min = np.asarray(bvh.node_min[0])
    root_max = np.asarray(bvh.node_max[0])
    allv = np.concatenate([np.asarray(v0), np.asarray(v1), np.asarray(v2)])
    assert (allv.min(0) >= root_min - 1e-5).all()
    assert (allv.max(0) <= root_max + 1e-5).all()
