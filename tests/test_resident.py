"""Resident-chunk Pallas tracer (experimental backend): exact agreement
with the dense reference sweep on random soups, including inactive lanes,
opacity-aware occlusion, and refit."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_pbrt.ops import traverse_dense as td
from tpu_pbrt.ops import traverse_resident as tr
from tpu_pbrt.ops.vec import Vec3


@pytest.fixture(scope="module")
def soup():
    rng = np.random.default_rng(1)
    t = 700
    v0 = rng.uniform(-2, 2, (t, 3)).astype(np.float32)
    v1 = v0 + rng.uniform(-0.4, 0.4, (t, 3)).astype(np.float32)
    v2 = v0 + rng.uniform(-0.4, 0.4, (t, 3)).astype(np.float32)
    op = (rng.random(t) > 0.3).astype(np.float32)
    return v0, v1, v2, op


@pytest.fixture(scope="module")
def rays():
    rng = np.random.default_rng(2)
    r = 3000
    oo = rng.uniform(-3, 3, (r, 3)).astype(np.float32)
    dd = rng.normal(size=(r, 3)).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=1, keepdims=True)
    o = Vec3(*[jnp.asarray(oo[:, i]) for i in range(3)])
    d = Vec3(*[jnp.asarray(dd[:, i]) for i in range(3)])
    tmax = jnp.where(jnp.asarray(rng.random(r) > 0.1), jnp.inf, -jnp.inf)
    return o, d, jnp.zeros(r), tmax


def test_closest_matches_dense(soup, rays):
    v0, v1, v2, op = soup
    o, d, tmin, tmax = rays
    res = tr.prepare(v0, v1, v2, op)
    dense = td.prepare(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                       opacity=jnp.asarray(op))
    h1 = td.closest_hit(dense, o, d, tmin, tmax)
    h2 = tr.closest_hit(res, o, d, tmin, tmax)
    assert (np.asarray(h1.tri) == np.asarray(h2.tri)).all()
    both = np.isfinite(np.asarray(h1.t)) & np.isfinite(np.asarray(h2.t))
    np.testing.assert_allclose(np.asarray(h1.t)[both],
                               np.asarray(h2.t)[both], rtol=1e-4)


def test_anyhit_matches_dense(soup, rays):
    v0, v1, v2, op = soup
    o, d, tmin, tmax = rays
    res = tr.prepare(v0, v1, v2, op)
    dense = td.prepare(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                       opacity=jnp.asarray(op))
    far = jnp.where(tmax > 0, 4.0, -jnp.inf)
    occ1 = np.asarray(td.any_hit(dense, o, d, tmin, far))
    occ2 = np.asarray(tr.any_hit(res, o, d, tmin, far))
    assert (occ1 == occ2).all()


def test_refit_tracks_deformation(soup, rays):
    v0, v1, v2, op = soup
    o, d, tmin, tmax = rays
    res = tr.prepare(v0, v1, v2, op)
    shift = np.asarray([0.3, -0.2, 0.1], np.float32)
    res2 = tr.refit(res, jnp.asarray(v0 + shift), jnp.asarray(v1 + shift),
                    jnp.asarray(v2 + shift))
    dense2 = td.prepare(jnp.asarray(v0 + shift), jnp.asarray(v1 + shift),
                        jnp.asarray(v2 + shift), opacity=jnp.asarray(op))
    h1 = td.closest_hit(dense2, o, d, tmin, tmax)
    h2 = tr.closest_hit(res2, o, d, tmin, tmax)
    assert (np.asarray(h1.tri) == np.asarray(h2.tri)).mean() > 0.999
