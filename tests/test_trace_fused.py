"""Fused traverse+fetch megakernel (ops/trace_shade_fused.py) equivalence
vs the unfused XLA dense path, in Pallas interpret mode on CPU."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_pbrt.ops import shade_table, trace_shade_fused, traverse_dense
from tpu_pbrt.ops.vec import Vec3


def _random_soup(n, seed=0):
    r = np.random.RandomState(seed)
    v0 = r.uniform(-2, 2, (n, 3)).astype(np.float32)
    v1 = v0 + r.uniform(-1, 1, (n, 3)).astype(np.float32)
    v2 = v0 + r.uniform(-1, 1, (n, 3)).astype(np.float32)
    return v0, v1, v2


def _random_rays(m, seed=1):
    r = np.random.RandomState(seed)
    o = r.uniform(-3, 3, (m, 3)).astype(np.float32)
    d = r.uniform(-1, 1, (m, 3)).astype(np.float32)
    d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-6)
    return (Vec3(*[jnp.asarray(o[:, i]) for i in range(3)]),
            Vec3(*[jnp.asarray(d[:, i]) for i in range(3)]))


def _cornell_tracer():
    from tpu_pbrt.models.cornell import make_cornell_box
    from tpu_pbrt.ops import tracer as tracer_mod

    scene = make_cornell_box()
    return tracer_mod.build_for_scene(scene, kind="dense"), scene


def test_closest_hit_shade_matches_unfused():
    tracer, _ = _cornell_tracer()
    o, d = _random_rays(513)
    t_min = jnp.zeros((513,))
    t_max = jnp.full((513,), jnp.inf)

    ref_hit = traverse_dense.closest_hit(tracer.accel, o, d, t_min, t_max)
    ref_attrs = shade_table.fetch_bounce(
        tracer.shade_table, jnp.maximum(ref_hit.tri, 0), o, d)

    sub = tracer.shade_table[
        :, jnp.asarray(shade_table._BOUNCE_COLS, jnp.int32)]
    hit, attrs = trace_shade_fused.closest_hit_shade(
        tracer.accel, sub, o, d, t_min, t_max, interpret=True)

    np.testing.assert_array_equal(np.asarray(hit.tri), np.asarray(ref_hit.tri))
    np.testing.assert_allclose(np.asarray(hit.t), np.asarray(ref_hit.t),
                               rtol=1e-6)
    m = np.asarray(ref_hit.tri) >= 0
    assert m.any() and (~m).any()
    for name in ("position", "flat_normal", "shading_normal", "base_color",
                 "emission"):
        a, b = getattr(attrs, name), getattr(ref_attrs, name)
        for ca, cb in zip((a.x, a.y, a.z), (b.x, b.y, b.z)):
            np.testing.assert_allclose(np.asarray(ca)[m], np.asarray(cb)[m],
                                       rtol=1e-5, atol=1e-5)
    for name in ("metallic", "roughness", "ior", "transmission",
                 "light_pdf_area", "light_cos"):
        np.testing.assert_allclose(
            np.asarray(getattr(attrs, name))[m],
            np.asarray(getattr(ref_attrs, name))[m], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(attrs.is_front_face)[m],
        np.asarray(ref_attrs.is_front_face)[m])
    np.testing.assert_array_equal(np.asarray(attrs.tri)[m],
                                  np.asarray(ref_attrs.tri)[m])


def test_closest_hit_shade_empty_interval_and_miss():
    tracer, _ = _cornell_tracer()
    o, d = _random_rays(128, seed=3)
    # half the lanes carry an empty interval (inactive-lane idiom)
    t_max = jnp.where(jnp.arange(128) % 2 == 0, jnp.inf, -jnp.inf)
    sub = tracer.shade_table[
        :, jnp.asarray(shade_table._BOUNCE_COLS, jnp.int32)]
    hit, _ = trace_shade_fused.closest_hit_shade(
        tracer.accel, sub, o, d, jnp.zeros((128,)), t_max, interpret=True)
    ref = traverse_dense.closest_hit(tracer.accel, o, d,
                                     jnp.zeros((128,)), t_max)
    np.testing.assert_array_equal(np.asarray(hit.tri), np.asarray(ref.tri))
    assert not np.asarray(hit.mask)[1::2].any()
    assert np.isinf(np.asarray(hit.t)[1::2]).all()


def test_any_hit_matches_dense():
    v0, v1, v2 = _random_soup(50, seed=7)
    opacity = (np.arange(50) % 3 != 0).astype(np.float32)  # mix transparent
    tris = traverse_dense.prepare(jnp.asarray(v0), jnp.asarray(v1),
                                  jnp.asarray(v2),
                                  opacity=jnp.asarray(opacity))
    o, d = _random_rays(257, seed=8)
    t_min = jnp.zeros((257,))
    t_max = jnp.where(jnp.arange(257) % 5 == 0, -jnp.inf, 4.0)
    ref = traverse_dense.any_hit(tris, o, d, t_min, t_max)
    got = trace_shade_fused.any_hit(tris, o, d, t_min, t_max,
                                    interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    assert np.asarray(ref).any()


def test_supported_gating():
    tracer, _ = _cornell_tracer()
    old = trace_shade_fused.TRACE_FUSED
    try:
        trace_shade_fused.TRACE_FUSED = True   # measured default is off
        assert trace_shade_fused.supported(
            tracer.accel, tracer.shade_table, None)
        assert not trace_shade_fused.supported(
            tracer.accel, tracer.shade_table, object())  # textured
        # oversized soup is rejected
        v0, v1, v2 = _random_soup(trace_shade_fused.MAX_TRIS_PAD + 8)
        big = traverse_dense.prepare(jnp.asarray(v0), jnp.asarray(v1),
                                     jnp.asarray(v2))
        big_table = jnp.zeros((shade_table.ONEHOT_MAX_ROWS + 128, 64))
        assert not trace_shade_fused.supported(big, big_table, None)
        trace_shade_fused.TRACE_FUSED = False
        assert not trace_shade_fused.supported(
            tracer.accel, tracer.shade_table, None)
    finally:
        trace_shade_fused.TRACE_FUSED = old


@pytest.mark.parametrize("n_tris", [9, 130])
def test_closest_hit_shade_odd_sizes(n_tris):
    """Non-multiple-of-8 soups and non-multiple-of-tile lane counts."""
    v0, v1, v2 = _random_soup(n_tris, seed=11)
    tris = traverse_dense.prepare(jnp.asarray(v0), jnp.asarray(v1),
                                  jnp.asarray(v2))
    # synthetic shade table: rows = padded soup order
    tp = tris.v0.shape[0]
    table = np.zeros((tp, shade_table.COLS), np.float32)
    table[:n_tris, shade_table._P0:shade_table._P0 + 3] = v0
    table[:n_tris, shade_table._E1:shade_table._E1 + 3] = v1 - v0
    table[:n_tris, shade_table._E2:shade_table._E2 + 3] = v2 - v0
    nrm = np.cross(v1 - v0, v2 - v0)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-9)
    for k in range(3):
        table[:n_tris, shade_table._N0 + 3 * k:
              shade_table._N0 + 3 * k + 3] = nrm
    table[:, shade_table._TRI] = np.concatenate(
        [np.arange(n_tris), -np.ones(tp - n_tris)])
    table = jnp.asarray(table)
    sub = table[:, jnp.asarray(shade_table._BOUNCE_COLS, jnp.int32)]

    o, d = _random_rays(100, seed=12)
    t_min = jnp.zeros((100,))
    t_max = jnp.full((100,), jnp.inf)
    ref_hit = traverse_dense.closest_hit(tris, o, d, t_min, t_max)
    hit, attrs = trace_shade_fused.closest_hit_shade(
        tris, sub, o, d, t_min, t_max, interpret=True)
    np.testing.assert_array_equal(np.asarray(hit.tri), np.asarray(ref_hit.tri))
    np.testing.assert_allclose(np.asarray(hit.t), np.asarray(ref_hit.t),
                               rtol=1e-6)
