"""Per-ray-culled traversal (ops/traverse_culled.py) vs the dense
reference: exactness, opacity shadows, refit, and tracer dispatch."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_pbrt.ops import tracer as tracer_mod
from tpu_pbrt.ops import traverse_culled as tc
from tpu_pbrt.ops import traverse_dense as td
from tpu_pbrt.ops.vec import Vec3


def soup(t=700, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-2, 2, (t, 3)).astype(np.float32)
    v0 = c + rng.normal(0, 0.15, (t, 3)).astype(np.float32)
    v1 = c + rng.normal(0, 0.15, (t, 3)).astype(np.float32)
    v2 = c + rng.normal(0, 0.15, (t, 3)).astype(np.float32)
    op = (rng.uniform(size=t) > 0.3).astype(np.float32)
    return v0, v1, v2, op


def rays(r=2500, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-3, 3, (r, 3)).astype(np.float32)
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ov = Vec3(jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2]))
    dv = Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2]))
    tmin = jnp.zeros((r,))
    tmax = jnp.full((r,), jnp.inf).at[::7].set(-jnp.inf)  # inactive lanes
    return ov, dv, tmin, tmax


class TestCulledVsDense:
    def test_closest_hit_exact(self):
        v0, v1, v2, op = soup()
        ct = tc.prepare(v0, v1, v2, op)
        dt = td.prepare(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                        opacity=jnp.asarray(op))
        ov, dv, tmin, tmax = rays()
        hc = jax.jit(tc.closest_hit)(ct, ov, dv, tmin, tmax)
        hd = jax.jit(td.closest_hit)(dt, ov, dv, tmin, tmax)
        fc, fd = np.isfinite(np.asarray(hc.t)), np.isfinite(np.asarray(hd.t))
        assert (fc == fd).all()
        m = fc & fd
        # t carries the mantissa-packed index truncation (2^-12 relative)
        np.testing.assert_allclose(np.asarray(hc.t)[m], np.asarray(hd.t)[m],
                                   rtol=5e-4)
        assert (np.asarray(hc.tri)[m] == np.asarray(hd.tri)[m]).all()

    def test_any_hit_exact(self):
        v0, v1, v2, op = soup(seed=5)
        ct = tc.prepare(v0, v1, v2, op)
        dt = td.prepare(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                        opacity=jnp.asarray(op))
        ov, dv, tmin, tmax = rays(seed=6)
        ac = jax.jit(tc.any_hit)(ct, ov, dv, tmin, tmax)
        ad = jax.jit(td.any_hit)(dt, ov, dv, tmin, tmax)
        assert (np.asarray(ac) == np.asarray(ad)).all()

    def test_bounded_interval(self):
        """Finite t_max must cut off farther hits identically."""
        v0, v1, v2, op = soup(seed=9)
        ct = tc.prepare(v0, v1, v2, op)
        dt = td.prepare(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                        opacity=jnp.asarray(op))
        ov, dv, tmin, _ = rays(seed=10)
        tmax = jnp.full((ov.x.shape[0],), 1.5)
        hc = jax.jit(tc.closest_hit)(ct, ov, dv, tmin, tmax)
        hd = jax.jit(td.closest_hit)(dt, ov, dv, tmin, tmax)
        assert (np.isfinite(np.asarray(hc.t))
                == np.isfinite(np.asarray(hd.t))).all()

    def test_preselect_exact(self, monkeypatch):
        """The entry-ranked SUPERBLOCK pre-level must stay exact: rays
        touching an unchosen super/candidate are re-swept by the cascade
        (conservative t_cull test), so results match dense bit-for-bit
        at the mantissa-truncation tolerance."""
        monkeypatch.setattr(tc, "PRESELECT", True)
        v0, v1, v2, op = soup(t=1400, seed=31)
        ct = tc.prepare(v0, v1, v2, op)
        dt = td.prepare(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                        opacity=jnp.asarray(op))
        ov, dv, tmin, tmax = rays(r=4000, seed=32)
        hc = tc.closest_hit(ct, ov, dv, tmin, tmax)   # unjitted: the jit
        ac = tc.any_hit(ct, ov, dv, tmin, tmax)       # cache ignores the flag
        hd = jax.jit(td.closest_hit)(dt, ov, dv, tmin, tmax)
        ad = jax.jit(td.any_hit)(dt, ov, dv, tmin, tmax)
        fc, fd = np.isfinite(np.asarray(hc.t)), np.isfinite(np.asarray(hd.t))
        assert (fc == fd).all()
        m = fc & fd
        np.testing.assert_allclose(np.asarray(hc.t)[m], np.asarray(hd.t)[m],
                                   rtol=5e-4)
        assert (np.asarray(hc.tri)[m] == np.asarray(hd.tri)[m]).all()
        assert (np.asarray(ac) == np.asarray(ad)).all()

    def test_windowed_vs_legacy_dispatch(self, monkeypatch):
        """The windowed gather path (QUERY_GATHER + CASCADE_GATHER, the
        default) and the legacy full-sort path must agree exactly — the
        soup/ray setup makes nearly every ray touched, so the windowed
        loop runs MULTIPLE hp-windows (rp = 8*hp), covering the
        window-boundary chunk regrouping."""
        v0, v1, v2, op = soup(seed=41)
        ct = tc.prepare(v0, v1, v2, op)
        ov, dv, tmin, tmax = rays(seed=42)
        hw = tc.closest_hit(ct, ov, dv, tmin, tmax)   # unjitted: the jit
        aw = tc.any_hit(ct, ov, dv, tmin, tmax)       # cache ignores flags
        monkeypatch.setattr(tc, "QUERY_GATHER", False)
        monkeypatch.setattr(tc, "CASCADE_GATHER", False)
        hl = tc.closest_hit(ct, ov, dv, tmin, tmax)
        al = tc.any_hit(ct, ov, dv, tmin, tmax)
        fw, fl = np.isfinite(np.asarray(hw.t)), np.isfinite(np.asarray(hl.t))
        assert (fw == fl).all()
        m = fw & fl
        np.testing.assert_allclose(np.asarray(hw.t)[m], np.asarray(hl.t)[m],
                                   rtol=5e-4)
        assert (np.asarray(hw.tri)[m] == np.asarray(hl.tri)[m]).all()
        assert (np.asarray(aw) == np.asarray(al)).all()

    def test_off_origin_precision(self):
        """Scene translated ~1e3 units from the origin: the slab/MT
        cancellation must not flip hits vs dense (ADVICE r4: bounds the
        off-origin gap before any plane-form constants are trusted)."""
        v0, v1, v2, op = soup(seed=33)
        shift = np.float32([1000.0, -750.0, 1250.0])
        v0, v1, v2 = v0 + shift, v1 + shift, v2 + shift
        ct = tc.prepare(v0, v1, v2, op)
        dt = td.prepare(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                        opacity=jnp.asarray(op))
        ov, dv, tmin, tmax = rays(seed=34)
        ov = Vec3(ov.x + shift[0], ov.y + shift[1], ov.z + shift[2])
        hc = jax.jit(tc.closest_hit)(ct, ov, dv, tmin, tmax)
        hd = jax.jit(td.closest_hit)(dt, ov, dv, tmin, tmax)
        fc, fd = np.isfinite(np.asarray(hc.t)), np.isfinite(np.asarray(hd.t))
        assert (fc == fd).mean() > 0.999   # fp-boundary flips only
        m = fc & fd
        np.testing.assert_allclose(np.asarray(hc.t)[m], np.asarray(hd.t)[m],
                                   rtol=5e-3)

    def test_refit_tracks_deformation(self):
        v0, v1, v2, op = soup(seed=2)
        ct = tc.prepare(v0, v1, v2, op)
        shift = np.float32([0.5, -0.25, 1.0])
        ct2 = jax.jit(tc.refit)(ct, jnp.asarray(v0 + shift),
                                jnp.asarray(v1 + shift),
                                jnp.asarray(v2 + shift))
        dt2 = td.prepare(jnp.asarray(v0 + shift), jnp.asarray(v1 + shift),
                         jnp.asarray(v2 + shift), opacity=jnp.asarray(op))
        ov, dv, tmin, tmax = rays(seed=3)
        hc = jax.jit(tc.closest_hit)(ct2, ov, dv, tmin, tmax)
        hd = jax.jit(td.closest_hit)(dt2, ov, dv, tmin, tmax)
        m = np.isfinite(np.asarray(hc.t))
        assert (m == np.isfinite(np.asarray(hd.t))).all()
        assert (np.asarray(hc.tri)[m] == np.asarray(hd.tri)[m]).all()

    def test_tracer_dispatch_picks_culled(self):
        from tpu_pbrt.models.material import make_table
        from tpu_pbrt.models.mesh import build_geometry
        from tpu_pbrt.models.scene import make_environment, make_scene

        rng = np.random.default_rng(11)
        t = tracer_mod.CULLED_MIN_TRIS + 64
        pos = rng.uniform(-1, 1, (t * 3, 3)).astype(np.float32)
        ind = np.arange(t * 3, dtype=np.int32).reshape(t, 3)
        geom = build_geometry([{
            "positions": pos, "normals": pos, "indices": ind, "material": 0,
        }])
        scene = make_scene(geom, make_table([{}]), make_environment())
        trc = tracer_mod.build_for_scene(scene)
        assert trc.kind == "culled"

    def test_cornell_render_via_culled(self):
        """Force the culled backend on the Cornell box: the render must
        match the dense backend pixel-for-pixel (same estimator)."""
        from tpu_pbrt.models.cornell import make_cornell_box, make_cornell_camera
        from tpu_pbrt.passes.pathtrace import PathTraceSettings
        from tpu_pbrt.render.renderer import _render_frame

        scene = make_cornell_box()
        cam = make_cornell_camera(24, 24).data()
        settings = PathTraceSettings(bounces=2)
        imgs = {}
        for kind in ("dense", "culled"):
            trc = tracer_mod.build_for_scene(scene, kind=kind)
            img, _ = jax.jit(
                lambda trc, sc, c: _render_frame(
                    trc, sc, c, np.uint32(0), width=24, height=24,
                    settings=settings))(trc, scene, cam)
            imgs[kind] = np.asarray(img)
        # same estimator; only the traversal t carries the 2^-12 index
        # truncation, which perturbs spawn points slightly
        assert np.isfinite(imgs["culled"]).all()
        np.testing.assert_allclose(imgs["culled"].mean(),
                                   imgs["dense"].mean(), rtol=0.02)


class TestMxuSweep:
    """The MXU plane-form sweep (`_mt_mxu_T`) vs Möller–Trumbore."""

    def _comps(self, v0, v1, v2):
        f = lambda a: jnp.asarray(a, jnp.float32)
        e1, e2 = v1 - v0, v2 - v0
        return tuple(f(x) for x in (
            v0[:, 0], v0[:, 1], v0[:, 2], e1[:, 0], e1[:, 1], e1[:, 2],
            e2[:, 0], e2[:, 1], e2[:, 2]))

    def test_kernel_agreement(self):
        v0, v1, v2, _ = soup(t=640, seed=21)
        ov, dv, tmin, tmax = rays(r=512, seed=22)
        comps = self._comps(v0, v1, v2)
        t_mt = np.asarray(tc._mt_comp_T(ov, dv, *comps, tmin, tmax))
        t_mx = np.asarray(tc._mt_mxu_T(ov, dv, *comps, tmin, tmax))
        hit_mt, hit_mx = np.isfinite(t_mt), np.isfinite(t_mx)
        # fp-boundary flips near triangle edges are allowed, but rare
        assert (hit_mt != hit_mx).mean() < 1e-3
        m = hit_mt & hit_mx
        np.testing.assert_allclose(t_mx[m], t_mt[m], rtol=1e-4, atol=1e-5)

    def test_kernel_agreement_off_origin(self):
        """Advisor r4: the plane form stores pre-rounded n.v0 / p.v0
        constants and subtracts against n.o inside the matmul, whose
        cancellation behaves worse than MT's (o - v0)-first formulation
        far from the origin. Bound the flip rate with the soup (and the
        rays aimed at it) translated by 1e3 units."""
        off = np.float32([1e3, -1e3, 1e3])
        v0, v1, v2, _ = soup(t=640, seed=21)
        v0, v1, v2 = v0 + off, v1 + off, v2 + off
        ov, dv, tmin, tmax = rays(r=512, seed=22)
        from tpu_pbrt.ops.vec import Vec3
        ov = Vec3(ov.x + off[0], ov.y + off[1], ov.z + off[2])
        comps = self._comps(v0, v1, v2)
        t_mt = np.asarray(tc._mt_comp_T(ov, dv, *comps, tmin, tmax))
        t_mx = np.asarray(tc._mt_mxu_T(ov, dv, *comps, tmin, tmax))
        hit_mt, hit_mx = np.isfinite(t_mt), np.isfinite(t_mx)
        # off-origin cancellation costs precision: allow 10x the
        # at-origin flip budget, still rare
        assert (hit_mt != hit_mx).mean() < 1e-2
        m = hit_mt & hit_mx
        np.testing.assert_allclose(t_mx[m], t_mt[m], rtol=1e-3, atol=1e-3)

    def test_degenerate_rows_never_hit(self):
        """Zero-area (padding) triangles must miss under the plane form."""
        v0 = np.zeros((8, 3), np.float32)
        comps = self._comps(v0, v0, v0)
        ov, dv, tmin, tmax = rays(r=128, seed=23)
        t = np.asarray(tc._mt_mxu_T(ov, dv, *comps, tmin, tmax))
        assert not np.isfinite(t).any()

    def test_end_to_end_vs_dense(self, monkeypatch):
        monkeypatch.setattr(tc, "MT_MXU", True)
        v0, v1, v2, op = soup(t=704, seed=24)
        ct = tc.prepare(v0, v1, v2, op)
        dt = td.prepare(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                        opacity=jnp.asarray(op))
        ov, dv, tmin, tmax = rays(r=2560, seed=25)
        hc = tc.closest_hit(ct, ov, dv, tmin, tmax)   # unjitted: the jit
        ad = tc.any_hit(ct, ov, dv, tmin, tmax)       # cache ignores MT_MXU
        hd = td.closest_hit(dt, ov, dv, tmin, tmax)
        add = td.any_hit(dt, ov, dv, tmin, tmax)
        fc, fd = np.isfinite(np.asarray(hc.t)), np.isfinite(np.asarray(hd.t))
        assert (fc != fd).mean() < 1e-3
        m = fc & fd
        same = np.asarray(hc.tri)[m] == np.asarray(hd.tri)[m]
        assert same.mean() > 0.999   # near-tie id flips only
        np.testing.assert_allclose(np.asarray(hc.t)[m][same],
                                   np.asarray(hd.t)[m][same], rtol=5e-4)
        assert (np.asarray(ad) != np.asarray(add)).mean() < 1e-3


class TestDenseMxuSweep:
    """The dense tracer's MXU plane-form sweeps vs Möller–Trumbore."""

    def _chunk(self, t=192, seed=31):
        v0, v1, v2, _ = soup(t=t, seed=seed)
        f = jnp.asarray
        return f(v0), f(v1 - v0), f(v2 - v0)

    def test_closest_kernel_agreement(self):
        cv0, ce1, ce2 = self._chunk()
        ov, dv, tmin, tmax = rays(r=512, seed=32)
        t_mt, _, _ = td._mt_chunk_T(ov, dv, cv0, ce1, ce2, tmin, tmax)
        t_mx, _, _ = td._mt_mxu_chunk_T(ov, dv, cv0, ce1, ce2, tmin, tmax)
        t_mt, t_mx = np.asarray(t_mt), np.asarray(t_mx)
        hit_mt, hit_mx = np.isfinite(t_mt), np.isfinite(t_mx)
        # fp-boundary flips near triangle edges are allowed, but rare
        assert (hit_mt != hit_mx).mean() < 1e-3
        m = hit_mt & hit_mx
        np.testing.assert_allclose(t_mx[m], t_mt[m], rtol=1e-4, atol=1e-5)

    def test_any_kernel_agreement(self):
        cv0, ce1, ce2 = self._chunk(seed=33)
        ov, dv, tmin, tmax = rays(r=512, seed=34)
        a_mt = np.asarray(
            td._mt_any_chunk_T(ov, dv, cv0, ce1, ce2, tmin, tmax))
        a_mx = np.asarray(
            td._mt_mxu_any_chunk_T(ov, dv, cv0, ce1, ce2, tmin, tmax))
        assert (a_mt != a_mx).mean() < 1e-3

    def test_degenerate_rows_never_hit(self):
        z = jnp.zeros((8, 3), jnp.float32)
        v0 = jnp.asarray(np.random.default_rng(35).normal(size=(8, 3)),
                         jnp.float32)
        ov, dv, tmin, tmax = rays(r=128, seed=36)
        t, _, _ = td._mt_mxu_chunk_T(ov, dv, v0, z, z, tmin, tmax)
        assert not np.isfinite(np.asarray(t)).any()
        a = td._mt_mxu_any_chunk_T(ov, dv, v0, z, z, tmin, tmax)
        assert not np.asarray(a).any()

    def test_end_to_end_vs_control(self, monkeypatch):
        v0, v1, v2, op = soup(t=704, seed=37)
        dt = td.prepare(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                        opacity=jnp.asarray(op))
        ov, dv, tmin, tmax = rays(r=2560, seed=38)
        monkeypatch.setattr(td, "MT_MXU", True)
        hx = td.closest_hit(dt, ov, dv, tmin, tmax)   # unjitted: the jit
        ax = td.any_hit(dt, ov, dv, tmin, tmax)       # cache ignores MT_MXU
        monkeypatch.setattr(td, "MT_MXU", False)
        hc = td.closest_hit(dt, ov, dv, tmin, tmax)
        ac = td.any_hit(dt, ov, dv, tmin, tmax)
        fx, fc = np.isfinite(np.asarray(hx.t)), np.isfinite(np.asarray(hc.t))
        assert (fx != fc).mean() < 1e-3
        m = fx & fc
        same = np.asarray(hx.tri)[m] == np.asarray(hc.tri)[m]
        assert same.mean() > 0.999   # near-tie id flips only
        np.testing.assert_allclose(np.asarray(hx.t)[m][same],
                                   np.asarray(hc.t)[m][same], rtol=5e-4)
        assert (np.asarray(ax) != np.asarray(ac)).mean() < 1e-3
