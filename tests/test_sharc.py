"""SHARC hash-grid radiance cache: key/resolve/query semantics
(64-bit keys, direct-mapped table, sort-only resolve)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pbrt.ops.vec import Vec3
from tpu_pbrt.passes import sharc


SETTINGS = sharc.SHARCSettings(capacity_log2=12)
CAM = np.zeros(3, np.float32)


def v3(arr):
    a = jnp.asarray(arr, jnp.float32)
    return Vec3(a[:, 0], a[:, 1], a[:, 2])


def keys_of(values):
    """Synthetic 64-bit keys from small ints (lo = hi = value)."""
    v = jnp.asarray(values, jnp.uint32)
    return sharc.VoxelKey(lo=v, hi=v)


class TestKeys:
    def test_same_voxel_same_key(self):
        p = v3([[5.0, 0.0, 0.0], [5.001, 0.0, 0.0]])
        n = v3([[0, 1, 0], [0, 1, 0]])
        k = sharc.voxel_key(p, n, CAM, SETTINGS)
        assert int(k.lo[0]) == int(k.lo[1])
        assert int(k.hi[0]) == int(k.hi[1])

    def test_different_voxel_different_key(self):
        p = v3([[5.0, 0.0, 0.0], [6.0, 3.0, 1.0]])
        n = v3([[0, 1, 0], [0, 1, 0]])
        k = sharc.voxel_key(p, n, CAM, SETTINGS)
        assert (int(k.lo[0]), int(k.hi[0])) != (int(k.lo[1]), int(k.hi[1]))

    def test_normal_bucket_separates_faces(self):
        p = v3([[5.0, 0.0, 0.0], [5.0, 0.0, 0.0]])
        n = v3([[0, 1, 0], [0, -1, 0]])
        k = sharc.voxel_key(p, n, CAM, SETTINGS)
        assert (int(k.lo[0]), int(k.hi[0])) != (int(k.lo[1]), int(k.hi[1]))

    def test_level_grows_with_distance(self):
        p = v3([[1.0, 0, 0], [100.0, 0, 0]])
        lvl = sharc.grid_level(p, CAM, SETTINGS)
        assert float(lvl[1]) > float(lvl[0])

    def test_distinct_voxels_never_alias(self):
        """The VERDICT-flagged leak: with 32-bit keys, distinct voxels
        colliding in the hash were indistinguishable — query returned a
        false 'found' with another voxel's radiance. With 64-bit keys a
        single-word collision must NOT produce a hit: store one voxel,
        query thousands of OTHER voxels, assert zero false positives even
        for voxels that share the stored voxel's direct-map slot."""
        rng = np.random.default_rng(7)
        pts = rng.uniform(-40, 40, size=(20000, 3)).astype(np.float32)
        p = Vec3(jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]),
                 jnp.asarray(pts[:, 2]))
        n = Vec3(jnp.zeros(20000), jnp.ones(20000), jnp.zeros(20000))
        k = sharc.voxel_key(p, n, CAM, SETTINGS)
        lo = np.asarray(k.lo)
        hi = np.asarray(k.hi)
        pair = lo.astype(np.uint64) << np.uint64(32) | hi.astype(np.uint64)
        uniq, first_idx = np.unique(pair, return_index=True)
        # sanity: among 20k nearby voxels the 64-bit keys are collision-free
        # for DISTINCT voxel identities (duplicates here are true same-voxel)
        c = 1 << SETTINGS.capacity_log2
        slots = lo & (c - 1)
        # store ONE voxel, then query every different-key voxel
        state = sharc.init_state(SETTINGS)
        one = sharc.VoxelKey(lo=k.lo[:1], hi=k.hi[:1])
        state = sharc.resolve(state, one, v3([[5.0, 0.0, 0.0]]),
                              jnp.ones((1,), bool), SETTINGS)
        out, found = sharc.query(state, k)
        found = np.asarray(found)
        same64 = (lo == lo[0]) & (hi == hi[0])
        # every hit must be the genuinely identical 64-bit key; in
        # particular same-slot different-key voxels (expected ~N/C of them)
        # must miss rather than read the stored radiance
        assert (found == same64).all()
        same_slot_diff_key = (slots == slots[0]) & ~same64
        if same_slot_diff_key.any():
            assert not found[same_slot_diff_key].any()


class TestResolveQuery:
    def test_roundtrip(self):
        state = sharc.init_state(SETTINGS)
        keys = keys_of([111, 222, 111, 333])
        rad = v3([[1, 0, 0], [0, 2, 0], [3, 0, 0], [0, 0, 4]])
        valid = jnp.ones((4,), bool)
        state = sharc.resolve(state, keys, rad, valid, SETTINGS)

        q = keys_of([111, 222, 333, 999])
        out, found = sharc.query(state, q)
        f = np.asarray(found)
        assert f.tolist() == [True, True, True, False]
        got = np.asarray(out.to_array())
        np.testing.assert_allclose(got[0], [2.0, 0, 0], atol=1e-2)  # mean(1,3)
        np.testing.assert_allclose(got[1], [0, 2.0, 0], atol=1e-2)
        np.testing.assert_allclose(got[2], [0, 0, 4.0], atol=1e-2)

    def test_accumulation_across_frames(self):
        state = sharc.init_state(SETTINGS)
        k = keys_of([42])
        valid = jnp.ones((1,), bool)
        state = sharc.resolve(state, k, v3([[1, 1, 1]]), valid, SETTINGS)
        state = sharc.resolve(state, k, v3([[3, 3, 3]]), valid, SETTINGS)
        out, found = sharc.query(state, k)
        assert bool(found[0])
        np.testing.assert_allclose(np.asarray(out.to_array())[0], 2.0,
                                   atol=1e-2)

    def test_invalid_records_ignored(self):
        state = sharc.init_state(SETTINGS)
        k = keys_of([7, 8])
        valid = jnp.asarray([True, False])
        state = sharc.resolve(state, k, v3([[1, 0, 0], [5, 5, 5]]), valid,
                              SETTINGS)
        _, found = sharc.query(state, keys_of([7, 8]))
        assert bool(found[0]) and not bool(found[1])

    def test_stale_eviction(self):
        s = sharc.SHARCSettings(capacity_log2=12, max_stale_frames=2)
        state = sharc.init_state(s)
        k = keys_of([5])
        state = sharc.resolve(state, k, v3([[1, 1, 1]]), jnp.ones((1,), bool), s)
        # 3 frames with unrelated keys -> entry 5 goes stale and is evicted
        other = keys_of([9])
        for _ in range(3):
            state = sharc.resolve(state, other, v3([[0, 0, 1]]),
                                  jnp.ones((1,), bool), s)
        _, found = sharc.query(state, k)
        assert not bool(found[0])

    def test_slot_collision_eviction_prefers_busier(self):
        """Two distinct 64-bit keys sharing a direct-map slot: the entry
        with more samples this frame wins the slot; the loser misses (an
        unbiased cache miss, never a wrong radiance)."""
        c = 1 << SETTINGS.capacity_log2
        a, b = 17, 17 + c            # same slot, different keys
        state = sharc.init_state(SETTINGS)
        # key a arrives with 3 samples, key b with 1 -> a holds the slot
        ks = sharc.VoxelKey(
            lo=jnp.asarray([a, a, a, b], jnp.uint32),
            hi=jnp.asarray([1, 1, 1, 2], jnp.uint32))
        state = sharc.resolve(state, ks, v3([[1, 0, 0]] * 3 + [[0, 9, 0]]),
                              jnp.ones((4,), bool), SETTINGS)
        _, found_a = sharc.query(state, sharc.VoxelKey(
            lo=jnp.asarray([a], jnp.uint32), hi=jnp.asarray([1], jnp.uint32)))
        _, found_b = sharc.query(state, sharc.VoxelKey(
            lo=jnp.asarray([b], jnp.uint32), hi=jnp.asarray([2], jnp.uint32)))
        assert bool(found_a[0]) and not bool(found_b[0])
        # next frame b arrives busier than a's capped history allows? No:
        # a's accumulated count (3) beats b's single sample - a persists
        ks2 = sharc.VoxelKey(lo=jnp.asarray([b], jnp.uint32),
                             hi=jnp.asarray([2], jnp.uint32))
        state = sharc.resolve(state, ks2, v3([[0, 9, 0]]),
                              jnp.ones((1,), bool), SETTINGS)
        _, found_a = sharc.query(state, sharc.VoxelKey(
            lo=jnp.asarray([a], jnp.uint32), hi=jnp.asarray([1], jnp.uint32)))
        assert bool(found_a[0])

    def test_footprint_gate(self):
        # close sharp hit -> invalid; far rough path -> valid
        pos = v3([[2.0, 0, 0], [50.0, 0, 0]])
        hit_t = jnp.asarray([0.01, 40.0])
        rough = jnp.asarray([0.0, 1.0])
        ok = sharc.footprint_valid(hit_t, rough, pos, CAM, SETTINGS)
        assert not bool(ok[0])
        assert bool(ok[1])


class TestSharcRender:
    def test_query_render_matches_reference_mean(self):
        """Cornell with SHARC on: after a few warmup frames the cached
        render's mean must sit near the plain path-traced mean (the cache
        replaces tail bounces with accumulated radiance)."""
        import jax
        from tpu_pbrt.models.cornell import make_cornell_box, make_cornell_camera
        from tpu_pbrt.ops import tracer as tracer_mod
        from tpu_pbrt.passes.pathtrace import PathTraceSettings
        from tpu_pbrt.render.renderer import Renderer, render_frame_sharc

        w = h = 32
        scene = make_cornell_box()
        cam = make_cornell_camera(w, h)
        settings = PathTraceSettings(bounces=4)
        r = Renderer(scene, w, h, settings)
        s = sharc.SHARCSettings(capacity_log2=14, scene_scale=10.0,
                                downscale=2)
        state = sharc.init_state(s)

        fn = jax.jit(lambda trc, sc, c, f, st: render_frame_sharc(
            trc, sc, c, f, st, width=w, height=h, settings=settings,
            sharc_settings=s))
        imgs = []
        for f in range(10):
            img, rays, state = fn(r.tracer, scene, cam.data(),
                                  np.uint32(f), state)
            imgs.append(np.asarray(img))
        sharc_mean = np.stack(imgs[5:]).mean()
        assert np.isfinite(np.stack(imgs)).all()
        # some cache entries exist after warmup
        assert int((np.asarray(state.count) > 0).sum()) > 10

        ref = np.asarray(r.render_mean(cam, 12, frame_offset=100)).mean()
        assert abs(sharc_mean / ref - 1.0) < 0.35, (sharc_mean, ref)


class TestResolveEquivalence:
    """The round-4 update-pool-only resolve (P-sized sorts + one unique-slot
    scatter) must reproduce the round-3 sort-only resolve exactly."""

    def _assert_states_equal(self, a, b):
        np.testing.assert_array_equal(np.asarray(a.key_lo),
                                      np.asarray(b.key_lo))
        np.testing.assert_array_equal(np.asarray(a.key_hi),
                                      np.asarray(b.key_hi))
        np.testing.assert_allclose(np.asarray(a.radiance),
                                   np.asarray(b.radiance), atol=1e-5)
        np.testing.assert_allclose(np.asarray(a.count), np.asarray(b.count),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(a.stale), np.asarray(b.stale),
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(a.qdata),
                                      np.asarray(b.qdata))

    def test_random_streams_match_sorted_resolve(self):
        s = sharc.SHARCSettings(capacity_log2=6)   # tiny: force collisions
        rng = np.random.default_rng(7)
        st_new = sharc.init_state(s)
        st_old = sharc.init_state(s)
        for frame in range(8):
            n = 256
            # small key space so slots collide and keys repeat across frames
            raw = rng.integers(0, 160, n).astype(np.uint32)
            keys = sharc.VoxelKey(lo=jnp.asarray(raw),
                                  hi=jnp.asarray(raw * np.uint32(2654435761)))
            rad = v3(rng.random((n, 3)).astype(np.float32) * 3.0)
            valid = jnp.asarray(rng.random(n) < 0.8)
            st_new = sharc.resolve(st_new, keys, rad, valid, s)
            st_old = sharc.resolve_sorted(st_old, keys, rad, valid, s)
            self._assert_states_equal(st_new, st_old)

    def test_empty_update_pool(self):
        s = sharc.SHARCSettings(capacity_log2=6)
        st = sharc.init_state(s)
        k = keys_of([3, 4])
        st = sharc.resolve(st, k, v3([[1, 1, 1], [2, 2, 2]]),
                           jnp.ones((2,), bool), s)
        before = np.asarray(st.count).sum()
        st2 = sharc.resolve(st, keys_of([0, 0]), v3([[9, 9, 9]] * 2),
                            jnp.zeros((2,), bool), s)
        assert np.asarray(st2.count).sum() == before       # nothing merged
        assert np.asarray(st2.stale).max() == 1.0          # but aged
