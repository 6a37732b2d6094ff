"""Native host-ops (C++/ctypes) vs numpy-fallback equivalence. The
library compiles on first use (g++ baked in this image); if the build
were unavailable every wrapper returns None and callers keep the numpy
path — these tests then skip."""

import numpy as np
import pytest

from tpu_pbrt import native


@pytest.fixture(scope="module")
def built():
    if native.lib() is None:
        pytest.skip("native toolchain unavailable")
    return True


def test_morton_order_matches_numpy(built):
    rng = np.random.default_rng(0)
    v0 = rng.normal(size=(5000, 3)).astype(np.float32)
    v1 = v0 + rng.normal(scale=0.01, size=v0.shape).astype(np.float32)
    v2 = v0 + rng.normal(scale=0.01, size=v0.shape).astype(np.float32)
    got = native.morton_order(v0, v1, v2)

    centroid = (v0 + v1 + v2) / 3.0
    lo, hi = centroid.min(0), centroid.max(0)
    q = np.clip((centroid - lo) / np.maximum(hi - lo, 1e-12) * 1024.0,
                0, 1023).astype(np.uint32)

    def expand(x):
        x = (x * 0x00010001) & 0xFF0000FF
        x = (x * 0x00000101) & 0x0F00F00F
        x = (x * 0x00000011) & 0xC30C30C3
        x = (x * 0x00000005) & 0x49249249
        return x

    codes = (expand(q[:, 0]) << 2) | (expand(q[:, 1]) << 1) | expand(q[:, 2])
    want = np.argsort(codes, kind="stable").astype(np.int32)
    np.testing.assert_array_equal(got, want)


def test_block_bounds_matches_numpy(built):
    rng = np.random.default_rng(1)
    n, block = 256, 64
    sv0 = rng.normal(size=(n, 3)).astype(np.float32)
    sv1 = rng.normal(size=(n, 3)).astype(np.float32)
    sv2 = rng.normal(size=(n, 3)).astype(np.float32)
    sid = np.arange(n, dtype=np.int32)
    sid[-10:] = -1  # padding
    bmin, bmax = native.block_bounds(sv0, sv1, sv2, sid, block)

    nb = n // block
    tri_min = np.minimum(np.minimum(sv0, sv1), sv2).reshape(nb, block, 3)
    tri_max = np.maximum(np.maximum(sv0, sv1), sv2).reshape(nb, block, 3)
    valid = (sid >= 0).reshape(nb, block, 1)
    np.testing.assert_allclose(
        bmin, np.where(valid, tri_min, np.inf).min(1), rtol=0, atol=0)
    np.testing.assert_allclose(
        bmax, np.where(valid, tri_max, -np.inf).max(1), rtol=0, atol=0)


def test_mip_downsample_matches_numpy(built):
    rng = np.random.default_rng(2)
    for h, w in ((16, 16), (8, 4), (1, 8), (4, 1)):
        src = rng.random((h, w, 4)).astype(np.float32)
        got = native.mip_downsample(src)
        nh, nw = max(h // 2, 1), max(w // 2, 1)
        s = src[: nh * 2, : nw * 2] if (h > 1 and w > 1) else src
        if h > 1 and w > 1:
            want = s.reshape(nh, 2, nw, 2, -1).mean((1, 3))
        elif h > 1:
            want = s.reshape(nh, 2, 1, -1).mean(1).reshape(nh, 1, -1)
        else:
            want = s.reshape(1, nw, 2, -1).mean(2)
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-7)


def test_pack_level_quads_matches_numpy(built):
    from tpu_pbrt.ops import texture as tex

    rng = np.random.default_rng(3)
    for wrap in (tex.WRAP_REPEAT, tex.WRAP_CLAMP):
        for srgb in (False, True):
            m = rng.random((8, 8, 4)).astype(np.float32)
            got = native.pack_level_quads(m, wrap == tex.WRAP_REPEAT, srgb)
            # numpy reference path (native disabled by calling internals)
            rgb = np.clip(m[..., :3], 0.0, 1.0)
            if srgb:
                rgb = np.where(rgb <= 0.0031308, rgb * 12.92,
                               1.055 * rgb ** (1.0 / 2.4) - 0.055)
            q = np.clip(np.round(np.concatenate(
                [rgb, np.clip(m[..., 3:], 0, 1)], -1) * 255.0),
                0, 255).astype(np.uint32)
            packed = (q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16)
                      | (q[..., 3] << 24))
            hh, ww = packed.shape
            if wrap == tex.WRAP_REPEAT:
                x1 = (np.arange(ww) + 1) % ww
                y1 = (np.arange(hh) + 1) % hh
            else:
                x1 = np.minimum(np.arange(ww) + 1, ww - 1)
                y1 = np.minimum(np.arange(hh) + 1, hh - 1)
            want = np.stack([packed, packed[:, x1], packed[y1, :],
                             packed[y1][:, x1]], -1).reshape(-1, 4)
            # sRGB encode rounding may differ by 1 ulp of u8 per channel
            if srgb:
                for col in range(4):
                    ga = np.stack([(got[:, col] >> s) & 0xFF
                                   for s in (0, 8, 16, 24)], -1).astype(int)
                    wa = np.stack([(want[:, col] >> s) & 0xFF
                                   for s in (0, 8, 16, 24)], -1).astype(int)
                    assert np.abs(ga - wa).max() <= 1
            else:
                np.testing.assert_array_equal(got, want)
