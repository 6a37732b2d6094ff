"""OpenEXR scanline decoder round-trip (we author minimal EXR files by
hand — no OpenEXR library exists in this environment)."""

import struct
import zlib

import numpy as np
import pytest

from tpu_pbrt.utils.texture_io import load_image_rgba


def _attr(name, atype, payload):
    return (name.encode() + b"\0" + atype.encode() + b"\0"
            + struct.pack("<i", len(payload)) + payload)


def _chlist(channels):
    out = b""
    for name, ptype in channels:
        out += (name.encode() + b"\0" + struct.pack("<i", ptype)
                + b"\0\0\0\0" + struct.pack("<ii", 1, 1))
    return out + b"\0"


def _predict_interleave(raw: bytes) -> bytes:
    """OpenEXR ZIP pre-pass: split even/odd bytes, then delta-encode."""
    a = np.frombuffer(raw, np.uint8)
    n = a.shape[0]
    half = (n + 1) // 2
    t = np.empty(n, np.uint8)
    t[:half] = a[0::2]
    t[half:] = a[1::2]
    d = t.astype(np.int32)
    d[1:] = d[1:] - d[:-1] + 384
    return (d % 256).astype(np.uint8).tobytes()


def write_exr(path, img: np.ndarray, compression=0, ptype=2):
    """img: (H, W, C<=4) float32; channels written as B,G,R(,A) —
    alphabetical order, as OpenEXR requires."""
    h, w, c = img.shape
    names = ["B", "G", "R", "A"][: c] if c < 4 else ["A", "B", "G", "R"]
    chan_img = {"R": img[..., 0], "G": img[..., 1], "B": img[..., 2]}
    if c == 4:
        chan_img["A"] = img[..., 3]
    channels = sorted((n, ptype) for n in chan_img)
    dtype = {1: np.float16, 2: np.float32}[ptype]

    header = b""
    header += _attr("channels", "chlist", _chlist(channels))
    header += _attr("compression", "compression", bytes([compression]))
    box = struct.pack("<4i", 0, 0, w - 1, h - 1)
    header += _attr("dataWindow", "box2i", box)
    header += _attr("displayWindow", "box2i", box)
    header += _attr("lineOrder", "lineOrder", b"\0")
    header += _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += _attr("screenWindowCenter", "v2f", struct.pack("<ff", 0, 0))
    header += _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\0"

    lines_per_block = 16 if compression == 3 else 1
    n_blocks = (h + lines_per_block - 1) // lines_per_block
    chunks = []
    for b in range(n_blocks):
        y0 = b * lines_per_block
        ny = min(lines_per_block, h - y0)
        raw = b""
        for line in range(ny):
            for name, _ in channels:
                raw += chan_img[name][y0 + line].astype(dtype).tobytes()
        if compression in (2, 3):
            packed = zlib.compress(_predict_interleave(raw))
            if len(packed) >= len(raw):
                packed = raw
        else:
            packed = raw
        chunks.append(struct.pack("<ii", y0, len(packed)) + packed)

    base = 8 + len(header) + 8 * n_blocks
    offsets = []
    off = base
    for ch in chunks:
        offsets.append(off)
        off += len(ch)
    with open(path, "wb") as f:
        f.write(b"\x76\x2f\x31\x01" + struct.pack("<I", 2))
        f.write(header)
        f.write(struct.pack(f"<{n_blocks}Q", *offsets))
        for ch in chunks:
            f.write(ch)


@pytest.mark.parametrize("compression", [0, 2, 3])
@pytest.mark.parametrize("ptype", [1, 2])
def test_exr_roundtrip(tmp_path, compression, ptype):
    rng = np.random.default_rng(7)
    img = (rng.random((20, 17, 3)) * 4.0).astype(np.float32)
    p = str(tmp_path / "t.exr")
    write_exr(p, img, compression=compression, ptype=ptype)
    out = load_image_rgba(p)
    assert out.shape == (20, 17, 4)
    tol = 2e-3 if ptype == 1 else 1e-6
    np.testing.assert_allclose(out[..., :3], img, rtol=tol, atol=tol)
    np.testing.assert_allclose(out[..., 3], 1.0)


def test_exr_with_alpha(tmp_path):
    img = np.concatenate([
        np.linspace(0, 8, 8 * 8 * 3, dtype=np.float32).reshape(8, 8, 3),
        np.full((8, 8, 1), 0.25, np.float32)], -1)
    p = str(tmp_path / "a.exr")
    write_exr(p, img, compression=2)
    out = load_image_rgba(p)
    np.testing.assert_allclose(out, img, rtol=1e-6, atol=1e-6)


def test_exr_environment_texture(tmp_path):
    """EXR plugs into the scene-JSON environment path (linear, no sRGB)."""
    from tpu_pbrt.utils.texture_io import load_latlong_texture

    img = np.full((4, 8, 3), 3.5, np.float32)
    p = str(tmp_path / "env.exr")
    write_exr(p, img, compression=3)
    tex = load_latlong_texture(p)
    np.testing.assert_allclose(tex, 3.5, rtol=1e-6)
