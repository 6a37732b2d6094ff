"""DDS/BC decoder tests: random blocks for every supported BC format are
wrapped in a DDS container and decoded by BOTH our native decoder
(tpu_pbrt/utils/dds.py) and Pillow's independent DDS plugin; outputs must
match to u8 precision. Mirrors the reference's DDS coverage
(Source/TextureHelpers.ixx:33-137 via DirectXTex)."""

import struct
import unittest

import numpy as np

from tpu_pbrt.utils import dds


def make_dds(w, h, fmt_payload, *, fourcc=None, dxgi=None, rgb_bits=0,
             masks=(0, 0, 0, 0)):
    """Minimal DDS file bytes for one mip-0 surface."""
    pf_flags = 0x4 if (fourcc or dxgi) else 0x41   # FOURCC | (RGB+ALPHA)
    cc = b"DX10" if dxgi else (fourcc or b"\0\0\0\0")
    header = struct.pack(
        "<4I", 0x20534444, 124, 0x1007, h) + struct.pack("<I", w)
    header += struct.pack("<3I", 0, 0, 0) + b"\0" * 44
    header += struct.pack("<2I", 32, pf_flags) + cc
    header += struct.pack("<5I", rgb_bits, *masks)
    header += struct.pack("<5I", 0x1000, 0, 0, 0, 0)
    if dxgi:
        header += struct.pack("<5I", dxgi, 3, 0, 1, 0)
    return header + fmt_payload


def pil_decode(data):
    import io
    from PIL import Image

    img = Image.open(io.BytesIO(data))
    return np.asarray(img.convert("RGBA"), np.uint8)


class TestDDS(unittest.TestCase):
    def _roundtrip(self, fmt, bpb, *, fourcc=None, dxgi=None, w=16, h=16,
                   seed=0, atol=1):
        rng = np.random.default_rng(seed)
        nblocks = (w // 4) * (h // 4)
        payload = rng.integers(0, 256, nblocks * bpb, dtype=np.uint8)
        if fmt == "bc7":
            # force valid mode bits (a zero low byte would be mode>=8);
            # set a random mode 0..7 per block
            payload = payload.reshape(nblocks, 16)
            modes = rng.integers(0, 8, nblocks)
            for i, m in enumerate(modes):
                b = int(payload[i, 0])
                b &= ~((1 << (m + 1)) - 1) & 0xFF
                payload[i, 0] = (b | (1 << m)) & 0xFF
            payload = payload.reshape(-1)
        data = make_dds(w, h, payload.tobytes(), fourcc=fourcc, dxgi=dxgi)
        ours = dds.load_dds_bytes_for_tests(data)
        ref = pil_decode(data).astype(np.float32) / 255.0
        ours8 = np.round(np.clip(ours, 0, 1) * 255)
        ref8 = np.round(ref * 255)
        self.assertLessEqual(
            np.abs(ours8 - ref8).max(), atol,
            f"{fmt}: max diff {np.abs(ours8 - ref8).max()}")

    def test_bc1(self):
        self._roundtrip("bc1", 8, fourcc=b"DXT1")

    def test_bc2(self):
        self._roundtrip("bc2", 16, fourcc=b"DXT3")

    def test_bc3(self):
        self._roundtrip("bc3", 16, fourcc=b"DXT5")

    def test_bc4(self):
        self._roundtrip("bc4", 8, fourcc=b"ATI1")

    def test_bc5(self):
        self._roundtrip("bc5", 16, fourcc=b"ATI2")

    def test_bc7(self):
        for seed in range(4):
            self._roundtrip("bc7", 16, dxgi=98, seed=seed)

    def test_uncompressed_rgba8(self):
        rng = np.random.default_rng(3)
        w = h = 8
        px = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
        data = make_dds(w, h, px.tobytes(), rgb_bits=32,
                        masks=(0xFF, 0xFF00, 0xFF0000, 0xFF000000))
        ours = dds.load_dds_bytes_for_tests(data)
        np.testing.assert_array_equal(
            np.round(ours * 255).astype(np.uint8), px)

    def test_loader_integration(self):
        """load_image_rgba routes .dds and applies sRGB->linear."""
        import tempfile, os
        from tpu_pbrt.utils.texture_io import load_image_rgba

        solid = np.zeros(8, np.uint8)
        # BC1 block: c0=c1=white (0xFFFF), indices 0 -> all white
        solid[:4] = [0xFF, 0xFF, 0xFF, 0xFF]
        data = make_dds(4, 4, solid.tobytes(), fourcc=b"DXT1")
        with tempfile.NamedTemporaryFile(suffix=".dds", delete=False) as f:
            f.write(data)
            path = f.name
        try:
            img = load_image_rgba(path, srgb=True)
            self.assertEqual(img.shape, (4, 4, 4))
            np.testing.assert_allclose(img[..., :3], 1.0, atol=1e-5)
        finally:
            os.unlink(path)


if __name__ == "__main__":
    unittest.main()
