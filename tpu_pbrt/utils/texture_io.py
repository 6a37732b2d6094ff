"""Texture loading (PNG/JPG/HDR-ish via PIL), sRGB rules, mip chains.

Capability mirror of the reference texture loader (reference:
Source/TextureHelpers.ixx:33-137 — DDS/WIC/HDR loaders with sRGB forcing and
mip upload). PIL covers LDR formats; radiance .hdr files get a minimal
native decoder (PIL lacks one); EXR/DDS are not available in this image and
raise a clear error.
"""

from __future__ import annotations

import numpy as np

from ..ops import math as pmath


def load_image_rgba(path: str, srgb: bool = True) -> np.ndarray:
    """(H, W, 4) float32, linear light."""
    lower = path.lower()
    if lower.endswith(".hdr"):
        rgb = _load_radiance_hdr(path)
        a = np.ones_like(rgb[..., :1])
        return np.concatenate([rgb, a], -1)
    if lower.endswith((".exr", ".dds")):
        raise RuntimeError(
            f"{path}: EXR/DDS decoding not available in this environment"
        )
    from PIL import Image

    arr = np.asarray(Image.open(path).convert("RGBA"), np.float32) / 255.0
    if srgb:
        rgb = np.where(
            arr[..., :3] <= 0.04045,
            arr[..., :3] / 12.92,
            ((arr[..., :3] + 0.055) / 1.055) ** 2.4,
        )
        arr = np.concatenate([rgb, arr[..., 3:]], -1)
    return arr.astype(np.float32)


def load_latlong_texture(path: str) -> np.ndarray:
    """(H, W, 3) float32 environment radiance."""
    return load_image_rgba(path, srgb=not path.lower().endswith(".hdr"))[..., :3]


def _load_radiance_hdr(path: str) -> np.ndarray:
    """Minimal Radiance RGBE (.hdr) decoder (RLE + flat scanlines)."""
    with open(path, "rb") as f:
        data = f.read()
    # header ends with an empty line, then the resolution line
    pos = 0
    if not data.startswith((b"#?RADIANCE", b"#?RGBE")):
        raise ValueError(f"{path}: not a Radiance HDR file")
    while True:
        nl = data.index(b"\n", pos)
        line = data[pos:nl]
        pos = nl + 1
        if line == b"":
            break
    nl = data.index(b"\n", pos)
    res = data[pos:nl].split()
    pos = nl + 1
    if res[0] != b"-Y" or res[2] != b"+X":
        raise ValueError(f"{path}: unsupported HDR orientation {res}")
    h, w = int(res[1]), int(res[3])

    out = np.zeros((h, w, 4), np.uint8)
    buf = np.frombuffer(data, np.uint8, count=len(data) - pos, offset=pos)
    bp = 0
    for y in range(h):
        if w < 8 or w > 0x7FFF or buf[bp] != 2 or buf[bp + 1] != 2:
            # flat scanline
            row = buf[bp:bp + w * 4].reshape(w, 4)
            out[y] = row
            bp += w * 4
            continue
        bp += 4  # scanline header
        for c in range(4):
            x = 0
            while x < w:
                count = int(buf[bp]); bp += 1
                if count > 128:  # run
                    out[y, x:x + count - 128, c] = buf[bp]
                    bp += 1
                    x += count - 128
                else:  # literal
                    out[y, x:x + count, c] = buf[bp:bp + count]
                    bp += count
                    x += count
    rgbe = out.astype(np.float32)
    exp = np.ldexp(1.0, out[..., 3].astype(np.int32) - 136)
    rgb = rgbe[..., :3] * exp[..., None]
    return rgb.astype(np.float32)


def build_mip_chain(img: np.ndarray, max_levels: int = 16) -> list[np.ndarray]:
    """Box-filtered mip pyramid down to 1x1 (TextureHelpers mip upload
    analogue). img: (H, W, C), H/W powers of two preferred."""
    mips = [img.astype(np.float32)]
    while len(mips) < max_levels and (mips[-1].shape[0] > 1 or mips[-1].shape[1] > 1):
        src = mips[-1]
        h, w = src.shape[:2]
        nh, nw = max(h // 2, 1), max(w // 2, 1)
        src = src[: nh * 2, : nw * 2] if (h > 1 and w > 1) else src
        if h > 1 and w > 1:
            m = src.reshape(nh, 2, nw, 2, -1).mean((1, 3))
        elif h > 1:
            m = src.reshape(nh, 2, 1, -1).mean(1).reshape(nh, 1, -1)
        else:
            m = src.reshape(1, nw, 2, -1).mean(2)
        mips.append(m.astype(np.float32))
    return mips
