"""Texture loading (PNG/JPG via PIL, native .hdr/.exr/.dds decoders),
sRGB rules, mip chains.

Capability mirror of the reference texture loader (reference:
Source/TextureHelpers.ixx:33-137 — DDS/WIC/HDR loaders with sRGB forcing and
mip upload). PIL covers LDR formats; Radiance .hdr, OpenEXR scanline
images (NONE/RLE/ZIPS/ZIP compression, HALF/FLOAT/UINT channels) and DDS
(BC1-BC5, BC7, uncompressed — see utils/dds.py) get native decoders."""

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
    if lower.endswith(".exr"):
        return _load_exr(path)
    if lower.endswith(".dds"):
        from .dds import load_dds

        return load_dds(path, srgb_default=srgb)
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


def _exr_unpredict_deinterleave(raw: bytes) -> np.ndarray:
    """OpenEXR's ZIP/RLE byte postprocess: undo the delta predictor, then
    split the byte stream back out of its two interleaved halves."""
    t = np.frombuffer(raw, np.uint8).astype(np.int32)
    t = (np.cumsum(t - 128) + 128 * 1).astype(np.uint8)  # d[i]+=d[i-1]-128
    n = t.shape[0]
    half = (n + 1) // 2
    out = np.empty(n, np.uint8)
    out[0::2] = t[:half]
    out[1::2] = t[half:]
    return out


def _exr_rle_decode(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        c = raw[i]
        i += 1
        if c > 127:         # signed char < 0: copy 256-c literal bytes
            cnt = 256 - c
            out += raw[i:i + cnt]
            i += cnt
        else:               # repeat next byte c+1 times
            out += raw[i:i + 1] * (c + 1)
            i += 1
    return bytes(out)


def _load_exr(path: str) -> np.ndarray:
    """Minimal OpenEXR 2.0 scanline decoder -> (H, W, 4) float32 linear.
    Supports single-part scanline files, NONE/RLE/ZIPS/ZIP compression,
    HALF/FLOAT/UINT channels, 1x1 sampling (the reference loads .exr
    through DirectXTex the same way, Source/TextureHelpers.ixx:49-55)."""
    import struct
    import zlib

    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"\x76\x2f\x31\x01":
        raise ValueError(f"{path}: not an OpenEXR file")
    version = struct.unpack("<I", data[4:8])[0]
    if version & 0x200:
        raise ValueError(f"{path}: tiled EXR not supported")
    if version & 0x1000:
        raise ValueError(f"{path}: multi-part EXR not supported")

    def read_cstr(pos):
        end = data.index(b"\0", pos)
        return data[pos:end].decode("latin-1"), end + 1

    # --- header attributes
    pos = 8
    channels = []       # (name, pixel_type) in file (alphabetical) order
    compression = 0
    dw = None
    while True:
        name, pos = read_cstr(pos)
        if name == "":
            break
        atype, pos = read_cstr(pos)
        size = struct.unpack_from("<i", data, pos)[0]
        pos += 4
        payload = data[pos:pos + size]
        pos += size
        if name == "channels":
            cp = 0
            while payload[cp] != 0:
                cend = payload.index(b"\0", cp)
                cname = payload[cp:cend].decode("latin-1")
                ptype, = struct.unpack_from("<i", payload, cend + 1)
                xs, ys = struct.unpack_from("<ii", payload, cend + 9)
                if xs != 1 or ys != 1:
                    raise ValueError(f"{path}: subsampled channels")
                channels.append((cname, ptype))
                cp = cend + 17
        elif name == "compression":
            compression = payload[0]
        elif name == "dataWindow":
            dw = struct.unpack("<4i", payload)
    if dw is None or not channels:
        raise ValueError(f"{path}: missing dataWindow/channels")
    w = dw[2] - dw[0] + 1
    h = dw[3] - dw[1] + 1

    lines_per_block = {0: 1, 1: 1, 2: 1, 3: 16}.get(compression)
    if lines_per_block is None:
        raise ValueError(
            f"{path}: unsupported EXR compression {compression} "
            "(NONE/RLE/ZIPS/ZIP only)")
    n_blocks = (h + lines_per_block - 1) // lines_per_block
    offsets = struct.unpack_from(f"<{n_blocks}Q", data, pos)

    dtypes = {0: np.uint32, 1: np.float16, 2: np.float32}
    bpp = {0: 4, 1: 2, 2: 4}
    planes = {c: np.zeros((h, w), np.float32) for c, _ in channels}
    row_bytes = sum(bpp[t] for _, t in channels) * w

    for off in offsets:
        y0, packed = struct.unpack_from("<ii", data, off)
        raw = data[off + 8:off + 8 + packed]
        ny = min(lines_per_block, dw[3] - y0 + 1)
        expect = row_bytes * ny
        if compression in (2, 3) and packed < expect:
            raw = _exr_unpredict_deinterleave(zlib.decompress(raw))
        elif compression == 1 and packed < expect:
            raw = _exr_unpredict_deinterleave(_exr_rle_decode(raw))
        else:
            raw = np.frombuffer(raw, np.uint8)
        bp = 0
        for line in range(ny):
            for cname, ptype in channels:
                nb = bpp[ptype] * w
                vals = np.frombuffer(
                    bytes(raw[bp:bp + nb]), dtypes[ptype]).astype(np.float32)
                if ptype == 0:
                    vals = vals / np.float32(0xFFFFFFFF)
                planes[cname][y0 - dw[1] + line] = vals
                bp += nb

    def plane(name, default):
        return planes.get(name, np.full((h, w), default, np.float32))

    if "Y" in planes and "R" not in planes:   # luminance-only EXR
        y = planes["Y"]
        return np.stack([y, y, y, plane("A", 1.0)], -1)
    return np.stack([plane("R", 0.0), plane("G", 0.0), plane("B", 0.0),
                     plane("A", 1.0)], -1)


def build_mip_chain(img: np.ndarray, max_levels: int = 16) -> list[np.ndarray]:
    """Box-filtered mip pyramid down to 1x1 (TextureHelpers mip upload
    analogue). img: (H, W, C), H/W powers of two preferred."""
    from ..native import mip_downsample

    mips = [img.astype(np.float32)]
    while len(mips) < max_levels and (mips[-1].shape[0] > 1 or mips[-1].shape[1] > 1):
        src = mips[-1]
        native = mip_downsample(src)     # C++ box filter when available
        if native is not None:
            mips.append(native)
            continue
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
