"""DDS container + block-compression decoders (BC1-BC5, BC7, and common
uncompressed layouts), pure numpy.

Capability mirror of the reference's DDS path (reference:
Source/TextureHelpers.ixx:33-137 loads DDS via DirectXTex `LoadFromDDSFile`
+ `Decompress`; glTF extension MSFT_texture_dds routes .dds sources,
Source/GLTFHelpers.ixx:451). Returns the base mip as (H, W, 4) float32
linear light; mips are rebuilt by `build_mip_chain` like every other
source format.

Decoders are vectorized over blocks (BC1-5) and over blocks-per-mode
(BC7), so multi-megapixel textures decode in tens of milliseconds —
there is no per-texel Python.
"""

from __future__ import annotations

import struct

import numpy as np

DDS_MAGIC = 0x20534444          # 'DDS '
DDPF_FOURCC = 0x4
DDPF_RGB = 0x40
DDPF_ALPHAPIXELS = 0x1
DDPF_LUMINANCE = 0x20000

# DXGI formats we accept (subset the reference tooling emits)
_DXGI = {
    28: ("rgba8", False),    # R8G8B8A8_UNORM
    29: ("rgba8", True),     # R8G8B8A8_UNORM_SRGB
    87: ("bgra8", False),    # B8G8R8A8_UNORM
    91: ("bgra8", True),     # B8G8R8A8_UNORM_SRGB
    71: ("bc1", False), 72: ("bc1", True),
    74: ("bc2", False), 75: ("bc2", True),
    77: ("bc3", False), 78: ("bc3", True),
    80: ("bc4", False), 81: ("bc4s", False),
    83: ("bc5", False), 84: ("bc5s", False),
    98: ("bc7", False), 99: ("bc7", True),
    2: ("rgba32f", False),   # R32G32B32A32_FLOAT
    10: ("rgba16f", False),  # R16G16B16A16_FLOAT
}

_FOURCC = {
    b"DXT1": "bc1", b"DXT2": "bc2", b"DXT3": "bc2",
    b"DXT4": "bc3", b"DXT5": "bc3",
    b"ATI1": "bc4", b"BC4U": "bc4",
    b"ATI2": "bc5", b"BC5U": "bc5",
}


def load_dds(path: str, srgb_default: bool = True) -> np.ndarray:
    """Decode the base mip of a .dds file to (H, W, 4) f32 linear."""
    with open(path, "rb") as f:
        data = f.read()
    raw, width, height, fmt, srgb = _parse_dds(data, path, srgb_default)
    rgba = decode_surface(raw, width, height, fmt)
    if srgb:
        rgb = np.where(rgba[..., :3] <= 0.04045, rgba[..., :3] / 12.92,
                       ((rgba[..., :3] + 0.055) / 1.055) ** 2.4)
        rgba = np.concatenate([rgb, rgba[..., 3:]], -1)
    return rgba.astype(np.float32)


def load_dds_bytes_for_tests(data: bytes) -> np.ndarray:
    """Decode in-memory DDS bytes WITHOUT sRGB conversion (test oracle
    comparisons against PIL, which returns raw stored values)."""
    raw, width, height, fmt, _ = _parse_dds(data, "<bytes>", False)
    return decode_surface(raw, width, height, fmt)


def _parse_dds(data: bytes, path: str, srgb_default: bool = True):
    if len(data) < 128 or struct.unpack_from("<I", data, 0)[0] != DDS_MAGIC:
        raise ValueError(f"{path}: not a DDS file")
    (size, _flags, height, width) = struct.unpack_from("<4I", data, 4)
    if size != 124:
        raise ValueError(f"{path}: bad DDS header size {size}")
    pf_flags, fourcc = struct.unpack_from("<II", data, 80)
    rgb_bits, rmask, gmask, bmask, amask = struct.unpack_from(
        "<5I", data, 88)
    payload = 128
    fmt, srgb = None, srgb_default

    if pf_flags & DDPF_FOURCC:
        cc = data[84:88]
        if cc == b"DX10":
            dxgi, _dim, _misc, _asize, _misc2 = struct.unpack_from(
                "<5I", data, 128)
            payload = 148
            if dxgi not in _DXGI:
                raise ValueError(f"{path}: unsupported DXGI format {dxgi}")
            fmt, srgb = _DXGI[dxgi]
        else:
            fmt = _FOURCC.get(cc)
            if fmt is None:
                raise ValueError(f"{path}: unsupported FourCC {cc!r}")
    elif pf_flags & DDPF_RGB:
        if rgb_bits == 32:
            if rmask == 0xFF:
                fmt = "rgba8"
            elif rmask == 0xFF0000:
                fmt = "bgra8"
        elif rgb_bits == 24 and rmask in (0xFF, 0xFF0000):
            fmt = "bgr8" if rmask == 0xFF0000 else "rgb8"
        if fmt is None:
            raise ValueError(f"{path}: unsupported RGB masks")
    elif pf_flags & DDPF_LUMINANCE and rgb_bits == 8:
        fmt = "l8"
    else:
        raise ValueError(f"{path}: unsupported pixel format flags")

    raw = np.frombuffer(data, np.uint8, offset=payload)
    return raw, width, height, fmt, srgb


def decode_surface(raw: np.ndarray, w: int, h: int, fmt: str) -> np.ndarray:
    """Decode mip 0 of a surface in `fmt` from flat u8 `raw`."""
    if fmt in ("rgba8", "bgra8", "rgb8", "bgr8", "l8"):
        ch = {"rgba8": 4, "bgra8": 4, "rgb8": 3, "bgr8": 3, "l8": 1}[fmt]
        img = raw[:w * h * ch].reshape(h, w, ch).astype(np.float32) / 255.0
        if fmt == "l8":
            img = np.repeat(img, 3, axis=-1)
        elif fmt in ("bgra8", "bgr8"):
            img = img[..., [2, 1, 0] + ([3] if ch == 4 else [])]
        if img.shape[-1] == 3:
            img = np.concatenate([img, np.ones_like(img[..., :1])], -1)
        return img
    if fmt == "rgba32f":
        return raw[:w * h * 16].view(np.float32).reshape(h, w, 4).copy()
    if fmt == "rgba16f":
        return raw[:w * h * 8].view(np.float16).reshape(
            h, w, 4).astype(np.float32)

    bw, bh = (w + 3) // 4, (h + 3) // 4
    bpb = 8 if fmt in ("bc1", "bc4", "bc4s") else 16
    blocks = raw[:bw * bh * bpb].reshape(bw * bh, bpb)
    if fmt == "bc1":
        px = _decode_bc1(blocks, allow_alpha=True)
    elif fmt == "bc2":
        c = _decode_bc1(blocks[:, 8:], allow_alpha=False)
        a4 = blocks[:, :8].view(np.uint16).reshape(-1, 4).astype(np.uint32)
        sh = (np.arange(16, dtype=np.uint32) % 4) * 4
        a = ((a4[:, np.arange(16) // 4] >> sh[None, :]) & 0xF) / 15.0
        px = np.concatenate([c[..., :3], a[..., None]], -1)
    elif fmt == "bc3":
        c = _decode_bc1(blocks[:, 8:], allow_alpha=False)
        a = _decode_bc4_words(blocks[:, :8])
        px = np.concatenate([c[..., :3], a[..., None]], -1)
    elif fmt in ("bc4", "bc4s"):
        r = _decode_bc4_words(blocks, signed=fmt.endswith("s"))
        px = np.stack([r, r, r, np.ones_like(r)], -1)
    elif fmt in ("bc5", "bc5s"):
        s = fmt.endswith("s")
        r = _decode_bc4_words(blocks[:, :8], signed=s)
        g = _decode_bc4_words(blocks[:, 8:], signed=s)
        px = np.stack([r, g, np.zeros_like(r), np.ones_like(r)], -1)
    elif fmt == "bc7":
        px = _decode_bc7(blocks)
    else:
        raise ValueError(f"unsupported surface format {fmt}")
    # (B, 16, 4) -> (H, W, 4)
    px = px.reshape(bh, bw, 4, 4, 4).transpose(0, 2, 1, 3, 4)
    return px.reshape(bh * 4, bw * 4, 4)[:h, :w]


def _decode_bc1(blocks: np.ndarray, allow_alpha: bool) -> np.ndarray:
    """(B, 8) u8 -> (B, 16, 4) f32. Handles the c0<=c1 3-color+alpha mode."""
    c01 = blocks[:, :4].copy().view(np.uint16)           # (B, 2)
    c0, c1 = c01[:, 0].astype(np.uint32), c01[:, 1].astype(np.uint32)

    def expand565(c):
        r = ((c >> 11) & 0x1F).astype(np.float32) / 31.0
        g = ((c >> 5) & 0x3F).astype(np.float32) / 63.0
        b = (c & 0x1F).astype(np.float32) / 31.0
        return np.stack([r, g, b], -1)

    p0, p1 = expand565(c0), expand565(c1)
    four = (c0 > c1) | (not allow_alpha)
    f = four[:, None].astype(np.float32)
    p2 = f * ((2 * p0 + p1) / 3) + (1 - f) * ((p0 + p1) / 2)
    p3 = f * ((p0 + 2 * p1) / 3)                          # else black
    pal = np.stack([p0, p1, p2, p3], 1)                   # (B, 4, 3)
    ones = np.ones(len(blocks), np.float32)
    pala = np.stack([ones, ones, ones,
                     np.where(four, 1.0, 0.0).astype(np.float32)], 1)
    if not allow_alpha:
        pala = np.ones_like(pala)
    bits = blocks[:, 4:8].copy().view(np.uint32)[:, 0]    # (B,)
    idx = (bits[:, None] >> (2 * np.arange(16, dtype=np.uint32))) & 3
    rgb = np.take_along_axis(pal, idx[..., None].astype(np.int64), axis=1)
    a = np.take_along_axis(pala, idx.astype(np.int64), axis=1)
    return np.concatenate([rgb, a[..., None]], -1)


def _decode_bc4_words(blocks: np.ndarray, signed: bool = False) -> np.ndarray:
    """(B, 8) u8 BC4 words -> (B, 16) f32 in [0,1] (or [-1,1] mapped)."""
    if signed:
        e0 = blocks[:, 0].view(np.int8).astype(np.float32)
        e1 = blocks[:, 1].view(np.int8).astype(np.float32)
        e0 = np.maximum(e0, -127) / 127.0
        e1 = np.maximum(e1, -127) / 127.0
        interp8 = e0 > e1
    else:
        e0 = blocks[:, 0].astype(np.float32) / 255.0
        e1 = blocks[:, 1].astype(np.float32) / 255.0
        interp8 = blocks[:, 0] > blocks[:, 1]
    # 48 bits of 3-bit indices
    lo = blocks[:, 2:8].astype(np.uint64)
    bits = np.zeros(len(blocks), np.uint64)
    for i in range(6):
        bits |= lo[:, i] << np.uint64(8 * i)
    idx = ((bits[:, None] >> (3 * np.arange(16, dtype=np.uint64))) &
           np.uint64(7)).astype(np.int32)                 # (B, 16)

    # 8-interp palette: [e0, e1, (6e0+e1)/7 ... (e0+6e1)/7]
    w8 = np.asarray([[7, 0], [0, 7], [6, 1], [5, 2], [4, 3], [3, 4],
                     [2, 5], [1, 6]], np.float32) / 7.0
    pal8 = e0[:, None] * w8[None, :, 0] + e1[:, None] * w8[None, :, 1]
    # 6-interp palette: [e0, e1, (4e0+e1)/5 ... , 0, 1]
    w6 = np.asarray([[5, 0], [0, 5], [4, 1], [3, 2], [2, 3], [1, 4]],
                    np.float32) / 5.0
    pal6 = e0[:, None] * w6[None, :, 0] + e1[:, None] * w6[None, :, 1]
    lohi = np.asarray([0.0, 1.0], np.float32)
    if signed:
        lohi = np.asarray([-1.0, 1.0], np.float32)
    pal6 = np.concatenate(
        [pal6, np.broadcast_to(lohi, (len(blocks), 2))], axis=1)
    pal = np.where(interp8[:, None], pal8, pal6)          # (B, 8)
    out = np.take_along_axis(pal, idx, axis=1)
    if signed:
        out = (out + 1.0) / 2.0
    return out.astype(np.float32)


# --------------------------------------------------------------------------
# BC7 (8 modes, mode-vectorized)
# --------------------------------------------------------------------------

_P2 = np.asarray([  # 64 two-subset partitions (BC6H/BC7 spec table)
    0xCCCC, 0x8888, 0xEEEE, 0xECC8, 0xC880, 0xFEEC, 0xFEC8, 0xEC80,
    0xC800, 0xFFEC, 0xFE80, 0xE800, 0xFFE8, 0xFF00, 0xFFF0, 0xF000,
    0xF710, 0x008E, 0x7100, 0x08CE, 0x008C, 0x7310, 0x3100, 0x8CCE,
    0x088C, 0x3110, 0x6666, 0x366C, 0x17E8, 0x0FF0, 0x718E, 0x399C,
    0xAAAA, 0xF0F0, 0x5A5A, 0x33CC, 0x3C3C, 0x55AA, 0x9696, 0xA55A,
    0x73CE, 0x13C8, 0x324C, 0x3BDC, 0x6996, 0xC33C, 0x9966, 0x0660,
    0x0272, 0x04E4, 0x4E40, 0x2720, 0xC936, 0x936C, 0x39C6, 0x639C,
    0x9336, 0x9CC6, 0x817E, 0xE718, 0xCCF0, 0x0FCC, 0x7744, 0xEE22,
], np.uint32)

_P3 = np.asarray([  # 64 three-subset partitions, 2 bits per texel
    0xAA685050, 0x6A5A5040, 0x5A5A4200, 0x5450A0A8,
    0xA5A50000, 0xA0A05050, 0x5555A0A0, 0x5A5A5050,
    0xAA550000, 0xAA555500, 0xAAAA5500, 0x90909090,
    0x94949494, 0xA4A4A4A4, 0xA9A59450, 0x2A0A4250,
    0xA5945040, 0x0A425054, 0xA5A5A500, 0x55A0A0A0,
    0xA8A85454, 0x6A6A4040, 0xA4A45000, 0x1A1A0500,
    0x0050A4A4, 0xAAA59090, 0x14696914, 0x69691400,
    0xA08585A0, 0xAA821414, 0x50A4A450, 0x6A5A0200,
    0xA9A58000, 0x5090A0A8, 0xA8A09050, 0x24242424,
    0x00AA5500, 0x24924924, 0x24499224, 0x50A50A50,
    0x500AA550, 0xAAAA4444, 0x66660000, 0xA5A0A5A0,
    0x50A050A0, 0x69286928, 0x44AAAA44, 0x66666600,
    0xAA444444, 0x54A854A8, 0x95809580, 0x96969600,
    0xA85454A8, 0x80959580, 0xAA141414, 0x96960000,
    0xAAAA1414, 0xA05050A0, 0xA0A5A5A0, 0x96000000,
    0x40804080, 0xA9A8A9A8, 0xAAAAAA44, 0x2A4A5254,
], np.uint32)

_ANCHOR2 = np.asarray([  # anchor index of subset 1, 2-subset partitions
    15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15,
    15, 2, 8, 2, 2, 8, 8, 15, 2, 8, 2, 2, 8, 8, 2, 2,
    15, 15, 6, 8, 2, 8, 15, 15, 2, 8, 2, 2, 2, 15, 15, 6,
    6, 2, 6, 8, 15, 15, 2, 2, 15, 15, 15, 15, 15, 2, 2, 15,
], np.int32)

_ANCHOR3A = np.asarray([
    3, 3, 15, 15, 8, 3, 15, 15, 8, 8, 6, 6, 6, 5, 3, 3,
    3, 3, 8, 15, 3, 3, 6, 10, 5, 8, 8, 6, 8, 5, 15, 15,
    8, 15, 3, 5, 6, 10, 8, 15, 15, 3, 15, 5, 15, 15, 15, 15,
    3, 15, 5, 5, 5, 8, 5, 10, 5, 10, 8, 13, 15, 12, 3, 3,
], np.int32)

_ANCHOR3B = np.asarray([
    15, 8, 8, 3, 15, 15, 3, 8, 15, 15, 15, 15, 15, 15, 15, 8,
    15, 8, 15, 3, 15, 8, 15, 8, 3, 15, 6, 10, 15, 15, 10, 8,
    15, 3, 15, 10, 10, 8, 9, 10, 6, 15, 8, 15, 3, 6, 6, 8,
    15, 3, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 3, 15, 15, 8,
], np.int32)

_W2 = np.asarray([0, 21, 43, 64], np.int64)
_W3 = np.asarray([0, 9, 18, 27, 37, 46, 55, 64], np.int64)
_W4 = np.asarray([0, 4, 9, 13, 17, 21, 26, 30, 34, 38, 43, 47,
                  51, 55, 60, 64], np.int64)

# per-mode: (subsets, partition_bits, rot_bits, idx_sel_bit, color_bits,
#            alpha_bits, endpoint_pbits, shared_pbits, index_bits,
#            index2_bits)
_BC7_MODES = [
    (3, 4, 0, 0, 4, 0, 1, 0, 3, 0),
    (2, 6, 0, 0, 6, 0, 0, 1, 3, 0),
    (3, 6, 0, 0, 5, 0, 0, 0, 2, 0),
    (2, 6, 0, 0, 7, 0, 1, 0, 2, 0),
    (1, 0, 2, 1, 5, 6, 0, 0, 2, 3),
    (1, 0, 2, 0, 7, 8, 0, 0, 2, 2),
    (1, 0, 0, 0, 7, 7, 1, 0, 4, 0),
    (2, 6, 0, 0, 5, 5, 1, 0, 2, 0),
]


def _get_bits(lo, hi, off, n):
    """Extract n bits at offset off from 128-bit ints given as two u64."""
    off = int(off)
    n = int(n)
    if n == 0:
        return np.zeros(lo.shape, np.int64)
    mask = np.uint64((1 << n) - 1)
    if off + n <= 64:
        return ((lo >> np.uint64(off)) & mask).astype(np.int64)
    if off >= 64:
        return ((hi >> np.uint64(off - 64)) & mask).astype(np.int64)
    k = 64 - off
    a = (lo >> np.uint64(off)).astype(np.uint64)
    b = (hi & np.uint64((1 << (n - k)) - 1)) << np.uint64(k)
    return ((a | b) & mask).astype(np.int64)


def _decode_bc7(blocks: np.ndarray) -> np.ndarray:
    """(B, 16) u8 -> (B, 16px, 4) f32."""
    n = len(blocks)
    lo = blocks[:, :8].copy().view(np.uint64)[:, 0]
    hi = blocks[:, 8:].copy().view(np.uint64)[:, 0]
    out = np.zeros((n, 16, 4), np.float32)
    out[..., 3] = 1.0
    # mode = index of lowest set bit
    mode_of = np.full(n, 8, np.int32)
    for m in range(7, -1, -1):
        mode_of[(lo & np.uint64((1 << (m + 1)) - 1)) ==
                np.uint64(1 << m)] = m

    for m in range(8):
        sel = np.where(mode_of == m)[0]
        if len(sel) == 0:
            continue
        out[sel] = _decode_bc7_mode(m, lo[sel], hi[sel])
    return out


def _decode_bc7_mode(m, lo, hi):
    (ns, pb, rb, isb, cb, ab, epb, spb, ib, ib2) = _BC7_MODES[m]
    n = len(lo)
    pos = m + 1
    part = _get_bits(lo, hi, pos, pb); pos += pb
    rot = _get_bits(lo, hi, pos, rb); pos += rb
    idx_sel = _get_bits(lo, hi, pos, isb); pos += isb

    nep = ns * 2
    # endpoints: R[nep] G[nep] B[nep] (A[nep])
    chans = []
    for _c in range(3):
        ep = np.stack([_get_bits(lo, hi, pos + cb * i, cb)
                       for i in range(nep)], -1)
        pos += cb * nep
        chans.append(ep)
    if ab:
        ep = np.stack([_get_bits(lo, hi, pos + ab * i, ab)
                       for i in range(nep)], -1)
        pos += ab * nep
        chans.append(ep)
    else:
        chans.append(np.full((n, nep), (1 << cb) - 1, np.int64))
    eps = np.stack(chans, -1)            # (n, nep, 4) ints
    bits = np.asarray([cb, cb, cb, ab if ab else cb], np.int64)

    if epb:  # unique p-bit per endpoint
        p = np.stack([_get_bits(lo, hi, pos + i, 1) for i in range(nep)],
                     -1)
        pos += nep
        eps = (eps << 1) | p[..., None]
        bits = bits + 1
    elif spb:  # one shared p-bit per subset
        p = np.stack([_get_bits(lo, hi, pos + i, 1) for i in range(ns)],
                     -1)
        pos += ns
        eps = (eps << 1) | np.repeat(p, 2, axis=1)[..., None]
        bits = bits + 1

    # expand to 8 bits: left-shift then replicate high bits
    eps8 = np.zeros_like(eps)
    for c in range(4):
        b = int(bits[c])
        v = eps[..., c] << (8 - b)
        eps8[..., c] = v | (v >> b)
    if not ab:
        eps8[..., 3] = 255

    # subset assignment per texel
    tex = np.arange(16)
    if ns == 1:
        subset = np.zeros((n, 16), np.int64)
        anchors = [np.zeros(n, np.int64)]
    elif ns == 2:
        bitsmap = _P2[part].astype(np.uint32)
        subset = ((bitsmap[:, None] >> tex[None, :]) & 1).astype(np.int64)
        anchors = [np.zeros(n, np.int64), _ANCHOR2[part].astype(np.int64)]
    else:
        bitsmap = _P3[part].astype(np.uint32)
        subset = ((bitsmap[:, None] >> (2 * tex)[None, :]) & 3).astype(
            np.int64)
        anchors = [np.zeros(n, np.int64), _ANCHOR3A[part].astype(np.int64),
                   _ANCHOR3B[part].astype(np.int64)]

    def read_indices(nbits, pos0):
        """Anchored variable-width indices: anchor texels drop the MSB."""
        idx = np.zeros((n, 16), np.int64)
        p = np.full(n, pos0, np.int64)
        # widths per texel (n, 16): nbits-1 at anchors else nbits
        is_anchor = np.zeros((n, 16), bool)
        for s, a in enumerate(anchors):
            is_anchor[np.arange(n), a] |= (s < ns)
        width = np.where(is_anchor, nbits - 1, nbits)
        # cumulative offsets per texel
        offs = np.concatenate(
            [np.zeros((n, 1), np.int64), np.cumsum(width, 1)[:, :-1]], 1)
        for t in range(16):
            o = pos0 + offs[:, t]
            w = width[:, t]
            # vectorized over the two possible widths
            v_full = _gather_bits(lo, hi, o, nbits)
            v_anch = _gather_bits(lo, hi, o, nbits - 1)
            idx[:, t] = np.where(w == nbits, v_full, v_anch)
        return idx

    idx1 = read_indices(ib, pos)
    total1 = 16 * ib - ns
    idx2 = None
    if ib2:
        idx2 = read_indices(ib2, pos + total1)

    wtab = {2: _W2, 3: _W3, 4: _W4}
    w1 = wtab[ib][idx1]                  # (n, 16)
    e0 = np.take_along_axis(eps8, (subset * 2)[..., None], 1)
    e1 = np.take_along_axis(eps8, (subset * 2 + 1)[..., None], 1)
    col = ((64 - w1)[..., None] * e0 + w1[..., None] * e1 + 32) >> 6

    if ib2:
        w2 = wtab[ib2][idx2]
        col2 = ((64 - w2)[..., None] * e0 + w2[..., None] * e1 + 32) >> 6
        if m == 4:
            # idx_sel swaps which index stream drives color vs alpha
            swap = idx_sel[:, None].astype(bool)
            a = np.where(swap[..., None], col[..., 3:], col2[..., 3:])
            c = np.where(swap[..., None], col2[..., :3], col[..., :3])
        else:
            c, a = col[..., :3], col2[..., 3:]
        col = np.concatenate([c, a], -1)

    # rotation: swap alpha with a color channel
    col = col.astype(np.float32) / 255.0
    for r in (1, 2, 3):
        s = rot == r
        if np.any(s):
            tmp = col[s].copy()
            col[s, :, r - 1] = tmp[:, :, 3]
            col[s, :, 3] = tmp[:, :, r - 1]
    return col


def _gather_bits(lo, hi, off, n):
    """Per-element bit extraction with VARIABLE offsets (vector form)."""
    if n <= 0:
        return np.zeros(lo.shape, np.int64)
    off = off.astype(np.uint64)
    mask = np.uint64((1 << n) - 1)
    lo_part = lo >> off
    # bits from hi when off+n crosses 64 (guard off=0: hi<<64 undefined)
    shift_up = np.uint64(64) - off
    hi_part = np.where(off > 0, hi << (shift_up % np.uint64(64)),
                       np.uint64(0))
    over = off >= 64
    hi_only = hi >> np.where(over, off - np.uint64(64), np.uint64(0))
    v = np.where(over, hi_only, lo_part | hi_part)
    return (v & mask).astype(np.int64)
