"""HDR ingestion: Radiance RGBE, OpenEXR scanline, DDS, cubemaps.

The reference's role for these codecs is DDSTextureLoader12-based env
cubemap load (reference: Source/GPUTexture.cpp:165-245). Synthetic
files are built in-test so no binary assets live in the repo.
"""

import struct
import zlib

import numpy as np
import pytest

from directcomputeraytracing_tpu.utils import hdr as H
from directcomputeraytracing_tpu.utils.image import load_env_map


def radiance_rle_bytes(img):
    """Write adaptive-RLE Radiance bytes (exercises the RLE decode
    path, unlike save_hdr's flat scanlines)."""
    h, w, _ = img.shape
    m = np.max(img, axis=2)
    exp = np.zeros((h, w), np.int32)
    nz = m > 1e-38
    exp[nz] = np.floor(np.log2(m[nz])).astype(np.int32) + 1
    scale = np.where(nz, np.ldexp(np.float32(1.0), -exp + 8), 0.0)
    mant = np.clip(img * scale[..., None], 0, 255).astype(np.uint8)
    rgbe = np.concatenate(
        [mant, np.where(nz, exp + 128, 0).astype(np.uint8)[..., None]],
        axis=2)
    out = [b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n",
           f"-Y {h} +X {w}\n".encode()]
    for y in range(h):
        out.append(bytes([2, 2, w >> 8, w & 0xFF]))
        for c in range(4):
            row = rgbe[y, :, c]
            x = 0
            while x < w:
                # find a run
                run = 1
                while (x + run < w and run < 127
                       and row[x + run] == row[x]):
                    run += 1
                if run >= 3:
                    out.append(bytes([128 + run, row[x]]))
                    x += run
                else:
                    lit = min(128, w - x)
                    out.append(bytes([lit]) + row[x:x + lit].tobytes())
                    x += lit
    return b"".join(out)


def test_hdr_flat_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.uniform(0.0, 50.0, (13, 21, 3)).astype(np.float32)
    img[3, 4] = 0.0
    p = str(tmp_path / "a.hdr")
    H.save_hdr(p, img)
    back = H.load_hdr(p)
    assert back.shape == img.shape
    # RGBE quantization is relative to the pixel max (shared exponent):
    # one 8-bit mantissa step of the largest channel
    q = np.max(img, axis=2, keepdims=True) / 256.0
    assert np.all(np.abs(back - img) <= q + 1e-4)
    assert np.all(back[3, 4] == 0.0)


def test_hdr_rle(tmp_path):
    rng = np.random.default_rng(1)
    img = np.zeros((8, 64, 3), np.float32)
    img[:, :32] = 7.5          # long runs
    img[:, 32:] = rng.uniform(0.0, 300.0, (8, 32, 3))  # literals
    p = tmp_path / "b.hdr"
    p.write_bytes(radiance_rle_bytes(img))
    back = H.load_hdr(str(p))
    q = np.max(img, axis=2, keepdims=True) / 256.0
    assert np.all(np.abs(back - img) <= q + 1e-4)


def _exr_attr(name, typ, payload):
    return (name.encode() + b"\0" + typ.encode() + b"\0"
            + struct.pack("<I", len(payload)) + payload)


def exr_bytes(img, compression, half=True):
    """Minimal single-part scanline EXR writer (RGB)."""
    h, w, _ = img.shape
    chans = b""
    for cname in (b"B", b"G", b"R"):  # alphabetical
        chans += (cname + b"\0" + struct.pack("<I", 1 if half else 2)
                  + b"\0" * 4 + struct.pack("<2I", 1, 1))
    chans += b"\0"
    hdr = b"\x76\x2f\x31\x01" + struct.pack("<I", 2)
    hdr += _exr_attr("channels", "chlist", chans)
    hdr += _exr_attr("compression", "compression",
                     bytes([compression]))
    dw = struct.pack("<4i", 0, 0, w - 1, h - 1)
    hdr += _exr_attr("dataWindow", "box2i", dw)
    hdr += _exr_attr("displayWindow", "box2i", dw)
    hdr += _exr_attr("lineOrder", "lineOrder", b"\0")
    hdr += _exr_attr("pixelAspectRatio", "float",
                     struct.pack("<f", 1.0))
    hdr += _exr_attr("screenWindowCenter", "v2f",
                     struct.pack("<2f", 0, 0))
    hdr += _exr_attr("screenWindowWidth", "float",
                     struct.pack("<f", 1.0))
    hdr += b"\0"
    lines_per = 16 if compression == 3 else 1
    n_blocks = -(-h // lines_per)
    dt = np.float16 if half else np.float32
    blocks = []
    for b in range(n_blocks):
        y0 = b * lines_per
        ny = min(lines_per, h - y0)
        rows = b""
        for y in range(y0, y0 + ny):
            for ci, cname in enumerate(("B", "G", "R")):
                c = {"R": 0, "G": 1, "B": 2}[cname]
                rows += img[y, :, c].astype(dt).tobytes()
        if compression == 0:
            payload = rows
        else:
            arr = np.frombuffer(rows, np.uint8)
            half_n = (len(arr) + 1) // 2
            inter = np.empty(len(arr), np.uint8)
            inter[:half_n] = arr[0::2]
            inter[half_n:] = arr[1::2]
            d = inter.astype(np.int16)
            d[1:] = (d[1:] - inter[:-1].astype(np.int16)) + 128
            # spec-conformant: the first byte is stored raw
            comp = zlib.compress(d.astype(np.uint8).tobytes())
            payload = comp if len(comp) < len(rows) else rows
        blocks.append(struct.pack("<iI", y0, len(payload)) + payload)
    offs = []
    base = len(hdr) + 8 * n_blocks
    pos = base
    for blk in blocks:
        offs.append(pos)
        pos += len(blk)
    return hdr + struct.pack(f"<{n_blocks}Q", *offs) + b"".join(blocks)


@pytest.mark.parametrize("compression", [0, 2, 3])
@pytest.mark.parametrize("half", [True, False])
def test_exr(tmp_path, compression, half):
    rng = np.random.default_rng(2)
    img = rng.uniform(0.0, 100.0, (21, 17, 3)).astype(np.float32)
    p = tmp_path / "c.exr"
    p.write_bytes(exr_bytes(img, compression, half=half))
    back = H.load_exr(str(p))
    assert back.shape == img.shape
    tol = 0.002 if half else 1e-7
    assert np.allclose(back, img, rtol=tol, atol=0.05 if half else 1e-6)


def _dds_header(w, h, dxgi, cube=False):
    hdr = b"DDS " + struct.pack(
        "<7I", 124, 0x1007, h, w, 0, 0, 1) + b"\0" * 44
    hdr += struct.pack("<2I", 32, 0x4) + b"DX10" + b"\0" * 20
    hdr += struct.pack("<2I", 0x1000, 0x200 | 0xFC00 if cube else 0x1000)
    hdr += b"\0" * 12
    assert len(hdr) == 128
    hdr += struct.pack("<5I", dxgi, 3, 0x4 if cube else 0,
                       6 if cube else 1, 0)
    return hdr


def test_dds_half_float(tmp_path):
    rng = np.random.default_rng(3)
    img = rng.uniform(0.0, 20.0, (8, 16, 4)).astype(np.float16)
    p = tmp_path / "d.dds"
    p.write_bytes(_dds_header(16, 8, H._DXGI_R16G16B16A16F)
                  + img.tobytes())
    back = H.load_dds(str(p))
    assert back.shape == (8, 16, 3)
    assert np.allclose(back, img[..., :3].astype(np.float32))


def test_dds_rgb32f_and_rgb9e5(tmp_path):
    img = np.arange(4 * 4 * 3, dtype=np.float32).reshape(4, 4, 3) / 7.0
    p = tmp_path / "e.dds"
    p.write_bytes(_dds_header(4, 4, H._DXGI_R32G32B32F) + img.tobytes())
    assert np.allclose(H.load_dds(str(p)), img)

    # R9G9B9E5: pack then decode
    m = np.maximum(img.max(axis=2), 1e-9)
    e = np.clip(np.floor(np.log2(m)) + 1, -15, 16).astype(np.int32)
    scale = np.ldexp(np.float32(1.0), 9 - e)
    packed = np.zeros((4, 4), np.uint32)
    for c in range(3):
        v = np.clip(img[..., c] * scale, 0, 511).astype(np.uint32)
        packed |= v << (9 * c)
    packed |= (e + 15).astype(np.uint32) << 27
    p2 = tmp_path / "f.dds"
    p2.write_bytes(_dds_header(4, 4, H._DXGI_R9G9B9E5)
                   + packed.tobytes())
    back = H.load_dds(str(p2))
    assert np.allclose(back, img, rtol=0.01, atol=0.01)


def test_dds_cubemap_resample(tmp_path):
    s = 8
    faces = np.zeros((6, s, s, 4), np.float16)
    for f in range(6):
        faces[f, :, :, :3] = f + 1.0
    p = tmp_path / "cube.dds"
    p.write_bytes(_dds_header(s, s, H._DXGI_R16G16B16A16F, cube=True)
                  + faces.tobytes())
    cube = H.load_dds(str(p))
    assert cube.shape == (6, s, s, 3)
    for f in range(6):
        assert np.allclose(cube[f], f + 1.0)
    pano = H.load_dds(str(p), cubemap="latlong")
    assert pano.shape == (2 * s, 4 * s, 3)
    hh, ww = pano.shape[:2]
    # +Y face (value 3) straight up, -Y (4) straight down
    assert abs(pano[0, ww // 2, 0] - 3.0) < 0.5
    assert abs(pano[hh - 1, ww // 2, 0] - 4.0) < 0.5
    # pano columns follow sample_env_radiance's u = atan2(z,x)/2pi + 0.5:
    # the center column (u=0.5, atan2=0) is +X (value 1)
    assert abs(pano[hh // 2, ww // 2, 0] - 1.0) < 0.5
    # u=0.75 (atan2=+pi/2) is +Z (value 5)
    assert abs(pano[hh // 2, 3 * ww // 4, 0] - 5.0) < 0.5


def test_cubemap_directions_cover_all_faces():
    s = 16
    faces = np.stack([np.full((s, s, 3), f + 1.0, np.float32)
                      for f in range(6)])
    pano = H.cubemap_to_latlong(faces, 32)
    present = {int(round(v)) for v in np.unique(pano)}
    assert present == {1, 2, 3, 4, 5, 6}


def test_load_env_map_dispatch(tmp_path):
    img = np.full((4, 8, 3), 2.5, np.float32)
    p = str(tmp_path / "env.hdr")
    H.save_hdr(p, img)
    back = load_env_map(p)
    assert back.shape == (4, 8, 3)
    assert np.allclose(back, img, rtol=0.05)


def _bc6h_random_blocks(mode, nblk, rng):
    blocks = rng.integers(0, 256, (nblk, 16), dtype=np.uint8)
    keep = 0xFC if mode < 2 else 0xE0
    blocks[:, 0] = (blocks[:, 0] & np.uint8(keep)) | np.uint8(mode)
    return blocks


def _pillow_bc6h(raw, w, h, signed):
    import io

    from PIL import Image

    dxgi = H._DXGI_BC6H_SF16 if signed else H._DXGI_BC6H_UF16
    data = _dds_header(w, h, dxgi) + raw
    return np.asarray(Image.open(io.BytesIO(data)), dtype=np.float32)


def test_bc6h_unsigned_matches_pillow_all_modes():
    """Random blocks in each of the 14 modes must decode texel-for-
    texel like Pillow's independent native BC6H decoder (its 8-bit
    output is clip(v,0,1)*255; one grey step of tolerance covers the
    rounding difference). This pins the bit-layout tables against an
    implementation we did not write."""
    from directcomputeraytracing_tpu.utils.bc6h import _MODES, decode_bc6h

    rng = np.random.default_rng(0)
    for mode in _MODES:
        blocks = _bc6h_random_blocks(mode, 128, rng)
        raw = blocks.tobytes()
        w, h = 4 * 128, 4
        pil = _pillow_bc6h(raw, w, h, signed=False)
        mine = decode_bc6h(np.frombuffer(raw, np.uint8), w, h,
                           signed=False)
        assert np.isfinite(mine).all()
        conv = np.clip(mine, 0.0, 1.0) * 255.0
        err = np.abs(conv - pil)
        assert err.max() <= 1.25, f"mode {mode:05b}: {err.max()}"


def test_bc6h_signed_matches_pillow_no_overflow():
    """SF16 agreement on blocks constrained so base+delta cannot
    overflow (Pillow and the Khronos spec disagree on overflow wrap
    semantics; we follow the spec's modulo-2^EPB arithmetic)."""
    from directcomputeraytracing_tpu.utils.bc6h import (
        _MODES, _PARSED, decode_bc6h,
    )

    rng = np.random.default_rng(1)
    for mode in _MODES:
        ns, wb, db, fields = _PARSED[mode]
        blocks = _bc6h_random_blocks(mode, 128, rng)
        # clear the top 2 bits of every endpoint field: base stays a
        # small positive, deltas stay small positives -> no overflow,
        # no negative endpoints (Pillow clamps negatives to 0 anyway)
        dw = dict(zip("rgb", db if db is not None else (wb, wb, wb)))
        for key, dlo, width, rev, src in fields:
            if key == "d4":
                continue
            nb_ = wb if key[1] == "w" else dw[key[0]]
            for i in range(width):
                dst = (dlo + width - 1 - i) if rev else (dlo + i)
                if dst >= nb_ - 2:
                    bit = src + i
                    blocks[:, bit // 8] &= np.uint8(0xFF ^ (1 << (bit % 8)))
        raw = blocks.tobytes()
        w, h = 4 * 128, 4
        pil = _pillow_bc6h(raw, w, h, signed=True)
        mine = decode_bc6h(np.frombuffer(raw, np.uint8), w, h,
                           signed=True)
        conv = np.clip(mine, 0.0, 1.0) * 255.0
        err = np.abs(conv - pil)
        assert err.max() <= 1.25, f"mode {mode:05b}: {err.max()}"


def test_bc6h_reserved_modes_decode_black():
    from directcomputeraytracing_tpu.utils.bc6h import decode_bc6h

    rng = np.random.default_rng(2)
    for mode in (0b10011, 0b10111, 0b11011, 0b11111):
        blocks = _bc6h_random_blocks(mode, 4, rng)
        out = decode_bc6h(np.frombuffer(blocks.tobytes(), np.uint8),
                          16, 4, signed=False)
        assert (out == 0.0).all()


def test_bc6h_dds_load_and_cubemap(tmp_path):
    """The full load_dds path accepts BC6H (DX10 header), including the
    cubemap -> lat-long resample, and matches Pillow per face."""
    rng = np.random.default_rng(3)
    blocks = _bc6h_random_blocks(0b00011, 2 * 2, rng)
    raw = blocks.tobytes()
    p = tmp_path / "bc6.dds"
    p.write_bytes(_dds_header(8, 8, H._DXGI_BC6H_UF16) + raw)
    img = H.load_dds(str(p))
    assert img.shape == (8, 8, 3) and np.isfinite(img).all()
    pil = _pillow_bc6h(raw, 8, 8, signed=False)
    assert np.abs(np.clip(img, 0, 1) * 255 - pil).max() <= 1.25

    faces = [_bc6h_random_blocks(0b00011, 4, rng).tobytes()
             for _ in range(6)]
    pc = tmp_path / "bc6cube.dds"
    pc.write_bytes(_dds_header(8, 8, H._DXGI_BC6H_UF16, cube=True)
                   + b"".join(faces))
    assert H.load_dds(str(pc)).shape == (6, 8, 8, 3)
    pano = H.load_dds(str(pc), cubemap="latlong")
    assert pano.shape == (16, 32, 3) and np.isfinite(pano).all()
