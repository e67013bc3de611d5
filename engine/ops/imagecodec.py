"""Dependency-free raster codecs: 24-bit BMP, 8-bit PNG (stdlib zlib),
and baseline JPEG (jpegcodec.py).

The reference's decode responsibility is real rasters
(/root/reference/crates/server/src/generation.rs:276-305 decodes base64
payloads into ``image::DynamicImage``); this container ships no PIL /
ffmpeg, so these formats — one trivially uncompressed (BMP), one
DEFLATE-compressed with the full scanline-filter set (PNG), one
DCT+Huffman entropy-coded (JPEG) — give the multimodal operators
genuine pixel decode without any dependency.

Scope (deliberate): BMP = BITMAPINFOHEADER, 24 bpp, BI_RGB, bottom-up or
top-down; PNG = bit depth 8, color type 0 (gray) or 2 (RGB), no
interlace, filters 0-4 on decode (encode writes filter 0); JPEG =
baseline/extended sequential Huffman (see jpegcodec.py). Anything
else raises ValueError — loud, never a wrong image.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# module-level import, never lazy: decode_image runs inside worker UDFs,
# where a runtime relative import fails under serialize-by-value.
# encode_jpeg is re-exported for fixture generators (multimodal.py).
from .jpegcodec import decode_jpeg, encode_jpeg  # noqa: F401

BMP_MAGIC = b"BM"
PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
JPEG_MAGIC = b"\xff\xd8\xff"


def sniff_format(data: bytes):
    """'bmp' | 'png' | 'jpeg' | None by magic bytes."""
    if data[:2] == BMP_MAGIC:
        return "bmp"
    if data[:8] == PNG_MAGIC:
        return "png"
    if data[:3] == JPEG_MAGIC:
        return "jpeg"
    return None


def to_gray(rgb: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 -> (h, w) float64 ITU-R 601 luma (PIL's 'L' weights)."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    return (299 * r + 587 * g + 114 * b) / 1000.0


# ---------------------------------------------------------------------------
# BMP (24-bit BI_RGB)
# ---------------------------------------------------------------------------

def encode_bmp(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit bottom-up BMP bytes."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("encode_bmp wants (h, w, 3) uint8")
    h, w = rgb.shape[:2]
    row_len = (w * 3 + 3) & ~3  # 4-byte padded
    rows = np.zeros((h, row_len), dtype=np.uint8)
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pix = rows.tobytes()
    header = struct.pack(
        "<2sIHHI", BMP_MAGIC, 54 + len(pix), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix),
                    2835, 2835, 0, 0)
    return header + pix


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes -> (h, w, 3) uint8 RGB."""
    if data[:2] != BMP_MAGIC:
        raise ValueError("not a BMP (missing 'BM' magic)")
    (offset,) = struct.unpack_from("<I", data, 10)
    (hdr_size, w, h, _planes, bpp, compression) = struct.unpack_from(
        "<IiiHHI", data, 14
    )
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP (hdr={hdr_size}, bpp={bpp}, comp={compression})"
        )
    top_down = h < 0
    h = abs(h)
    row_len = (w * 3 + 3) & ~3
    need = offset + row_len * h
    if len(data) < need:
        raise ValueError("truncated BMP pixel array")
    rows = np.frombuffer(data, dtype=np.uint8, count=row_len * h,
                         offset=offset).reshape(h, row_len)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return np.ascontiguousarray(rgb if top_down else rgb[::-1])


# ---------------------------------------------------------------------------
# PNG (bit depth 8, gray / RGB, filters 0-4)
# ---------------------------------------------------------------------------

def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + tag + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """(h, w, 3) RGB or (h, w) gray uint8 -> PNG bytes (filter 0 rows)."""
    if img.dtype != np.uint8:
        raise ValueError("encode_png wants uint8")
    if img.ndim == 2:
        color_type, ch = 0, 1
        flat = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, ch = 2, 3
        flat = img
    else:
        raise ValueError("encode_png wants (h, w) or (h, w, 3)")
    h, w = img.shape[:2]
    raw = np.zeros((h, 1 + w * ch), dtype=np.uint8)
    raw[:, 1:] = flat.reshape(h, w * ch)  # filter byte 0 per scanline
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters; raw is h rows of (1 + stride) bytes."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int64)
        if ftype == 0:
            rec = line
        elif ftype == 1:  # Sub: per-lane prefix sum mod 256
            rec = line.reshape(-1, bpp).cumsum(axis=0).reshape(-1) % 256
        elif ftype == 2:  # Up
            rec = (line + prev) % 256
        elif ftype == 3:  # Average (sequential left dependency)
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (line[x] + (left + int(prev[x])) // 2) % 256
        elif ftype == 4:  # Paeth (sequential left dependency)
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                rec[x] = (line[x] + _paeth(a, b, c)) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        prev = rec.astype(np.uint8)
        out[y] = prev
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8 RGB ((h, w) gray promotes to RGB)."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in (0, 2) or comp or filt or interlace:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color={color_type}, "
            f"interlace={interlace})"
        )
    ch = 3 if color_type == 2 else 1
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if raw.size != h * (1 + stride):
        raise ValueError("PNG scanline payload size mismatch")
    px = _unfilter(raw.reshape(h, 1 + stride), h, stride, ch)
    if ch == 1:
        return np.ascontiguousarray(
            np.repeat(px.reshape(h, w, 1), 3, axis=2)
        )
    return np.ascontiguousarray(px.reshape(h, w, 3))


def decode_image(data: bytes) -> np.ndarray:
    """Sniff + decode any supported format -> (h, w, 3) uint8 RGB."""
    fmt = sniff_format(data)
    if fmt == "bmp":
        return decode_bmp(data)
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        return decode_jpeg(data)
    raise ValueError("unknown image format (not BMP/PNG/JPEG)")


def resize_nearest(rgb: np.ndarray, nw: int, nh: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample to (nh, nw, 3)."""
    h, w = rgb.shape[:2]
    ys = (np.arange(nh) * h) // nh
    xs = (np.arange(nw) * w) // nw
    return np.ascontiguousarray(rgb[ys][:, xs])
