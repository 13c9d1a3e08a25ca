"""Minimal pure-Python PNG codec (stdlib zlib only) + nearest-neighbor
resample — the in-container decoder behind operators/multimodal.resize.

Support envelope (explicit, checked): 8-bit depth, color types 0
(grayscale), 2 (RGB), 6 (RGBA), no interlace. That covers everything the
engine's synthetic media generator emits and the common PNG baseline;
anything else raises ``UnsupportedImage`` with the reason. Decode
handles ALL five scanline filters (real-world encoders use them);
encode emits filter 0 (None) — simplicity over ratio, zlib still
deflates it.

Everything here is per-payload Python executed INSIDE an Arrow batch
loop (mapInPandas) — no Spark imports, no row-at-a-time Py4J. numpy is
used for the resample index math only.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}  # color type -> samples per pixel


class UnsupportedImage(ValueError):
    """Payload is not a PNG this codec supports."""


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: bytes, width: int, height: int, channels: int = 3) -> bytes:
    """Encode raw row-major samples (``width*height*channels`` bytes,
    8-bit) as a PNG. channels: 1=gray, 3=RGB, 4=RGBA."""
    color_type = {1: 0, 3: 2, 4: 6}.get(channels)
    if color_type is None:
        raise UnsupportedImage(f"channels must be 1/3/4, got {channels}")
    if len(pixels) != width * height * channels:
        raise UnsupportedImage(
            f"pixel buffer is {len(pixels)} bytes, expected "
            f"{width * height * channels}"
        )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * channels
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter type None
        raw += pixels[y * stride : (y + 1) * stride]
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: bytes, width: int, height: int, channels: int) -> bytearray:
    """Reverse PNG scanline filtering (types 0-4) -> raw samples."""
    stride = width * channels
    bpp = channels  # bytes per pixel at bit depth 8
    out = bytearray(height * stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        prev_off = (y - 1) * stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            if y > 0:
                for i in range(stride):
                    line[i] = (line[i] + out[prev_off + i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                up = out[prev_off + i] if y > 0 else 0
                line[i] = (line[i] + (left + up) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = out[prev_off + i] if y > 0 else 0
                c = out[prev_off + i - bpp] if (y > 0 and i >= bpp) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise UnsupportedImage(f"unknown scanline filter {ftype}")
        out[y * stride : (y + 1) * stride] = line
    return out


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG -> (width, height, channels, raw row-major samples).

    Raises UnsupportedImage for non-PNG payloads or features outside the
    support envelope (bit depth != 8, palette, interlace).
    """
    if data[:8] != _SIGNATURE:
        raise UnsupportedImage("not a PNG (bad signature)")
    pos = 8
    width = height = channels = -1
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise UnsupportedImage(f"bit depth {depth} (only 8)")
            if ctype not in _CHANNELS:
                raise UnsupportedImage(f"color type {ctype} (only 0/2/6)")
            if interlace != 0:
                raise UnsupportedImage("interlaced PNG not supported")
            channels = _CHANNELS[ctype]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width < 0 or not idat:
        raise UnsupportedImage("missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    expected = height * (width * channels + 1)
    if len(raw) != expected:
        raise UnsupportedImage(
            f"decompressed {len(raw)} bytes, expected {expected}"
        )
    return width, height, channels, bytes(_unfilter(raw, width, height, channels))


def resize_nearest(
    pixels: bytes,
    width: int,
    height: int,
    channels: int,
    new_width: int,
    new_height: int,
) -> bytes:
    """Nearest-neighbor resample (deterministic integer index math:
    src = floor(dst * size / new_size), the classic scale map)."""
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    ys = (np.arange(new_height) * height) // new_height
    xs = (np.arange(new_width) * width) // new_width
    return arr[ys][:, xs].tobytes()


def resize_png(data: bytes, new_width: int, new_height: int) -> bytes:
    """Decode -> nearest-neighbor resize -> re-encode. The per-payload
    kernel behind operators/multimodal.resize_images."""
    if new_width < 1 or new_height < 1:
        raise UnsupportedImage("target dimensions must be >= 1")
    width, height, channels, pixels = decode_png(data)
    out = resize_nearest(pixels, width, height, channels, new_width, new_height)
    return encode_png(out, new_width, new_height, channels)
