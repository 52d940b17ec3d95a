"""Pure-stdlib image codecs (PNG + BMP) for the X4 multimodal path.

The reference treats media as opaque per-item payloads flowing through
WASM lenses; here the decode step runs inside Arrow-batched Python
workers (see operators/multimodal.py). This container ships no image
libraries, so the real decode path is implemented against the public
file-format specs with nothing but ``zlib`` + ``struct``:

- PNG (RFC 2083): 8-bit greyscale / RGB / greyscale+alpha / RGBA,
  non-interlaced, all five scanline filters. Encoder emits filter-0
  rows (valid everywhere, cheapest to write).
- BMP (Windows BITMAPINFOHEADER): 24-bit uncompressed BI_RGB,
  bottom-up or top-down.

If Pillow is importable it is preferred (``decode_image_auto`` probes
for it once) — the pure decoders are the fallback, not a replacement.

A decoded image is a plain dict: ``{"width", "height", "mode",
"channels", "pixels"}`` with ``pixels`` = row-major top-down bytes,
``channels`` interleaved — the same layout Pillow's ``tobytes()``
produces for the matching mode.
"""

from __future__ import annotations

import struct
import zlib
from typing import Any

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_COLOR_TYPE_TO_MODE = {0: "L", 2: "RGB", 4: "LA", 6: "RGBA"}
_MODE_TO_COLOR_TYPE = {m: c for c, m in _COLOR_TYPE_TO_MODE.items()}
_MODE_CHANNELS = {"L": 1, "LA": 2, "RGB": 3, "RGBA": 4}


class ImageFormatError(ValueError):
    """Payload is not a decodable image in a supported format."""


# --- PNG ------------------------------------------------------------------

def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> dict[str, Any]:
    if not data.startswith(PNG_SIGNATURE):
        raise ImageFormatError("not a PNG payload (bad signature)")
    pos, width = len(PNG_SIGNATURE), None
    idat = bytearray()
    height = bit_depth = color_type = interlace = None
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            if len(chunk) < 13:
                raise ImageFormatError("PNG: truncated IHDR chunk")
            width, height, bit_depth, color_type, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", chunk[:13])
        elif ctype == b"IDAT":
            idat.extend(chunk)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ImageFormatError("PNG: missing IHDR")
    if bit_depth != 8:
        raise ImageFormatError(f"PNG: unsupported bit depth {bit_depth} (only 8)")
    if color_type not in _COLOR_TYPE_TO_MODE:
        raise ImageFormatError(
            f"PNG: unsupported color type {color_type} (palette images not supported)")
    if interlace != 0:
        raise ImageFormatError("PNG: interlaced images not supported")
    mode = _COLOR_TYPE_TO_MODE[color_type]
    ch = _MODE_CHANNELS[mode]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        # keep the documented contract: malformed-but-header-valid
        # payloads still raise ImageFormatError, never a bare zlib.error
        raise ImageFormatError(f"PNG: corrupt IDAT stream ({exc})") from exc
    stride = width * ch
    if len(raw) != (stride + 1) * height:
        raise ImageFormatError("PNG: IDAT size does not match dimensions")
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        row = bytearray(raw[row_start + 1:row_start + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                row[i] = (row[i] + row[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - ch] if i >= ch else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = row[i - ch] if i >= ch else 0
                upleft = prev[i - ch] if i >= ch else 0
                row[i] = (row[i] + _paeth(left, prev[i], upleft)) & 0xFF
        elif ftype != 0:
            raise ImageFormatError(f"PNG: unknown filter type {ftype}")
        out[y * stride:(y + 1) * stride] = row
        prev = row
    return {"width": width, "height": height, "mode": mode,
            "channels": ch, "pixels": bytes(out)}


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF))


def encode_png(width: int, height: int, mode: str, pixels: bytes) -> bytes:
    if mode not in _MODE_TO_COLOR_TYPE:
        raise ImageFormatError(f"PNG encode: unsupported mode {mode!r}")
    ch = _MODE_CHANNELS[mode]
    stride = width * ch
    if len(pixels) != stride * height:
        raise ImageFormatError("PNG encode: pixel buffer does not match dimensions")
    ihdr = struct.pack(">IIBBBBB", width, height, 8,
                       _MODE_TO_COLOR_TYPE[mode], 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[y * stride:(y + 1) * stride]
                   for y in range(height))
    return (PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 6)) + _chunk(b"IEND", b""))


# --- BMP ------------------------------------------------------------------

def decode_bmp(data: bytes) -> dict[str, Any]:
    if len(data) < 54 or data[:2] != b"BM":
        raise ImageFormatError("not a BMP payload")
    (pixel_offset,) = struct.unpack("<I", data[10:14])
    width, height = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if bpp != 24 or compression != 0:
        raise ImageFormatError(
            f"BMP: only 24-bit uncompressed supported (bpp={bpp}, comp={compression})")
    bottom_up = height > 0
    height = abs(height)
    if width < 0:
        raise ImageFormatError("BMP: negative width")
    row_size = (width * 3 + 3) & ~3  # rows padded to 4 bytes
    if len(data) < pixel_offset + row_size * height:
        # truncated pixel array: fail the documented contract up front
        # instead of a bare ValueError from the per-pixel unpack below
        raise ImageFormatError(
            "BMP: payload shorter than the declared pixel array "
            f"(need {pixel_offset + row_size * height} bytes, have {len(data)})")
    out = bytearray(width * height * 3)
    for y in range(height):
        src_y = (height - 1 - y) if bottom_up else y
        row = data[pixel_offset + src_y * row_size:
                   pixel_offset + src_y * row_size + width * 3]
        for x in range(width):
            b, g, r = row[3 * x:3 * x + 3]
            i = (y * width + x) * 3
            out[i:i + 3] = bytes((r, g, b))
    return {"width": width, "height": height, "mode": "RGB",
            "channels": 3, "pixels": bytes(out)}


# --- resize + dispatch ----------------------------------------------------

def resize_nearest(img: dict[str, Any], new_w: int, new_h: int) -> dict[str, Any]:
    """Nearest-neighbor resample (deterministic, lib-free)."""
    w, h, ch = img["width"], img["height"], img["channels"]
    src = img["pixels"]
    out = bytearray(new_w * new_h * ch)
    for y in range(new_h):
        sy = min(y * h // new_h, h - 1)
        for x in range(new_w):
            sx = min(x * w // new_w, w - 1)
            si = (sy * w + sx) * ch
            di = (y * new_w + x) * ch
            out[di:di + ch] = src[si:si + ch]
    return {"width": new_w, "height": new_h, "mode": img["mode"],
            "channels": ch, "pixels": bytes(out)}


def _try_pillow(data: bytes) -> dict[str, Any] | None:
    try:
        import io

        from PIL import Image  # type: ignore
    except ImportError:
        return None
    try:
        img = Image.open(io.BytesIO(data))
        if img.mode not in _MODE_CHANNELS:
            img = img.convert("RGB")
        return {"width": img.width, "height": img.height, "mode": img.mode,
                "channels": _MODE_CHANNELS[img.mode], "pixels": img.tobytes()}
    except Exception:
        # Pillow couldn't identify/decode it — fall through to the pure
        # decoders, whose errors honor the ImageFormatError contract.
        return None


def decode_image_auto(data: bytes) -> dict[str, Any]:
    """Decode by magic bytes: Pillow when importable, else the pure
    PNG/BMP decoders. Raises ImageFormatError for anything else."""
    data = data or b""
    via_pillow = _try_pillow(data)
    if via_pillow is not None:
        return via_pillow
    if data.startswith(PNG_SIGNATURE):
        return decode_png(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    raise ImageFormatError(
        "unsupported image payload (expected PNG or BMP; install Pillow "
        "for other formats)")


def split_png_stream(data: bytes) -> list[bytes]:
    """Split a concatenated-PNG byte stream into individual frames — the
    lib-free 'video container' used by sample_frames' real path."""
    frames, start = [], data.find(PNG_SIGNATURE)
    while start != -1:
        nxt = data.find(PNG_SIGNATURE, start + len(PNG_SIGNATURE))
        frames.append(data[start:nxt] if nxt != -1 else data[start:])
        start = nxt
    return frames
