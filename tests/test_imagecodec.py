"""Pure codec tests (no Spark): PNG encode/decode incl. all five
scanline filters, BMP decode, nearest-neighbor resize, PNG-stream
splitting. These run against hand-built byte fixtures so the decoders
are checked against the file-format specs, not against themselves.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from lens_spark.functions.imagecodec import (
    ImageFormatError,
    PNG_SIGNATURE,
    decode_bmp,
    decode_image_auto,
    decode_png,
    encode_png,
    resize_nearest,
    split_png_stream,
)


def _pixels(w: int, h: int, ch: int, seed: int = 0) -> bytes:
    return bytes((seed + i * 7) % 256 for i in range(w * h * ch))


@pytest.mark.parametrize("mode,ch", [("L", 1), ("LA", 2), ("RGB", 3), ("RGBA", 4)])
def test_png_roundtrip_all_modes(mode, ch):
    w, h = 5, 3
    px = _pixels(w, h, ch, seed=9)
    img = decode_png(encode_png(w, h, mode, px))
    assert (img["width"], img["height"], img["mode"]) == (w, h, mode)
    assert img["pixels"] == px


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF))


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def test_png_decode_all_filter_types():
    """Forward-filter a known image with each filter type per row and
    check the decoder reconstructs the original pixels (spec parity,
    not encoder/decoder self-consistency)."""
    w, h, ch = 4, 5, 3
    px = _pixels(w, h, ch, seed=3)
    stride = w * ch
    rows = [px[y * stride:(y + 1) * stride] for y in range(h)]
    filtered = bytearray()
    prev = bytes(stride)
    for y, row in enumerate(rows):
        ftype = y % 5  # 0,1,2,3,4
        filtered.append(ftype)
        for i in range(stride):
            left = row[i - ch] if i >= ch else 0
            up = prev[i]
            upleft = prev[i - ch] if i >= ch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) >> 1
            else:
                pred = _paeth(left, up, upleft)
            filtered.append((row[i] - pred) & 0xFF)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(filtered)))
            + _chunk(b"IEND", b""))
    img = decode_png(data)
    assert img["pixels"] == px


def _bmp_24(w: int, h: int, rgb_rows: list[list[tuple]]) -> bytes:
    """Build a bottom-up 24-bit BI_RGB BMP from top-down RGB rows."""
    row_size = (w * 3 + 3) & ~3
    body = bytearray()
    for y in reversed(range(h)):  # bottom-up storage
        row = bytearray()
        for (r, g, b) in rgb_rows[y]:
            row += bytes((b, g, r))  # BGR on disk
        row += bytes(row_size - len(row))
        body += row
    pixel_offset = 14 + 40
    header = (b"BM" + struct.pack("<IHHI", pixel_offset + len(body), 0, 0, pixel_offset)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                            2835, 2835, 0, 0))
    return bytes(header + body)


def test_bmp_decode_bottom_up_bgr_padding():
    rows = [[(255, 0, 0), (0, 255, 0), (0, 0, 255)],
            [(10, 20, 30), (40, 50, 60), (70, 80, 90)]]
    img = decode_bmp(_bmp_24(3, 2, rows))
    assert (img["width"], img["height"], img["mode"]) == (3, 2, "RGB")
    got = [tuple(img["pixels"][i:i + 3]) for i in range(0, len(img["pixels"]), 3)]
    assert got == rows[0] + rows[1]  # top-down RGB out


def test_resize_nearest_downsample_exact():
    # 4x4 single-channel: checkerboard of 2x2 blocks → 2x2 keeps the
    # top-left sample of each block
    px = bytes([1, 1, 2, 2,
                1, 1, 2, 2,
                3, 3, 4, 4,
                3, 3, 4, 4])
    img = {"width": 4, "height": 4, "mode": "L", "channels": 1, "pixels": px}
    out = resize_nearest(img, 2, 2)
    assert out["pixels"] == bytes([1, 2, 3, 4])
    up = resize_nearest(out, 4, 4)
    assert up["pixels"] == px  # nearest upsample restores the blocks


def test_auto_dispatch_and_errors():
    png = encode_png(2, 2, "RGB", _pixels(2, 2, 3))
    assert decode_image_auto(png)["mode"] == "RGB"
    bmp = _bmp_24(1, 1, [[(9, 8, 7)]])
    assert decode_image_auto(bmp)["pixels"] == bytes((9, 8, 7))
    with pytest.raises(ImageFormatError):
        decode_image_auto(b"not an image")
    with pytest.raises(ImageFormatError):
        decode_image_auto(b"")


def test_malformed_but_header_valid_payloads_keep_error_contract():
    """Truncated/corrupt payloads with valid magic+header must raise
    ImageFormatError — not bare ValueError/zlib.error (advisory fix)."""
    # corrupt PNG IDAT: valid signature + IHDR, garbage compressed data
    png = encode_png(2, 2, "RGB", _pixels(2, 2, 3))
    idat_at = png.find(b"IDAT") - 4
    (idat_len,) = struct.unpack(">I", png[idat_at:idat_at + 4])
    corrupt = (png[:idat_at + 8]
               + b"\xff" * idat_len + png[idat_at + 8 + idat_len:])
    with pytest.raises(ImageFormatError, match="corrupt IDAT"):
        decode_png(corrupt)
    # truncated PNG IHDR chunk
    with pytest.raises(ImageFormatError, match="truncated IHDR"):
        decode_png(PNG_SIGNATURE + struct.pack(">I", 4) + b"IHDR"
                   + b"\x00" * 8)
    # truncated BMP: header declares more pixel data than present
    bmp = _bmp_24(4, 4, [[(1, 2, 3)] * 4] * 4)
    with pytest.raises(ImageFormatError, match="shorter than the declared"):
        decode_bmp(bmp[:60])


def test_split_png_stream():
    frames = [encode_png(2, 2, "L", _pixels(2, 2, 1, seed=s)) for s in range(3)]
    stream = b"junk-prefix" + b"".join(frames)
    assert split_png_stream(stream) == frames
    assert split_png_stream(b"") == []
