"""Pure-Python image codecs (BMP + PNG) for multimodal columns.

The reference treats media as opaque blobs; a training-data pipeline
must decode them at scale. No codec library (PIL et al.) exists in
this container, so these are real stdlib-only implementations — not
stubs: 24-bit BMP (BITMAPINFOHEADER, 4-byte row padding, bottom-up)
and 8-bit truecolor PNG (IHDR/IDAT/IEND, zlib, all five scanline
filters: None/Sub/Up/Average/Paeth per the PNG spec §9). numpy does
the per-scanline math; the per-image Python overhead is amortized by
Arrow-batched mapInPandas in operators/multimodal.py.

The encoder exists to fabricate deterministic fixtures (pixel values
are closed-form functions of (doc_id, x, y), so a SQL oracle can
verify decoded statistics without ever seeing an image) and to cycle
through every PNG filter type, which makes the differential check
cover the whole filter decoder.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


class ImageFormatError(ValueError):
    pass


# --- BMP --------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit BMP bytes."""
    h, w, _ = pixels.shape
    row_len = (w * 3 + 3) & ~3
    img = np.zeros((h, row_len), dtype=np.uint8)
    # BMP stores BGR, bottom-up
    img[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    data = img.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """24/32-bit uncompressed BMP -> (h, w, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ImageFormatError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    if hdr_size < 40:
        raise ImageFormatError(f"unsupported BMP header size {hdr_size}")
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if compression != 0 or bpp not in (24, 32):
        raise ImageFormatError(
            f"unsupported BMP (bpp={bpp}, compression={compression})")
    flipped = h > 0
    h = abs(h)
    nchan = bpp // 8
    row_len = (w * nchan + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_len * h, offset=offset
    ).reshape(h, row_len)
    img = rows[:, : w * nchan].reshape(h, w, nchan)
    if flipped:
        img = img[::-1]
    return img[:, :, 2::-1].copy()  # BGR(A) -> RGB


# --- PNG --------------------------------------------------------------


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + tag + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    pa = np.abs(b.astype(np.int16) - c)
    pb = np.abs(a.astype(np.int16) - c)
    pc = np.abs(a.astype(np.int16) + b - 2 * c.astype(np.int16))
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> truecolor PNG; the filter type cycles
    row % 5 so decoders must implement the full filter set."""
    h, w, _ = pixels.shape
    bpp = 3
    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.uint8)
    for y in range(h):
        row = pixels[y].reshape(-1)
        ftype = y % 5
        left = np.concatenate([np.zeros(bpp, np.uint8), row[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.uint8), prev[:-bpp]])
        if ftype == 0:
            enc = row
        elif ftype == 1:  # Sub
            enc = (row.astype(np.int16) - left) % 256
        elif ftype == 2:  # Up
            enc = (row.astype(np.int16) - prev) % 256
        elif ftype == 3:  # Average
            enc = (row.astype(np.int16)
                   - ((left.astype(np.int16) + prev) // 2)) % 256
        else:  # Paeth
            enc = (row.astype(np.int16) - _paeth(left, prev, upleft)) % 256
        raw.append(ftype)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (PNG_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """8-bit grayscale/RGB/RGBA PNG -> (h, w, c) uint8 (alpha kept)."""
    if payload[:8] != PNG_MAGIC:
        raise ImageFormatError("not a PNG payload")
    pos = 8
    w = h = None
    bitdepth = colortype = interlace = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4: pos + 8]
        body = payload[pos + 8: pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bitdepth, colortype, _, _, interlace = struct.unpack(
                ">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if w is None:
        raise ImageFormatError("PNG missing IHDR")
    if bitdepth != 8 or interlace != 0:
        raise ImageFormatError(
            f"unsupported PNG (bitdepth={bitdepth}, interlace={interlace})")
    nchan = {0: 1, 2: 3, 4: 2, 6: 4}.get(colortype)
    if nchan is None:
        raise ImageFormatError(f"unsupported PNG color type {colortype}")
    raw = zlib.decompress(bytes(idat))
    stride = w * nchan
    if len(raw) != h * (stride + 1):
        raise ImageFormatError("PNG data length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1)
        if ftype == 0:
            rec = line.copy()
        elif ftype == 2:  # Up
            rec = (line.astype(np.int16) + prev) % 256
            rec = rec.astype(np.uint8)
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left scan
            rec = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                left = int(rec[i - nchan]) if i >= nchan else 0
                up = int(prev[i])
                upleft = int(prev[i - nchan]) if i >= nchan else 0
                if ftype == 1:
                    rec[i] = (int(line[i]) + left) % 256
                elif ftype == 3:
                    rec[i] = (int(line[i]) + (left + up) // 2) % 256
                else:
                    pa = abs(up - upleft)
                    pb = abs(left - upleft)
                    pc = abs(left + up - 2 * upleft)
                    pred = (left if pa <= pb and pa <= pc
                            else up if pb <= pc else upleft)
                    rec[i] = (int(line[i]) + pred) % 256
        else:
            raise ImageFormatError(f"unknown PNG filter {ftype}")
        out[y] = rec
        prev = rec
    return out.reshape(h, w, nchan)


# --- dispatch ---------------------------------------------------------


def decode_image(payload: bytes) -> np.ndarray:
    """Magic-byte dispatch -> (h, w, c) uint8 pixels."""
    if payload[:8] == PNG_MAGIC:
        return decode_png(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise ImageFormatError("unrecognized image payload")


def image_format(payload: bytes) -> str:
    if payload[:8] == PNG_MAGIC:
        return "png"
    if payload[:2] == b"BM":
        return "bmp"
    return "unknown"


# --- deterministic fixtures ------------------------------------------
#
# Pixel (x, y) of the image for integer seed d:
#   R = (7 d + 3 x + 5 y) % 256
#   G = (11 d + x + 2 y) % 256
#   B = (13 d + 4 x + y) % 256
# with w = 4 + d % 5, h = 3 + d % 4; even seeds encode PNG, odd BMP.
# A SQL oracle reproduces any statistic of these pixels in closed
# form, so decode correctness is differentially checkable.


def synth_dims(d: int) -> tuple[int, int]:
    return 4 + d % 5, 3 + d % 4


def synth_pixels(d: int) -> np.ndarray:
    w, h = synth_dims(d)
    y, x = np.mgrid[0:h, 0:w]
    r = (7 * d + 3 * x + 5 * y) % 256
    g = (11 * d + x + 2 * y) % 256
    b = (13 * d + 4 * x + y) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def synth_image(d: int) -> bytes:
    px = synth_pixels(d)
    return encode_png(px) if d % 2 == 0 else encode_bmp(px)
