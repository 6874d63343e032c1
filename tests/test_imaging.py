"""Pure-stdlib image codec tests (gizmosql_spark/imaging.py): exact
round-trips across sizes, every PNG filter type, BMP row padding,
byte-order/format dispatch, and malformed-payload rejection. Property
coverage via hypothesis (random pixel grids)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from gizmosql_spark import imaging as im

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAS_HYP = True
except ImportError:  # pragma: no cover
    _HAS_HYP = False


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("h,w", [(1, 1), (1, 7), (6, 1), (3, 4), (16, 16)])
def test_png_roundtrip(h, w):
    px = _img(h, w, seed=h * 100 + w)
    assert np.array_equal(im.decode_png(im.encode_png(px)), px)


@pytest.mark.parametrize("h,w", [(1, 1), (1, 5), (4, 3), (8, 8), (5, 2)])
def test_bmp_roundtrip_padding(h, w):
    # widths 1,2,3,5 exercise every 4-byte row-padding remainder
    px = _img(h, w, seed=h * 10 + w)
    assert np.array_equal(im.decode_bmp(im.encode_bmp(px)), px)


def test_png_exercises_all_filters():
    """encode_png cycles filter = row % 5; 6 rows covers all five."""
    px = _img(6, 5, seed=3)
    payload = im.encode_png(px)
    # pull the raw filter bytes back out of the IDAT stream
    assert payload[:8] == im.PNG_MAGIC
    pos, idat = 8, bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4: pos + 8]
        if tag == b"IDAT":
            idat.extend(payload[pos + 8: pos + 8 + length])
        pos += 12 + length
    raw = zlib.decompress(bytes(idat))
    stride = 5 * 3
    filters = [raw[y * (stride + 1)] for y in range(6)]
    assert filters == [0, 1, 2, 3, 4, 0]
    assert np.array_equal(im.decode_png(payload), px)


def test_dispatch_and_format():
    px = _img(2, 2)
    assert im.image_format(im.encode_png(px)) == "png"
    assert im.image_format(im.encode_bmp(px)) == "bmp"
    assert im.image_format(b"\xff\xd8\xff") == "unknown"
    assert np.array_equal(im.decode_image(im.encode_bmp(px)), px)


def test_malformed_payloads_rejected():
    with pytest.raises(im.ImageFormatError):
        im.decode_image(b"GIF89a....")
    with pytest.raises(im.ImageFormatError):
        im.decode_png(im.PNG_MAGIC + b"\x00" * 4)  # no IHDR
    with pytest.raises(im.ImageFormatError):
        im.decode_bmp(b"BM" + b"\x00" * 60)  # bpp 0


def test_grayscale_png_decodes():
    """Decoder handles color types the encoder doesn't emit."""
    h, w = 3, 4
    gray = _img(h, w)[:, :, 0]
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw.extend(gray[y].tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    payload = (im.PNG_MAGIC + im._chunk(b"IHDR", ihdr)
               + im._chunk(b"IDAT", zlib.compress(bytes(raw)))
               + im._chunk(b"IEND", b""))
    out = im.decode_png(payload)
    assert out.shape == (h, w, 1)
    assert np.array_equal(out[:, :, 0], gray)


def test_synth_images_match_formula():
    for d in (0, 1, 7, 12, 19):
        px = im.decode_image(im.synth_image(d))
        w, h = im.synth_dims(d)
        assert px.shape == (h, w, 3)
        for y in range(h):
            for x in range(w):
                assert px[y, x, 0] == (7 * d + 3 * x + 5 * y) % 256
                assert px[y, x, 1] == (11 * d + x + 2 * y) % 256
                assert px[y, x, 2] == (13 * d + 4 * x + y) % 256


if _HAS_HYP:

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 10), w=st.integers(1, 10),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_property_roundtrip(h, w, seed):
        px = _img(h, w, seed=seed)
        assert np.array_equal(im.decode_png(im.encode_png(px)), px)
        assert np.array_equal(im.decode_bmp(im.encode_bmp(px)), px)
