"""GIF LZW codec: roundtrip properties (hypothesis-fuzzed), the
adversarial LZW cases (KwKwK, table overflow → CLEAR, width growth),
and honest rejection of truncated / unsupported streams."""

from __future__ import annotations

import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from smart_city_data_pipeline_spark.operators.gif_codec import (
    decode_gif_gray,
    encode_gif_gray,
)


def _roundtrip(a: np.ndarray) -> None:
    buf = encode_gif_gray(a)
    back = decode_gif_gray(buf)
    assert back is not None
    assert back.shape == a.shape
    assert (back == a).all()


def test_gradient_and_constant_roundtrip():
    yy, xx = np.mgrid[0:20, 0:48]
    _roundtrip(((3 * xx + 5 * yy + 7 * 13) % 256).astype(np.uint8))
    _roundtrip(np.full((130, 200), 7, dtype=np.uint8))  # deep runs


def test_kwkwk_pattern_roundtrip():
    """ab ab ab … is the canonical KwKwK trigger (the decoder reads a
    code equal to its own next table slot)."""
    row = np.array([1, 2] * 64, dtype=np.uint8)
    _roundtrip(np.tile(row, (16, 1)))
    row = np.array([5, 5, 6, 5, 5, 6, 5] * 20, dtype=np.uint8)
    _roundtrip(np.tile(row, (9, 1)))


def test_table_overflow_forces_clear_and_width_growth():
    """An image with >4096 distinct strings forces width 9→12 and a
    mid-stream CLEAR; the roundtrip still reproduces every pixel."""
    a = (np.indices((100, 300)).sum(0) ** 2 % 251).astype(np.uint8)
    buf = encode_gif_gray(a)
    assert len(buf) > 4096 // 2  # genuinely compressed, non-trivial
    back = decode_gif_gray(buf)
    assert (back == a).all()


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 30),
    seed=st.integers(0, 2**31 - 1),
)
def test_fuzz_roundtrip(w, h, seed):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
    _roundtrip(a)


def test_rejections():
    a = (np.add.outer(np.arange(12) * 5, np.arange(17) * 3) % 256).astype(
        np.uint8
    )
    buf = encode_gif_gray(a)
    assert decode_gif_gray(b"") is None
    assert decode_gif_gray(b"GIF9") is None
    assert decode_gif_gray(b"NOPE" + buf[4:]) is None
    # mid-header, mid-palette, mid-descriptor, and mid-LZW-data cuts
    # (cutting only the trailer is NOT a failure: EOI already arrived)
    for cut in (5, 12, 30, 500, 800):
        assert cut < len(buf) - 2
        assert decode_gif_gray(buf[:cut]) is None
    # interlaced flag set -> cv2 seam (honest None)
    desc_at = 13 + 768
    assert buf[desc_at] == 0x2C
    interlaced = bytearray(buf)
    interlaced[desc_at + 9] |= 0x40
    assert decode_gif_gray(bytes(interlaced)) is None
    # local-palette flag set -> cv2 seam
    local = bytearray(buf)
    local[desc_at + 9] |= 0x80
    assert decode_gif_gray(bytes(local)) is None


def test_extension_blocks_are_skipped():
    a = np.arange(64, dtype=np.uint8).reshape(8, 8)
    buf = encode_gif_gray(a)
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    comment = b"\x21\xfe\x05hello\x00"
    spliced = buf[:781] + gce + comment + buf[781:]
    assert (decode_gif_gray(spliced) == a).all()


def test_header_fields_are_real():
    a = np.zeros((7, 9), dtype=np.uint8)
    buf = encode_gif_gray(a)
    assert buf[:6] == b"GIF89a"
    w, h = struct.unpack("<HH", buf[6:10])
    assert (w, h) == (9, 7)
    assert buf.endswith(b"\x00\x3b")


# The GIF89a spec-walkthrough sample image (public documentation of the
# format: a 10x10, 4-color GCT, LZW-min-code-2 stream produced by a
# REFERENCE encoder and hand-annotated byte by byte in the widely
# mirrored "What's in a GIF" format walkthrough). A decoder that
# deviated from the spec's width-growth / CLEAR conventions in lockstep
# with our encoder would still round-trip — this fixture breaks the
# lockstep: the bytes were never produced by our encoder. (PIL/cv2 are
# absent in this container, so cross-validation is decode-golden only.)
_GOLDEN_SPEC_GIF = bytes.fromhex(
    "474946383961"  # "GIF89a"
    "0a000a00"      # 10x10 logical screen
    "91"            # GCT present, 2-bit color, 4 entries
    "0000"          # background index, aspect
    "ffffff" "ff0000" "0000ff" "000000"  # GCT: white red blue black
    "21f90400000000" "00"      # graphic control extension
    "2c00000000" "0a000a00" "00"  # image descriptor, no local palette
    "02"            # LZW minimum code size
    "16"            # one 22-byte data sub-block
    "8c2d99872a1cdc33a00275ec95faa8de608c04914c01"
    "00"            # block terminator
    "3b"            # trailer
)

# The documented pixel indices (0=white 1=red 2=blue): red/blue halves
# swapping at row 5, with a 4x4 white block centered on the seam.
_GOLDEN_SPEC_IDX = [
    [1, 1, 1, 1, 1, 2, 2, 2, 2, 2],
    [1, 1, 1, 1, 1, 2, 2, 2, 2, 2],
    [1, 1, 1, 1, 1, 2, 2, 2, 2, 2],
    [1, 1, 1, 0, 0, 0, 0, 2, 2, 2],
    [1, 1, 1, 0, 0, 0, 0, 2, 2, 2],
    [2, 2, 2, 0, 0, 0, 0, 1, 1, 1],
    [2, 2, 2, 0, 0, 0, 0, 1, 1, 1],
    [2, 2, 2, 2, 2, 1, 1, 1, 1, 1],
    [2, 2, 2, 2, 2, 1, 1, 1, 1, 1],
    [2, 2, 2, 2, 2, 1, 1, 1, 1, 1],
]


def test_decode_reference_encoded_golden_bytes():
    """Cross-implementation check: decode a stream we did not encode.
    The decoder returns the palette red channel, so the documented
    index image is projected through the golden GCT's red column
    (white/red -> 255, blue -> 0) before comparing."""
    red = np.array([0xFF, 0xFF, 0x00, 0x00], dtype=np.uint8)
    want = red[np.array(_GOLDEN_SPEC_IDX, dtype=np.uint8)]
    got = decode_gif_gray(_GOLDEN_SPEC_GIF)
    assert got is not None
    assert got.shape == (10, 10)
    assert (got == want).all()
