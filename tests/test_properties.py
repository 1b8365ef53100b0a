"""Property-based tests (hypothesis) for the pure-Python seams.

These cover the code that parses UNTRUSTED bytes or feeds literals
into plans — the places where a single malformed input must never
crash a 1000-executor job: the BMP codec, the centroid normalizer,
and the deterministic hyperplane generator.
"""

from __future__ import annotations

import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from smart_city_data_pipeline_spark.operators.multimodal import (
    decode_bmp_gray,
    decode_png,
    encode_bmp_gray,
    encode_png,
)
from smart_city_data_pipeline_spark.operators.similarity import KMEANS_SCALE


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_bmp_roundtrip_any_shape(h, w, seed):
    """decode(encode(img)) is bit-exact for EVERY shape, including the
    row-padding cases (width not a multiple of 4)."""
    img = np.random.default_rng(seed).integers(0, 256, size=(h, w), dtype=np.uint8)
    back = decode_bmp_gray(encode_bmp_gray(img))
    assert back is not None and back.shape == (h, w) and (back == img).all()


@settings(max_examples=120, deadline=None)
@given(buf=st.binary(min_size=0, max_size=300))
def test_bmp_decoder_never_raises_on_garbage(buf):
    """Arbitrary bytes must yield None or an array — never an
    exception (a crash-truncated payload in the lake must not kill the
    decode stage)."""
    out = decode_bmp_gray(buf)
    assert out is None or isinstance(out, np.ndarray)


@settings(max_examples=120, deadline=None)
@given(tail=st.binary(min_size=0, max_size=300))
def test_bmp_decoder_never_raises_on_bm_prefixed_garbage(tail):
    """Same, for bytes that PASS the magic check — header fields are
    attacker-controlled (sizes, offsets, bpp) and must be bounds-checked."""
    out = decode_bmp_gray(b"BM" + tail)
    assert out is None or isinstance(out, np.ndarray)


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    base_filter=st.integers(min_value=0, max_value=4),
)
def test_png_roundtrip_any_shape_any_filter(h, w, seed, base_filter):
    """decode(encode(img)) is bit-exact for EVERY shape and EVERY
    scanline filter type (rotating from an arbitrary base so all five
    unfilter paths — None/Sub/Up/Average/Paeth — are exercised)."""
    img = np.random.default_rng(seed).integers(0, 256, size=(h, w), dtype=np.uint8)
    filters = [(base_filter + y) % 5 for y in range(h)]
    back = decode_png(encode_png(img, row_filters=filters))
    assert back is not None and back.shape == (h, w) and (back == img).all()


@settings(max_examples=30, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    base_filter=st.integers(min_value=0, max_value=4),
)
def test_png_rgb_roundtrip(seed, base_filter):
    """RGB (color type 2) round-trips to the per-pixel channel mean —
    the same grayscale reduction the 24-bit BMP path uses."""
    img = np.random.default_rng(seed).integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    filters = [(base_filter + y) % 5 for y in range(5)]
    back = decode_png(encode_png(img, row_filters=filters))
    want = img.mean(axis=2).astype(np.uint8)
    assert back is not None and (back == want).all()


@settings(max_examples=120, deadline=None)
@given(buf=st.binary(min_size=0, max_size=300))
def test_png_decoder_never_raises_on_garbage(buf):
    out = decode_png(buf)
    assert out is None or isinstance(out, np.ndarray)


@settings(max_examples=120, deadline=None)
@given(tail=st.binary(min_size=0, max_size=300))
def test_png_decoder_never_raises_on_sig_prefixed_garbage(tail):
    """Bytes that PASS the magic check: chunk lengths, CRCs, IHDR
    fields, and the zlib stream are all untrusted and bounds-checked."""
    out = decode_png(b"\x89PNG\r\n\x1a\n" + tail)
    assert out is None or isinstance(out, np.ndarray)


@settings(max_examples=60, deadline=None)
@given(tail=st.binary(min_size=0, max_size=200), cut=st.integers(min_value=8, max_value=120))
def test_png_decoder_never_raises_on_truncated_real_png(tail, cut):
    """A REAL encoded PNG truncated mid-stream (the crash-torn-write
    case) plus arbitrary appended bytes must never raise."""
    img = np.arange(48, dtype=np.uint8).reshape(6, 8)
    real = encode_png(img, row_filters=[y % 5 for y in range(6)])
    out = decode_png(real[: min(cut, len(real))] + tail)
    assert out is None or isinstance(out, np.ndarray)


def test_bmp_24bpp_decode_path():
    """A hand-built 24-bit uncompressed BMP decodes to the per-pixel
    channel mean (the grayscale reduction the feature extractor uses)."""
    w, h = 3, 2
    px = np.arange(w * h * 3, dtype=np.uint8).reshape(h, w, 3)
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1].reshape(h, w * 3)
    pixels = rows.tobytes()
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + len(pixels), 0, 0, offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    out = decode_bmp_gray(header + info + pixels)
    assert out is not None and out.shape == (h, w)
    want = px.mean(axis=2).astype(np.uint8)
    assert (out == want).all()


@settings(max_examples=80, deadline=None)
@given(
    vec=st.lists(
        st.floats(min_value=-100.0, max_value=100.0, allow_nan=False),
        min_size=1,
        max_size=64,
    )
)
def test_kmeans_grid_quantization_properties(vec):
    """The 2^16 integer-grid quantization the learned quantizer trains
    on (python twin of _qvec's floor(x·scale + 0.5)): integer-valued,
    within half a grid step of the input, and exactly representable as
    a double for any realistic embedding magnitude."""
    import math

    q = [float(math.floor(x * KMEANS_SCALE + 0.5)) for x in vec]
    assert all(v.is_integer() for v in q)
    assert all(abs(v / KMEANS_SCALE - x) <= 0.5 / KMEANS_SCALE + 1e-12
               for v, x in zip(q, vec))
    assert all(abs(v) < 2**53 for v in q)


def test_srp_hyperplanes_deterministic():
    from smart_city_data_pipeline_spark.operators.dedup import _srp_hyperplanes

    a = _srp_hyperplanes(4, 8)
    b = _srp_hyperplanes(4, 8)
    assert a == b
    assert all(-1000.0 <= x <= 1000.0 for row in a for x in row)


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=33),
    w=st.integers(min_value=1, max_value=33),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_roundtrip_never_crashes_and_bounds_error(h, w, seed):
    """Baseline JPEG: any shape encodes to a decodable stream of the
    right shape; per-pixel error is bounded by the worst-case
    dequantization envelope (Σq/2 per block is loose; 200 is far above
    any legal reconstruction error, so a codec bug still fails)."""
    from smart_city_data_pipeline_spark.operators.jpeg_codec import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    img = np.random.default_rng(seed).integers(0, 256, size=(h, w), dtype=np.uint8)
    back = decode_jpeg_gray(encode_jpeg_gray(img))
    assert back is not None and back.shape == (h, w)
    assert int(np.abs(back.astype(int) - img.astype(int)).max()) <= 200


@settings(max_examples=60, deadline=None)
@given(data=st.binary(min_size=0, max_size=300))
def test_jpeg_decoder_survives_garbage(data):
    """Untrusted-byte seam: arbitrary bytes (with and without a JPEG
    SOI prefix) must yield None or an array — never an exception."""
    from smart_city_data_pipeline_spark.operators.jpeg_codec import (
        decode_jpeg_gray,
    )

    for buf in (data, b"\xff\xd8" + data):
        out = decode_jpeg_gray(buf)
        assert out is None or out.ndim == 2


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=33),
    w=st.integers(min_value=1, max_value=33),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_progressive_equals_baseline_decode(h, w, seed):
    """Progressive (SOF2) spectral-selection streams carry the SAME
    quantized coefficients as the baseline encoding of the same
    pixels, just in a different scan structure — so for any shape the
    progressive decode must equal the baseline decode exactly. Any
    divergence is a scan-machinery bug (DC interleave, EOB handling,
    band bounds), not quantization loss."""
    from smart_city_data_pipeline_spark.operators.jpeg_codec import (
        decode_jpeg_gray,
        encode_jpeg_gray,
        encode_jpeg_progressive,
    )

    img = np.random.default_rng(seed).integers(0, 256, size=(h, w), dtype=np.uint8)
    base = decode_jpeg_gray(encode_jpeg_gray(img))
    for successive in (False, True):
        prog = decode_jpeg_gray(encode_jpeg_progressive(img, successive=successive))
        assert prog is not None and prog.shape == (h, w)
        assert np.array_equal(prog, base), successive


@settings(max_examples=60, deadline=None)
@given(data=st.binary(min_size=0, max_size=300))
def test_jpeg_progressive_decoder_survives_garbage(data):
    """Untrusted-byte seam for the SOF2 path: arbitrary bytes after a
    progressive-looking prefix must yield None or an array — never an
    exception."""
    from smart_city_data_pipeline_spark.operators.jpeg_codec import (
        _decode_progressive,
    )

    for buf in (data, b"\xff\xd8" + data, b"\xff\xd8\xff\xc2" + data):
        out = _decode_progressive(buf)
        assert out is None or out.ndim == 2
