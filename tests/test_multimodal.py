"""Multimodal plumbing tests (SURVEY.md §2F): binary payload column, Arrow
batch decode via mapInPandas, metadata-only frame sampling."""

from __future__ import annotations

from smart_city_data_pipeline_spark.operators.multimodal import (
    camera_rollup,
    crop_payload,
    extract_features,
    frames_features,
    resize_frames,
    sample_frames,
    synth_frames,
)


def test_frames_schema(spark, sf_dir):
    frames = synth_frames(spark, sf_dir)
    kinds = {f.name: f.dataType.simpleString() for f in frames.schema.fields}
    assert kinds["payload"] == "binary"
    assert kinds["meta"].startswith("struct<width:int,height:int,format:string,frame_no:int")


def test_sampling_is_metadata_only(spark, sf_dir):
    frames = synth_frames(spark, sf_dir)
    sampled = sample_frames(frames, every_k=3)
    n_all = frames.count()
    n_s = sampled.count()
    assert 0 < n_s < n_all


def test_feature_extraction_deterministic(spark, sf_dir):
    frames = synth_frames(spark, sf_dir).limit(50)
    feats = extract_features(frames)
    rows = {r["frame_id"]: r for r in feats.collect()}
    assert len(rows) == 50
    r0 = rows[min(rows)]
    assert r0["n_bytes"] > 0
    assert sum(r0["histo_head"]) == r0["n_bytes"]  # histogram covers every byte
    assert 0 < r0["mean_intensity"] < 256
    # Deterministic across runs.
    again = {r["frame_id"]: r for r in extract_features(frames).collect()}
    assert again[min(rows)]["mean_intensity"] == r0["mean_intensity"]


def test_crop_payload_is_jvm_side(spark, sf_dir):
    frames = synth_frames(spark, sf_dir).limit(20)
    cropped = crop_payload(frames, 16)
    rows = cropped.collect()
    assert all(len(bytes(r["payload"])) <= 16 for r in rows)
    # No Python boundary: the plan must not contain a MapInPandas node.
    assert "MapInPandas" not in cropped._jdf.queryExecution().executedPlan().toString()


def test_resize_frames_contract(spark, sf_dir):
    frames = synth_frames(spark, sf_dir).limit(20)
    resized = resize_frames(frames, 8, 4)
    rows = resized.collect()
    assert resized.schema["payload"].dataType.simpleString() == "binary"
    for r in rows:
        assert r["meta"]["width"] == 8 and r["meta"]["height"] == 4
        assert len(bytes(r["payload"])) <= 8 * 4
    # Deterministic stub.
    again = resize_frames(frames, 8, 4).collect()
    assert sorted(bytes(r["payload"]) for r in rows) == sorted(bytes(r["payload"]) for r in again)


def test_camera_rollup_and_query_entry(spark, sf_dir):
    out = frames_features(spark, sf_dir)
    assert out.columns == ["camera_id", "n_frames", "avg_intensity", "total_bytes"]
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["n_frames"] > 0 for r in rows)


def test_bmp_codec_roundtrip_exact():
    """The pure-numpy BMP codec is a REAL codec: decode(encode(img))
    must reproduce the pixel array bit-for-bit (incl. non-multiple-of-4
    widths exercising row padding)."""
    import numpy as np

    from smart_city_data_pipeline_spark.operators.multimodal import (
        decode_bmp_gray,
        encode_bmp_gray,
    )

    rng = np.random.default_rng(3)
    for h, w in ((4, 4), (5, 7), (24, 32), (3, 1)):
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        back = decode_bmp_gray(encode_bmp_gray(img))
        assert back is not None and back.shape == (h, w)
        assert (back == img).all()
    assert decode_bmp_gray(b"not a bmp at all....") is None


def test_bmp_frames_decode_for_real(spark, sf_dir):
    """frames_features_bmp must flow through the REAL decoder: the
    rolled-up mean intensity equals the numpy ground truth of the
    seeded gradient, which the statistics fallback could never match."""
    import numpy as np

    from smart_city_data_pipeline_spark.operators.multimodal import (
        BMP_H,
        BMP_W,
        frames_features_bmp,
    )

    rows = frames_features_bmp(spark, sf_dir).collect()
    assert len(rows) > 0
    yy, xx = np.mgrid[0:BMP_H, 0:BMP_W]

    def true_mean(fid: int) -> float:
        return float(((xx * 3 + yy * 5 + fid * 7) % 256).mean())

    from smart_city_data_pipeline_spark.catalog import table

    doc_ids = [r["doc_id"] for r in table(spark, sf_dir, "documents").select("doc_id").collect()]
    want = {}
    for fid in doc_ids:
        if fid % 30 % 3 == 0:  # sample_frames(every_k=3) on frame_no = fid % 30
            cam = fid % 16
            want.setdefault(cam, []).append(true_mean(fid))
    for r in rows:
        expect = round(sum(want[r["camera_id"]]) / len(want[r["camera_id"]]), 4)
        assert abs(r["avg_intensity"] - expect) < 1e-6, (r, expect)


def test_png_frames_decode_for_real(spark, sf_dir):
    """frames_features_png must flow through the REAL PNG decoder (all
    five scanline filters on the production path): the rolled-up mean
    equals the numpy ground truth of the seeded gradient, and total_px
    only exists when decode succeeds (the fallback would report byte
    counts of the compressed payload instead)."""
    import numpy as np

    from smart_city_data_pipeline_spark.catalog import table
    from smart_city_data_pipeline_spark.operators.multimodal import (
        PNG_H,
        PNG_W,
        frames_features_png,
    )

    rows = frames_features_png(spark, sf_dir).collect()
    assert len(rows) > 0
    yy, xx = np.mgrid[0:PNG_H, 0:PNG_W]
    doc_ids = [r["doc_id"] for r in table(spark, sf_dir, "documents").select("doc_id").collect()]
    want_sum: dict[int, int] = {}
    want_n: dict[int, int] = {}
    for fid in doc_ids:
        if fid % 30 % 3 == 0:
            cam = fid % 16
            want_sum[cam] = want_sum.get(cam, 0) + int(((xx * 3 + yy * 5 + fid * 7) % 256).sum())
            want_n[cam] = want_n.get(cam, 0) + 1
    for r in rows:
        cam = r["camera_id"]
        assert r["n_frames"] == want_n[cam]
        assert r["total_px"] == want_n[cam] * PNG_W * PNG_H
        expect = want_sum[cam] / (want_n[cam] * PNG_W * PNG_H)
        assert abs(r["avg_intensity"] - expect) < 1e-4, (r, expect)


def test_resize_bmp_real_path(spark, sf_dir):
    """Resizing BMP frames re-encodes REAL BMPs at the target size."""
    from smart_city_data_pipeline_spark.operators.multimodal import (
        decode_bmp_gray,
        resize_frames,
        synth_bmp_frames,
    )

    frames = synth_bmp_frames(spark, sf_dir).limit(10)
    rows = resize_frames(frames, 8, 6).collect()
    assert len(rows) == 10
    for r in rows:
        arr = decode_bmp_gray(bytes(r["payload"]))
        assert arr is not None and arr.shape == (6, 8)


def test_jpeg_codec_block_constant_exact():
    """The baseline JPEG codec round-trips the block-constant
    even-offset family BIT-EXACTLY (quantization lossless by
    construction: AC coefficients quantize to 0, the DC quant step 16
    divides 8·(v−128)) — the property the analytic oracle relies on."""
    import numpy as np

    from smart_city_data_pipeline_spark.operators.jpeg_codec import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    yy, xx = np.mgrid[0:24, 0:32]
    bx, by = xx // 8, yy // 8
    for fid in (0, 1, 7, 13, 29, 104):
        img = (64 + 2 * ((3 * bx + 5 * by + 7 * fid) % 64)).astype(np.uint8)
        back = decode_jpeg_gray(encode_jpeg_gray(img))
        assert back is not None and np.array_equal(back, img), fid


def test_jpeg_codec_lossy_bounded_and_robust():
    """General images: decode(encode(x)) keeps shape, stays within the
    quantization error envelope for smooth content, and the decoder
    rejects garbage instead of raising."""
    import numpy as np

    from smart_city_data_pipeline_spark.operators.jpeg_codec import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    yy, xx = np.mgrid[0:24, 0:32]
    smooth = ((xx * 2 + yy * 3) % 256).astype(np.uint8)
    back = decode_jpeg_gray(encode_jpeg_gray(smooth))
    assert back.shape == smooth.shape
    assert int(np.abs(back.astype(int) - smooth.astype(int)).max()) <= 16

    odd = np.random.default_rng(7).integers(0, 256, (13, 21), dtype=np.uint8)
    assert decode_jpeg_gray(encode_jpeg_gray(odd)).shape == (13, 21)

    assert decode_jpeg_gray(b"not a jpeg") is None
    assert decode_jpeg_gray(b"\xff\xd8\xff\xd9") is None
    assert decode_jpeg_gray(b"\xff\xd8\xff\xdb\x00\x02") is None


def test_jpeg_frames_decode_for_real(spark, sf_dir):
    """frames_features_jpeg must flow through the REAL JPEG decoder:
    the rolled-up mean equals the numpy ground truth of the
    block-constant family (the byte-statistics fallback could never
    match it on an entropy-coded payload)."""
    import numpy as np

    from smart_city_data_pipeline_spark.catalog import table
    from smart_city_data_pipeline_spark.operators.multimodal import (
        JPEG_H,
        JPEG_W,
        frames_features_jpeg,
    )

    rows = frames_features_jpeg(spark, sf_dir).collect()
    assert len(rows) > 0
    yy, xx = np.mgrid[0:JPEG_H, 0:JPEG_W]
    bx, by = xx // 8, yy // 8

    def true_mean(fid: int) -> float:
        return float((64 + 2 * ((3 * bx + 5 * by + 7 * fid) % 64)).mean())

    doc_ids = [
        r["doc_id"]
        for r in table(spark, sf_dir, "documents").select("doc_id").collect()
    ]
    want = {}
    for fid in doc_ids:
        if fid % 30 % 3 == 0:
            want.setdefault(fid % 16, []).append(true_mean(fid))
    for r in rows:
        expect = round(sum(want[r["camera_id"]]) / len(want[r["camera_id"]]), 4)
        assert abs(r["avg_intensity"] - expect) < 1e-6, (r, expect)


def test_jpeg_restart_markers():
    """DRI/RSTn streams (the error-resilience structure real camera
    firmware emits) decode identically to the unsegmented stream, and
    the block-constant family stays bit-exact across intervals."""
    import numpy as np

    from smart_city_data_pipeline_spark.operators.jpeg_codec import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    yy, xx = np.mgrid[0:24, 0:32]
    bx, by = xx // 8, yy // 8
    img = (64 + 2 * ((3 * bx + 5 * by + 7 * 11) % 64)).astype(np.uint8)
    for ri in (1, 2, 5, 12, 100):
        buf = encode_jpeg_gray(img, restart_interval=ri)
        assert np.array_equal(decode_jpeg_gray(buf), img), ri
        if ri <= 5:  # markers actually present for small intervals
            assert any(
                buf[i] == 0xFF and 0xD0 <= buf[i + 1] <= 0xD7
                for i in range(2, len(buf) - 1)
            ), ri
    noisy = np.random.default_rng(9).integers(0, 256, (17, 29), dtype=np.uint8)
    base = decode_jpeg_gray(encode_jpeg_gray(noisy))
    for ri in (1, 4, 7):
        seg = decode_jpeg_gray(encode_jpeg_gray(noisy, restart_interval=ri))
        assert np.array_equal(seg, base), ri


def test_jpeg_color_codec():
    """4:4:4 color JPEG: gray-identical RGB round-trips EXACTLY (the
    BT.601 transform cancels: Y == v, chroma == 128); true-color smooth
    gradients decode within the quantization envelope; random color
    shapes survive."""
    import numpy as np

    from smart_city_data_pipeline_spark.operators.jpeg_codec import (
        decode_jpeg_gray,
        encode_jpeg_color,
    )

    yy, xx = np.mgrid[0:24, 0:32]
    bx, by = xx // 8, yy // 8
    img = (64 + 2 * ((3 * bx + 5 * by + 7 * 11) % 64)).astype(np.uint8)
    rgb = np.stack([img, img, img], axis=2)
    for ri in (0, 3):
        out = decode_jpeg_gray(encode_jpeg_color(rgb, restart_interval=ri))
        assert np.array_equal(out, img), ri

    r, g, b = (xx * 2) % 256, (yy * 3) % 256, (xx + yy) % 256
    rgb2 = np.stack([r, g, b], axis=2).astype(np.uint8)
    ref = np.stack([r, g, b], axis=2).mean(axis=2)
    d2 = decode_jpeg_gray(encode_jpeg_color(rgb2)).astype(float)
    assert float(np.abs(d2 - ref).max()) <= 20

    rc = np.random.default_rng(5).integers(0, 256, (13, 21, 3), dtype=np.uint8)
    assert decode_jpeg_gray(encode_jpeg_color(rc)).shape == (13, 21)


def test_jpeg_420_subsampling():
    """4:2:0 (the dominant real-camera layout): gray-identical
    block-constant RGB round-trips EXACTLY through the 16x16 MCU
    structure (constant chroma survives the 2x2-mean downsample and
    replication upsample); smooth true color stays within the
    envelope; odd sizes cross the MCU grid correctly."""
    import numpy as np

    from smart_city_data_pipeline_spark.operators.jpeg_codec import (
        decode_jpeg_gray,
        encode_jpeg_color,
    )

    yy, xx = np.mgrid[0:24, 0:32]
    bx, by = xx // 8, yy // 8
    img = (64 + 2 * ((3 * bx + 5 * by + 7 * 11) % 64)).astype(np.uint8)
    rgb = np.stack([img] * 3, axis=2)
    for ri in (0, 2):
        d = decode_jpeg_gray(
            encode_jpeg_color(rgb, restart_interval=ri, subsample=True)
        )
        assert np.array_equal(d, img), ri

    r, g, b = (xx * 2) % 256, (yy * 3) % 256, (xx + yy) % 256
    rgb2 = np.stack([r, g, b], axis=2).astype(np.uint8)
    ref = np.stack([r, g, b], axis=2).mean(axis=2)
    d2 = decode_jpeg_gray(encode_jpeg_color(rgb2, subsample=True)).astype(float)
    assert float(np.abs(d2 - ref).max()) <= 30

    rc = np.random.default_rng(5).integers(0, 256, (19, 23, 3), dtype=np.uint8)
    assert decode_jpeg_gray(encode_jpeg_color(rc, subsample=True)).shape == (19, 23)


def test_jpeg_progressive_codec():
    """Progressive (SOF2) spectral-selection round trip: bit-exact on
    the block-constant even-offset family (gray AND gray-identical
    RGB), and on arbitrary images the progressive decode must equal
    the BASELINE decode of the same pixels — the two scan structures
    carry identical quantized coefficients, so any difference is a
    scan-machinery bug."""
    import numpy as np

    from smart_city_data_pipeline_spark.operators.jpeg_codec import (
        _decode_progressive,
        decode_jpeg_gray,
        encode_jpeg_gray,
        encode_jpeg_progressive,
    )

    yy, xx = np.mgrid[0:24, 0:32]
    for fid in (0, 3, 11):
        img = (64 + 2 * ((3 * (xx // 8) + 5 * (yy // 8) + 7 * fid) % 64)).astype(
            np.uint8
        )
        buf = encode_jpeg_progressive(img)
        assert buf[:4] == b"\xff\xd8\xff\xdb" and b"\xff\xc2" in buf
        assert np.array_equal(decode_jpeg_gray(buf), img), fid
        rgb = np.stack([img, img, img], axis=2)
        assert np.array_equal(decode_jpeg_gray(encode_jpeg_progressive(rgb)), img)
    rng = np.random.default_rng(11)
    for h, w in ((41, 53), (8, 8), (17, 9)):
        noisy = rng.integers(0, 256, (h, w), dtype=np.uint8)
        prog = decode_jpeg_gray(encode_jpeg_progressive(noisy))
        base = decode_jpeg_gray(encode_jpeg_gray(noisy))
        assert prog is not None and np.array_equal(prog, base), (h, w)
    assert _decode_progressive(b"\xff\xd8\xff\xd9") is None


def test_jpeg_progressive_successive_approximation():
    """The four-stage successive-approximation script (DC+AC first
    passes at Al=1, then DC/AC refinement restoring bit 0) must
    reassemble the exact quantized coefficients: decode equals the
    BASELINE decode of the same pixels on arbitrary images, and is
    bit-exact on the lossless block-constant family (gray and
    gray-identical RGB)."""
    import numpy as np

    from smart_city_data_pipeline_spark.operators.jpeg_codec import (
        decode_jpeg_gray,
        encode_jpeg_gray,
        encode_jpeg_progressive,
    )

    yy, xx = np.mgrid[0:24, 0:32]
    img = (64 + 2 * ((3 * (xx // 8) + 5 * (yy // 8) + 7 * 9) % 64)).astype(
        np.uint8
    )
    buf = encode_jpeg_progressive(img, successive=True)
    assert buf.count(b"\xff\xda") >= 4  # DC first, AC first, 2 refinements
    assert np.array_equal(decode_jpeg_gray(buf), img)
    rgb = np.stack([img, img, img], axis=2)
    assert np.array_equal(
        decode_jpeg_gray(encode_jpeg_progressive(rgb, successive=True)), img
    )
    rng = np.random.default_rng(23)
    for h, w in ((41, 53), (9, 40), (1, 16), (12, 1), (17, 18)):
        noisy = rng.integers(0, 256, (h, w), dtype=np.uint8)
        sa = decode_jpeg_gray(encode_jpeg_progressive(noisy, successive=True))
        base = decode_jpeg_gray(encode_jpeg_gray(noisy))
        assert sa is not None and np.array_equal(sa, base), (h, w)


def test_jpeg_progressive_eob_runs():
    """The progressive decoder must handle GENERAL EOBn runs (runs of
    all-zero-band blocks longer than one), which this repo's encoder
    never emits (it flushes EOB per block): hand-assemble an AC scan
    whose first block ends in EOB4 covering the remaining three blocks,
    using a custom Huffman table that actually contains the EOBn
    symbol."""
    import numpy as np

    from smart_city_data_pipeline_spark.operators.jpeg_codec import (
        _BitReader,
        _BitWriter,
        _canonical_codes,
        _decode_prog_scan,
        _decode_table,
    )

    # symbols: 0x02 = (run 0, size 2) coefficient, 0x20 = EOB4 (r=2)
    bits = [0] * 16
    bits[2] = 2  # two 3-bit codes
    vals = [0x02, 0x20]
    enc = _canonical_codes(bits, vals)
    dec = _decode_table(bits, vals)

    wtr = _BitWriter()
    c, ln = enc[0x02]
    wtr.write(c, ln)
    wtr.write(3, 2)  # coefficient +3 at k=1 of block 0
    c, ln = enc[0x20]
    wtr.write(c, ln)
    wtr.write(0, 2)  # EOB run = 2^2 - 1 + 0 + this block = 4 blocks
    data = wtr.flush() + b"\xff\xd9"

    comps = [(1, 0, 1, 1)]
    coefs = [np.zeros((1, 4, 64), dtype=np.int64)]
    rd = _BitReader(data, 0)
    ok = _decode_prog_scan(
        rd, coefs, comps, [(0, 0, 0)], {0x10: dec},
        1, 63, 0, 0, 8, 32, 0,
    )
    assert ok
    want = np.zeros((1, 4, 64), dtype=np.int64)
    want[0, 0, 1] = 3
    assert np.array_equal(coefs[0], want)
