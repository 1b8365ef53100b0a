"""Multimodal columns: binary frames + typed metadata + mapInPandas pipeline.

The reference's camera path (RTSP → Kafka frames → Flink vision job,
``data-simulators/camera-sim``, ``pipline2/data-proccessor/stream/
flink_vision_job_proper.py``) carries opaque image payloads with typed
metadata and runs decode→detect over them. Spark-first re-expression:

- frames are rows ``(frame_id, camera_id, ts, meta struct, payload binary)``
  — an opaque ``binary`` column, never parsed by Catalyst;
- decode/feature-extract runs in ``mapInPandas`` so payloads cross the
  Python boundary as Arrow record batches (zero-copy buffers), not
  pickled rows;
- the codecs are REAL: 8/24-bit BMP (pure struct/numpy,
  :func:`encode_bmp_gray` / :func:`decode_bmp_gray`), non-interlaced
  8-bit PNG (zlib + all five scanline filters, :func:`encode_png` /
  :func:`decode_png`), and baseline JPEG — single-component, 4:4:4
  color, AND 4:2:0 chroma-subsampled, with restart markers
  (:mod:`jpeg_codec`, bitstream-driven Huffman + dequant + IDCT), and
  GIF89a with real LZW (:mod:`gif_codec`, variable 9→12-bit codes,
  stream-rebuilt string table incl. KwKwK, CLEAR handling).
  Only interlaced/local-palette GIF remains behind the cv2 seam
  (absent in this container) with a deterministic payload-statistics
  fallback, keeping schema / partitioning / batch plumbing honest.

Scale notes: binary payloads dominate bytes, so the pipeline projects
metadata-only columns whenever the payload is not needed (column pruning
keeps frame scans cheap), and ``maxRecordsPerBatch`` bounds Arrow batch
memory when payloads are large. Frame sampling happens BEFORE decode —
filter on metadata (frame_no % k) so undecoded payloads are never moved.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from smart_city_data_pipeline_spark.catalog import spread, table
from smart_city_data_pipeline_spark.functions.rounding import pround, pround_sql

FRAME_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("frame_no", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("frame_id", T.LongType()),
        T.StructField("camera_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("histo_head", T.ArrayType(T.IntegerType())),
        # Exact-aggregation companions to mean_intensity: integer pixel
        # sum and pixel count. Camera-level averages computed as
        # SUM(sum_intensity)/SUM(n_px) are ONE double division of two
        # exactly-representable integers — bit-identical across engines
        # and summation orders, unlike AVG over per-frame doubles.
        T.StructField("sum_intensity", T.LongType()),
        T.StructField("n_px", T.IntegerType()),
    ]
)


def synth_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stand-in frame table derived from ``documents``.

    Payload = utf-8 bytes of the doc text (an opaque blob as far as the
    pipeline is concerned); metadata is a typed struct. In production this
    table is the Kafka/RTSP bridge output written to the lake.
    """
    docs = spread(
        table(spark, sf_dir, "documents"), "doc_id", key=f"{sf_dir}:documents"
    )
    return docs.select(
        F.col("doc_id").alias("frame_id"),
        (F.col("doc_id") % 16).alias("camera_id"),
        F.struct(
            F.lit(640).alias("width"),
            F.lit(480).alias("height"),
            F.lit("raw8").alias("format"),
            (F.col("doc_id") % 30).cast("int").alias("frame_no"),
        ).alias("meta"),
        F.encode("text", "utf-8").alias("payload"),
    )


def sample_frames(frames: DataFrame, every_k: int = 10) -> DataFrame:
    """Keep every k-th frame — metadata-only filter, payloads never move."""
    return frames.where(F.col("meta.frame_no") % every_k == 0)


BMP_W, BMP_H = 32, 24
# One sample rate for every hash-gated frame entry: the synth
# pre-filter, the metadata sample, and the analytic oracles all derive
# from this constant, so the filter can never silently diverge between
# the Spark side and the SQL side.
FRAME_SAMPLE_K = 3


def synth_bmp_frames(
    spark: SparkSession, sf_dir: str, every_k: int | None = None
) -> DataFrame:
    """Frame table whose payloads are REAL uncompressed 8-bit BMPs
    (deterministic per-frame gradient seeded by frame_id), built in
    mapInPandas — the shape an RTSP bridge writing raw frames to the
    lake produces. Everything downstream exercises the actual decoder,
    not the statistics fallback.

    ``every_k`` pre-applies :func:`sample_frames`'s frame_no filter
    (frame_no ≡ frame_id % 30) BEFORE the encode stage, like
    :func:`synth_png_frames`: a post-synth filter cannot push through
    mapInPandas, so without it the Python encoder runs on every frame
    only to throw 2 of 3 away (guide §4 — ship only the rows the
    Python stage must touch). In production frames arrive already
    encoded; the encoder here is synthetic overhead only."""
    import numpy as np

    # spread BEFORE the mapInPandas chain: a single-row-group scan would
    # otherwise serialize every Python encode/decode onto one core.
    docs = spread(
        table(spark, sf_dir, "documents"), "doc_id", key=f"{sf_dir}:documents"
    ).select(
        F.col("doc_id").alias("frame_id"), (F.col("doc_id") % 16).alias("camera_id")
    )
    if every_k is not None:
        docs = docs.where((F.col("frame_id") % 30) % every_k == 0)

    out_schema = T.StructType(
        [
            T.StructField("frame_id", T.LongType()),
            T.StructField("camera_id", T.LongType()),
            T.StructField("meta", FRAME_META),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yy, xx = np.mgrid[0:BMP_H, 0:BMP_W]
        for pdf in batches:
            payloads, metas = [], []
            for fid in pdf["frame_id"]:
                img = ((xx * 3 + yy * 5 + int(fid) * 7) % 256).astype(np.uint8)
                payloads.append(encode_bmp_gray(img))
                metas.append(
                    {"width": BMP_W, "height": BMP_H, "format": "bmp8", "frame_no": int(fid) % 30}
                )
            yield pd.DataFrame(
                {
                    "frame_id": pdf["frame_id"],
                    "camera_id": pdf["camera_id"],
                    "meta": metas,
                    "payload": payloads,
                }
            )

    return docs.mapInPandas(run, out_schema)


def _fallback_stats(buf: bytes) -> tuple[float, list[int]]:
    """Deterministic payload statistics — the stub 'decode'."""
    if not buf:
        return 0.0, [0, 0, 0, 0]
    histo = [0, 0, 0, 0]
    total = 0
    for b in buf:
        histo[b >> 6] += 1
        total += b
    return total / len(buf), histo


def encode_bmp_gray(arr) -> bytes:
    """REAL encoder: 8-bit grayscale → uncompressed BMP (BITMAPINFOHEADER
    + 256-entry gray palette, 4-byte-padded rows, bottom-up). Pure
    struct/numpy — no imaging library needed for uncompressed frames,
    which is what an RTSP bridge actually ships."""
    import struct

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape
    stride = (w + 3) & ~3
    palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
    offset = 14 + 40 + len(palette)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w] = a[::-1]  # bottom-up row order
    pixels = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", offset + len(pixels), 0, 0, offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(pixels), 2835, 2835, 256, 0)
    return header + info + palette + pixels


def decode_bmp_gray(buf: bytes):
    """REAL decoder for uncompressed 8-bit/24-bit BMP payloads (pure
    struct/numpy). Returns a 2-D uint8 array or None if ``buf`` is not
    an uncompressed BMP this decoder handles (JPEG/PNG stay behind the
    cv2 seam)."""
    import struct

    import numpy as np

    if len(buf) < 54 or buf[:2] != b"BM":
        return None
    offset = struct.unpack_from("<I", buf, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", buf, 14)
    if hdr_size < 40:
        return None
    planes, bpp, compression = struct.unpack_from("<HHI", buf, 26)
    if compression != 0 or bpp not in (8, 24) or w <= 0 or h == 0:
        return None
    flipped = h > 0
    h = abs(h)
    bytes_pp = bpp // 8
    stride = (w * bytes_pp + 3) & ~3
    if offset + stride * h > len(buf):
        return None
    rows = np.frombuffer(buf, dtype=np.uint8, count=stride * h, offset=offset)
    rows = rows.reshape(h, stride)[:, : w * bytes_pp]
    if flipped:
        rows = rows[::-1]
    if bpp == 24:
        rows = rows.reshape(h, w, 3).mean(axis=2).astype(np.uint8)
    return rows


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a, b, c):
    """Paeth predictor (PNG filter 4) on integer arrays."""
    import numpy as np

    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(arr, row_filters=None) -> bytes:
    """REAL encoder: 8-bit grayscale ``(H, W)`` or RGB ``(H, W, 3)`` →
    non-interlaced PNG, pure stdlib ``zlib`` + numpy — what the
    reference's camera simulator ships as compressed frames
    (``data-simulators/camera-analytics/camera_simulator.py``).

    ``row_filters`` optionally selects the per-row scanline filter
    (0=None 1=Sub 2=Up 3=Average 4=Paeth) by index — any choice decodes
    to the same pixels, so the synthetic frame table uses ``y % 5`` to
    exercise every filter type on the production decode path.
    """
    import struct
    import zlib

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    h, w = a.shape[:2]
    ch = 1 if gray else a.shape[2]
    raw = a.reshape(h, w * ch).astype(np.int16)
    stride = w * ch
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        ft = 0 if row_filters is None else int(row_filters[y]) % 5
        line = raw[y]
        left = np.concatenate([np.zeros(ch, dtype=np.int16), line[:-ch]])
        upleft = np.concatenate([np.zeros(ch, dtype=np.int16), prev[:-ch]])
        if ft == 0:
            enc = line
        elif ft == 1:
            enc = line - left
        elif ft == 2:
            enc = line - prev
        elif ft == 3:
            enc = line - (left + prev) // 2
        else:
            enc = line - _paeth(left, prev, upleft)
        out.append(ft)
        out += (enc % 256).astype(np.uint8).tobytes()
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0 if gray else 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(buf: bytes):
    """REAL decoder for non-interlaced 8-bit gray/RGB PNG (pure stdlib
    zlib + numpy; all five scanline filters). Returns a 2-D uint8 array
    (RGB averaged to gray like the 24-bit BMP path) or None for
    anything this decoder does not handle — never raises on untrusted
    bytes (hypothesis-fuzzed, like the BMP seam)."""
    import struct
    import zlib

    import numpy as np

    if len(buf) < 8 or buf[:8] != _PNG_SIG:
        return None
    pos, ihdr, idat = 8, None, b""
    while pos + 12 <= len(buf):
        ln, tag = struct.unpack_from(">I4s", buf, pos)
        if pos + 12 + ln > len(buf):
            return None
        data = buf[pos + 8 : pos + 8 + ln]
        crc = struct.unpack_from(">I", buf, pos + 8 + ln)[0]
        if crc != zlib.crc32(tag + data) & 0xFFFFFFFF:
            return None
        if tag == b"IHDR":
            ihdr = data
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or len(ihdr) != 13 or not idat:
        return None
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or color not in (0, 2) or comp or filt or interlace:
        return None
    if w == 0 or h == 0 or w > 1 << 24 or h > 1 << 24:
        return None
    ch = 1 if color == 0 else 3
    stride = w * ch
    try:
        raw = zlib.decompress(idat)
    except zlib.error:
        return None
    if len(raw) != h * (stride + 1):
        return None
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    recon = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        if ft == 0:
            cur = line
        elif ft == 2:
            cur = (line + prev) % 256
        elif ft == 1:
            # Sub is a per-channel cumulative sum mod 256 — vectorized.
            cur = np.empty(stride, dtype=np.int32)
            for c in range(ch):
                cur[c::ch] = np.cumsum(line[c::ch]) % 256
        elif ft in (3, 4):
            # Average/Paeth are sequential along the row (cur[i] needs
            # cur[i-ch]) — loop over plain Python ints: numpy scalar
            # indexing per element is ~50× slower than list ops here.
            line_l = line.tolist()
            prev_l = prev.tolist()
            cur_l = [0] * stride
            if ft == 3:
                for i in range(stride):
                    left = cur_l[i - ch] if i >= ch else 0
                    cur_l[i] = (line_l[i] + ((left + prev_l[i]) >> 1)) & 255
            else:
                for i in range(stride):
                    left = cur_l[i - ch] if i >= ch else 0
                    up = prev_l[i]
                    ul = prev_l[i - ch] if i >= ch else 0
                    pa = abs(up - ul)
                    pb = abs(left - ul)
                    pc = abs(left + up - ul - ul)
                    if pa <= pb and pa <= pc:
                        pred = left
                    elif pb <= pc:
                        pred = up
                    else:
                        pred = ul
                    cur_l[i] = (line_l[i] + pred) & 255
            cur = np.asarray(cur_l, dtype=np.int32)
        else:
            return None
        recon[y] = cur
        prev = cur
    arr = recon.astype(np.uint8)
    if ch == 3:
        arr = arr.reshape(h, w, 3).mean(axis=2).astype(np.uint8)
    return arr


def _decode_frame(buf: bytes):
    """Codec seam, tried in order — returns a 2-D uint8 array or None:

    1. REAL pure-numpy decode for uncompressed BMP payloads
       (:func:`decode_bmp_gray`) — fully functional in this container;
    2. REAL pure-stdlib decode for non-interlaced 8-bit PNG payloads
       (:func:`decode_png`, zlib + the five scanline filters);
    3. REAL pure-numpy decode for baseline JPEG — single-component,
       4:4:4 color, and 4:2:0 subsampled (:mod:`jpeg_codec`,
       bitstream-driven Huffman + dequant + IDCT + BT.601);
    4. cv2 for what remains (progressive JPEG) — absent here, so that
       branch is the one remaining gated seam.
    """
    import numpy as np

    from smart_city_data_pipeline_spark.operators.jpeg_codec import (
        decode_jpeg_gray,
    )

    from smart_city_data_pipeline_spark.operators.gif_codec import (
        decode_gif_gray,
    )

    if not buf:
        return None
    arr = decode_bmp_gray(buf)
    if arr is None:
        arr = decode_png(buf)
    if arr is None:
        arr = decode_gif_gray(buf)
    if arr is None:
        arr = decode_jpeg_gray(buf)
    if arr is None:
        try:  # pragma: no cover - cv2 absent in this environment
            import cv2

            arr = cv2.imdecode(np.frombuffer(buf, dtype=np.uint8), cv2.IMREAD_GRAYSCALE)
        except ImportError:
            arr = None
    return arr


def _payload_stats(buf: bytes) -> tuple[float, list[int], int, int]:
    """(mean, histo_head, sum_intensity, n_px) for one payload; falls
    back to deterministic byte statistics for undecodable bytes, keeping
    the Arrow plumbing and schema honest everywhere."""
    import numpy as np

    arr = _decode_frame(buf)
    if arr is None:
        mean, histo = _fallback_stats(buf)
        return mean, histo, int(sum(buf)), len(buf)
    histo = np.histogram(arr, bins=4, range=(0, 256))[0]
    s, n = int(arr.sum(dtype=np.int64)), int(arr.size)
    return s / n, [int(x) for x in histo], s, n


def extract_features(frames: DataFrame) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched).

    Batch memory is bounded by the session's
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` (set it per cluster
    for large payloads) — never mutated here: a query must not change
    session-global execution config as a side effect.
    """

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            means, histos, sizes, sums, npxs = [], [], [], [], []
            for buf in pdf["payload"]:
                raw = bytes(buf) if buf is not None else b""
                mean, histo, s, n = _payload_stats(raw)
                means.append(mean)
                histos.append(histo)
                sizes.append(len(raw))
                sums.append(s)
                npxs.append(n)
            yield pd.DataFrame(
                {
                    "frame_id": pdf["frame_id"],
                    "camera_id": pdf["camera_id"],
                    "n_bytes": sizes,
                    "mean_intensity": means,
                    "histo_head": histos,
                    "sum_intensity": sums,
                    "n_px": npxs,
                }
            )

    return frames.select("frame_id", "camera_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def crop_payload(frames: DataFrame, max_bytes: int) -> DataFrame:
    """Byte-level payload crop — pure JVM expression (substring works on
    binary), no Python boundary: the cheap pre-filter before any decode
    when only a payload prefix is needed (headers, thumbnails)."""
    return frames.withColumn(
        "payload", F.expr(f"substring(payload, 1, {int(max_bytes)})")
    )


def resize_frames(frames: DataFrame, width: int, height: int) -> DataFrame:
    """Decode → resize → re-encode via mapInPandas (Arrow-batched).

    Codec seam like :func:`_decode_frame`: with cv2 absent the
    deterministic fallback subsamples every k-th byte to the target
    size, keeping the schema contract (payload stays binary, meta is
    updated) and the Arrow plumbing real.
    """
    target = width * height

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for buf in pdf["payload"]:
                raw = bytes(buf) if buf is not None else b""
                arr = _decode_frame(raw)
                if arr is not None:
                    # REAL nearest-neighbor resize + BMP re-encode, so
                    # the resized payload stays decodable downstream.
                    ys = (np.arange(height) * arr.shape[0]) // height
                    xs = (np.arange(width) * arr.shape[1]) // width
                    out.append(encode_bmp_gray(arr[np.ix_(ys, xs)]))
                    continue
                try:  # pragma: no cover - cv2 absent in this environment
                    import cv2

                    dec = cv2.imdecode(np.frombuffer(raw, dtype=np.uint8), cv2.IMREAD_GRAYSCALE)
                    if dec is None:
                        raise ValueError("undecodable payload")
                    out.append(cv2.resize(dec, (width, height)).tobytes())
                except (ImportError, ValueError):
                    k = max(1, len(raw) // target) if raw else 1
                    out.append(raw[::k][:target])
            res = pdf.copy()
            res["payload"] = out
            yield res

    base = frames.select("frame_id", "camera_id", "meta", "payload")
    resized = base.mapInPandas(run, base.schema)
    return resized.withColumn(
        "meta",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.format").alias("format"),
            F.col("meta.frame_no").alias("frame_no"),
        ),
    )


PNG_W, PNG_H = 40, 30


def synth_png_frames(
    spark: SparkSession, sf_dir: str, every_k: int | None = None
) -> DataFrame:
    """Frame table whose payloads are REAL compressed PNGs (same
    deterministic per-frame gradient as the BMP table, at PNG dims),
    built in mapInPandas — the shape the reference's camera simulator
    ships (compressed frames over Kafka). Row filter ``y % 5``
    exercises all five PNG scanline filters on the production decode
    path, not just in unit tests.

    ``every_k`` pre-applies :func:`sample_frames`'s frame_no filter
    (frame_no ≡ frame_id % 30) BEFORE the encode stage: in production
    frames arrive already encoded, so the encoder here is synthetic-
    data scaffolding and paying it for frames the pipeline immediately
    drops would triple the benchmark's Python time for no coverage.
    """
    import numpy as np

    # spread BEFORE the mapInPandas chain: a single-row-group scan would
    # otherwise serialize every Python encode/decode onto one core.
    docs = spread(
        table(spark, sf_dir, "documents"), "doc_id", key=f"{sf_dir}:documents"
    ).select(
        F.col("doc_id").alias("frame_id"), (F.col("doc_id") % 16).alias("camera_id")
    )
    if every_k is not None:
        docs = docs.where((F.col("frame_id") % 30) % every_k == 0)

    out_schema = T.StructType(
        [
            T.StructField("frame_id", T.LongType()),
            T.StructField("camera_id", T.LongType()),
            T.StructField("meta", FRAME_META),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    filters = [y % 5 for y in range(PNG_H)]

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yy, xx = np.mgrid[0:PNG_H, 0:PNG_W]
        for pdf in batches:
            payloads, metas = [], []
            for fid in pdf["frame_id"]:
                img = ((xx * 3 + yy * 5 + int(fid) * 7) % 256).astype(np.uint8)
                payloads.append(encode_png(img, row_filters=filters))
                metas.append(
                    {"width": PNG_W, "height": PNG_H, "format": "png8", "frame_no": int(fid) % 30}
                )
            yield pd.DataFrame(
                {
                    "frame_id": pdf["frame_id"],
                    "camera_id": pdf["camera_id"],
                    "meta": metas,
                    "payload": payloads,
                }
            )

    return docs.mapInPandas(run, out_schema)


JPEG_W, JPEG_H = 32, 24


def synth_jpeg_frames(
    spark: SparkSession, sf_dir: str, every_k: int | None = None,
    color: bool = False, subsample: bool = False, progressive: bool = False,
) -> DataFrame:
    """Frame table whose payloads are REAL entropy-coded baseline JPEGs
    (:mod:`jpeg_codec`) — the exact format the reference's camera
    simulator ships over Kafka.

    The synthetic image is BLOCK-constant (one value per 8×8 JPEG
    block) with even offsets from 128, so quantization is lossless by
    construction (module docstring of :mod:`jpeg_codec`) and the
    decoded pixels equal the closed-form source — which is what lets a
    LOSSY-format pipeline carry an exact SQL oracle. The Huffman/DCT
    machinery still runs for real: per-block DC differentials, EOB
    coding, byte stuffing, bitstream-table reconstruction.
    """
    import numpy as np

    from smart_city_data_pipeline_spark.operators.jpeg_codec import (
        encode_jpeg_gray,
    )

    if progressive and subsample:
        raise ValueError(
            "progressive encoding has no 4:2:0 support — refusing to "
            "silently emit 4:4:4 frames under a subsample=True request"
        )

    docs = spread(
        table(spark, sf_dir, "documents"), "doc_id", key=f"{sf_dir}:documents"
    ).select(
        F.col("doc_id").alias("frame_id"), (F.col("doc_id") % 16).alias("camera_id")
    )
    if every_k is not None:
        docs = docs.where((F.col("frame_id") % 30) % every_k == 0)

    out_schema = T.StructType(
        [
            T.StructField("frame_id", T.LongType()),
            T.StructField("camera_id", T.LongType()),
            T.StructField("meta", FRAME_META),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from smart_city_data_pipeline_spark.operators.jpeg_codec import (
            encode_jpeg_color,
            encode_jpeg_progressive,
        )

        yy, xx = np.mgrid[0:JPEG_H, 0:JPEG_W]
        bxg, byg = xx // 8, yy // 8
        for pdf in batches:
            payloads, metas = [], []
            for fid in pdf["frame_id"]:
                img = (64 + 2 * ((3 * bxg + 5 * byg + 7 * int(fid)) % 64)).astype(
                    np.uint8
                )
                if progressive:
                    # SOF2 successive-approximation scan script (coarse
                    # DC+AC first passes at Al=1, then the refinement
                    # scans restoring bit 0 — the full four-stage
                    # progressive pipeline); gray-identical RGB as in
                    # the color path below.
                    buf = encode_jpeg_progressive(
                        np.stack([img, img, img], axis=2) if color else img,
                        successive=True,
                    )
                elif color:
                    # gray-identical RGB: Y plane == img, chroma == 128 —
                    # the color transform cancels exactly, so the decoded
                    # gray equals the closed-form source through the
                    # 3-component interleaved scan (with subsample=True,
                    # through the 4:2:0 MCU structure: constant chroma
                    # survives the 2×2 mean and the replication upsample).
                    buf = encode_jpeg_color(
                        np.stack([img, img, img], axis=2), subsample=subsample
                    )
                else:
                    buf = encode_jpeg_gray(img)
                payloads.append(buf)
                metas.append(
                    {
                        "width": JPEG_W,
                        "height": JPEG_H,
                        "format": "jpeg",
                        "frame_no": int(fid) % 30,
                    }
                )
            yield pd.DataFrame(
                {
                    "frame_id": pdf["frame_id"],
                    "camera_id": pdf["camera_id"],
                    "meta": metas,
                    "payload": payloads,
                }
            )

    return docs.mapInPandas(run, out_schema)


def camera_rollup(features: DataFrame) -> DataFrame:
    """Per-camera feature rollup — the vision job's windowed aggregate."""
    return features.groupBy("camera_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.avg("mean_intensity").alias("avg_intensity"),
        F.sum("n_bytes").alias("total_bytes"),
    )


def camera_rollup_exact(features: DataFrame) -> DataFrame:
    """Per-camera rollup whose average is ONE double division of two
    integer sums (pixel-weighted mean) — bit-identical across engines
    and partial-aggregation orders, so it can carry a hash-checked
    DuckDB oracle. Equal to the unweighted mean-of-means whenever all
    frames share one geometry (both synthetic tables do)."""
    from smart_city_data_pipeline_spark.functions.rounding import pround, pround_sql

    return features.groupBy("camera_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        pround(
            F.sum("sum_intensity").cast("double") / F.sum("n_px").cast("double")
        ).alias("avg_intensity"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum("n_px").alias("total_px"),
    )


def frames_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() entry: synth frames → sample → decode → per-camera rollup.

    rows-only oracle (binary decode is not SQL-expressible); determinism
    comes from the stubbed codec.
    """
    frames = sample_frames(synth_frames(spark, sf_dir), every_k=FRAME_SAMPLE_K)
    return camera_rollup(extract_features(frames)).select(
        "camera_id",
        "n_frames",
        F.round("avg_intensity", 4).alias("avg_intensity"),
        "total_bytes",
    )


def frames_features_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() entry exercising the REAL BMP decoder end-to-end:
    synth BMP frames → sample → decode (pure-numpy path, no fallback)
    → exact per-camera rollup.

    FULL DuckDB oracle: the synthetic frame is the closed-form gradient
    ``img[y, x] = (3x + 5y + 7·frame_id) mod 256``, so the rolled-up
    pixel sums are computable in SQL over a generate_series grid — the
    gate hash-checks the real decode, not just pytest."""
    frames = sample_frames(
        synth_bmp_frames(spark, sf_dir, every_k=FRAME_SAMPLE_K),
        every_k=FRAME_SAMPLE_K,
    )
    return camera_rollup_exact(extract_features(frames)).select(
        "camera_id", "n_frames", "avg_intensity", "total_bytes"
    )


def frames_features_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() entry exercising the REAL PNG decoder (zlib + all five
    scanline filters) end-to-end, same closed-form gradient oracle as
    :func:`frames_features_bmp`. ``total_px`` (not total_bytes) is the
    third column because compressed payload sizes are not
    SQL-computable — pixel counts only exist if the decode is real."""
    frames = sample_frames(
        synth_png_frames(spark, sf_dir, every_k=FRAME_SAMPLE_K),
        every_k=FRAME_SAMPLE_K,
    )
    return camera_rollup_exact(extract_features(frames)).select(
        "camera_id", "n_frames", "avg_intensity", "total_px"
    )


# BMP payload size is fixed by geometry: file+info headers (54) +
# 256-entry palette (1024) + 4-byte-aligned rows.
_BMP_PAYLOAD_BYTES = 54 + 1024 + ((BMP_W + 3) & ~3) * BMP_H


def _grid_rollup_oracle(w: int, h: int, extra_col: str) -> str:
    from smart_city_data_pipeline_spark.functions.rounding import pround_sql

    avg = pround_sql("CAST(SUM(s) AS DOUBLE) / CAST(SUM(n_px) AS DOUBLE)")
    return f"""
        WITH f AS (
            SELECT doc_id AS frame_id, doc_id % 16 AS camera_id
            FROM documents WHERE (doc_id % 30) % {FRAME_SAMPLE_K} = 0
        ),
        grid AS (
            SELECT gx.x AS x, gy.y AS y
            FROM generate_series(0, {w - 1}) gx(x), generate_series(0, {h - 1}) gy(y)
        ),
        per AS (
            SELECT frame_id, camera_id,
                   SUM((3 * x + 5 * y + 7 * frame_id) % 256) AS s,
                   COUNT(*) AS n_px
            FROM f, grid GROUP BY 1, 2
        )
        SELECT camera_id, COUNT(*) AS n_frames,
               {avg} AS avg_intensity,
               {extra_col}
        FROM per GROUP BY camera_id
    """


RESIZE_W, RESIZE_H = 16, 12


def frames_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() entry proving the REAL resize path end-to-end under
    the hash gate: BMP frames → nearest-neighbor resize + BMP re-encode
    (:func:`resize_frames`) → decode again → camera rollup. The
    nearest-neighbor map ``src[(y·H)//H', (x·W)//W']`` over the
    synthetic gradient is closed-form, so the oracle recomputes the
    resized pixel means entirely in SQL — a wrong index map, stride
    bug, or re-encode defect hash-mismatches here."""
    frames = sample_frames(
        synth_bmp_frames(spark, sf_dir, every_k=FRAME_SAMPLE_K),
        every_k=FRAME_SAMPLE_K,
    )
    resized = resize_frames(frames, RESIZE_W, RESIZE_H)
    return camera_rollup_exact(extract_features(resized)).select(
        "camera_id", "n_frames", "avg_intensity", "total_px"
    )


def _resize_rollup_oracle(src_w: int, src_h: int, w: int, h: int) -> str:
    from smart_city_data_pipeline_spark.functions.rounding import pround_sql

    avg = pround_sql("CAST(SUM(s) AS DOUBLE) / CAST(SUM(n_px) AS DOUBLE)")
    px = f"(3 * ((x * {src_w}) // {w}) + 5 * ((y * {src_h}) // {h}) + 7 * frame_id) % 256"
    return f"""
        WITH f AS (
            SELECT doc_id AS frame_id, doc_id % 16 AS camera_id
            FROM documents WHERE (doc_id % 30) % {FRAME_SAMPLE_K} = 0
        ),
        grid AS (
            SELECT gx.x AS x, gy.y AS y
            FROM generate_series(0, {w - 1}) gx(x), generate_series(0, {h - 1}) gy(y)
        ),
        per AS (
            SELECT frame_id, camera_id,
                   SUM({px}) AS s,
                   COUNT(*) AS n_px
            FROM f, grid GROUP BY 1, 2
        )
        SELECT camera_id, COUNT(*) AS n_frames,
               {avg} AS avg_intensity,
               CAST(COUNT(*) * {w * h} AS BIGINT) AS total_px
        FROM per GROUP BY camera_id
    """


def frames_features_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() entry exercising the REAL baseline JPEG decoder
    (bitstream-built Huffman tables, dequant, IDCT) end-to-end under
    the hash gate. The block-constant even-offset synthetic family
    decodes bit-exactly (see :mod:`jpeg_codec`), so the oracle
    recomputes the decoded pixel means in closed-form SQL — through an
    actual lossy-format entropy-coded round trip."""
    frames = sample_frames(
        synth_jpeg_frames(spark, sf_dir, every_k=FRAME_SAMPLE_K),
        every_k=FRAME_SAMPLE_K,
    )
    return camera_rollup_exact(extract_features(frames)).select(
        "camera_id", "n_frames", "avg_intensity", "total_px"
    )


def _jpeg_rollup_oracle(w: int, h: int) -> str:
    from smart_city_data_pipeline_spark.functions.rounding import pround_sql

    avg = pround_sql("CAST(SUM(s) AS DOUBLE) / CAST(SUM(n_px) AS DOUBLE)")
    px = "64 + 2 * ((3 * (x // 8) + 5 * (y // 8) + 7 * frame_id) % 64)"
    return f"""
        WITH f AS (
            SELECT doc_id AS frame_id, doc_id % 16 AS camera_id
            FROM documents WHERE (doc_id % 30) % {FRAME_SAMPLE_K} = 0
        ),
        grid AS (
            SELECT gx.x AS x, gy.y AS y
            FROM generate_series(0, {w - 1}) gx(x), generate_series(0, {h - 1}) gy(y)
        ),
        per AS (
            SELECT frame_id, camera_id,
                   SUM({px}) AS s,
                   COUNT(*) AS n_px
            FROM f, grid GROUP BY 1, 2
        )
        SELECT camera_id, COUNT(*) AS n_frames,
               {avg} AS avg_intensity,
               CAST(COUNT(*) * {w * h} AS BIGINT) AS total_px
        FROM per GROUP BY camera_id
    """


def frames_features_jpeg_color(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() entry exercising the 3-component 4:4:4 COLOR JPEG
    decode (interleaved Y/Cb/Cr MCUs, per-component DC predictors,
    YCbCr→RGB) under the hash gate: the synthetic frames are
    gray-identical RGB, so the color transform cancels exactly and the
    decoded gray equals the same closed-form source as the gray
    entry."""
    frames = sample_frames(
        synth_jpeg_frames(spark, sf_dir, every_k=FRAME_SAMPLE_K, color=True),
        every_k=FRAME_SAMPLE_K,
    )
    return camera_rollup_exact(extract_features(frames)).select(
        "camera_id", "n_frames", "avg_intensity", "total_px"
    )


def frames_features_jpeg420(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() entry exercising the 4:2:0 chroma-subsampled JPEG
    decode — the dominant real-camera layout (16×16 MCUs, 4 Y + Cb +
    Cr blocks, chroma upsample) — under the hash gate, with the same
    closed-form oracle: constant chroma survives the 2×2-mean
    downsample and the replication upsample exactly."""
    frames = sample_frames(
        synth_jpeg_frames(
            spark, sf_dir, every_k=FRAME_SAMPLE_K, color=True, subsample=True
        ),
        every_k=FRAME_SAMPLE_K,
    )
    return camera_rollup_exact(extract_features(frames)).select(
        "camera_id", "n_frames", "avg_intensity", "total_px"
    )


def frames_features_jpeg_prog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() entry exercising the PROGRESSIVE (SOF2) JPEG decoder
    under the hash gate: a real four-stage successive-approximation
    bitstream (interleaved DC scan at Al=1, per-component AC first
    scans at Al=1, DC refinement, per-component AC refinement with
    correction-bit semantics) accumulated into the coefficient store
    and reconstructed — the scan-script machinery sequential decode
    never touches. Same closed-form oracle: the refinement scans
    reassemble the exact quantized coefficients, the frame family is
    lossless by construction, and gray-identical RGB cancels the color
    transform exactly."""
    frames = sample_frames(
        synth_jpeg_frames(
            spark, sf_dir, every_k=FRAME_SAMPLE_K, color=True, progressive=True
        ),
        every_k=FRAME_SAMPLE_K,
    )
    return camera_rollup_exact(extract_features(frames)).select(
        "camera_id", "n_frames", "avg_intensity", "total_px"
    )


# --- Audio modality: real RIFF/WAV plumbing ---------------------------
#
# The multimodal brief's audio leg, built like the image codec family:
# payloads are REAL RIFF/WAVE files (PCM 16-bit mono) synthesized from
# a closed-form integer signal, the decoder is a real chunk-walking
# RIFF parser (numpy, no audio libs — none are in the container), and
# every extracted feature is an exact integer with an arithmetic
# closed form, so the DuckDB oracle needs no decode at all.
#
# Signal: a two-level square wave — ``s[i] = +A`` for the first half of
# each period, ``-B`` (B = A//2) for the second — parameterized per
# clip by clip_id. Closed forms (H = P//2):
#   n_hi  = (N // P)·H + min(N mod P, H)         # +A samples
#   zc    = (N − 1) // H                         # sign flips
#   sums  = n_hi·A − (N − n_hi)·B, n_hi·A² + (N − n_hi)·B²
# All < 2⁵³ by construction (A ≤ 8000, N ≤ 2368).

AUDIO_SR = 8000  # sample rate stamped in the fmt chunk


def _wav_params(clip_id: int) -> tuple[int, int, int]:
    """(n_samples, amp_hi, period) — deterministic per clip."""
    n = 1600 + (clip_id % 5) * 160
    a = 1000 + (clip_id % 8) * 1000
    p = 8 + (clip_id % 13) * 4
    return n, a, p


def encode_wav_pcm16(samples, rate: int = AUDIO_SR) -> bytes:
    """Minimal canonical RIFF/WAVE container: fmt chunk (PCM, mono,
    16-bit) + data chunk, little-endian throughout."""
    import struct

    import numpy as np

    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_pcm16(buf: bytes):
    """Real chunk-walking RIFF parser: verifies the RIFF/WAVE
    signature, iterates chunks (skipping unknown ones, honoring the
    odd-length pad byte), reads the fmt chunk (PCM mono 16-bit only),
    and returns (rate, int16 numpy array). Raises ValueError on
    malformed containers — pytest feeds it truncated and misdeclared
    files (tests/test_audio_wav.py)."""
    import struct

    import numpy as np

    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    declared = struct.unpack("<I", buf[4:8])[0]
    if declared + 8 > len(buf):
        raise ValueError("truncated RIFF payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= declared + 8:
        cid = buf[pos : pos + 4]
        (clen,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        chunk = buf[pos + 8 : pos + 8 + clen]
        if len(chunk) < clen:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            afmt, nch, rate, _, _, bits = struct.unpack("<HHIIHH", chunk[:16])
            if (afmt, nch, bits) != (1, 1, 16):
                raise ValueError("only PCM mono 16-bit supported")
        elif cid == b"data":
            data = chunk
        pos += 8 + clen + (clen & 1)  # odd chunks are padded
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    return rate, np.frombuffer(data, dtype="<i2")


AUDIO_OUT = T.StructType(
    [
        T.StructField("clip_id", T.LongType()),
        T.StructField("device_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("peak", T.LongType()),
        T.StructField("trough", T.LongType()),
        T.StructField("sum_amp", T.LongType()),
        T.StructField("sum_sq", T.LongType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def synth_wav_clips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clip table with REAL WAV payloads (one per document row)."""
    import numpy as np

    docs = spread(
        table(spark, sf_dir, "documents"), "doc_id", key=f"{sf_dir}:documents"
    ).select(F.col("doc_id").alias("clip_id"), (F.col("doc_id") % 16).alias("device_id"))

    out_schema = T.StructType(
        [
            T.StructField("clip_id", T.LongType()),
            T.StructField("device_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for cid in pdf["clip_id"]:
                n, a, p = _wav_params(int(cid))
                i = np.arange(n)
                s = np.where(i % p < p // 2, a, -(a // 2)).astype("<i2")
                payloads.append(encode_wav_pcm16(s))
            yield pd.DataFrame(
                {
                    "clip_id": pdf["clip_id"],
                    "device_id": pdf["device_id"],
                    "payload": payloads,
                }
            )

    return docs.mapInPandas(run, out_schema)


def audio_features_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() entry exercising the REAL WAV decoder end-to-end:
    synth RIFF clips → chunk-walk decode → exact integer features per
    clip (peak/trough, amplitude and energy sums, zero crossings).

    FULL DuckDB oracle with NO decode: every feature has an arithmetic
    closed form in the synthesis parameters (module comment above), so
    the gate hash-checks that the real parser reproduces the
    generative signal bit-exactly. Scale shape: mapInPandas is
    Arrow-batched and embarrassingly parallel per clip; features are
    integers, the rollup (if any) is a keyed aggregate."""
    import numpy as np

    clips = synth_wav_clips(spark, sf_dir)

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid, dev, buf in zip(
                pdf["clip_id"], pdf["device_id"], pdf["payload"]
            ):
                rate, s = decode_wav_pcm16(bytes(buf))
                s64 = s.astype(np.int64)
                zc = int(np.count_nonzero(s64[1:] * s64[:-1] < 0))
                rows.append(
                    (
                        int(cid), int(dev), int(rate), int(s64.size),
                        int(s64.max()), int(s64.min()),
                        int(s64.sum()), int((s64 * s64).sum()), zc,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "clip_id", "device_id", "sample_rate", "n_samples",
                    "peak", "trough", "sum_amp", "sum_sq", "zero_crossings",
                ],
            )

    return clips.mapInPandas(run, AUDIO_OUT)


def audio_resample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() entry proving the audio TRANSFORM path end-to-end
    under the hash gate (the ``frames_resize_stats`` pattern): decode
    the real WAV → decimate by 2 (naive every-other-sample downsample,
    documented aliasing contract — the anti-alias filter is a real
    DSP dependency this container doesn't carry) → re-encode at half
    the rate → decode AGAIN → exact integer features.

    Oracle with no decode: the decimated two-level square wave has the
    same closed forms with ``M = (N+1)//2`` samples and quarter-period
    ``r = P//4`` (``s[2j]`` hits the hi level iff ``j mod P/2 <
    P/4``; P ≡ 0 mod 4 by construction)."""
    import numpy as np

    clips = synth_wav_clips(spark, sf_dir)

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid, dev, buf in zip(
                pdf["clip_id"], pdf["device_id"], pdf["payload"]
            ):
                rate, s = decode_wav_pcm16(bytes(buf))
                re_buf = encode_wav_pcm16(s[::2], rate // 2)
                rate2, d = decode_wav_pcm16(re_buf)
                d64 = d.astype(np.int64)
                zc = int(np.count_nonzero(d64[1:] * d64[:-1] < 0))
                rows.append(
                    (
                        int(cid), int(dev), int(rate2), int(d64.size),
                        int(d64.max()), int(d64.min()),
                        int(d64.sum()), int((d64 * d64).sum()), zc,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "clip_id", "device_id", "sample_rate", "n_samples",
                    "peak", "trough", "sum_amp", "sum_sq", "zero_crossings",
                ],
            )

    return clips.mapInPandas(run, AUDIO_OUT)


QUERIES = {
    "frames_features": frames_features,
    "frames_features_bmp": frames_features_bmp,
    "frames_features_png": frames_features_png,
    "frames_resize_stats": frames_resize_stats,
    "frames_features_jpeg": frames_features_jpeg,
    "frames_features_jpeg_color": frames_features_jpeg_color,
    "frames_features_jpeg420": frames_features_jpeg420,
    "frames_features_jpeg_prog": frames_features_jpeg_prog,
    "audio_features_wav": audio_features_wav,
    "audio_resample_stats": audio_resample_stats,
}

ORACLES: dict[str, str] = {
    # closed-form integer features of the two-level square wave — no
    # decode in SQL; hash-match proves the real RIFF parse reproduces
    # the generative signal exactly
    "audio_features_wav": f"""
        WITH p AS (
            SELECT doc_id AS clip_id, doc_id % 16 AS device_id,
                   1600 + (doc_id % 5) * 160 AS n,
                   1000 + (doc_id % 8) * 1000 AS a,
                   8 + (doc_id % 13) * 4 AS per
            FROM documents
        ),
        d AS (
            SELECT clip_id, device_id, n, a, a // 2 AS b, per, per // 2 AS h,
                   (n // per) * (per // 2)
                       + LEAST(n % per, per // 2) AS n_hi
            FROM p
        )
        SELECT clip_id, device_id,
               CAST({AUDIO_SR} AS INTEGER) AS sample_rate,
               CAST(n AS BIGINT) AS n_samples,
               CAST(a AS BIGINT) AS peak,
               CAST(-b AS BIGINT) AS trough,
               CAST(n_hi * a - (n - n_hi) * b AS BIGINT) AS sum_amp,
               CAST(n_hi * a * a + (n - n_hi) * b * b AS BIGINT) AS sum_sq,
               CAST((n - 1) // h AS BIGINT) AS zero_crossings
        FROM d
    """,
    # decimated closed forms: M=(N+1)//2 samples, quarter-period r=P//4
    "audio_resample_stats": f"""
        WITH p AS (
            SELECT doc_id AS clip_id, doc_id % 16 AS device_id,
                   (1600 + (doc_id % 5) * 160 + 1) // 2 AS m,
                   1000 + (doc_id % 8) * 1000 AS a,
                   (8 + (doc_id % 13) * 4) // 2 AS q,
                   (8 + (doc_id % 13) * 4) // 4 AS r
            FROM documents
        ),
        d AS (
            SELECT clip_id, device_id, m, a, a // 2 AS b, q, r,
                   (m // q) * r + LEAST(m % q, r) AS n_hi
            FROM p
        )
        SELECT clip_id, device_id,
               CAST({AUDIO_SR // 2} AS INTEGER) AS sample_rate,
               CAST(m AS BIGINT) AS n_samples,
               CAST(a AS BIGINT) AS peak,
               CAST(-b AS BIGINT) AS trough,
               CAST(n_hi * a - (m - n_hi) * b AS BIGINT) AS sum_amp,
               CAST(n_hi * a * a + (m - n_hi) * b * b AS BIGINT) AS sum_sq,
               CAST((m - 1) // r AS BIGINT) AS zero_crossings
        FROM d
    """,
    "frames_features_bmp": _grid_rollup_oracle(
        BMP_W, BMP_H, f"CAST(COUNT(*) * {_BMP_PAYLOAD_BYTES} AS BIGINT) AS total_bytes"
    ),
    "frames_features_png": _grid_rollup_oracle(
        PNG_W, PNG_H, f"CAST(COUNT(*) * {PNG_W * PNG_H} AS BIGINT) AS total_px"
    ),
    "frames_resize_stats": _resize_rollup_oracle(
        BMP_W, BMP_H, RESIZE_W, RESIZE_H
    ),
    "frames_features_jpeg": _jpeg_rollup_oracle(JPEG_W, JPEG_H),
    "frames_features_jpeg_color": _jpeg_rollup_oracle(JPEG_W, JPEG_H),
    "frames_features_jpeg420": _jpeg_rollup_oracle(JPEG_W, JPEG_H),
    "frames_features_jpeg_prog": _jpeg_rollup_oracle(JPEG_W, JPEG_H),
}


def _gap_params(clip_id: int) -> tuple[int, int, int]:
    """(n_samples, amp, block) for the gapped clips — deterministic."""
    n = 1600 + (clip_id % 5) * 160
    a = 1000 + (clip_id % 8) * 1000
    b = 200 + (clip_id % 3) * 40
    return n, a, b


def synth_wav_gapped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clip table with REAL WAV payloads whose signal alternates
    loud/SILENT blocks (loud first): block j of ``block`` samples is a
    square wave of amplitude ±amp when j is even and exact zeros when
    j is odd — the planted structure every silence statistic below
    has a closed form over."""
    import numpy as np

    docs = spread(
        table(spark, sf_dir, "documents"), "doc_id", key=f"{sf_dir}:documents"
    ).select(
        F.col("doc_id").alias("clip_id"),
        (F.col("doc_id") % 16).alias("device_id"),
    )
    out_schema = T.StructType(
        [
            T.StructField("clip_id", T.LongType()),
            T.StructField("device_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for cid in pdf["clip_id"]:
                n, a, b = _gap_params(int(cid))
                i = np.arange(n)
                loud = np.where(i % 8 < 4, a, -a)
                s = np.where((i // b) % 2 == 0, loud, 0).astype("<i2")
                payloads.append(encode_wav_pcm16(s))
            yield pd.DataFrame(
                {
                    "clip_id": pdf["clip_id"],
                    "device_id": pdf["device_id"],
                    "payload": payloads,
                }
            )

    return docs.mapInPandas(run, out_schema)


SIL_T = 500  # |sample| below this counts as silence

AUDIO_SIL_OUT = T.StructType(
    [
        T.StructField("clip_id", T.LongType()),
        T.StructField("device_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_silent_runs", T.LongType()),
        T.StructField("silent_samples", T.LongType()),
        T.StructField("longest_silent_run", T.LongType()),
        T.StructField("silent_fraction", T.DoubleType()),
    ]
)


def audio_silence_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence segmentation over REAL decoded audio — the VAD
    primitive (run-length extraction under an amplitude gate) every
    speech pipeline runs before transcription: per clip, the silent
    run count, total silent samples, longest run, and silent
    fraction (|sample| < ``SIL_T``).

    FULL oracle with NO decode: the gapped synthesis alternates
    loud/silent blocks, so every statistic is integer arithmetic in
    (n, block) — full_blocks = n div B, silent blocks are the odd
    ones, a trailing partial block is silent iff full_blocks is odd
    (closed forms inline in the SQL). The hash match proves the real
    RIFF parse + numpy run-length extraction reproduce the
    generative structure bit-exactly (the ``audio_features_wav``
    discipline). Scale: Arrow-batched mapInPandas, embarrassingly
    parallel per clip; run-length is one vectorized diff per clip.
    """
    import numpy as np

    clips = synth_wav_gapped(spark, sf_dir)

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid, dev, buf in zip(
                pdf["clip_id"], pdf["device_id"], pdf["payload"]
            ):
                _rate, s = decode_wav_pcm16(bytes(buf))
                sil = (np.abs(s.astype(np.int64)) < SIL_T).astype(np.int8)
                # run boundaries via the padded diff trick
                d = np.diff(np.concatenate(([0], sil, [0])))
                starts = np.flatnonzero(d == 1)
                ends = np.flatnonzero(d == -1)
                lens = ends - starts
                rows.append(
                    (
                        int(cid),
                        int(dev),
                        int(s.size),
                        int(lens.size),
                        int(lens.sum()),
                        int(lens.max()) if lens.size else 0,
                        float(lens.sum()) / float(s.size),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_SIL_OUT])

    out = clips.mapInPandas(run, AUDIO_SIL_OUT)
    return out.select(
        "clip_id",
        "device_id",
        "n_samples",
        "n_silent_runs",
        "silent_samples",
        "longest_silent_run",
        pround(F.col("silent_fraction")).alias("silent_fraction"),
    )


QUERIES["audio_silence_segments"] = audio_silence_segments

# closed-form twin: n = 1600 + (id%5)*160, B = 200 + (id%3)*40;
# blocks alternate loud/silent starting loud, so silent blocks are the
# odd-indexed ones and a trailing partial block is silent iff
# full_blocks is odd.
ORACLES["audio_silence_segments"] = f"""
    WITH p AS (
        SELECT doc_id AS clip_id,
               doc_id % 16 AS device_id,
               1600 + (doc_id % 5) * 160 AS n,
               200 + (doc_id % 3) * 40 AS b
        FROM documents
    ),
    d AS (
        SELECT clip_id, device_id, n, b,
               n // b AS full_blocks,
               n % b AS rem
        FROM p
    ),
    s AS (
        SELECT clip_id, device_id, n,
               CAST(full_blocks // 2 AS BIGINT) AS n_full_silent,
               CAST(CASE WHEN full_blocks % 2 = 1 AND rem > 0
                         THEN rem ELSE 0 END AS BIGINT) AS partial_silent,
               b
        FROM d
    )
    SELECT clip_id,
           device_id,
           CAST(n AS BIGINT) AS n_samples,
           CAST(n_full_silent
                + CASE WHEN partial_silent > 0 THEN 1 ELSE 0 END
                AS BIGINT) AS n_silent_runs,
           CAST(n_full_silent * b + partial_silent AS BIGINT)
               AS silent_samples,
           CAST(CASE WHEN n_full_silent >= 1 THEN b
                     ELSE partial_silent END AS BIGINT)
               AS longest_silent_run,
           {pround_sql(
               'CAST(n_full_silent * b + partial_silent AS DOUBLE)'
               ' / CAST(n AS DOUBLE)'
           )} AS silent_fraction
    FROM s
"""


# Perceptual average-hash (aHash) geometry: decoded frame -> 8x8
# nearest-neighbor thumbnail -> bit = pixel > frame mean. Split across
# two BIGINT halves because bit 63 of a single hash would overflow
# signed 64-bit SUMs in both engines.
AHASH_SIDE = 8


def ahash_features(frames: DataFrame) -> DataFrame:
    """Decode + perceptual average-hash via mapInPandas: REAL decode
    (:func:`_decode_frame`), nearest-neighbor 8x8 thumbnail (the
    ``resize_frames`` index map), then bit_i = px_i*64 > sum(px) — the
    strict integer comparison instead of a float mean, so the bit
    pattern is engine-exact."""

    schema = T.StructType(
        [
            T.StructField("frame_id", T.LongType()),
            T.StructField("camera_id", T.LongType()),
            T.StructField("ahash_hi", T.LongType()),
            T.StructField("ahash_lo", T.LongType()),
        ]
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            his, los = [], []
            for buf in pdf["payload"]:
                raw = bytes(buf) if buf is not None else b""
                arr = _decode_frame(raw)
                if arr is None:
                    his.append(-1)
                    los.append(-1)
                    continue
                h, w = arr.shape
                ys = (np.arange(AHASH_SIDE) * h) // AHASH_SIDE
                xs = (np.arange(AHASH_SIDE) * w) // AHASH_SIDE
                thumb = arr[np.ix_(ys, xs)].astype(np.int64)
                s = int(thumb.sum())
                bits = (thumb * (AHASH_SIDE * AHASH_SIDE) > s).flatten()
                lo = sum(1 << i for i in range(32) if bits[i])
                hi = sum(1 << (i - 32) for i in range(32, 64) if bits[i])
                his.append(hi)
                los.append(lo)
            yield pd.DataFrame(
                {
                    "frame_id": pdf["frame_id"],
                    "camera_id": pdf["camera_id"],
                    "ahash_hi": his,
                    "ahash_lo": los,
                }
            )

    return frames.select("frame_id", "camera_id", "payload").mapInPandas(run, schema)


def frames_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-duplicate detection over REAL decoded frames:
    average-hash (8x8 thumbnail, mean-threshold bits — the classic
    aHash of pHash-family dedup) computed through the actual BMP
    decode path, then exact hash grouping. The multimodal twin of
    ``dedup_exact``: frames whose CONTENT collides perceptually group
    together however their payload bytes differ.

    The synthetic gradient px=(3x+5y+7f)%256 makes the thumbnail a
    closed form of ``f mod 256`` — the oracle recomputes every bit in
    SQL (8x8 grid per sampled frame), so a decode/stride/threshold
    defect hash-mismatches. Groups keyed on (hi, lo) halves; a single
    64-bit key would overflow signed SUMs at bit 63.

    100 TB story: the only Python is the Arrow-batched decode (already
    the documented seam); the dedup itself is ONE map-side-combinable
    keyed aggregate on a 64-bit key — no pair joins, no windows."""
    frames = sample_frames(
        synth_bmp_frames(spark, sf_dir, every_k=FRAME_SAMPLE_K),
        every_k=FRAME_SAMPLE_K,
    )
    hashed = ahash_features(frames)
    return (
        hashed.groupBy("ahash_hi", "ahash_lo")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.countDistinct("camera_id").alias("n_cameras"),
            F.min("frame_id").alias("first_frame"),
        )
        .select(
            "ahash_hi",
            "ahash_lo",
            "n_frames",
            "n_cameras",
            "first_frame",
            (F.col("n_frames") > 1).alias("is_dup"),
        )
    )


QUERIES["frames_ahash_dedup"] = frames_ahash_dedup

# Thumbnail index map for the 32x24 BMP family: x=(X*32)//8=4X,
# y=(Y*24)//8=3Y, so thumb px = (12X + 15Y + 7f) % 256.
ORACLES["frames_ahash_dedup"] = f"""
    WITH f AS (
        SELECT doc_id AS frame_id, doc_id % 16 AS camera_id
        FROM documents WHERE (doc_id % 30) % {FRAME_SAMPLE_K} = 0
    ),
    grid AS (
        SELECT gx.x AS x, gy.y AS y
        FROM generate_series(0, {AHASH_SIDE - 1}) gx(x),
             generate_series(0, {AHASH_SIDE - 1}) gy(y)
    ),
    px AS (
        SELECT frame_id, camera_id, x, y,
               (12 * x + 15 * y + 7 * frame_id) % 256 AS v
        FROM f, grid
    ),
    s AS (
        SELECT frame_id, SUM(v) AS sv FROM px GROUP BY 1
    ),
    hashes AS (
        SELECT px.frame_id, px.camera_id,
               CAST(SUM(CASE WHEN px.v * 64 > s.sv AND px.y * 8 + px.x >= 32
                        THEN CAST(1 AS BIGINT) << (px.y * 8 + px.x - 32)
                        ELSE 0 END) AS BIGINT) AS ahash_hi,
               CAST(SUM(CASE WHEN px.v * 64 > s.sv AND px.y * 8 + px.x < 32
                        THEN CAST(1 AS BIGINT) << (px.y * 8 + px.x)
                        ELSE 0 END) AS BIGINT) AS ahash_lo
        FROM px JOIN s ON px.frame_id = s.frame_id
        GROUP BY 1, 2
    )
    SELECT ahash_hi, ahash_lo,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(COUNT(DISTINCT camera_id) AS BIGINT) AS n_cameras,
           CAST(MIN(frame_id) AS BIGINT) AS first_frame,
           (COUNT(*) > 1) AS is_dup
    FROM hashes GROUP BY 1, 2
"""


# Walsh-Hadamard audio analysis window: first 64 samples of each clip.
# The +/-1 Walsh basis from bit_count(k AND i) keeps every coefficient
# an exact integer (the walsh_energy discipline applied to the AUDIO
# modality), so band energies survive the hash gate through a REAL
# RIFF decode.
AWB_N = 64
AWB_BANDS = ((0, 0, "dc"), (1, 7, "low"), (8, 31, "mid"), (32, 63, "high"))


def audio_walsh_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequency-band spectral analysis of REAL decoded audio: decode
    the RIFF/PCM payload, take the first 64 samples, compute the
    Walsh-Hadamard transform W_k = sum_i s_i*(-1)^popcount(k&i), and
    roll coefficient energies into four sequency bands (dc / low /
    mid / high) — the integer-exact stand-in for the mel-band energies
    a speech pipeline extracts per clip. A square wave of period p
    concentrates energy in the band whose sequency matches 64/p, so
    ``dominant_band`` varies across clips (both branches of the
    comparison are live under the gate).

    Exactness: PCM samples are int16, every W_k is an exact int64
    (|W_k| <= 64*32767), band energies are exact integer sums of W_k^2
    — no floats anywhere. The oracle replays the transform from the
    synthesis closed form (i%p square wave) over a generate_series
    grid, never touching the payload — the hash match proves the real
    parser + transform reproduce the generative signal bit-exactly.

    100 TB story: Arrow-batched decode per clip (the documented
    multimodal seam), a 64x64 integer matmul per clip in numpy, then
    plain columns — no shuffle at all until a consumer aggregates."""
    import numpy as np

    clips = synth_wav_clips(spark, sf_dir)

    schema = T.StructType(
        [
            T.StructField("clip_id", T.LongType()),
            T.StructField("device_id", T.LongType()),
            T.StructField("e_dc", T.LongType()),
            T.StructField("e_low", T.LongType()),
            T.StructField("e_mid", T.LongType()),
            T.StructField("e_high", T.LongType()),
            T.StructField("dominant_band", T.StringType()),
        ]
    )

    # +/-1 Walsh matrix (natural/Hadamard order), built once per worker.
    ks = np.arange(AWB_N)
    pop = np.zeros((AWB_N, AWB_N), dtype=np.int64)
    for k in range(AWB_N):
        for i in range(AWB_N):
            pop[k, i] = bin(k & i).count("1") & 1
    WALSH = 1 - 2 * pop  # (-1)^popcount(k&i)

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid, dev, buf in zip(
                pdf["clip_id"], pdf["device_id"], pdf["payload"]
            ):
                rate, s = decode_wav_pcm16(bytes(buf))
                w = WALSH @ s[:AWB_N].astype(np.int64)
                e = w * w
                bands = [int(e[lo : hi + 1].sum()) for lo, hi, _ in AWB_BANDS]
                dom = max(zip(bands, [name for _, _, name in AWB_BANDS]))[1]
                rows.append((int(cid), int(dev), *bands, dom))
            yield pd.DataFrame(
                rows,
                columns=[
                    "clip_id", "device_id",
                    "e_dc", "e_low", "e_mid", "e_high", "dominant_band",
                ],
            )

    return clips.mapInPandas(run, schema)


QUERIES["audio_walsh_bands"] = audio_walsh_bands

# Synthesis closed form (synth_wav_clips): s[i] = a if i%p < p//2 else
# -(a//2) with n=1600+(id%5)*160 (>= 64 always), a=1000+(id%8)*1000,
# p=8+(id%13)*4. Dominant-band tie-break = max (energy, name) pair,
# mirrored with array_max over (e, name) structs.
ORACLES["audio_walsh_bands"] = f"""
    WITH clips AS (
        SELECT doc_id AS clip_id, doc_id % 16 AS device_id,
               1000 + (doc_id % 8) * 1000 AS a,
               8 + (doc_id % 13) * 4 AS p
        FROM documents
    ),
    grid AS (
        SELECT gk.k AS k, gi.i AS i
        FROM generate_series(0, {AWB_N - 1}) gk(k),
             generate_series(0, {AWB_N - 1}) gi(i)
    ),
    coef AS (
        SELECT c.clip_id, c.device_id, g.k,
               SUM((CASE WHEN g.i % c.p < c.p // 2 THEN c.a
                    ELSE -(c.a // 2) END)
                   * (1 - 2 * (bit_count(CAST(g.k AS BIGINT)
                                         & CAST(g.i AS BIGINT)) % 2))
               ) AS w
        FROM clips c, grid g
        GROUP BY 1, 2, 3
    ),
    bands AS (
        SELECT clip_id, device_id,
               CAST(SUM(CASE WHEN k = 0 THEN w * w ELSE 0 END) AS BIGINT)
                   AS e_dc,
               CAST(SUM(CASE WHEN k BETWEEN 1 AND 7 THEN w * w ELSE 0 END)
                   AS BIGINT) AS e_low,
               CAST(SUM(CASE WHEN k BETWEEN 8 AND 31 THEN w * w ELSE 0 END)
                   AS BIGINT) AS e_mid,
               CAST(SUM(CASE WHEN k BETWEEN 32 AND 63 THEN w * w ELSE 0 END)
                   AS BIGINT) AS e_high
        FROM coef GROUP BY 1, 2
    ),
    expanded AS (
        SELECT clip_id, unnest(ARRAY[
            {{'e': e_dc, 'name': 'dc'}},
            {{'e': e_low, 'name': 'low'}},
            {{'e': e_mid, 'name': 'mid'}},
            {{'e': e_high, 'name': 'high'}}
        ]) AS b
        FROM bands
    ),
    dom AS (SELECT clip_id, MAX(b) AS mb FROM expanded GROUP BY 1)
    SELECT bands.clip_id, device_id, e_dc, e_low, e_mid, e_high,
           struct_extract(dom.mb, 'name') AS dominant_band
    FROM bands JOIN dom ON bands.clip_id = dom.clip_id
"""


# Scene-cut decision: mean intensity jump between CONSECUTIVE sampled
# frames of a camera exceeding SCENE_CUT_TH gray levels. Compared as
# |sum_t - sum_prev| > TH * n_px — pure integers (n_px is equal on
# both sides of a pair by construction).
SCENE_CUT_TH = 16


def scene_cut_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection over REAL decoded frames — the frame-
    differencing keyframe detector every video ingestion pipeline runs
    before expensive per-frame models (sample at cuts, not uniformly):
    per camera, order sampled frames, flag jumps where the mean
    intensity moves more than SCENE_CUT_TH gray levels between
    consecutive frames.

    All decisions are integer: the decode yields exact
    ``sum_intensity``/``n_px`` (:func:`extract_features`), the jump
    test cross-multiplies ``|sum_t - sum_prev| > TH*n_px``, and the
    oracle recomputes every frame's pixel sum from the closed-form
    gradient — a stride/palette/row-order decode bug shifts a sum and
    flips a cut.

    Shape: Arrow-batched decode (the documented seam), ONE lag window
    per camera (keyed on camera_id, ordered by frame_id), one rollup.
    At 100 TB the window state is one previous row per camera."""
    from pyspark.sql import Window

    frames = sample_frames(
        synth_bmp_frames(spark, sf_dir, every_k=FRAME_SAMPLE_K),
        every_k=FRAME_SAMPLE_K,
    )
    feats = extract_features(frames).select(
        "camera_id", "frame_id", "sum_intensity", "n_px"
    )
    w = Window.partitionBy("camera_id").orderBy("frame_id")
    diffs = feats.withColumn(
        "jump", F.abs(F.col("sum_intensity") - F.lag("sum_intensity").over(w))
    )
    cut = (F.col("jump") > F.lit(SCENE_CUT_TH) * F.col("n_px")).cast("int")
    per = diffs.select(
        "camera_id",
        "frame_id",
        "jump",
        "n_px",
        F.when(F.col("jump").isNotNull(), cut).alias("is_cut"),
    )
    return per.groupBy("camera_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum(F.coalesce(F.col("is_cut"), F.lit(0))).alias("n_cuts"),
        F.max("jump").alias("max_jump"),
        F.min(
            F.when(F.col("is_cut") == 1, F.col("frame_id"))
        ).alias("first_cut_frame"),
        pround(
            F.sum(F.coalesce(F.col("is_cut"), F.lit(0))).cast("double")
            / F.count(F.lit(1))
        ).alias("cut_rate"),
    )


QUERIES["scene_cut_detect"] = scene_cut_detect

ORACLES["scene_cut_detect"] = f"""
    WITH f AS (
        SELECT doc_id AS frame_id, doc_id % 16 AS camera_id
        FROM documents WHERE (doc_id % 30) % {FRAME_SAMPLE_K} = 0
    ),
    grid AS (
        SELECT gx.x AS x, gy.y AS y
        FROM generate_series(0, {BMP_W - 1}) gx(x),
             generate_series(0, {BMP_H - 1}) gy(y)
    ),
    sums AS (
        SELECT frame_id, camera_id,
               SUM((3 * x + 5 * y + 7 * frame_id) % 256) AS s,
               COUNT(*) AS n_px
        FROM f, grid GROUP BY 1, 2
    ),
    diffs AS (
        SELECT camera_id, frame_id, n_px,
               ABS(s - LAG(s) OVER (
                   PARTITION BY camera_id ORDER BY frame_id)) AS jump
        FROM sums
    ),
    flagged AS (
        SELECT camera_id, frame_id, jump,
               CASE WHEN jump IS NULL THEN NULL
                    WHEN jump > {SCENE_CUT_TH} * n_px THEN 1
                    ELSE 0 END AS is_cut
        FROM diffs
    )
    SELECT camera_id,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(SUM(COALESCE(is_cut, 0)) AS BIGINT) AS n_cuts,
           CAST(MAX(jump) AS BIGINT) AS max_jump,
           CAST(MIN(CASE WHEN is_cut = 1 THEN frame_id END) AS BIGINT)
               AS first_cut_frame,
           {pround_sql(
               'CAST(SUM(COALESCE(is_cut, 0)) AS DOUBLE) / COUNT(*)'
           )} AS cut_rate
    FROM flagged GROUP BY 1
"""


# --------------------------------------------------------------------------
# Histogram equalization through the real BMP codec.
# --------------------------------------------------------------------------


def equalize_frames(frames: DataFrame) -> DataFrame:
    """Decode → histogram-equalize → BMP re-encode via mapInPandas.

    The mapping is the classic integer CDF stretch, pinned to exact
    integer arithmetic so an oracle can recompute it:
    ``eq(v) = (cdf(v) − cdf_min)·255 // (n_px − cdf_min)`` (floor on
    non-negative operands — engine-portable), identity when the image
    is constant (``n_px == cdf_min``)."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for buf in pdf["payload"]:
                raw = bytes(buf) if buf is not None else b""
                arr = _decode_frame(raw)
                if arr is None:
                    out.append(raw)
                    continue
                vals, counts = np.unique(arr, return_counts=True)
                cdf = np.cumsum(counts)
                denom = int(arr.size) - int(cdf[0])
                if denom <= 0:
                    out.append(encode_bmp_gray(arr))
                    continue
                lut_vals = ((cdf - cdf[0]) * 255) // denom
                lut = np.zeros(256, dtype=np.int64)
                lut[vals] = lut_vals
                out.append(encode_bmp_gray(lut[arr].astype(np.uint8)))
            res = pdf.copy()
            res["payload"] = out
            yield res

    base = frames.select("frame_id", "camera_id", "meta", "payload")
    return base.mapInPandas(run, base.schema)


def frames_equalize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() entry proving histogram EQUALIZATION end-to-end under
    the hash gate: BMP frames → integer-CDF equalize + BMP re-encode
    (:func:`equalize_frames`) → decode again → camera rollup. The
    per-frame gradient is closed-form, so the oracle regenerates each
    frame's pixel multiset in SQL, rebuilds the same integer CDF map
    (a per-frame window over the ≤256-value histogram), and re-derives
    the equalized pixel means exactly — a wrong LUT, cumsum, or
    re-encode defect hash-mismatches here. Equalized images should
    read near mid-gray (mean ≈ 127.5) — the flatness the transform
    promises; the hash check pins the exact value."""
    frames = sample_frames(
        synth_bmp_frames(spark, sf_dir, every_k=FRAME_SAMPLE_K),
        every_k=FRAME_SAMPLE_K,
    )
    return camera_rollup_exact(extract_features(equalize_frames(frames))).select(
        "camera_id", "n_frames", "avg_intensity", "total_px"
    )


QUERIES["frames_equalize_stats"] = frames_equalize_stats

ORACLES["frames_equalize_stats"] = f"""
    WITH f AS (
        SELECT doc_id AS frame_id, doc_id % 16 AS camera_id
        FROM documents WHERE (doc_id % 30) % {FRAME_SAMPLE_K} = 0
    ),
    grid AS (
        SELECT gx.x AS x, gy.y AS y
        FROM generate_series(0, {BMP_W - 1}) gx(x),
             generate_series(0, {BMP_H - 1}) gy(y)
    ),
    px AS (
        SELECT frame_id, camera_id,
               (3 * x + 5 * y + 7 * frame_id) % 256 AS v
        FROM f, grid
    ),
    hist AS (
        SELECT frame_id, camera_id, v, CAST(COUNT(*) AS BIGINT) AS c
        FROM px GROUP BY 1, 2, 3
    ),
    cdf AS (
        SELECT frame_id, camera_id, v, c,
               SUM(c) OVER (PARTITION BY frame_id ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
               FIRST_VALUE(c) OVER (PARTITION BY frame_id ORDER BY v
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS cdf_min
        FROM hist
    ),
    mapped AS (
        SELECT frame_id, camera_id,
               CASE WHEN {BMP_W * BMP_H} - cdf_min > 0
                    THEN ((cum - cdf_min) * 255)
                         // ({BMP_W * BMP_H} - cdf_min)
                    ELSE v END AS ev,
               c
        FROM cdf
    ),
    per AS (
        SELECT frame_id, camera_id,
               CAST(SUM(ev * c) AS BIGINT) AS s,
               CAST(SUM(c) AS BIGINT) AS n_px
        FROM mapped GROUP BY 1, 2
    )
    SELECT camera_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
           {pround_sql('CAST(SUM(s) AS DOUBLE) / CAST(SUM(n_px) AS DOUBLE)')}
               AS avg_intensity,
           CAST(SUM(n_px) AS BIGINT) AS total_px
    FROM per GROUP BY 1
"""


# ---------------------------------------------------------------------------
# MJPEG-in-AVI video containers (round 9): real RIFF build + parse.
# ---------------------------------------------------------------------------

VIDEO_FRAMES = 8        # frames per synthetic video (doc_id DIV 8)
VIDEO_SAMPLE_VIDS = 4   # build every 4th video (cost parity w/ jpeg keys)
VIDEO_DECODE_K = 4      # decode every 4th frame position within a video

_AVI_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.LongType()),
        T.StructField("camera_id", T.LongType()),
        T.StructField("n_frames_hdr", T.IntegerType()),
        T.StructField("n_frames_chunks", T.IntegerType()),
        T.StructField("idx_entries", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_decoded", T.IntegerType()),
        T.StructField("sum_intensity", T.LongType()),
        T.StructField("n_px", T.LongType()),
    ]
)


def _avi_build(frame_ids) -> bytes:
    """Assemble a real RIFF-AVI (MJPEG 'vids' stream) around the
    bit-exact synthetic JPEG frames. Layout: hdrl(avih + strl(strh,
    strf)) + movi('00dc' chunks, word-aligned) + idx1."""
    import struct

    import numpy as np

    from smart_city_data_pipeline_spark.operators.jpeg_codec import (
        encode_jpeg_gray,
    )

    yy, xx = np.mgrid[0:JPEG_H, 0:JPEG_W]
    bxg, byg = xx // 8, yy // 8
    payloads = []
    for fid in frame_ids:
        img = (64 + 2 * ((3 * bxg + 5 * byg + 7 * int(fid)) % 64)).astype(
            np.uint8
        )
        payloads.append(encode_jpeg_gray(img))

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    n = len(payloads)
    avih = struct.pack(
        "<14I",
        33333, 0, 0, 0x10, n, 0, 1, max(map(len, payloads)),
        JPEG_W, JPEG_H, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, 30, 0, n,
        max(map(len, payloads)), 0xFFFFFFFF, 0, 0, 0, 0, 0,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, JPEG_W, JPEG_H, 1, 24, b"MJPG",
        JPEG_W * JPEG_H * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_chunks, idx, off = [], [], 4
    for p in payloads:
        movi_chunks.append(chunk(b"00dc", p))
        idx.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(p)))
        off += 8 + len(p) + (len(p) % 2)
    movi = lst(b"movi", b"".join(movi_chunks))
    idx1 = chunk(b"idx1", b"".join(idx))
    body = b"AVI " + hdrl + movi + idx1
    import struct as _s

    return b"RIFF" + _s.pack("<I", len(body)) + body


def _avi_parse(buf: bytes):
    """Walk the RIFF tree for real: avih header fields, movi '00dc'
    chunk census, idx1 entry count, and decode of every
    VIDEO_DECODE_K-th frame through the shared JPEG decoder."""
    import struct

    from smart_city_data_pipeline_spark.operators.jpeg_codec import (
        decode_jpeg_gray,
    )

    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        return None
    n_hdr = w = h = 0
    chunks, idx_entries = [], 0
    pos = 12
    end = 8 + struct.unpack("<I", buf[4:8])[0]

    def walk(p, stop):
        nonlocal n_hdr, w, h, idx_entries
        while p + 8 <= stop:
            fourcc = buf[p:p + 4]
            size = struct.unpack("<I", buf[p + 4:p + 8])[0]
            body0 = p + 8
            if fourcc == b"LIST":
                walk(body0 + 4, body0 + size)
            elif fourcc == b"avih":
                vals = struct.unpack("<14I", buf[body0:body0 + 56])
                n_hdr, w, h = vals[4], vals[8], vals[9]
            elif fourcc == b"00dc":
                chunks.append(buf[body0:body0 + size])
            elif fourcc == b"idx1":
                idx_entries = size // 16
            p = body0 + size + (size % 2)

    walk(pos, end)
    s_int = n_px = n_dec = 0
    for i, p in enumerate(chunks):
        if i % VIDEO_DECODE_K:
            continue
        img = decode_jpeg_gray(p)
        if img is None:
            continue
        n_dec += 1
        s_int += int(img.astype("int64").sum())
        n_px += int(img.size)
    return n_hdr, len(chunks), idx_entries, w, h, n_dec, s_int, n_px


def video_mjpeg_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() entry for the VIDEO modality: per camera, the census a
    video lake needs — container count, frame counts as claimed by the
    avih header vs counted from the movi '00dc' chunks vs the idx1
    index (the three MUST agree; the parity flag is hash-checked), and
    decoded-frame intensity stats through the REAL JPEG decoder on
    every 4th frame.

    The containers are REAL RIFF-AVI MJPEG files assembled in-engine
    around the bit-exact block-constant JPEG family (one video per 4th
    group of 8 documents), then parsed back by an actual RIFF walker —
    header fields, chunk alignment (odd-size word padding), index
    entries. FULL DuckDB oracle: decoded positions are frame ids ≡ 0,4
    (mod 8), whose pixels are the closed-form gradient, so the rollup
    is computable over a generate_series grid; the container/index
    parities reduce to exact frame counts.

    Scale shape: one grouped collect_list per video (8 ids), one
    mapInPandas build+parse pass (Arrow-batched, payloads never cross
    ungrouped), one keyed camera rollup. At 100 TB the same walker
    reads real camera archives instead of the synthesizer."""
    import pandas as _pd

    docs = spread(
        table(spark, sf_dir, "documents"), "doc_id", key=f"{sf_dir}:documents"
    ).select(
        F.expr(f"doc_id DIV {VIDEO_FRAMES}").alias("video_id"),
        F.col("doc_id").alias("frame_id"),
    ).where(F.expr(f"video_id % {VIDEO_SAMPLE_VIDS} = 0"))
    vids = docs.groupBy("video_id").agg(
        F.sort_array(F.collect_list("frame_id")).alias("frame_ids")
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, fids in zip(pdf["video_id"], pdf["frame_ids"]):
                buf = _avi_build(list(fids))
                parsed = _avi_parse(buf)
                n_hdr, n_chunks, n_idx, w, h, n_dec, s, px = parsed
                rows.append(
                    (
                        int(vid), int(vid) % 16, n_hdr, n_chunks, n_idx,
                        w, h, n_dec, s, px,
                    )
                )
            yield _pd.DataFrame(
                rows, columns=[f.name for f in _AVI_SCHEMA.fields]
            )

    parsed = vids.mapInPandas(run, schema=_AVI_SCHEMA)
    g = parsed.groupBy("camera_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_videos"),
        F.sum("n_frames_chunks").cast("bigint").alias("n_frames"),
        F.min(
            (F.col("n_frames_hdr") == F.col("n_frames_chunks"))
            & (F.col("idx_entries") == F.col("n_frames_chunks"))
            & (F.col("width") == JPEG_W)
            & (F.col("height") == JPEG_H)
        ).alias("containers_consistent"),
        F.sum("n_decoded").cast("bigint").alias("n_decoded"),
        F.sum("sum_intensity").alias("s"),
        F.sum("n_px").alias("px"),
    )
    return g.select(
        "camera_id",
        "n_videos",
        "n_frames",
        "containers_consistent",
        "n_decoded",
        pround(F.col("s").cast("double") / F.col("px").cast("double")).alias(
            "avg_intensity"
        ),
        F.col("px").cast("bigint").alias("total_px"),
    )


QUERIES["video_mjpeg_index"] = video_mjpeg_index

ORACLES["video_mjpeg_index"] = f"""
    WITH vids AS (
        SELECT doc_id // {VIDEO_FRAMES} AS video_id, doc_id AS frame_id
        FROM documents
        WHERE (doc_id // {VIDEO_FRAMES}) % {VIDEO_SAMPLE_VIDS} = 0
    ),
    per_video AS (
        SELECT video_id, video_id % 16 AS camera_id,
               CAST(COUNT(*) AS BIGINT) AS n_frames
        FROM vids GROUP BY 1, 2
    ),
    decoded AS (
        -- parser decodes every {VIDEO_DECODE_K}-th position of the
        -- doc_id-sorted frame list; with {VIDEO_FRAMES} frames per
        -- video those are positions 0 and 4
        SELECT v.video_id, v.video_id % 16 AS camera_id, v.frame_id
        FROM (
            SELECT video_id, frame_id,
                   ROW_NUMBER() OVER (PARTITION BY video_id
                                      ORDER BY frame_id) - 1 AS pos
            FROM vids
        ) v
        WHERE v.pos % {VIDEO_DECODE_K} = 0
    ),
    grid AS (
        SELECT gx.x AS x, gy.y AS y
        FROM generate_series(0, {JPEG_W - 1}) gx(x),
             generate_series(0, {JPEG_H - 1}) gy(y)
    ),
    per_frame AS (
        SELECT d.camera_id, d.frame_id,
               SUM(64 + 2 * ((3 * (x // 8) + 5 * (y // 8)
                   + 7 * d.frame_id) % 64)) AS s,
               COUNT(*) AS n_px
        FROM decoded d, grid GROUP BY 1, 2
    ),
    vstats AS (
        SELECT camera_id,
               CAST(COUNT(*) AS BIGINT) AS n_videos,
               CAST(SUM(n_frames) AS BIGINT) AS n_frames
        FROM per_video GROUP BY 1
    ),
    dstats AS (
        SELECT camera_id,
               CAST(COUNT(*) AS BIGINT) AS n_decoded,
               CAST(SUM(s) AS BIGINT) AS s,
               CAST(SUM(n_px) AS BIGINT) AS px
        FROM per_frame GROUP BY 1
    )
    SELECT v.camera_id, v.n_videos, v.n_frames,
           TRUE AS containers_consistent,
           d.n_decoded,
           {pround_sql('CAST(d.s AS DOUBLE) / CAST(d.px AS DOUBLE)')}
               AS avg_intensity,
           d.px AS total_px
    FROM vstats v JOIN dstats d USING (camera_id)
"""


# ---------------------------------------------------------------------------
# GIF modality (round 9): real LZW codec under the hash gate.
# ---------------------------------------------------------------------------

GIF_W, GIF_H = 48, 20


def synth_gif_frames(
    spark: SparkSession, sf_dir: str, every_k: int | None = None
) -> DataFrame:
    """Frame table whose payloads are REAL LZW-compressed GIF89a files
    (:mod:`gif_codec`) over the shared closed-form gradient — GIF is
    lossless, so the decoded pixels equal the source exactly and the
    rollup carries a full SQL oracle through a genuinely compressed
    variable-code-width bitstream."""
    import numpy as np

    from smart_city_data_pipeline_spark.operators.gif_codec import (
        encode_gif_gray,
    )

    docs = spread(
        table(spark, sf_dir, "documents"), "doc_id", key=f"{sf_dir}:documents"
    ).select(
        F.col("doc_id").alias("frame_id"), (F.col("doc_id") % 16).alias("camera_id")
    )
    if every_k is not None:
        docs = docs.where((F.col("frame_id") % 30) % every_k == 0)

    out_schema = T.StructType(
        [
            T.StructField("frame_id", T.LongType()),
            T.StructField("camera_id", T.LongType()),
            T.StructField("meta", FRAME_META),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yy, xx = np.mgrid[0:GIF_H, 0:GIF_W]
        for pdf in batches:
            payloads, metas = [], []
            for fid in pdf["frame_id"]:
                img = ((3 * xx + 5 * yy + 7 * int(fid)) % 256).astype(
                    np.uint8
                )
                payloads.append(encode_gif_gray(img))
                metas.append(
                    {
                        "width": GIF_W,
                        "height": GIF_H,
                        "format": "gif",
                        "frame_no": int(fid) % 30,
                    }
                )
            yield pd.DataFrame(
                {
                    "frame_id": pdf["frame_id"],
                    "camera_id": pdf["camera_id"],
                    "meta": metas,
                    "payload": payloads,
                }
            )

    return docs.mapInPandas(run, schema=out_schema)


def frames_features_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() entry exercising the REAL GIF LZW decoder end-to-end
    under the hash gate: variable 9→12-bit codes, stream-rebuilt string
    table (incl. the KwKwK case), CLEAR handling, sub-block framing —
    same closed-form gradient oracle as the BMP/PNG entries, with
    ``total_px`` third (compressed sizes are not SQL-computable)."""
    frames = sample_frames(
        synth_gif_frames(spark, sf_dir, every_k=FRAME_SAMPLE_K),
        every_k=FRAME_SAMPLE_K,
    )
    return camera_rollup_exact(extract_features(frames)).select(
        "camera_id", "n_frames", "avg_intensity", "total_px"
    )


QUERIES["frames_features_gif"] = frames_features_gif

ORACLES["frames_features_gif"] = _grid_rollup_oracle(
    GIF_W, GIF_H, f"CAST(COUNT(*) * {GIF_W * GIF_H} AS BIGINT) AS total_px"
)


# Gain schedule for the clipping audit: deterministic per clip, chosen
# so some clips stay clean (gain 1-3) and some drive the +A half of the
# square wave past the int16 rail (gain up to 6 on amps up to 8000).
def _clip_gain(clip_id: int) -> int:
    return 1 + (clip_id % 6)


def synth_wav_clips_gained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAV clips with a deterministic per-clip GAIN applied before the
    int16 clamp — the overdriven-microphone corpus for
    :func:`audio_clip_detect`. The clamp happens pre-encode, so the
    REAL decoder sees genuine rail-valued PCM, exactly like a clipped
    field recording."""
    import numpy as np

    docs = spread(
        table(spark, sf_dir, "documents"), "doc_id", key=f"{sf_dir}:documents"
    ).select(
        F.col("doc_id").alias("clip_id"), (F.col("doc_id") % 16).alias("device_id")
    )

    out_schema = T.StructType(
        [
            T.StructField("clip_id", T.LongType()),
            T.StructField("device_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for cid in pdf["clip_id"]:
                n, a, p = _wav_params(int(cid))
                g = _clip_gain(int(cid))
                i = np.arange(n)
                raw = np.where(i % p < p // 2, a * g, -(a // 2) * g)
                s = np.clip(raw, -32768, 32767).astype("<i2")
                payloads.append(encode_wav_pcm16(s))
            yield pd.DataFrame(
                {
                    "clip_id": pdf["clip_id"],
                    "device_id": pdf["device_id"],
                    "payload": payloads,
                }
            )

    return docs.mapInPandas(run, out_schema)


def audio_clip_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIPPING audit for the audio leg — the overdriven-input QC every
    ingest fleet runs before wasting model time on distorted clips:
    per device, how many clips touch the int16 rails, how many samples
    sit AT a rail, and the worst per-clip clipped share. Rail contact
    is the definition (s = +32767 or −32768 after the recorder's own
    clamp), counted from REAL decoded PCM through the shared RIFF
    chunk walker.

    FULL oracle with no decode: the gained two-level square wave has
    closed-form rail counts — the +A half (⌈..⌉/⌊..⌋ period
    arithmetic over n, p) clips exactly when a·g > 32767, the −A/2
    half never reaches −32768 on this schedule — so the gate
    hash-checks that the real parser reproduces every rail sample.
    Integers throughout; the worst share is one pround'd division.

    Shape: Arrow-batched synth+decode per clip, one device-keyed
    aggregate."""
    clips = synth_wav_clips_gained(spark, sf_dir)

    out_schema = T.StructType(
        [
            T.StructField("clip_id", T.LongType()),
            T.StructField("device_id", T.LongType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("n_railed", T.LongType()),
        ]
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ns, railed = [], []
            for buf in pdf["payload"]:
                s = decode_wav_pcm16(bytes(buf))[1]
                arr = np.asarray(s, dtype=np.int32)
                ns.append(int(arr.size))
                railed.append(
                    int(((arr == 32767) | (arr == -32768)).sum())
                )
            yield pd.DataFrame(
                {
                    "clip_id": pdf["clip_id"],
                    "device_id": pdf["device_id"],
                    "n_samples": ns,
                    "n_railed": railed,
                }
            )

    feats = clips.mapInPandas(run, out_schema)
    share = F.col("n_railed").cast("double") / F.col("n_samples").cast("double")
    return feats.groupBy("device_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clips"),
        F.sum((F.col("n_railed") > 0).cast("int")).cast("bigint").alias(
            "n_clipped_clips"
        ),
        F.sum("n_railed").cast("bigint").alias("n_railed_samples"),
        F.sum("n_samples").cast("bigint").alias("n_samples"),
        pround(F.max(share)).alias("worst_clip_share"),
    )


QUERIES["audio_clip_detect"] = audio_clip_detect

ORACLES["audio_clip_detect"] = f"""
    WITH clips AS (
        SELECT doc_id AS clip_id, doc_id % 16 AS device_id,
               1600 + (doc_id % 5) * 160 AS n,
               1000 + (doc_id % 8) * 1000 AS a,
               8 + (doc_id % 13) * 4 AS p,
               1 + (doc_id % 6) AS g
        FROM documents
    ),
    per AS (
        SELECT clip_id, device_id, n,
               -- samples in the +A half: full periods + remainder
               CASE WHEN a * g > 32767
                    THEN (n // p) * (p // 2) + LEAST(n % p, p // 2)
                    ELSE 0 END AS n_railed
        FROM clips
    )
    SELECT device_id,
           CAST(COUNT(*) AS BIGINT) AS n_clips,
           CAST(SUM(CASE WHEN n_railed > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clipped_clips,
           CAST(SUM(n_railed) AS BIGINT) AS n_railed_samples,
           CAST(SUM(n) AS BIGINT) AS n_samples,
           {pround_sql(
               'MAX(CAST(n_railed AS DOUBLE) / CAST(n AS DOUBLE))'
           )} AS worst_clip_share
    FROM per
    GROUP BY 1
"""


def _laplacian_feats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame 4-neighbor |Laplacian| sum + interior pixel count
    through the REAL decode path (Arrow-batched numpy stencil, no
    per-pixel Python) — shared by the camera rollup
    (:func:`frames_laplacian_stats`) and the per-window keyframe pick
    (:func:`keyframe_select`)."""
    frames = sample_frames(
        synth_bmp_frames(spark, sf_dir, every_k=FRAME_SAMPLE_K),
        every_k=FRAME_SAMPLE_K,
    )

    out_schema = T.StructType(
        [
            T.StructField("frame_id", T.LongType()),
            T.StructField("camera_id", T.LongType()),
            T.StructField("abs_lap", T.LongType()),
            T.StructField("n_interior", T.LongType()),
        ]
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            laps, ns = [], []
            for buf in pdf["payload"]:
                img = decode_bmp_gray(bytes(buf)).astype(np.int64)
                core = img[1:-1, 1:-1]
                lap = (
                    4 * core
                    - img[:-2, 1:-1]
                    - img[2:, 1:-1]
                    - img[1:-1, :-2]
                    - img[1:-1, 2:]
                )
                laps.append(int(np.abs(lap).sum()))
                ns.append(int(core.size))
            yield pd.DataFrame(
                {
                    "frame_id": pdf["frame_id"],
                    "camera_id": pdf["camera_id"],
                    "abs_lap": laps,
                    "n_interior": ns,
                }
            )

    return frames.mapInPandas(run, out_schema)


def frames_laplacian_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EDGE ENERGY per camera through the real decode path — the
    variance-of-Laplacian family statistic a vision pipeline uses to
    pick the sharpest frame per window before running detectors (a
    defocused or smeared frame has low second-order energy). Every
    existing frame entry aggregates ZEROTH-order pixel stats; this is
    the first second-order STENCIL over decoded pixels: the 4-neighbor
    discrete Laplacian |4f − f(x±1,y) − f(x,y±1)| summed over interior
    pixels.

    FULL oracle: the decoded image is the closed-form gradient, so the
    stencil is a direct per-(x,y) arithmetic expression over a
    generate_series grid — a stride/row-order/palette decode bug
    shifts a neighbor and flips the hash. All sums exact integers; the
    per-camera mean is one pround'd division.

    Shape: Arrow-batched decode + numpy stencil (vectorized, no Python
    per-pixel loop), one camera-keyed aggregate."""
    feats = _laplacian_feats(spark, sf_dir)
    return feats.groupBy("camera_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_frames"),
        F.sum("abs_lap").cast("bigint").alias("total_abs_laplacian"),
        F.max("abs_lap").cast("bigint").alias("max_frame_laplacian"),
        pround(
            F.sum("abs_lap").cast("double")
            / F.sum("n_interior").cast("double")
        ).alias("mean_abs_laplacian"),
    )


QUERIES["frames_laplacian_stats"] = frames_laplacian_stats

ORACLES["frames_laplacian_stats"] = f"""
    WITH f AS (
        SELECT doc_id AS frame_id, doc_id % 16 AS camera_id
        FROM documents WHERE (doc_id % 30) % {FRAME_SAMPLE_K} = 0
    ),
    grid AS (
        SELECT gx.x AS x, gy.y AS y
        FROM generate_series(1, {BMP_W - 2}) gx(x),
             generate_series(1, {BMP_H - 2}) gy(y)
    ),
    per AS (
        SELECT frame_id, camera_id,
               SUM(ABS(
                   4 * ((3 * x + 5 * y + 7 * frame_id) % 256)
                   - ((3 * (x - 1) + 5 * y + 7 * frame_id) % 256)
                   - ((3 * (x + 1) + 5 * y + 7 * frame_id) % 256)
                   - ((3 * x + 5 * (y - 1) + 7 * frame_id) % 256)
                   - ((3 * x + 5 * (y + 1) + 7 * frame_id) % 256)
               )) AS abs_lap,
               CAST(COUNT(*) AS BIGINT) AS n_interior
        FROM f, grid GROUP BY 1, 2
    )
    SELECT camera_id,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(SUM(abs_lap) AS BIGINT) AS total_abs_laplacian,
           CAST(MAX(abs_lap) AS BIGINT) AS max_frame_laplacian,
           {pround_sql(
               'CAST(SUM(abs_lap) AS DOUBLE) / CAST(SUM(n_interior) AS DOUBLE)'
           )} AS mean_abs_laplacian
    FROM per GROUP BY 1
"""


# Keyframe selection window, in RAW frame_id units (frame ids are the
# video timeline; cameras interleave on doc_id % 16, so a window holds
# every sampled frame of a camera inside the id range).
KEYFRAME_WIN = 128


def _keyframe_pick(feats: DataFrame) -> DataFrame:
    """Argmax-|Laplacian| frame per (camera, KEYFRAME_WIN id window)
    from a per-frame feature table ``(camera_id, frame_id, abs_lap)``.
    Ties break to the SMALLEST frame_id (earliest frame) via one
    max-of-struct aggregate — no window function, so the pick is a
    single map-side-combinable keyed aggregate at any scale."""
    win = F.expr(f"frame_id DIV {KEYFRAME_WIN}").alias("win_id")
    best = F.max(
        F.struct(
            F.col("abs_lap").alias("lap"),
            (-F.col("frame_id")).alias("neg_fid"),
        )
    ).alias("b")
    return (
        feats.groupBy("camera_id", win)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_frames"),
            best,
        )
        .select(
            "camera_id",
            "win_id",
            "n_frames",
            (-F.col("b.neg_fid")).cast("bigint").alias("keyframe_id"),
            F.col("b.lap").cast("bigint").alias("keyframe_lap"),
        )
    )


def keyframe_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-frame-per-window pick — the keyframe-selection read every
    vision pipeline ships before running expensive detectors: within
    each (camera, KEYFRAME_WIN-frame-id window), the frame with the
    maximal 4-neighbor |Laplacian| energy (sharpest; defocused/smeared
    frames score low), ties to the earliest frame. Composes the real
    decode path of :func:`frames_laplacian_stats` with a keyed
    argmax-by-struct aggregate.

    FULL oracle: per-frame |Laplacian| is closed-form over the
    synthetic gradient (any stride/row-order decode bug flips it), and
    the pick is ROW_NUMBER over (abs_lap DESC, frame_id ASC) — exact
    integers everywhere.

    Shape: one Arrow-batched decode pass + ONE map-side-combinable
    (camera, window)-keyed aggregate; no global order, no window
    function, so the plan is flat at any frame count."""
    return _keyframe_pick(_laplacian_feats(spark, sf_dir))


QUERIES["keyframe_select"] = keyframe_select

ORACLES["keyframe_select"] = f"""
    WITH f AS (
        SELECT doc_id AS frame_id, doc_id % 16 AS camera_id
        FROM documents WHERE (doc_id % 30) % {FRAME_SAMPLE_K} = 0
    ),
    grid AS (
        SELECT gx.x AS x, gy.y AS y
        FROM generate_series(1, {BMP_W - 2}) gx(x),
             generate_series(1, {BMP_H - 2}) gy(y)
    ),
    per AS (
        SELECT frame_id, camera_id,
               SUM(ABS(
                   4 * ((3 * x + 5 * y + 7 * frame_id) % 256)
                   - ((3 * (x - 1) + 5 * y + 7 * frame_id) % 256)
                   - ((3 * (x + 1) + 5 * y + 7 * frame_id) % 256)
                   - ((3 * x + 5 * (y - 1) + 7 * frame_id) % 256)
                   - ((3 * x + 5 * (y + 1) + 7 * frame_id) % 256)
               )) AS abs_lap
        FROM f, grid GROUP BY 1, 2
    ),
    ranked AS (
        SELECT camera_id, frame_id // {KEYFRAME_WIN} AS win_id,
               frame_id, abs_lap,
               CAST(COUNT(*) OVER (
                   PARTITION BY camera_id, frame_id // {KEYFRAME_WIN}
               ) AS BIGINT) AS n_frames,
               ROW_NUMBER() OVER (
                   PARTITION BY camera_id, frame_id // {KEYFRAME_WIN}
                   ORDER BY abs_lap DESC, frame_id ASC
               ) AS rn
        FROM per
    )
    SELECT camera_id, win_id, n_frames,
           CAST(frame_id AS BIGINT) AS keyframe_id,
           CAST(abs_lap AS BIGINT) AS keyframe_lap
    FROM ranked WHERE rn = 1
"""
