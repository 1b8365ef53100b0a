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
- the codec is REAL for uncompressed frames: 8/24-bit BMP encode +
  decode in pure struct/numpy (:func:`encode_bmp_gray` /
  :func:`decode_bmp_gray`) — what an RTSP bridge shipping raw frames
  produces. Compressed formats (JPEG/PNG) remain behind the cv2 seam
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

from smart_city_data_pipeline_spark.catalog import table

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
    ]
)


def synth_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stand-in frame table derived from ``documents``.

    Payload = utf-8 bytes of the doc text (an opaque blob as far as the
    pipeline is concerned); metadata is a typed struct. In production this
    table is the Kafka/RTSP bridge output written to the lake.
    """
    docs = table(spark, sf_dir, "documents")
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


def synth_bmp_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame table whose payloads are REAL uncompressed 8-bit BMPs
    (deterministic per-frame gradient seeded by frame_id), built in
    mapInPandas — the shape an RTSP bridge writing raw frames to the
    lake produces. Everything downstream exercises the actual decoder,
    not the statistics fallback."""
    import numpy as np

    docs = table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("frame_id"), (F.col("doc_id") % 16).alias("camera_id")
    )

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


def _decode_payload(buf: bytes) -> tuple[float, list[int]]:
    """Codec seam, tried in order:

    1. REAL pure-numpy decode for uncompressed BMP payloads
       (:func:`decode_bmp_gray`) — fully functional in this container;
    2. cv2 for compressed formats (JPEG/PNG) — absent here, so that
       branch is the remaining gated seam;
    3. deterministic payload statistics for undecodable bytes, keeping
       the Arrow plumbing and schema honest everywhere.
    """
    import numpy as np

    arr = decode_bmp_gray(buf) if buf else None
    if arr is None:
        try:  # pragma: no cover - cv2 absent in this environment
            import cv2

            arr = cv2.imdecode(np.frombuffer(buf, dtype=np.uint8), cv2.IMREAD_GRAYSCALE)
        except ImportError:
            arr = None
    if arr is None:
        return _fallback_stats(buf)
    histo = np.histogram(arr, bins=4, range=(0, 256))[0]
    return float(arr.mean()), [int(x) for x in histo]


def extract_features(frames: DataFrame) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched).

    Batch memory is bounded by the session's
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` (set it per cluster
    for large payloads) — never mutated here: a query must not change
    session-global execution config as a side effect.
    """

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            means, histos, sizes = [], [], []
            for buf in pdf["payload"]:
                raw = bytes(buf) if buf is not None else b""
                mean, histo = _decode_payload(raw)
                means.append(mean)
                histos.append(histo)
                sizes.append(len(raw))
            yield pd.DataFrame(
                {
                    "frame_id": pdf["frame_id"],
                    "camera_id": pdf["camera_id"],
                    "n_bytes": sizes,
                    "mean_intensity": means,
                    "histo_head": histos,
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

    Codec seam like :func:`_decode_payload`: with cv2 absent the
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
                arr = decode_bmp_gray(raw) if raw else None
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


def camera_rollup(features: DataFrame) -> DataFrame:
    """Per-camera feature rollup — the vision job's windowed aggregate."""
    return features.groupBy("camera_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.avg("mean_intensity").alias("avg_intensity"),
        F.sum("n_bytes").alias("total_bytes"),
    )


def frames_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() entry: synth frames → sample → decode → per-camera rollup.

    rows-only oracle (binary decode is not SQL-expressible); determinism
    comes from the stubbed codec.
    """
    frames = sample_frames(synth_frames(spark, sf_dir), every_k=3)
    return camera_rollup(extract_features(frames)).select(
        "camera_id",
        "n_frames",
        F.round("avg_intensity", 4).alias("avg_intensity"),
        "total_bytes",
    )


def frames_features_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() entry exercising the REAL decoder end-to-end: synth
    BMP frames → sample → decode (pure-numpy BMP path, no fallback) →
    per-camera rollup. rows-only oracle (binary decode is not
    SQL-expressible); determinism comes from the seeded gradient
    payloads."""
    frames = sample_frames(synth_bmp_frames(spark, sf_dir), every_k=3)
    return camera_rollup(extract_features(frames)).select(
        "camera_id",
        "n_frames",
        F.round("avg_intensity", 4).alias("avg_intensity"),
        "total_bytes",
    )


QUERIES = {
    "frames_features": frames_features,
    "frames_features_bmp": frames_features_bmp,
}

ORACLES: dict[str, str] = {}
