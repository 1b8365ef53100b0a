"""Camera / vision analytics: nested detections flattening + rollups.

The reference stores vision output as an ARRAY<STRUCT<...>> column per
frame (``setup_smart_city_hive.hql:7`` vision_detections: object_id,
type, bounding_box, confidences), tracks per-object ``first_seen`` and
emits ``tracking_duration_seconds``
(``pipline2/data-proccessor/stream/rtsp_proccess/flink_vision_job_proper.py:50,246``),
and the warehouse aggregates per-camera demographic counts + average
duration (``pipline2/init-timescaledb.sql:34-47`` traffic_counts:
male/female/children/adults + avg duration). The test lake has no
nested column, so a deterministic detections array is SYNTHESIZED from
``events`` arithmetic — identically in Spark and the DuckDB oracle —
and then flattened the way a real vision lake would be.

Object identity is STABLE across frames: ``object_id = camera·1000 +
(event_id·7+i) mod 50`` makes each camera's objects recur over its
event stream, so dwell (max ts − min ts per object) is meaningful, and
class/demographics are functions of object_id (a tracked object never
changes type or gender between frames).

Spark-first notes: the flatten is ``inline()`` (generator expression,
whole-stage codegen, no Python); at 100 TB explode multiplies rows
BEFORE any shuffle, so rollups aggregate the exploded stream map-side —
never materialize the exploded table. Synthesis is a pure projection.
The dwell rollup is two keyed aggregates — (camera, object) then
camera — exactly the tracker→warehouse two-level shape, each
map-side-combinable.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from smart_city_data_pipeline_spark.catalog import table
from smart_city_data_pipeline_spark.functions.rounding import avg_exact, avg_exact_sql, pround

OBJ_TYPES = ("person", "car", "bike", "bus")
OBJECTS_PER_CAMERA = 50


@functools.lru_cache(maxsize=1)
def _detections_col() -> Column:
    """The synthesized detections expression, built ONCE per process.

    The ~30 field sub-expressions cost ~0.3 s of py4j Column transport
    per construction (measured r5 — the whole r2→r4 'drift' of the
    vision queries, plans unchanged); the expression only references
    unresolved input columns (event_id, user_id), so one cached Column
    serves every caller, like the dedup family's cached literals.
    """
    types = F.array(*[F.lit(t) for t in OBJ_TYPES])
    n = (F.col("event_id") % 3 + 1).cast("bigint")

    def det(i: Column) -> Column:
        # transform(sequence(1, n), det) builds only the n structs each
        # row actually has. (Measured against the "codegen-friendly"
        # slice(array(det(1),det(2),det(3)), 1, n) alternative: the
        # sliced form evaluates all 27 field expressions per row before
        # slicing and benches 3× SLOWER — don't "optimize" this back.)
        oid = F.col("user_id") * 1000 + (F.col("event_id") * 7 + i) % OBJECTS_PER_CAMERA
        return F.struct(
            oid.alias("object_id"),
            F.element_at(types, (oid % 4 + 1).cast("int")).alias("obj_type"),
            pround(((F.col("event_id") * 7 + i * 13) % 100) / 100.0).alias("confidence"),
            ((F.col("event_id") * 13 + i * 7) % 1920).cast("int").alias("bbox_x"),
            ((F.col("event_id") * 17 + i * 11) % 1080).cast("int").alias("bbox_y"),
            ((F.col("event_id") * 19 + i * 3) % 300 + 20).cast("int").alias("bbox_w"),
            ((F.col("event_id") * 23 + i * 5) % 400 + 40).cast("int").alias("bbox_h"),
            F.when(oid % 2 == 0, "male").otherwise("female").alias("gender"),
            F.when(oid % 10 < 2, "child").otherwise("adult").alias("age_group"),
        )

    return F.transform(F.sequence(F.lit(1).cast("bigint"), n), det)


def synth_detections(ev: DataFrame) -> DataFrame:
    """Frame table with a nested detections ARRAY<STRUCT> column.

    1-3 detections per event; object_id recurs within a camera so
    objects are trackable across frames; bbox ints and per-object
    demographics mirror the reference's detection schema
    (init-timescaledb.sql:14-20 bounding boxes, tracker attributes).
    Every field is a deterministic function of (event_id, user_id, i)
    so the DuckDB oracle reproduces it exactly.
    """
    return ev.select(
        "event_id",
        F.col("user_id").alias("camera_id"),
        "ts",
        _detections_col().alias("detections"),
    )


def detections_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flatten the nested array-of-structs — the Hive external-table read.

    ``inline_outer``, not ``inline``: the non-outer generator plants a
    ``size(detections) > 0`` guard filter that re-evaluates the whole
    synthesis expression twice more (measured 2× wall time); every frame
    has ≥1 detection, so outer semantics are identical here. On a real
    lake the column is stored and the distinction is moot — with a
    computed column it matters.
    """
    frames = synth_detections(table(spark, sf_dir, "events"))
    return frames.select("event_id", "camera_id", F.inline_outer("detections"))


def camera_object_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class detection rollup (camera_events): counts + avg confidence.

    Aggregates directly over the generator output — the exploded rows are
    consumed map-side, never shuffled or materialized as a table.
    """
    ex = detections_explode(spark, sf_dir)
    return ex.groupBy("obj_type").agg(
        F.count(F.lit(1)).alias("n_detections"),
        F.countDistinct("camera_id").alias("n_cameras"),
        pround(avg_exact(F.col("confidence"))).alias("avg_confidence"),
    )


def camera_dwell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-camera dwell + demographics rollup — the tracker's
    ``first_seen``→``tracking_duration_seconds`` path
    (flink_vision_job_proper.py:50,246) feeding the warehouse's
    traffic_counts demographics (init-timescaledb.sql:34-47).

    Level 1 keys on (camera_id, object_id): dwell = last−first sighting
    in µs (exact BIGINT in both engines — no float time math). Level 2
    rolls up per camera: object count, average dwell seconds, and the
    demographic splits counted over PERSON objects only (cars have no
    gender). One row per object at level 1, so demographic counts are
    per-object, not per-sighting.

    The exploded stream is pruned to (camera_id, object_id, ts) BEFORE
    the first shuffle; class/gender/age are functions of object_id, so
    they are derived AFTER the per-object aggregate instead of dragging
    three string columns through the shuffle and three min() aggregates
    over every sighting.
    """
    frames = synth_detections(table(spark, sf_dir, "events"))
    det = frames.select("camera_id", "ts", F.inline_outer("detections")).select(
        "camera_id", "ts", "object_id"
    )
    types = F.array(*[F.lit(t) for t in OBJ_TYPES])
    oid = F.col("object_id")
    per_obj = (
        det.groupBy("camera_id", "object_id")
        .agg(
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("dwell_us"),
            F.count(F.lit(1)).alias("n_sightings"),
        )
        .select(
            "camera_id",
            "dwell_us",
            "n_sightings",
            F.element_at(types, (oid % 4 + 1).cast("int")).alias("obj_type"),
            F.when(oid % 2 == 0, "male").otherwise("female").alias("gender"),
            F.when(oid % 10 < 2, "child").otherwise("adult").alias("age_group"),
        )
    )
    person = F.col("obj_type") == "person"
    return per_obj.groupBy("camera_id").agg(
        F.count(F.lit(1)).alias("n_objects"),
        pround(
            (F.sum("dwell_us").cast("double") / F.count(F.lit(1))) / 1_000_000.0
        ).alias("avg_dwell_seconds"),
        F.sum((person & (F.col("gender") == "male")).cast("long")).alias("n_male"),
        F.sum((person & (F.col("gender") == "female")).cast("long")).alias("n_female"),
        F.sum((person & (F.col("age_group") == "child")).cast("long")).alias("n_children"),
        F.sum((person & (F.col("age_group") == "adult")).cast("long")).alias("n_adults"),
        F.sum("n_sightings").alias("total_sightings"),
    )


_DET_BASE_SQL = """
    SELECT event_id, user_id AS camera_id, ts,
           user_id * 1000 + (event_id * 7 + i) % 50 AS object_id,
           ['person','car','bike','bus'][CAST((user_id * 1000 + (event_id * 7 + i) % 50) % 4 AS INT) + 1] AS obj_type,
           (FLOOR(CAST((((event_id * 7 + i * 13) % 100) / 100.0) AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS confidence,
           CAST((event_id * 13 + i * 7) % 1920 AS INT) AS bbox_x,
           CAST((event_id * 17 + i * 11) % 1080 AS INT) AS bbox_y,
           CAST((event_id * 19 + i * 3) % 300 + 20 AS INT) AS bbox_w,
           CAST((event_id * 23 + i * 5) % 400 + 40 AS INT) AS bbox_h,
           CASE WHEN (user_id * 1000 + (event_id * 7 + i) % 50) % 2 = 0 THEN 'male' ELSE 'female' END AS gender,
           CASE WHEN (user_id * 1000 + (event_id * 7 + i) % 50) % 10 < 2 THEN 'child' ELSE 'adult' END AS age_group
    FROM (SELECT *, unnest(range(1, CAST(event_id % 3 AS INT) + 2)) AS i FROM events)
"""

QUERIES = {
    "detections_explode": detections_explode,
    "camera_object_stats": camera_object_stats,
    "camera_dwell_stats": camera_dwell_stats,
}

ORACLES = {
    "detections_explode": f"""
        SELECT event_id, camera_id, object_id, obj_type, confidence,
               bbox_x, bbox_y, bbox_w, bbox_h, gender, age_group
        FROM ({_DET_BASE_SQL})
    """,
    "camera_object_stats": f"""
        SELECT obj_type,
               CAST(COUNT(*) AS BIGINT) AS n_detections,
               CAST(COUNT(DISTINCT camera_id) AS BIGINT) AS n_cameras,
               (FLOOR(CAST(({avg_exact_sql('confidence')}) AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS avg_confidence
        FROM ({_DET_BASE_SQL})
        GROUP BY 1
    """,
    "camera_dwell_stats": f"""
        WITH per_obj AS (
            SELECT camera_id, object_id,
                   epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dwell_us,
                   COUNT(*) AS n_sightings,
                   MIN(obj_type) AS obj_type,
                   MIN(gender) AS gender,
                   MIN(age_group) AS age_group
            FROM ({_DET_BASE_SQL})
            GROUP BY 1, 2
        )
        SELECT camera_id,
               CAST(COUNT(*) AS BIGINT) AS n_objects,
               (FLOOR(CAST(((CAST(SUM(dwell_us) AS DOUBLE) / COUNT(*)) / 1000000.0) AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS avg_dwell_seconds,
               CAST(SUM(CASE WHEN obj_type = 'person' AND gender = 'male' THEN 1 ELSE 0 END) AS BIGINT) AS n_male,
               CAST(SUM(CASE WHEN obj_type = 'person' AND gender = 'female' THEN 1 ELSE 0 END) AS BIGINT) AS n_female,
               CAST(SUM(CASE WHEN obj_type = 'person' AND age_group = 'child' THEN 1 ELSE 0 END) AS BIGINT) AS n_children,
               CAST(SUM(CASE WHEN obj_type = 'person' AND age_group = 'adult' THEN 1 ELSE 0 END) AS BIGINT) AS n_adults,
               CAST(SUM(n_sightings) AS BIGINT) AS total_sightings
        FROM per_obj
        GROUP BY 1
    """,
}
