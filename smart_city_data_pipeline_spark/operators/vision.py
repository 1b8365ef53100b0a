"""Camera / vision analytics: nested detections flattening + rollups.

The reference stores vision output as an ARRAY<STRUCT<...>> column per
frame (``setup_smart_city_hive.hql:7`` vision_detections: object_id,
type, bounding_box, confidences) and reports per-camera / per-class
counts (``init-db.sql:58`` camera_events). The test lake has no nested
column, so a deterministic detections array is SYNTHESIZED from
``events`` arithmetic — identically in Spark and the DuckDB oracle — and
then flattened the way a real vision lake would be.

Spark-first notes: the flatten is ``inline()`` (generator expression,
whole-stage codegen, no Python); at 100 TB explode multiplies rows
BEFORE any shuffle, so rollups aggregate the exploded stream map-side —
never materialize the exploded table. Synthesis is a pure projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from smart_city_data_pipeline_spark.catalog import table
from smart_city_data_pipeline_spark.functions.rounding import avg_exact, avg_exact_sql, pround

OBJ_TYPES = ("person", "car", "bike", "bus")


def synth_detections(ev: DataFrame) -> DataFrame:
    """Frame table with a nested detections ARRAY<STRUCT> column.

    1-3 detections per event, every field a deterministic function of
    (event_id, i) so the DuckDB oracle reproduces it exactly.
    """
    types = F.array(*[F.lit(t) for t in OBJ_TYPES])
    n = (F.col("event_id") % 3 + 1).cast("bigint")
    det = lambda i: F.struct(
        (F.col("event_id") * 10 + i).alias("object_id"),
        F.element_at(types, ((F.col("event_id") + i) % 4 + 1).cast("int")).alias("obj_type"),
        pround(((F.col("event_id") * 7 + i * 13) % 100) / 100.0).alias("confidence"),
    )
    return ev.select(
        "event_id",
        F.col("user_id").alias("camera_id"),
        "ts",
        F.transform(F.sequence(F.lit(1).cast("bigint"), n), det).alias("detections"),
    )


def detections_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flatten the nested array-of-structs — the Hive external-table read."""
    frames = synth_detections(table(spark, sf_dir, "events"))
    return frames.select("event_id", "camera_id", F.inline("detections"))


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


_DET_BASE_SQL = """
    SELECT event_id, user_id AS camera_id,
           event_id * 10 + i AS object_id,
           ['person','car','bike','bus'][CAST((event_id + i) % 4 AS INT) + 1] AS obj_type,
           (FLOOR(CAST((((event_id * 7 + i * 13) % 100) / 100.0) AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS confidence
    FROM (SELECT *, unnest(range(1, CAST(event_id % 3 AS INT) + 2)) AS i FROM events)
"""

QUERIES = {
    "detections_explode": detections_explode,
    "camera_object_stats": camera_object_stats,
}

ORACLES = {
    "detections_explode": f"SELECT event_id, camera_id, object_id, obj_type, confidence FROM ({_DET_BASE_SQL})",
    "camera_object_stats": f"""
        SELECT obj_type,
               CAST(COUNT(*) AS BIGINT) AS n_detections,
               CAST(COUNT(DISTINCT camera_id) AS BIGINT) AS n_cameras,
               (FLOOR(CAST(({avg_exact_sql('confidence')}) AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS avg_confidence
        FROM ({_DET_BASE_SQL})
        GROUP BY 1
    """,
}
