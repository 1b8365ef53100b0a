"""Hour-partitioned JSONL collector lake (read + write).

The reference's collectors (``pipline2/collectors/traffic_collector.py:120-180``)
drain Kafka into JSONL files laid out ``year=YYYY/month=MM/day=DD/hour=HH``,
one envelope per line::

    {"mqtt_topic": ..., "timestamp": ..., "bridge_received_at": ..., "data": {...}}

Spark-first re-expression:

- **Write**: the envelope is built with ``to_json(struct(...))`` (pure JVM
  expression) and written with the ``text`` writer partitioned by derived
  y/m/d/h columns — the exact Hive-style layout the reference's external
  tables mount (``setup_smart_city_hive.hql``). No Python in the row path.
- **Read**: ``spark.read`` with an EXPLICIT schema (never inference — at
  100 TB a schema-inference pass is a full extra scan) and ``basePath`` so
  the y/m/d/h directory keys become partition columns. Filters on
  year/month/day/hour become partition pruning: Spark never opens files
  outside the requested window, which is how a 7-day retention query stays
  cheap on years of history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("mqtt_topic", T.StringType()),
        T.StructField("timestamp", T.StringType()),
        T.StructField("bridge_received_at", T.StringType()),
        T.StructField(
            "data",
            T.StructType(
                [
                    T.StructField("event_id", T.LongType()),
                    T.StructField("user_id", T.LongType()),
                    T.StructField("event_type", T.StringType()),
                    T.StructField("value", T.DoubleType()),
                    T.StructField("props", T.StringType()),
                ]
            ),
        ),
    ]
)


def write_event_lake(events: DataFrame, path: str, topic_prefix: str = "smartcity") -> None:
    """Write events as the collectors' hour-partitioned JSONL envelope lake."""
    envelope = F.to_json(
        F.struct(
            F.concat_ws("/", F.lit(topic_prefix), F.col("event_type")).alias("mqtt_topic"),
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("timestamp"),
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("bridge_received_at"),
            F.struct("event_id", "user_id", "event_type", "value", "props").alias("data"),
        )
    )
    (
        events.select(
            envelope.alias("value"),
            F.year("ts").alias("year"),
            F.month("ts").alias("month"),
            F.dayofmonth("ts").alias("day"),
            F.hour("ts").alias("hour"),
        )
        .write.partitionBy("year", "month", "day", "hour")
        .mode("overwrite")
        .text(path)
    )


def read_event_lake(
    spark: SparkSession, path: str, quarantine_dir: str | None = None
) -> DataFrame:
    """Read the JSONL lake back into the flat events shape.

    Explicit schema + ``basePath`` → partition columns year/month/day/hour
    are available for pruning; the envelope is unwrapped JVM-side.

    Malformed-envelope tolerance: the reference's collectors write a
    PARTIAL last line when they crash mid-flush
    (``traffic_collector.py`` appends, then fsyncs), so a broken line
    must neither abort the job (FAILFAST) nor slip through as an
    all-null row (bare PERMISSIVE, the previous behavior). The lake is
    read as TEXT and parsed with PERMISSIVE ``from_json`` carrying an
    explicit ``_corrupt_record`` — the same single scan and the same
    y/m/d/h partition pruning, but parsing is an ordinary projection,
    so filtering on the corrupt column is legal (the raw-JSON reader
    forbids corrupt-column-only queries —
    UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — and the
    documented cache() workaround is a non-starter at 100 TB). Good
    rows flow; corrupt raw lines are dropped from the result and, when
    ``quarantine_dir`` is given, written there as text for
    replay/inspection (one eager write — call it from the maintenance
    job, not the hot path).
    """
    parse_schema = T.StructType(
        ENVELOPE_SCHEMA.fields + [T.StructField("_corrupt_record", T.StringType())]
    )
    lines = (
        spark.read.option("basePath", path)
        .text(f"{path}/year=*/month=*/day=*/hour=*")
    )
    raw = lines.select(
        "value",
        F.from_json(
            "value",
            parse_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("e"),
        "year",
        "month",
        "day",
        "hour",
    )
    # Two corrupt shapes: (a) unparseable lines, which PERMISSIVE mode
    # lands in _corrupt_record; (b) blank lines and the JSON literal
    # 'null', for which from_json returns a NULL struct WITHOUT setting
    # _corrupt_record — without the isNull() arm those become all-null
    # ghost rows in the result and are missed by the quarantine.
    corrupt = F.col("e").isNull() | F.col("e._corrupt_record").isNotNull()
    if quarantine_dir is not None:
        # Quarantine the ORIGINAL line (not _corrupt_record, which is
        # NULL for the null-struct shape) so every dropped line replays.
        (
            raw.filter(corrupt)
            .select("value")
            .write.mode("overwrite")
            .text(quarantine_dir)
        )
    raw = raw.filter(~corrupt)
    return raw.select(
        F.col("e.data.event_id").alias("event_id"),
        F.to_timestamp("e.timestamp").alias("ts"),
        F.col("e.data.user_id").alias("user_id"),
        F.col("e.data.event_type").alias("event_type"),
        F.col("e.data.value").alias("value"),
        F.col("e.data.props").alias("props"),
        F.col("e.mqtt_topic").alias("mqtt_topic"),
        "year",
        "month",
        "day",
        "hour",
    )
