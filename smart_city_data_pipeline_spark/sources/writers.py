"""Batch sinks: partitioned parquet, CSV, JDBC (live, via the bundled
Derby embedded driver), and gated Kafka.

Reference sinks:
- partitioned parquet: ``pipline2/spark-jobs/traffic_batch_processing.py:100``
  (analytics written partitioned for downstream pruning)
- JDBC/Postgres: ``traffic_batch_processing.py:117`` (warehouse tables from
  ``init-db.sql``)
- Kafka: the MQTT→Kafka / RTSP→Kafka bridges (``pipline2/extract/``)

Scale notes: partitioned writes repartition by the partition columns first
so each task writes few files (without it, every task writes a file per
partition value → small-file explosion at 1000 executors). JDBC writes
bound per-connection batches and connection counts; Kafka writes
serialize JVM-side via ``to_json``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_parquet(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Parquet sink partitioned by the given columns.

    ``repartition(*cols)`` co-locates each partition value in one task →
    one file per partition value instead of (tasks × values) small files.
    AQE coalescing keeps the shuffle cheap for small outputs.
    """
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .write.partitionBy(*partition_cols)
        .mode("overwrite")
        .parquet(path)
    )


def write_hour_partitioned_parquet(df: DataFrame, path: str, ts_col: str = "ts") -> None:
    """y/m/d/h-partitioned parquet — the collectors' lake layout, columnar."""
    out = (
        df.withColumn("year", F.year(ts_col))
        .withColumn("month", F.month(ts_col))
        .withColumn("day", F.dayofmonth(ts_col))
        .withColumn("hour", F.hour(ts_col))
    )
    write_partitioned_parquet(out, path, ["year", "month", "day", "hour"])


def write_sorted_parquet(
    df: DataFrame, path: str, sort_cols: list[str], n_files: int
) -> None:
    """Globally-sorted parquet export (terasort layout): range-partition
    on the sort key, then sort within each partition — file k holds a
    contiguous, non-overlapping key range below file k+1, and rows
    inside each file are ordered.

    This is the scalable form of ``ORDER BY`` output: a global
    ``sort()`` into one task cannot scale, while range partitioning
    samples the key distribution (one lightweight job) and gives every
    task an equal key slice. Downstream readers get merge-join-able /
    binary-searchable files, and parquet min/max footer stats align
    with the file order so range predicates prune whole files.
    Training-data use: the (shard, pos) export layout of
    ``global_shuffle_shards`` written with ``sort_cols=["shard",
    "pos"]`` is exactly a deterministic-shuffle dataset a loader can
    stream in order.
    """
    cols = [F.col(c) for c in sort_cols]
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def read_evolved_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet dataset whose batches were written under
    EVOLVING schemas (sensors gain fields over firmware generations —
    the reference's collectors append whatever the envelope carries).

    ``mergeSchema`` makes Spark union the footer schemas of every file
    instead of trusting the first one it samples, so columns added by
    later batches surface as NULL in earlier batches' rows rather than
    being silently dropped. The cost is one footer read per file at
    planning time — bounded by file count, not data size; at 100 TB a
    table registered in a metastore carries the merged schema already
    and this flag is only needed for raw-path reads like this one.
    """
    return spark.read.option("mergeSchema", "true").parquet(path)


def read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    """CSV read with explicit schema (no inference pass) + header."""
    return spark.read.schema(schema).option("header", "true").csv(path)


def write_csv(df: DataFrame, path: str) -> None:
    df.write.option("header", "true").mode("overwrite").csv(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC write — the Hive-native columnar twin of the parquet path
    (the reference's Hive DDL, ``setup_smart_city_hive.hql``, targets
    ORC-capable external tables). Spark bundles the ORC data source;
    predicate pushdown and column pruning apply exactly as for
    parquet."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_avro(df: DataFrame, path: str) -> None:
    """Avro write — the Kafka-ecosystem row format. The ``avro`` data
    source is an EXTERNAL module (spark-avro jar, not bundled in
    pyspark/jars); in this sandbox the call is expected to fail at
    datasource lookup — the gated-connector pytest drives it to that
    boundary, Kafka-style. On a provisioned cluster the same call
    works unchanged."""
    df.write.format("avro").mode("overwrite").save(path)


def derby_url(db_dir: str, create: bool = True) -> str:
    """JDBC URL for the Derby embedded driver that ships inside
    ``pyspark/jars`` (``derby-10.16.1.1.jar``) — a zero-infrastructure
    warehouse target that exercises the REAL Spark JDBC write/read
    path (driver lookup, dialect type mapping, batched inserts) in
    this sandbox. Production swaps the URL/driver for Postgres
    (reference: ``traffic_batch_processing.py:117``); the writer code
    is identical.
    """
    return f"jdbc:derby:{db_dir}" + (";create=true" if create else "")


DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: dict[str, str] | None = None,
    batchsize: int = 10_000,
    num_partitions: int | None = None,
) -> None:
    """JDBC sink (reference: ``traffic_batch_processing.py:117``).

    Verified end-to-end in this sandbox against the Derby embedded
    driver bundled with pyspark (see ``derby_url``); the Postgres path
    differs only in URL/driver (the ``org.postgresql`` jar is absent
    here and Maven Central is unreachable — probe recorded round 4).

    Scale posture: ``batchsize`` bounds rows per INSERT batch;
    ``num_partitions`` coalesces the write so at most that many
    concurrent connections hit the database — at 1000 executors an
    uncoalesced write would open 1000 connections and fall over long
    before Spark does. Coalesce (no shuffle) rather than repartition:
    the write is connection-bound, not CPU-bound.
    """
    if num_partitions is not None:
        df = df.coalesce(num_partitions)
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table).option(
        "batchsize", str(batchsize)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.mode(mode).save()


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """JDBC source. With a numeric ``partition_column`` + bounds the
    read is split into ``num_partitions`` parallel range queries
    (``WHERE col >= lo AND col < hi``) — the only way a JDBC scan
    parallelizes; without it the whole table arrives through one
    connection on one task, which is fine for dimension tables and
    wrong for facts.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 4))
        )
    return reader.load()


def write_kafka(df: DataFrame, bootstrap: str, topic: str, key_col: str | None = None) -> None:
    """Kafka sink (reference bridges publish JSON envelopes to topics).

    Gated: no spark-sql-kafka package in this environment. Serialization
    is JVM-side ``to_json`` over all columns; an optional key column keeps
    per-key ordering within a Kafka partition.

    Runtime-provisioning probe (round 4): a fresh session configured
    with ``spark.jars.packages =
    org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2`` (the exact
    match for this PySpark 4.1.2 / Scala 2.13 build) fails ivy
    resolution with ``unresolved dependency: not found`` — Maven
    Central is unreachable from this sandbox (HTTP 000), so the
    package cannot be fetched at runtime either. On any
    network-connected cluster that exact coordinate resolves and this
    sink round-trips unchanged.
    """
    payload = F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value")
    cols = [payload] if key_col is None else [F.col(key_col).cast("string").alias("key"), payload]
    (
        df.select(*cols)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()
    )


def read_kafka(spark: SparkSession, bootstrap: str, topic: str, schema) -> DataFrame:
    """Kafka batch source → parsed envelope (gated, same reason as above)."""
    raw = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .load()
    )
    return raw.select(F.from_json(F.col("value").cast("string"), schema).alias("j")).select("j.*")
