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
from pyspark.sql.window import Window

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


# --- Centroid-association tracker (batch twin) -----------------------
#
# The reference's Flink vision job assigns object identity across
# frames with a greedy nearest-centroid tracker
# (flink_vision_job_proper.py:37-128, SimpleTracker.update): distance
# matrix between tracked centroids and the frame's detections, rows
# (tracks) processed in ascending order of their minimum distance, each
# row attempting ONLY its own argmin column, a 50 px max-distance gate,
# miss-count expiry past max_disappeared, and new tracks registered for
# unmatched detections.
#
# Closed form (what makes this oracle-expressible): because a row only
# ever attempts its own argmin column, a column's winner is simply the
# MINIMUM (dist², track_id) over tracks whose argmin is that column —
# rows losing that minimum are skipped outright (the reference does not
# re-match them to their second choice), so the sequential greedy loop
# collapses to two argmins. Ties resolve exactly like numpy's stable
# argsort/argmin: (dist², track_id) across rows, lowest column index
# within a row. Only the FRAME-TO-FRAME fold is sequential; it runs per
# camera over a bounded block of TRACK_FRAMES frames (the ewma_batch
# bounded-fold discipline).
#
# Tracker input is a synthesized trajectory lake (deterministic integer
# functions of (camera, frame, slot), reproduced verbatim by the DuckDB
# oracle): three object slots per camera move linearly with per-slot
# velocity in [-25, 25] px/frame (consecutive-frame step ≤ 36 px < the
# 50 px gate → matches), wrap around the 1920×1080 screen (jump ≫ gate
# → miss-expiry + re-registration), and blink out for two consecutive
# frames every 17 (miss counter exercises WITHOUT expiry at
# TRACK_MAX_MISS = 2). Crossing trajectories exercise the greedy
# conflict rule. All coordinates are exact integers, so both engines
# agree bit-for-bit.
#
# Scale: one row_number shuffle keyed by camera (which co-locates each
# camera's rows), then ONE Arrow-batched mapInPandas call per PARTITION
# that walks its camera runs off raw numpy arrays — measured 7× cheaper
# than per-camera applyInPandas at sf0.1 (the per-group Arrow round
# trip and pandas group machinery cost more than the fold itself; see
# _fold_partition). At 100 TB the key would be (camera, day) and the
# tracker state is O(active tracks), never O(history).

TRACK_FRAMES = 128  # bounded per-camera frame block
TRACK_GATE = 50  # reference max-distance gate, px
TRACK_GATE2 = TRACK_GATE * TRACK_GATE
TRACK_MAX_MISS = 2  # expire when miss count EXCEEDS this

TRACKER_OUT_SCHEMA = (
    "camera_id long, track_id int, first_frame int, last_frame int, "
    "n_matched int, expired boolean, final_cx int, final_cy int"
)


def _tracker_step(active: list, done: list, next_id: int, f: int, dets: list) -> int:
    """One frame of the closed-form greedy centroid association over
    the LIVE track list only. Newly-expired tracks move from
    ``active`` to ``done`` (the batch fold's per-frame cost is then
    O(live tracks · dets), not O(every track ever registered — the
    expired list grows ~3·frames and dominated the first
    implementation's wall time). ``dets`` is ``[(col, x, y), ...]``
    in column order; returns the advanced ``next_id``."""
    winner = {}  # col -> (d2, tid)
    for t in active:
        b = None
        tx, ty = t["cx"], t["cy"]
        for c, x, y in dets:
            d2 = (tx - x) * (tx - x) + (ty - y) * (ty - y)
            if b is None or d2 < b[0]:
                b = (d2, c)
        if b is not None and b[0] <= TRACK_GATE2:
            w = winner.get(b[1])
            if w is None or (b[0], t["tid"]) < w:
                winner[b[1]] = (b[0], t["tid"])
    won = {tid: c for c, (_, tid) in winner.items()}
    xy = {c: (x, y) for c, x, y in dets}
    still = []
    for t in active:
        if t["tid"] in won:
            t["cx"], t["cy"] = xy[won[t["tid"]]]
            t["miss"] = 0
            t["last_f"] = f
            t["n_match"] += 1
            still.append(t)
        else:
            t["miss"] += 1
            if t["miss"] > TRACK_MAX_MISS:
                t["expired"] = True
                done.append(t)
            else:
                still.append(t)
    active[:] = still
    for c, x, y in dets:
        if c not in winner:
            active.append(
                dict(
                    tid=next_id, cx=x, cy=y, miss=0,
                    first_f=f, last_f=f, n_match=0, expired=False,
                )
            )
            next_id += 1
    return next_id


def tracker_update(tracks: list, next_id: int, f: int, dets: list) -> int:
    """One frame of the closed-form greedy centroid association.

    ``tracks`` is mutated in place (dicts with tid/cx/cy/miss/first_f/
    last_f/n_match/expired); ``dets`` is ``[(col, x, y), ...]`` in
    column order. Returns the advanced ``next_id``. Equivalence with
    the reference's sequential greedy loop is pytest-pinned
    (tests/test_centroid_tracker.py vs a literal-semantics greedy).
    Thin wrapper over :func:`_tracker_step` (the hot path folds with
    the active/done split directly and concatenates at the end)."""
    active = [t for t in tracks if not t["expired"]]
    done = [t for t in tracks if t["expired"]]
    next_id = _tracker_step(active, done, next_id, f, dets)
    tracks[:] = sorted(done + active, key=lambda t: t["tid"])
    return next_id


TRACKER_OUT_COLS = [
    "camera_id", "track_id", "first_frame", "last_frame",
    "n_matched", "expired", "final_cx", "final_cy",
]


def _fold_partition(batches):
    """Per-PARTITION tracker fold: every camera's detections land in
    one partition (the row_number window hashed by camera), so one
    raw-numpy pass walks all of the partition's camera runs. This is
    the cheap path the measurements forced: per-camera applyInPandas
    paid one Arrow round-trip + pandas group machinery per camera
    (15 s at sf0.1's 1500 cameras), per-frame pandas groupby another
    2×; one mapInPandas call per partition with a single lexsort runs
    the identical fold in ~3 s. Partition memory is bounded:
    cameras/partition × TRACK_FRAMES × 3 rows."""
    import numpy as np
    import pandas as pd

    frames = [b for b in batches]
    if not frames:
        return
    pdf = pd.concat(frames) if len(frames) > 1 else frames[0]
    cams = pdf["camera_id"].to_numpy()
    fs = pdf["f"].to_numpy()
    ss = pdf["s"].to_numpy()
    order = np.lexsort((ss, fs, cams))
    cams = cams[order]
    fs = fs[order]
    xs = pdf["cx"].to_numpy()[order]
    ys = pdf["cy"].to_numpy()[order]
    rows = []
    i, n = 0, len(cams)
    while i < n:
        cam = cams[i]
        active: list = []
        done: list = []
        nid = 0
        while i < n and cams[i] == cam:
            f = fs[i]
            dets = []
            c = 0
            while i < n and cams[i] == cam and fs[i] == f:
                dets.append((c, int(xs[i]), int(ys[i])))
                c += 1
                i += 1
            nid = _tracker_step(active, done, nid, int(f), dets)
        rows += [
            (int(cam), t["tid"], t["first_f"], t["last_f"], t["n_match"],
             t["expired"], t["cx"], t["cy"])
            for t in done + active
        ]
    yield pd.DataFrame(rows, columns=TRACKER_OUT_COLS)


def tracker_detections(ev: DataFrame) -> DataFrame:
    """Synthesized trajectory detections: (camera_id, f, s, cx, cy)."""
    w = Window.partitionBy("camera_id").orderBy("ts", "event_id")
    frames = (
        ev.select(F.col("user_id").alias("camera_id"), "ts", "event_id")
        .withColumn("f", F.row_number().over(w).cast("long"))
        .filter(F.col("f") <= TRACK_FRAMES)
    )
    base = frames.select(
        "camera_id",
        "f",
        F.explode(F.array(*[F.lit(i).cast("long") for i in (1, 2, 3)])).alias("s"),
    )
    c, fr, s = F.col("camera_id"), F.col("f"), F.col("s")
    vx = (c * 5 + s * 7) % 51 - 25
    vy = (c * 11 + s * 13) % 51 - 25
    cx = ((c * 37 + s * 101 + vx * fr) % 1920 + 1920) % 1920
    cy = ((c * 53 + s * 71 + vy * fr) % 1080 + 1080) % 1080
    return base.filter((c * 3 + fr + s * 3) % 17 >= 2).select(
        "camera_id",
        F.col("f").cast("int").alias("f"),
        F.col("s").cast("int").alias("s"),
        cx.cast("int").alias("cx"),
        cy.cast("int").alias("cy"),
    )


def centroid_tracks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy nearest-centroid tracking over per-camera frame
    sequences — the batch twin of the reference's Flink vision
    tracker (flink_vision_job_proper.py:37-128): stable track ids
    across frames, 50 px association gate, expiry after
    ``TRACK_MAX_MISS`` consecutive misses, new tracks for unmatched
    detections. One output row per track ever registered (expired
    tracks kept, flagged)."""
    dets = tracker_detections(table(spark, sf_dir, "events"))
    return dets.mapInPandas(_fold_partition, TRACKER_OUT_SCHEMA)


def track_lifetimes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-camera track-population report over :func:`centroid_tracks`
    output — the dashboard the reference's Flink tracker feeds
    (flink_vision_job_proper.py:122-128 logs per-frame track counts):
    how many identities each camera registered, how many expired vs
    survived, and how long tracks lived (frames) / how often they
    re-matched. One keyed aggregate over the tracker output (rows are
    already one-per-track, bounded by detections); all stats are
    exact-integer sums with single final divisions."""
    tr = centroid_tracks(spark, sf_dir)
    life = F.col("last_frame") - F.col("first_frame") + 1
    agg = tr.groupBy("camera_id").agg(
        F.count(F.lit(1)).alias("n_tracks"),
        F.sum(F.col("expired").cast("long")).alias("n_expired"),
        F.sum(life.cast("long")).alias("sum_life"),
        F.max(life).cast("int").alias("max_life"),
        F.sum(F.col("n_matched").cast("long")).alias("sum_matched"),
    )
    return agg.select(
        "camera_id",
        "n_tracks",
        "n_expired",
        pround(
            F.col("sum_life").cast("double") / F.col("n_tracks").cast("double")
        ).alias("avg_life_frames"),
        "max_life",
        pround(
            F.col("sum_matched").cast("double")
            / F.col("n_tracks").cast("double")
        ).alias("avg_rematches"),
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
    "centroid_tracks": centroid_tracks,
    "track_lifetimes": track_lifetimes,
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
    # Sequential per-camera greedy tracking replayed as a recursive CTE:
    # each recursion step advances every camera one frame, computing the
    # closed-form greedy update (per-track argmin, per-column winner by
    # min (d2, tid)) with list lambdas over the bounded track list.
    # Recursion depth = max frames per camera (<= TRACK_FRAMES).
    "centroid_tracks": f"""
        WITH RECURSIVE
        frames AS (
            SELECT user_id AS camera_id, rn AS f FROM (
                SELECT user_id, row_number() OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) AS rn
                FROM events)
            WHERE rn <= {TRACK_FRAMES}
        ),
        dets0 AS (
            SELECT camera_id, CAST(f AS INTEGER) AS f,
                   CAST(row_number() OVER (PARTITION BY camera_id, f ORDER BY s) - 1 AS INTEGER) AS col,
                   CAST(((camera_id*37 + s*101 + ((camera_id*5 + s*7) % 51 - 25)*f) % 1920 + 1920) % 1920 AS INTEGER) AS cx,
                   CAST(((camera_id*53 + s*71 + ((camera_id*11 + s*13) % 51 - 25)*f) % 1080 + 1080) % 1080 AS INTEGER) AS cy
            FROM frames, (SELECT unnest([1, 2, 3]) AS s)
            WHERE (camera_id*3 + f + s*3) % 17 >= 2
        ),
        fdets AS (
            SELECT camera_id, f,
                   list(struct_pack(col := col, x := cx, y := cy) ORDER BY col) AS ds
            FROM dets0 GROUP BY 1, 2
        ),
        maxf AS (SELECT camera_id, CAST(MAX(f) AS INTEGER) AS fmax FROM frames GROUP BY 1),
        st AS (
            SELECT camera_id, 0 AS f,
                   CAST([] AS STRUCT(tid INTEGER, cx INTEGER, cy INTEGER, miss INTEGER,
                                     first_f INTEGER, last_f INTEGER, n_match INTEGER,
                                     expired BOOLEAN)[]) AS tracks,
                   0 AS nid
            FROM maxf
            UNION ALL
            SELECT camera_id, f, tracks2 AS tracks, nid + len(newcols) AS nid
            FROM (
                SELECT s.camera_id, s.f + 1 AS f, s.nid,
                       list_transform(
                           list_filter(s.tracks, t -> NOT t.expired),
                           t -> struct_pack(
                               t := t,
                               b := CASE WHEN len(ds) = 0 THEN NULL ELSE
                                   list_reduce(
                                       list_transform(ds, d -> struct_pack(
                                           d2 := (t.cx - d.x)*(t.cx - d.x)
                                                 + (t.cy - d.y)*(t.cy - d.y),
                                           col := d.col)),
                                       (a, b) -> CASE WHEN b.d2 < a.d2 THEN b ELSE a END)
                               END)) AS tb,
                       COALESCE(d.ds, CAST([] AS STRUCT(col INTEGER, x INTEGER, y INTEGER)[])) AS ds,
                       s.tracks AS oldtracks
                FROM st s
                JOIN maxf m USING (camera_id)
                LEFT JOIN fdets d ON d.camera_id = s.camera_id AND d.f = s.f + 1
                WHERE s.f < m.fmax
            ),
            LATERAL (
                SELECT
                    list_transform(ds, d -> struct_pack(
                        col := d.col, x := d.x, y := d.y,
                        wtid := CASE WHEN len(list_filter(tb,
                                    z -> z.b IS NOT NULL AND z.b.col = d.col
                                         AND z.b.d2 <= {TRACK_GATE2})) = 0
                                THEN NULL ELSE
                                list_reduce(
                                    list_transform(
                                        list_filter(tb,
                                            z -> z.b IS NOT NULL AND z.b.col = d.col
                                                 AND z.b.d2 <= {TRACK_GATE2}),
                                        z -> struct_pack(d2 := z.b.d2, tid := z.t.tid)),
                                    (a, b) -> CASE WHEN b.d2 < a.d2
                                                   OR (b.d2 = a.d2 AND b.tid < a.tid)
                                              THEN b ELSE a END).tid
                                END)) AS wmap
            ),
            LATERAL (
                SELECT
                    list_filter(wmap, w -> w.wtid IS NULL) AS newcols,
                    list_concat(
                        list_transform(oldtracks, t -> CASE
                            WHEN t.expired THEN t
                            WHEN len(list_filter(wmap, w -> w.wtid = t.tid)) > 0 THEN
                                struct_pack(
                                    tid := t.tid,
                                    cx := list_filter(wmap, w -> w.wtid = t.tid)[1].x,
                                    cy := list_filter(wmap, w -> w.wtid = t.tid)[1].y,
                                    miss := 0, first_f := t.first_f, last_f := f,
                                    n_match := t.n_match + 1, expired := false)
                            ELSE
                                struct_pack(
                                    tid := t.tid, cx := t.cx, cy := t.cy,
                                    miss := t.miss + 1, first_f := t.first_f,
                                    last_f := t.last_f, n_match := t.n_match,
                                    expired := t.miss + 1 > {TRACK_MAX_MISS})
                            END),
                        list_transform(list_filter(wmap, w -> w.wtid IS NULL),
                            (w, i) -> struct_pack(
                                tid := nid + CAST(i AS INTEGER) - 1, cx := w.x, cy := w.y,
                                miss := 0, first_f := f, last_f := f,
                                n_match := 0, expired := false))
                    ) AS tracks2
            )
        )
        SELECT s.camera_id, t.tid AS track_id, t.first_f AS first_frame,
               t.last_f AS last_frame, t.n_match AS n_matched,
               t.expired AS expired, t.cx AS final_cx, t.cy AS final_cy
        FROM (SELECT camera_id, f, unnest(tracks) AS t
              FROM st JOIN maxf USING (camera_id) WHERE f = fmax) s(camera_id, f, t)
    """,
}

from smart_city_data_pipeline_spark.functions.rounding import pround_sql  # noqa: E402

# Aggregates the centroid_tracks oracle (nested as a derived table —
# DuckDB allows the inner WITH RECURSIVE there) so both legs replay
# the identical tracker before the per-camera rollup.
ORACLES["track_lifetimes"] = f"""
    SELECT camera_id,
           CAST(COUNT(*) AS BIGINT) AS n_tracks,
           CAST(SUM(CASE WHEN expired THEN 1 ELSE 0 END) AS BIGINT)
               AS n_expired,
           {pround_sql(
               'CAST(SUM(last_frame - first_frame + 1) AS DOUBLE)'
               ' / CAST(COUNT(*) AS DOUBLE)'
           )} AS avg_life_frames,
           CAST(MAX(last_frame - first_frame + 1) AS INT) AS max_life,
           {pround_sql(
               'CAST(SUM(n_matched) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)'
           )} AS avg_rematches
    FROM ({ORACLES['centroid_tracks']})
    GROUP BY 1
"""


# Cross-camera handoff window: a track starting on another camera
# within this many seconds of a track's end (same object class) is a
# handoff candidate — the city-scale re-identification prior.
HANDOFF_WINDOW_S = 600


def camera_handoff_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-camera handoff candidate matrix — the re-identification
    prior every multi-camera deployment computes before attempting
    appearance matching: for each ordered camera pair, how many
    (track end on A) → (track start on B within HANDOFF_WINDOW_S,
    same object class) candidates exist and their mean time gap.

    Scale shape: the inequality is a RANGE JOIN, executed as a keyed
    EQUI-join on (obj_type, Δ-sized time bucket) with the end side
    exploded to its bucket and the next (a start in (t, t+Δ] lands in
    exactly ONE of the two — so every candidate pair matches exactly
    once and needs no dedup shuffle), then the residual range filter.
    Never a cross product, never a broadcast of a corpus-scaled side;
    pair volume is bounded by per-(type, bucket) track density. The
    track table itself is two keyed aggregates over the exploded
    detections (bounded by objects × cameras).

    Exactness: gaps are exact integer microseconds; the mean is one
    pround'd division. Oracle: the same track table + a direct
    inequality join (DuckDB handles the range join natively at gate
    scale)."""
    frames = synth_detections(table(spark, sf_dir, "events"))
    det = frames.select("camera_id", "ts", F.inline_outer("detections"))
    tracks = det.groupBy("camera_id", "object_id", "obj_type").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    bucket_us = HANDOFF_WINDOW_S * 1_000_000
    ends = tracks.select(
        F.col("camera_id").alias("from_camera"),
        "obj_type",
        F.col("last_ts"),
        F.explode(
            F.array(
                F.expr(f"unix_micros(last_ts) div {bucket_us}"),
                F.expr(f"unix_micros(last_ts) div {bucket_us}") + F.lit(1),
            )
        ).alias("jb"),
    )
    starts = tracks.select(
        F.col("camera_id").alias("to_camera"),
        "obj_type",
        F.col("first_ts"),
        F.expr(f"unix_micros(first_ts) div {bucket_us}").alias("jb"),
    )
    gap_us = F.unix_micros(F.col("first_ts")) - F.unix_micros(F.col("last_ts"))
    pairs = (
        ends.join(starts, ["obj_type", "jb"])
        .filter(
            (F.col("to_camera") != F.col("from_camera"))
            & (gap_us > 0)
            & (gap_us <= F.lit(HANDOFF_WINDOW_S * 1_000_000))
        )
        .select("from_camera", "to_camera", gap_us.alias("gap_us"))
    )
    return pairs.groupBy("from_camera", "to_camera").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_handoffs"),
        pround(
            F.sum("gap_us").cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(1_000_000.0)
        ).alias("avg_gap_s"),
    )


QUERIES["camera_handoff_matrix"] = camera_handoff_matrix

ORACLES["camera_handoff_matrix"] = f"""
    WITH tracks AS (
        SELECT camera_id, object_id, obj_type,
               MIN(ts) AS first_ts, MAX(ts) AS last_ts
        FROM ({_DET_BASE_SQL})
        GROUP BY 1, 2, 3
    ),
    pairs AS (
        SELECT a.camera_id AS from_camera, b.camera_id AS to_camera,
               epoch_us(b.first_ts) - epoch_us(a.last_ts) AS gap_us
        FROM tracks a JOIN tracks b
          ON a.obj_type = b.obj_type
         AND a.camera_id <> b.camera_id
         AND epoch_us(b.first_ts) > epoch_us(a.last_ts)
         AND epoch_us(b.first_ts)
             <= epoch_us(a.last_ts) + {HANDOFF_WINDOW_S * 1_000_000}
    )
    SELECT from_camera, to_camera,
           CAST(COUNT(*) AS BIGINT) AS n_handoffs,
           {pround_sql(
               'CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) / 1000000.0'
           )} AS avg_gap_s
    FROM pairs GROUP BY 1, 2
"""
