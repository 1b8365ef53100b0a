"""Centroid-association tracker (VERDICT r6 item 5).

Pins the closed-form per-frame update (operators/vision.tracker_update)
against a literal-semantics port of the reference's sequential greedy
loop (flink_vision_job_proper.py:37-128 SimpleTracker.update: rows
sorted by min distance, each row attempting only its own argmin column,
used-row/col skips, 50 px gate, miss-count expiry) — including the
conflict cases where the two formulations could plausibly diverge.
"""

from __future__ import annotations

from smart_city_data_pipeline_spark.operators.vision import (
    TRACK_GATE2,
    TRACK_MAX_MISS,
    tracker_detections,
    tracker_update,
)


class GreedySequentialTracker:
    """The reference algorithm, written as the literal sequential loop
    (stable sort by (min-dist, insertion order); per-row argmin column
    with first-index tie-break; skip used rows/cols; gate AFTER the
    used check; miss++/expire for unmatched rows; register unmatched
    columns in order)."""

    def __init__(self, gate2=TRACK_GATE2, max_miss=TRACK_MAX_MISS):
        self.gate2 = gate2
        self.max_miss = max_miss
        self.next_id = 0
        self.pos = {}  # tid -> (x, y), insertion-ordered
        self.miss = {}
        self.meta = {}  # tid -> dict(first_f, last_f, n_match)
        self.closed = []  # expired track summaries

    def _register(self, x, y, f):
        tid = self.next_id
        self.next_id += 1
        self.pos[tid] = (x, y)
        self.miss[tid] = 0
        self.meta[tid] = dict(first_f=f, last_f=f, n_match=0)

    def _expire_check(self, tid):
        self.miss[tid] += 1
        if self.miss[tid] > self.max_miss:
            x, y = self.pos.pop(tid)
            m = self.meta.pop(tid)
            del self.miss[tid]
            self.closed.append((tid, m["first_f"], m["last_f"],
                               m["n_match"], True, x, y))

    def update(self, f, dets):
        if not dets:
            for tid in list(self.miss):
                self._expire_check(tid)
            return
        if not self.pos:
            for x, y in dets:
                self._register(x, y, f)
            return
        tids = list(self.pos)
        d = [
            [(self.pos[t][0] - x) ** 2 + (self.pos[t][1] - y) ** 2
             for (x, y) in dets]
            for t in tids
        ]
        # stable argsort of rows by their min distance
        order = sorted(range(len(tids)), key=lambda r: (min(d[r]), r))
        used_rows, used_cols = set(), set()
        for r in order:
            c = min(range(len(dets)), key=lambda j: (d[r][j], j))
            if r in used_rows or c in used_cols:
                continue
            if d[r][c] > self.gate2:
                continue
            tid = tids[r]
            self.pos[tid] = dets[c]
            self.miss[tid] = 0
            self.meta[tid]["last_f"] = f
            self.meta[tid]["n_match"] += 1
            used_rows.add(r)
            used_cols.add(c)
        for r in range(len(tids)):
            if r not in used_rows:
                self._expire_check(tids[r])
        for c in range(len(dets)):
            if c not in used_cols:
                x, y = dets[c]
                self._register(x, y, f)

    def summary(self):
        live = [
            (tid, m["first_f"], m["last_f"], m["n_match"], False, *self.pos[tid])
            for tid, m in self.meta.items()
        ]
        return sorted(self.closed + live)


def run_closed_form(frames):
    tracks, nid = [], 0
    for f, dets in enumerate(frames, start=1):
        nid = tracker_update(tracks, nid, f, [(c, x, y) for c, (x, y) in enumerate(dets)])
    return sorted(
        (t["tid"], t["first_f"], t["last_f"], t["n_match"], t["expired"],
         t["cx"], t["cy"])
        for t in tracks
    )


def run_greedy(frames):
    g = GreedySequentialTracker()
    for f, dets in enumerate(frames, start=1):
        g.update(f, dets)
    return g.summary()


def test_steady_trajectory_single_track():
    frames = [[(100 + 10 * f, 200 + 5 * f)] for f in range(1, 21)]
    out = run_closed_form(frames)
    assert len(out) == 1
    tid, first, last, nmatch, expired, _, _ = out[0]
    assert (tid, first, last, nmatch, expired) == (0, 1, 20, 19, False)


def test_teleport_expires_and_registers():
    frames = [[(100, 100)], [(110, 100)], [(1500, 900)],
              [(1510, 900)], [(1520, 900)], [(1530, 900)]]
    out = run_closed_form(frames)
    # old track: matched once, then 4 misses -> expired after miss > 2
    assert (0, 1, 2, 1, True, 110, 100) in out
    # teleported detection became a new persistent track
    assert (1, 3, 6, 3, False, 1530, 900) in out


def test_absence_within_miss_budget_keeps_identity():
    frames = [[(100, 100)], [(110, 100)], [], [], [(130, 100)]]
    out = run_closed_form(frames)
    assert out == [(0, 1, 5, 2, False, 130, 100)]


def test_conflict_goes_to_closer_track_loser_skipped():
    # two tracks, one detection equidistant-ish: closer track wins,
    # loser is NOT rematched (single-shot greedy) and takes a miss
    frames = [
        [(100, 100), (140, 100)],  # tracks 0 and 1
        [(118, 100)],  # 18px from track 0, 22px from track 1
    ]
    out = run_closed_form(frames)
    assert (0, 1, 2, 1, False, 118, 100) in out
    t1 = [t for t in out if t[0] == 1][0]
    assert t1[3] == 0 and not t1[4]  # unmatched, one miss, alive
    assert run_closed_form(frames) == run_greedy(frames)


def test_equal_distance_tie_lower_track_id_wins():
    frames = [
        [(100, 100), (140, 100)],
        [(120, 100)],  # exactly 20px from both
    ]
    out = run_closed_form(frames)
    assert (0, 1, 2, 1, False, 120, 100) in out
    assert run_closed_form(frames) == run_greedy(frames)


def test_gate_failure_leaves_column_free():
    # track 0's argmin is the far det (>50px): gate rejects, but the
    # column stays free and is registered as a new track
    frames = [[(100, 100)], [(200, 100)]]
    out = run_closed_form(frames)
    assert (0, 1, 1, 0, False, 100, 100) in out
    assert (1, 2, 2, 0, False, 200, 100) in out
    assert run_closed_form(frames) == run_greedy(frames)


def _lcg_frames(seed, n_frames, w=600, h=400):
    """Deterministic pseudo-random det soup with persistent movers."""
    x = seed
    movers = []
    for s in range(3):
        x = (x * 1103515245 + 12345) % (1 << 31)
        movers.append([x % w, (x >> 8) % h, (x >> 16) % 31 - 15, (x >> 20) % 31 - 15])
    frames = []
    for f in range(n_frames):
        dets = []
        for s, m in enumerate(movers):
            x = (x * 1103515245 + 12345) % (1 << 31)
            if x % 7 == 0:
                continue  # blink out
            if x % 23 == 0:  # teleport
                m[0], m[1] = (x >> 4) % w, (x >> 12) % h
            else:
                m[0] = (m[0] + m[2]) % w
                m[1] = (m[1] + m[3]) % h
            dets.append((m[0], m[1]))
        frames.append(dets)
    return frames


def test_randomized_equivalence_with_sequential_greedy():
    for seed in (1, 7, 42, 99, 12345):
        frames = _lcg_frames(seed, 120)
        assert run_closed_form(frames) == run_greedy(frames), seed


def test_spark_operator_matches_python_fold(spark, sf_dir):
    from smart_city_data_pipeline_spark.catalog import table
    from smart_city_data_pipeline_spark.operators.vision import centroid_tracks

    dets = tracker_detections(table(spark, sf_dir, "events")).collect()
    bycam = {}
    for r in sorted(dets, key=lambda r: (r["camera_id"], r["f"], r["s"])):
        bycam.setdefault(r["camera_id"], {}).setdefault(r["f"], []).append(
            (r["cx"], r["cy"])
        )
    expected = []
    for cam in bycam:
        tracks, nid = [], 0
        for f in sorted(bycam[cam]):
            nid = tracker_update(
                tracks, nid, f,
                [(c, x, y) for c, (x, y) in enumerate(bycam[cam][f])],
            )
        expected += [
            (cam, t["tid"], t["first_f"], t["last_f"], t["n_match"],
             t["expired"], t["cx"], t["cy"])
            for t in tracks
        ]
    got = sorted(tuple(r) for r in centroid_tracks(spark, sf_dir).collect())
    assert got == sorted(expected)
