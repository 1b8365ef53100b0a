"""Streaming Poisson-bootstrap uncertainty monitor — the batch
``poisson_bootstrap_ci`` (operators/stats.py) run continuously over
the event stream: per-(type, replicate) integer moments folded
incrementally, the confidence interval computed on read. A live mean
whose CI suddenly widens (sensor flapping, mixed populations) pages at
the next micro-batch instead of the next batch audit — with the SAME
deterministic draw, so the streamed CI is bit-identical to the batch
one over the same rows.

Spark-first shape: both legs are grouped aggregates of COMMUTATIVE
integer sums (the replicate moments Σw / Σw·cents and the full-sample
moments n / Σcents), i.e. monoids — any micro-batch interleaving folds
to the identical state, and the streaming state is |types|×(B+1) rows
regardless of volume. The report runs ON READ through the SAME
``bootstrap_ci_finish`` the batch operator uses (shared code — monitor
and report cannot drift; the ``calibration_monitor`` discipline), and
the draw/moment builders are the SAME ``bootstrap_replicate_moments``
/ ``bootstrap_corpus_moments`` (pure projections + streaming
aggregates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from smart_city_data_pipeline_spark.operators.stats import (
    bootstrap_ci_finish,
    bootstrap_corpus_moments,
    bootstrap_replicate_moments,
)


def bootstrap_replicate_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming leg 1: the shared per-(type, replicate) moment
    aggregate. Run with ``outputMode("complete")`` — state is the
    |types|×B replicate table, constant-bounded."""
    return bootstrap_replicate_moments(events_stream)


def bootstrap_corpus_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming leg 2: the shared full-sample per-type moments."""
    return bootstrap_corpus_moments(events_stream)


def bootstrap_ci_from_moments(rep: DataFrame, full: DataFrame) -> DataFrame:
    """On-read finisher over the two drained moment sinks — the
    identical IEEE sequence as the batch report."""
    return bootstrap_ci_finish(rep, full)
