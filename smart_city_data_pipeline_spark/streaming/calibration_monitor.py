"""Streaming classifier-calibration monitor — the batch
``classifier_calibration_report`` (operators/stats.py) run
continuously over a documents stream: per 0.1-confidence-bin
reliability moments folded incrementally, ECE/Brier on read. A filter
model drifting out of calibration (a crawl whose text distribution
moved under the fixed classifier) pages at the next micro-batch
instead of the next corpus audit.

Spark-first shape: the stream side is ONE grouped aggregate into the
≤10-bin moment table — every moment a COMMUTATIVE integer sum
(count, Σy, Σs, Σ(s−10⁴y)² in DECIMAL(38,0)), i.e. a monoid, so any
micro-batch interleaving folds to the bit-identical state and the
streaming state is CONSTANT-bounded (10 rows) regardless of volume.
The report runs ON READ over the moment sink through the SAME
``calibration_finish`` the batch operator uses (shared code — monitor
and report cannot drift; the ``psi_monitor`` discipline), and the
moment builder is the SAME ``calibration_bin_moments`` (a streaming
frame is accepted: score + bin are pure projections, the aggregate is
Spark's own streaming state store).

Batch-exactness contract (pytest): drain(wave1 ∪ wave2 as two
micro-batches via checkpoint) ≡ classifier_calibration_report(batch
over the union) EXACTLY — not approximately — because the finisher
consumes only the folded integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from smart_city_data_pipeline_spark.operators.stats import (
    calibration_bin_moments,
    calibration_finish,
)


def calibration_moment_stream(docs_stream: DataFrame) -> DataFrame:
    """Streaming leg: the shared per-bin integer-moment aggregate over
    a streaming documents frame. Run it with ``outputMode("complete")``
    — the state is the ≤10-row bin table, so complete mode re-emits a
    constant-size result per trigger (never row-proportional)."""
    return calibration_bin_moments(docs_stream)


def calibration_report_from_moments(moments: DataFrame) -> DataFrame:
    """On-read finisher over the drained moment sink — the identical
    IEEE sequence as the batch report."""
    return calibration_finish(moments)
