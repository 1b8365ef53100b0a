"""Incremental embedding-PCA maintenance: streaming raw moments,
batch-exact on read.

The batch operator (operators/similarity.py ``embedding_pca_power``)
re-scans the corpus twice per run; a training-data pipeline that keeps
APPENDING embeddings wants the covariance maintained incrementally.
The trick is that the centered scatter is derivable from three
MERGEABLE integer monoids — ``n``, ``s_j = Σq_j`` and
``M_jk = Σ q_j·q_k`` — via the exact identity

    C = M − m·sᵀ − s·mᵀ + n·m·mᵀ,   m = floor(s / n)  (integer mean)

so each micro-batch contributes one numpy int64 partial, the lake holds
one 4096-cell moment row (O(dim²) state, independent of stream volume),
and the on-read finisher runs the SAME power iteration as the batch
operator (:func:`operators.similarity.pca_finish` — shared code, the
two paths cannot drift). Batch-id bookkeeping makes crash-replayed
micro-batches idempotent (the ``cont_agg`` discipline).

Stream ≡ batch is EXACT equality, not approximation: pytest drops the
embeddings in three waves and asserts row-for-row equality with the
one-shot batch operator over the union.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from smart_city_data_pipeline_spark.operators.similarity import (
    PCA_Q,
    pca_finish,
)
from smart_city_data_pipeline_spark.streaming.warehouse_sink import (
    stream_to_warehouse,
)


def _batch_moments(df: DataFrame, dim: int):
    """One micro-batch's (n, s, M) as exact python ints — computed
    distributed via mapInPandas int64 partials (one 4096-cell row per
    partition), folded on the driver (bounded by partition count)."""
    q = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x: F.floor(x * F.lit(PCA_Q) + F.lit(0.5)).cast("long"),
    )
    qdf = df.select(q.alias("q"))

    def partials(it):
        import numpy as np
        import pandas as pd

        n = 0
        s = np.zeros(dim, dtype=np.int64)
        m = np.zeros((dim, dim), dtype=np.int64)
        for pdf in it:
            if not len(pdf):
                continue
            a = np.stack(pdf["q"].to_numpy()).astype(np.int64)
            n += len(a)
            s += a.sum(axis=0)
            m += a.T @ a
        yield pd.DataFrame(
            {"n": [n], "s": [s.tolist()], "m": [m.flatten().tolist()]}
        )

    parts = qdf.mapInPandas(
        partials, "n long, s array<long>, m array<long>"
    ).collect()
    n = sum(r["n"] for r in parts)
    s = [0] * dim
    m = [0] * (dim * dim)
    for r in parts:
        for j in range(dim):
            s[j] += r["s"][j]
        for j in range(dim * dim):
            m[j] += r["m"][j]
    return n, s, m


def merge_pca_moments(
    spark: SparkSession, path: str, batch_df: DataFrame, batch_id: int, dim: int
) -> None:
    """Idempotent read-merge-swap of one batch's raw moments into the
    JSON moment file (a single O(dim²) row — a sidecar file, not a
    table, is the right store)."""
    state = {"n": 0, "s": [0] * dim, "m": [0] * (dim * dim), "last_batch_id": -1}
    if os.path.exists(path):
        with open(path) as fh:
            state = json.load(fh)
        if batch_id <= state["last_batch_id"]:
            return  # crash-replay of an already-merged batch
    n, s, m = _batch_moments(batch_df, dim)
    state["n"] += n
    state["s"] = [a + b for a, b in zip(state["s"], s)]
    state["m"] = [a + b for a, b in zip(state["m"], m)]
    state["last_batch_id"] = batch_id
    tmp = path + "._tmp"
    with open(tmp, "w") as fh:
        json.dump(state, fh)
    os.replace(tmp, path)  # atomic swap


def continuous_pca_moments(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    dim: int,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain the PCA moment sidecar from an embeddings stream."""
    return stream_to_warehouse(
        stream,
        lambda df, bid: merge_pca_moments(df.sparkSession, path, df, bid, dim),
        checkpoint,
        available_now,
    )


def read_pca_from_moments(
    spark: SparkSession, path: str, dim: int
) -> DataFrame:
    """On-read finisher: exact centered scatter from the raw moments,
    then the SAME power iteration as the batch operator."""
    import math

    with open(path) as fh:
        state = json.load(fh)
    n, s = state["n"], state["s"]
    mflat = state["m"]
    mean = [int(math.floor(sj / n)) for sj in s]
    C = [
        [
            mflat[j * dim + k]
            - mean[j] * s[k]
            - s[j] * mean[k]
            + n * mean[j] * mean[k]
            for k in range(dim)
        ]
        for j in range(dim)
    ]
    return pca_finish(spark, C, n, dim)
