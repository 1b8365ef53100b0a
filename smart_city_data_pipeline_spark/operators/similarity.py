"""Similarity search over the ``embeddings`` table.

- ``ann_topk_cosine``: brute-force cosine top-k for a small probe set —
  the correctness baseline. The probe side is broadcast, so the big
  side streams once with no shuffle; ranking is a per-probe window.
- ``ann_ivf_topk``: the scale path — IVF-style pruning using the
  ``label`` column as the coarse quantizer cell: probes only scan
  their own cell instead of the full corpus (at 100 TB the cells are
  the partition key, so each probe touches 1/n_cells of the data).

Vector math is JVM-side (``zip_with``/``aggregate``) — see
:mod:`functions.vector`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from smart_city_data_pipeline_spark.catalog import spread, table
from smart_city_data_pipeline_spark.functions.rounding import pround
from smart_city_data_pipeline_spark.functions.vector import cosine, cosine_sql

N_PROBES = 5  # vec_id < 5 are the query vectors
TOP_K = 5


def ann_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k neighbors for each probe (full-scan baseline)."""
    emb = spread(table(spark, sf_dir, "embeddings"), "vec_id", key=f"{sf_dir}:embeddings")
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_emb")
    )
    cos = cosine(F.col("probe_emb"), F.col("embedding"))
    scored = (
        emb.join(F.broadcast(probes), F.col("vec_id") != F.col("probe_id"))
        .select(
            F.col("probe_id"),
            F.col("vec_id").alias("neighbor_id"),
            pround(cos).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("probe_id", "rank", "neighbor_id", "cos_sim")
    )


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-pruned top-k: probes only scan their own label cell."""
    emb = spread(table(spark, sf_dir, "embeddings"), "vec_id", key=f"{sf_dir}:embeddings")
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("label").alias("probe_label"),
        F.col("embedding").alias("probe_emb"),
    )
    cos = cosine(F.col("probe_emb"), F.col("embedding"))
    scored = (
        emb.join(
            F.broadcast(probes),
            (F.col("label") == F.col("probe_label")) & (F.col("vec_id") != F.col("probe_id")),
        )
        .select(
            F.col("probe_id"),
            F.col("vec_id").alias("neighbor_id"),
            pround(cos).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("probe_id", "rank", "neighbor_id", "cos_sim")
    )


QUERIES = {
    "ann_topk_cosine": ann_topk_cosine,
    "ann_ivf_topk": ann_ivf_topk,
}

_COS = cosine_sql("p.probe_emb", "e.embedding")

ORACLES = {
    "ann_topk_cosine": f"""
        WITH probes AS (
            SELECT vec_id AS probe_id, embedding AS probe_emb
            FROM embeddings WHERE vec_id < {N_PROBES}
        ),
        scored AS (
            SELECT p.probe_id, e.vec_id AS neighbor_id,
                   (FLOOR(CAST(({_COS}) AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS cos_sim
            FROM embeddings e JOIN probes p ON e.vec_id <> p.probe_id
        )
        SELECT probe_id, CAST(rank AS INT) AS rank, neighbor_id, cos_sim
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY probe_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
            FROM scored
        ) WHERE rank <= {TOP_K}
    """,
    "ann_ivf_topk": f"""
        WITH probes AS (
            SELECT vec_id AS probe_id, label AS probe_label, embedding AS probe_emb
            FROM embeddings WHERE vec_id < {N_PROBES}
        ),
        scored AS (
            SELECT p.probe_id, e.vec_id AS neighbor_id,
                   (FLOOR(CAST(({_COS}) AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS cos_sim
            FROM embeddings e
            JOIN probes p ON e.label = p.probe_label AND e.vec_id <> p.probe_id
        )
        SELECT probe_id, CAST(rank AS INT) AS rank, neighbor_id, cos_sim
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY probe_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
            FROM scored
        ) WHERE rank <= {TOP_K}
    """,
}
