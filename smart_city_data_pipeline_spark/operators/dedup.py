"""Deduplication operators over the ``documents`` corpus: exact,
n-gram Jaccard (inverted-index), MinHash+LSH, SimHash.

LLM-training-data extensions of the reference's data-quality layer
(``pipline2`` batch "data quality checks" in the architecture). All
hashing is md5-based (:mod:`functions.hashing`) so the DuckDB oracle
computes byte-identical integers — Spark's native hash()/xxhash64()
are engine-specific and never appear in an output contract.

Scale notes (the part that matters at 100 TB):
- NO O(n²) cross joins anywhere. Candidate pairs always come from an
  equi-join on a blocking key (shingle, LSH band hash, simhash band),
  so the shuffle is keyed and bounded by bucket size.
- The inverted-index Jaccard join is the classic
  group-by-shingle/pair-within-bucket plan; at production scale you cap
  document frequency per shingle (drop shingles with df > K) — here the
  corpus is synthetic and df stays small, so no cap is applied, keeping
  oracle semantics exact.
- MinHash signatures are one explode + one groupBy per doc (map-side
  combinable); LSH banding turns near-dup search into an equi-join.
- Everything is built-in expressions — no Python rows that would cap
  throughput at the Arrow boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from smart_city_data_pipeline_spark.catalog import table
from smart_city_data_pipeline_spark.functions.rounding import pround
from smart_city_data_pipeline_spark.functions.hashing import md5_long, md5_long_sql
from smart_city_data_pipeline_spark.functions.vector import cosine, cosine_sql

N_MINHASH = 16
N_BANDS = 4  # 4 rows per band
JACCARD_THRESHOLD = 0.8
MINHASH_SIM_THRESHOLD = 0.5
COSINE_NEARDUP_THRESHOLD = 0.3
SIMHASH_BITS = 60  # fits signed 64-bit in both engines


def _ws_tokens(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), "\\s+")


def _shingles(text: Column) -> Column:
    """Distinct 3-token shingles."""
    toks = _ws_tokens(text)
    n = F.size(toks)
    tri = F.transform(
        F.sequence(F.lit(0), n - 3),
        lambda i: F.concat_ws(" ", toks[i], toks[i + 1], toks[i + 2]),
    )
    return F.array_distinct(tri)


# DuckDB twin (1-based list indexing there).
_SHINGLES_SQL = (
    "list_distinct(list_transform(range(1, len({toks}) - 1),"
    " i -> {toks}[i] || ' ' || {toks}[i+1] || ' ' || {toks}[i+2]))"
).format(toks="regexp_split_to_array(trim(lower(text)), '\\s+')")


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: min doc_id per identical text is canonical."""
    docs = table(spark, sf_dir, "documents")
    canon = (
        docs.groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(F.min("doc_id").alias("canonical_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )
    return (
        docs.select(F.col("doc_id"), F.md5(F.col("text")).alias("text_hash"))
        .join(canon, "text_hash")
        .select(
            F.col("doc_id"),
            F.col("canonical_doc_id"),
            (F.col("doc_id") != F.col("canonical_doc_id")).alias("is_duplicate"),
            F.col("n_copies"),
        )
    )


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard ≥ threshold via inverted-index self-join."""
    docs = table(spark, sf_dir, "documents")
    sh = docs.select(
        F.col("doc_id"), F.explode(_shingles(F.col("text"))).alias("shingle")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_inter") / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_inter"))
    return (
        inter.join(F.broadcast(sa), F.col("doc_a") == F.col("sa.doc_id"))
        .join(F.broadcast(sb), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= JACCARD_THRESHOLD)
        .select(
            F.col("doc_a"), F.col("doc_b"), pround(jac).alias("jaccard")
        )
    )


def _minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, seed, minhash): min over shingles of seeded md5 hash."""
    docs = table(spark, sf_dir, "documents")
    sh = docs.select(
        F.col("doc_id"), F.explode(_shingles(F.col("text"))).alias("shingle")
    )
    # Per-row seed, so the seeded-hash concat is built inline rather
    # than via the literal-seed helper.
    seeded = sh.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(N_MINHASH - 1))).alias("seed"),
        F.col("shingle"),
    ).select(
        "doc_id",
        "seed",
        md5_long(F.concat(F.lit("s"), F.col("seed").cast("string"), F.lit(":"), F.col("shingle"))).alias("h"),
    )
    return seeded.groupBy("doc_id", "seed").agg(F.min("h").alias("minhash"))


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding: candidate pairs share an identical band,
    verified by signature similarity ≥ threshold."""
    sigs = _minhash_sigs(spark, sf_dir)
    band = (
        sigs.withColumn("band", F.col("seed") % N_BANDS)
        .groupBy("doc_id", "band")
        # sort by seed inside the band so the band key is deterministic
        .agg(
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("seed"), F.col("minhash")))
                        ),
                        lambda s: s["minhash"].cast("string"),
                    ),
                )
            ).alias("band_hash")
        )
    )
    a = band.alias("a")
    b = band.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = _minhash_sigs(spark, sf_dir).alias("sa")
    sb = _minhash_sigs(spark, sf_dir).alias("sb")
    sim = (
        cand.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            sb,
            (F.col("doc_b") == F.col("sb.doc_id")) & (F.col("sa.seed") == F.col("sb.seed")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            pround(F.avg((F.col("sa.minhash") == F.col("sb.minhash")).cast("double"))).alias("sig_sim")
        )
    )
    return sim.filter(F.col("sig_sim") >= MINHASH_SIM_THRESHOLD)


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash fingerprint per document + coarse band key."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        F.col("doc_id"), F.explode(_ws_tokens(F.col("text"))).alias("token")
    ).groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("w"))
    h = md5_long(F.col("token"))
    bits = tok.select(
        "doc_id",
        "w",
        h.alias("h"),
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("bit"),
    )
    # shiftright/shiftleft Python helpers take int shift amounts only,
    # so the per-row bit shift goes through SQL expressions.
    contrib = F.when(
        F.expr("shiftright(h, CAST(bit AS INT)) & 1") == 1, F.col("w")
    ).otherwise(-F.col("w"))
    per_bit = bits.groupBy("doc_id", "bit").agg(F.sum(contrib).alias("s"))
    fp = per_bit.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))")).otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )
    return fp.select(
        "doc_id",
        F.col("simhash"),
        F.shiftright(F.col("simhash"), SIMHASH_BITS - 12).alias("band"),
    )


def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-label (IVF-style blocked) cosine near-dup pairs."""
    emb = table(spark, sf_dir, "embeddings")
    a = emb.alias("a")
    b = emb.alias("b")
    cos = cosine(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos >= COSINE_NEARDUP_THRESHOLD)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            pround(cos).alias("cos_sim"),
        )
    )


_MINHASH_SIGS_SQL = f"""
    SELECT doc_id, seed,
           MIN({md5_long_sql("'s' || CAST(seed AS VARCHAR) || ':' || shingle")}) AS minhash
    FROM (
        SELECT doc_id, unnest({_SHINGLES_SQL}) AS shingle
        FROM documents
    ), (SELECT unnest(range(0, {N_MINHASH})) AS seed)
    GROUP BY 1, 2
"""

QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "embedding_neardup": embedding_neardup,
}

ORACLES = {
    "dedup_exact": """
        WITH canon AS (
            SELECT md5(text) AS text_hash,
                   MIN(doc_id) AS canonical_doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_copies
            FROM documents GROUP BY 1
        )
        SELECT d.doc_id, c.canonical_doc_id,
               d.doc_id <> c.canonical_doc_id AS is_duplicate,
               c.n_copies
        FROM documents d JOIN canon c ON md5(d.text) = c.text_hash
    """,
    "dedup_ngram_jaccard": f"""
        WITH sh AS (
            SELECT doc_id, unnest({_SHINGLES_SQL}) AS shingle
            FROM documents
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               (FLOOR(CAST((n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter)) AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS jaccard
        FROM inter
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter) >= {JACCARD_THRESHOLD}
    """,
    "dedup_minhash_lsh": f"""
        WITH sigs AS ({_MINHASH_SIGS_SQL}),
        bands AS (
            SELECT doc_id, seed % {N_BANDS} AS band,
                   md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)) AS band_hash
            FROM sigs GROUP BY 1, 2
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b,
               (FLOOR(CAST((AVG(CASE WHEN sa.minhash = sb.minhash THEN 1.0 ELSE 0.0 END)) AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS sig_sim
        FROM cand
        JOIN sigs sa ON doc_a = sa.doc_id
        JOIN sigs sb ON doc_b = sb.doc_id AND sa.seed = sb.seed
        GROUP BY 1, 2
        HAVING AVG(CASE WHEN sa.minhash = sb.minhash THEN 1.0 ELSE 0.0 END) >= {MINHASH_SIM_THRESHOLD}
    """,
    "dedup_simhash": f"""
        WITH tok AS (
            SELECT doc_id, token, COUNT(*) AS w
            FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
                FROM documents
            ) GROUP BY 1, 2
        ),
        bits AS (
            SELECT doc_id, bit,
                   SUM(CASE WHEN (({md5_long_sql('token')} >> bit) & 1) = 1
                            THEN w ELSE -w END) AS s
            FROM tok, (SELECT unnest(range(0, {SIMHASH_BITS})) AS bit)
            GROUP BY 1, 2
        )
        SELECT doc_id,
               CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash,
               CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) >> {SIMHASH_BITS - 12} AS band
        FROM bits
        GROUP BY 1
    """,
    "embedding_neardup": f"""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
               (FLOOR(CAST(({cosine_sql('a.embedding', 'b.embedding')}) AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS cos_sim
        FROM embeddings a
        JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE {cosine_sql('a.embedding', 'b.embedding')} >= {COSINE_NEARDUP_THRESHOLD}
    """,
}
