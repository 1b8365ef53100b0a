"""Text-analysis column expressions (language-ID heuristic, quality
scoring, token counting, fingerprinting).

All pure built-in expressions — at 100 TB this keeps text analytics
inside whole-stage codegen, no Python boundary. Each function has a
``*_sql`` twin producing the identical ANSI/DuckDB expression so every
operator here is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from smart_city_data_pipeline_spark.functions.rounding import pround

# Small English stopword list used by the language-ID heuristic and the
# quality score. Order matters only for readability.
STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it", "for", "on")

# BPE-ish lexer: runs of letters | runs of digits | single other non-space.
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def ws_tokens(text: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(F.trim(text), "\\s+")


def ws_token_count(text: Column) -> Column:
    return F.size(ws_tokens(text))


def regex_token_count(text: Column) -> Column:
    """Count of BPE-ish lexer tokens (letters/digits/punct split)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0))


def stopword_ratio(text: Column) -> Column:
    toks = ws_tokens(F.lower(text))
    stop = F.array(*[F.lit(w) for w in STOPWORDS])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    return hits / F.size(toks)


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not [A-Za-z0-9 ]."""
    stripped = F.regexp_replace(text, "[A-Za-z0-9 ]", "")
    return F.length(stripped) / F.length(text)


def mean_word_len(text: Column) -> Column:
    """Total non-space chars / whitespace token count."""
    return F.length(F.regexp_replace(text, "\\s+", "")) / ws_token_count(text)


def lang_id(text: Column) -> Column:
    """Stopword-ratio heuristic: 'en' when common-English density high."""
    return F.when(stopword_ratio(text) >= 0.05, "en").otherwise("unknown")


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality: length + cleanliness + naturalness."""
    len_term = F.least(ws_token_count(text) / F.lit(100.0), F.lit(1.0))
    clean_term = 1.0 - punct_ratio(text)
    stop_term = F.least(stopword_ratio(text) * 5.0, F.lit(1.0))
    wl = mean_word_len(text)
    wl_term = F.when((wl >= 3.0) & (wl <= 10.0), 1.0).otherwise(0.0)
    return pround(0.25 * len_term + 0.25 * clean_term + 0.25 * stop_term + 0.25 * wl_term)


def normalized_text(text: Column) -> Column:
    """Lowercase, collapse non-alnum runs to single spaces, trim."""
    return F.trim(F.regexp_replace(F.lower(text), "[^a-z0-9]+", " "))


def fingerprint(text: Column) -> Column:
    """md5 hex fingerprint of the normalized text (rolling-hash stand-in
    that is portable across engines)."""
    return F.md5(normalized_text(text))


# Rabin-Karp-style polynomial rolling hash over token hashes. Constants
# sized so acc*B + x never exceeds 2^63: acc < M = 2^31-1, x < 10^6.
ROLL_B = 131
ROLL_M = 2_147_483_647
_ROLL_X = 1_000_000


def rolling_hash(text: Column) -> Column:
    """Order-sensitive document fingerprint: fold h = (h*B + tok) % M.

    Pure array fold (aggregate) over per-token md5-derived ints —
    whole-stage codegen, no shuffle, no Python.
    """
    from smart_city_data_pipeline_spark.functions.hashing import md5_long

    vals = F.transform(ws_tokens(normalized_text(text)), lambda t: md5_long(t) % _ROLL_X)
    return F.aggregate(
        vals,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * ROLL_B + x) % ROLL_M,
    )


# ---------------------------------------------------------------- SQL twins

_STOP_SQL = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"


def ws_token_count_sql(col: str) -> str:
    return f"len(regexp_split_to_array(trim({col}), '\\s+'))"


def regex_token_count_sql(col: str) -> str:
    return f"len(regexp_extract_all({col}, '{TOKEN_REGEX}'))"


def stopword_ratio_sql(col: str) -> str:
    toks = f"regexp_split_to_array(trim(lower({col})), '\\s+')"
    return f"(len(list_filter({toks}, t -> t IN {_STOP_SQL})) * 1.0 / len({toks}))"


def punct_ratio_sql(col: str) -> str:
    return f"(length(regexp_replace({col}, '[A-Za-z0-9 ]', '', 'g')) * 1.0 / length({col}))"


def mean_word_len_sql(col: str) -> str:
    return f"(length(regexp_replace({col}, '\\s+', '', 'g')) * 1.0 / {ws_token_count_sql(col)})"


def lang_id_sql(col: str) -> str:
    return f"CASE WHEN {stopword_ratio_sql(col)} >= 0.05 THEN 'en' ELSE 'unknown' END"


def quality_score_sql(col: str) -> str:
    len_term = f"least({ws_token_count_sql(col)} / 100.0, 1.0)"
    clean_term = f"(1.0 - {punct_ratio_sql(col)})"
    stop_term = f"least({stopword_ratio_sql(col)} * 5.0, 1.0)"
    wl = mean_word_len_sql(col)
    wl_term = f"(CASE WHEN {wl} >= 3.0 AND {wl} <= 10.0 THEN 1.0 ELSE 0.0 END)"
    return f"(FLOOR(CAST((0.25*{len_term} + 0.25*{clean_term} + 0.25*{stop_term} + 0.25*{wl_term}) AS DOUBLE) * 10000.0 + 0.5) / 10000.0)"


def normalized_text_sql(col: str) -> str:
    return f"trim(regexp_replace(lower({col}), '[^a-z0-9]+', ' ', 'g'))"


def fingerprint_sql(col: str) -> str:
    return f"md5({normalized_text_sql(col)})"


def rolling_hash_sql(col: str) -> str:
    from smart_city_data_pipeline_spark.functions.hashing import md5_long_sql

    toks = f"regexp_split_to_array(trim({normalized_text_sql(col)}), '\\s+')"
    vals = f"list_transform({toks}, t -> {md5_long_sql('t')} % {_ROLL_X})"
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), {vals}), "
        f"(acc, x) -> (acc * {ROLL_B} + x) % {ROLL_M})"
    )


def kgram_strings(toks: Column, k: int) -> Column:
    """POSITIONAL k-token gram STRINGS (one per window position,
    space-joined) from an already-materialized token array.

    Built from k zipped slices (like the hashed variant in
    ``operators/dedup.py``) instead of ``transform(sequence(...),
    i -> toks[i] ...)`` — the index-lambda form re-evaluates the
    tokenizer for every element access (no CSE across a lambda
    boundary), turning an O(n) projection into O(n·k·len).

    Pass a COLUMN-bound token array (project ``ws_tokens(...)`` into a
    named column first) so the split itself runs once per row.
    """
    n = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    acc = F.slice(toks, 1, n)
    for off in range(1, k):
        acc = F.zip_with(
            acc,
            F.slice(toks, 1 + off, n),
            lambda x, y: F.concat(x, F.lit(" "), y),
        )
    return acc


def kgram_strings_sql(tk: str, k: int) -> str:
    """DuckDB twin of :func:`kgram_strings` for a token-array column
    ``tk`` — emits the positional gram via ``unnest(range(...))``
    indexing; the caller supplies the surrounding FROM/unnest scaffold
    (see the per-operator oracles)."""
    parts = " || ' ' || ".join(
        f"{tk}[i + {o}]" if o else f"{tk}[i]" for o in range(k)
    )
    return parts
