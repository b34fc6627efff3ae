"""Text-analysis operators over the ``documents`` table — the pieces a
large-scale training-data pipeline needs (token counting, quality
scoring, language-ID heuristic, document fingerprinting). All pure
built-in expressions (JVM-side, whole-stage codegen); no Python in the
hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import FRONT, TAIL, load, op

# deterministic normalization both engines can express identically
_NORM = r"[^a-z0-9 ]"


@op(
    "token_count",
    survey_ids="training-data: token counting (whitespace tokenizer)",
    oracle="""
    SELECT doc_id,
           LEN(regexp_split_to_array(TRIM(text), '\\s+')) AS n_tokens,
           n_chars
    FROM documents
    """,
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
        "n_chars",
    )


@op(
    "quality_score",
    survey_ids="training-data: quality scoring (length/punct/stopword ratios)",
    oracle="""
    SELECT doc_id,
           ROUND(CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[a-zA-Z ]', '', 'g'))
                 AS DOUBLE) / LENGTH(text), 6) AS punct_ratio,
           ROUND(CAST(LEN(regexp_extract_all(text, '\\b(the|a|of|and|to)\\b')) AS DOUBLE)
                 / LEN(regexp_split_to_array(TRIM(text), '\\s+')), 6) AS stopword_ratio,
           ROUND(CAST(LENGTH(text) AS DOUBLE)
                 / LEN(regexp_split_to_array(TRIM(text), '\\s+')), 6) AS avg_token_len
    FROM documents
    """,
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim("text"), r"\s+")).cast("double")
    text_len = F.length("text").cast("double")
    punct = text_len - F.length(F.regexp_replace("text", r"[a-zA-Z ]", ""))
    stop = F.size(
        F.regexp_extract_all("text", F.lit(r"\b(the|a|of|and|to)\b"), 1)
    ).cast("double")
    return d.select(
        "doc_id",
        F.round(punct / text_len, 6).alias("punct_ratio"),
        F.round(stop / n_tokens, 6).alias("stopword_ratio"),
        F.round(text_len / n_tokens, 6).alias("avg_token_len"),
    )


@op(
    "doc_fingerprint",
    survey_ids="training-data: document fingerprinting (normalized content hash)",
    oracle="""
    SELECT doc_id,
           MD5(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text), '[^a-z0-9 ]', '', 'g'),
                              ' +', ' ', 'g')) AS fingerprint
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    norm = F.regexp_replace(
        F.regexp_replace(F.lower("text"), _NORM, ""), " +", " "
    )
    return d.select("doc_id", F.md5(norm).alias("fingerprint"))


@op(
    "lang_id_heuristic",
    survey_ids="training-data: language-ID (marker-word n-gram heuristic)",
    oracle="""
    SELECT doc_id,
           CASE WHEN LEN(regexp_extract_all(LOWER(text), '\\b(the|and|of)\\b')) >= 1
                THEN 'en' ELSE 'unknown' END AS predicted_lang,
           lang
    FROM documents
    """,
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    en_markers = F.size(
        F.regexp_extract_all(F.lower("text"), F.lit(r"\b(the|and|of)\b"), 1)
    )
    return d.select(
        "doc_id",
        F.when(en_markers >= 1, "en").otherwise("unknown").alias("predicted_lang"),
        "lang",
    )


@op(
    "sha256_content_hash",
    priority=FRONT,  # r06 rotation: newest green row was r04
    survey_ids="§2.7 hash family (data_job.py:357-358 md5; input_hint sha256 invariant)",
    oracle="SELECT doc_id, SHA256(text) AS content_sha FROM documents",
)
def sha256_content_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", F.sha2("text", 256).alias("content_sha"))
