"""Text-analysis queries over `documents`: language ID, quality scoring,
token counting, fingerprinting. SQL-expression twins in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rlink_rs_spark.operators.text import (
    LANG_MARKERS,
    STOPWORDS,
    _in_list_sql,
    argmax_case_sql,
    marker_count_sql,
    quality_score_sql,
)
from rlink_rs_spark.queries.base import register
from rlink_rs_spark.tables import load_table

_TOK_DUCK = "string_split(text, ' ')"


@register(
    "text_stats_tokens",
    f"""
    SELECT doc_id,
           len({_TOK_DUCK}) AS n_tokens,
           length(text) AS n_chars_actual,
           len(list_filter({_TOK_DUCK}, t -> t IN ({_in_list_sql(STOPWORDS)}))) AS stopword_cnt,
           len(list_filter({_TOK_DUCK}, t -> length(t) >= 6)) AS long_token_cnt
    FROM documents
    """,
    "Token counting + basic text stats (whitespace tokens, stopword and "
    "long-token counts) -- the map-side profile pass of a data pipeline.",
)
def text_stats_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = F.split("text", " ")
    stop_in = _in_list_sql(STOPWORDS)
    return docs.select(
        "doc_id",
        F.size(tok).alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
        F.expr(f"size(filter(split(text, ' '), t -> t IN ({stop_in})))").alias("stopword_cnt"),
        F.expr("size(filter(split(text, ' '), t -> length(t) >= 6))").alias("long_token_cnt"),
    )


@register(
    "lang_id_heuristic",
    f"""
    WITH counted AS (
      SELECT doc_id, lang,
             {", ".join(f"{marker_count_sql(_TOK_DUCK, lang)} AS c_{lang}" for lang in LANG_MARKERS)}
      FROM documents
    )
    SELECT doc_id, lang AS lang_label, {argmax_case_sql()} AS lang_pred
    FROM counted
    """,
    "Language ID by stopword-marker argmax with fixed precedence (n-gram "
    "heuristic family). Marker counts are projected once per language, then "
    "a cheap CASE picks the argmax (repeating the count expressions inside "
    "the CASE defeated common-subexpression elimination).",
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counted = docs.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        *[
            F.expr(
                marker_count_sql("split(text, ' ')", lang).replace(
                    "len(list_filter(", "size(filter("
                )
            ).alias(f"c_{lang}")
            for lang in LANG_MARKERS
        ],
    )
    return counted.select(
        "doc_id", "lang_label", F.expr(argmax_case_sql()).alias("lang_pred")
    )


@register(
    "quality_score_docs",
    f"""
    WITH counted AS (
      SELECT doc_id, len({_TOK_DUCK}) AS nt, length(text) AS nc,
             len(list_filter({_TOK_DUCK}, t -> t IN ({_in_list_sql(STOPWORDS)}))) AS sc
      FROM documents
    )
    SELECT doc_id, {quality_score_sql('nt', 'nc', 'sc')} AS quality
    FROM counted
    """,
    "Quality scoring: banded length / mean-word-length / stopword-ratio "
    "heuristic in [0,1], rounded once at the end. Inputs projected once "
    "(cheap CASE bands over columns, not repeated token scans).",
)
def quality_score_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    stop_in = _in_list_sql(STOPWORDS)
    counted = docs.select(
        "doc_id",
        F.expr("size(split(text, ' '))").alias("nt"),
        F.length("text").alias("nc"),
        F.expr(f"size(filter(split(text, ' '), t -> t IN ({stop_in})))").alias("sc"),
    )
    return counted.select("doc_id", F.expr(quality_score_sql("nt", "nc", "sc")).alias("quality"))


@register(
    "doc_fingerprint",
    """
    SELECT doc_id,
           md5(lower(trim(text))) AS fingerprint,
           ('0x' || substr(md5(lower(trim(text))), 9, 8))::BIGINT AS shard_bucket
    FROM documents
    """,
    "Document fingerprinting: md5 over normalized text plus a 32-bit "
    "shard bucket (rolling-hash family stand-in; md5 keeps both engines "
    "bit-identical).",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.col("text")))
    return docs.select(
        "doc_id",
        F.md5(norm.cast("binary")).alias("fingerprint"),
        F.conv(F.substring(F.md5(norm.cast("binary")), 9, 8), 16, 10).cast("long").alias("shard_bucket"),
    )


@register(
    "multimodal_binary_features",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_hash,
           substr(text, 1, 16) AS header_preview
    FROM documents
    """,
    "Multimodal plumbing over an opaque binary column (text bytes standing "
    "in for image/audio payloads): byte length, content hash, header "
    "preview. The decode/feature-extract stage lives in "
    "operators/multimodal.py as a mapInPandas stub.",
)
def multimodal_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    blob = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        F.octet_length(blob).alias("n_bytes"),
        F.md5(blob).alias("content_hash"),
        F.substring("text", 1, 16).alias("header_preview"),
    )
