"""Similarity-search queries over the `embeddings` table (64-dim float
vectors), with bit-exact DuckDB oracles (explicit sum-chain dot products,
literal md5-derived hyperplanes -- see operators/similarity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rlink_rs_spark.operators import similarity as sim_ops
from rlink_rs_spark.operators.similarity import bucket_expr, cosine_expr, hyperplanes
from rlink_rs_spark.queries.base import register
from rlink_rs_spark.tables import load_table

_DIMS = 64
_K = 5
_N_QUERIES = 10  # query set: vec_id < 10
_N_PLANES = 8

_COS_DUCK = cosine_expr("sa.embedding", "sb.embedding", _DIMS, base=1)

_BRUTE_ORACLE = f"""
WITH scored AS (
  SELECT sa.vec_id AS query_id, sb.vec_id AS neighbor_id, {_COS_DUCK} AS cosine
  FROM embeddings sa JOIN embeddings sb ON sa.vec_id <> sb.vec_id
  WHERE sa.vec_id < {_N_QUERIES}
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {_K}
"""

_BUCKET_DUCK = bucket_expr("embedding", hyperplanes(_N_PLANES, _DIMS), base=1)

_LSH_ORACLE = f"""
WITH bucketed AS (
  SELECT vec_id, embedding, {_BUCKET_DUCK} AS bucket FROM embeddings
), scored AS (
  SELECT sa.vec_id AS query_id, sb.vec_id AS neighbor_id, {_COS_DUCK} AS cosine
  FROM bucketed sa JOIN bucketed sb
    ON sa.bucket = sb.bucket AND sa.vec_id <> sb.vec_id
  WHERE sa.vec_id < {_N_QUERIES}
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {_K}
"""


@register(
    "cosine_topk_bruteforce",
    _BRUTE_ORACLE,
    "Brute-force cosine top-5 neighbors for 10 query vectors: broadcast "
    "query set x full scan, deterministic rank (cosine desc, id asc). "
    "The exact-NN baseline for the LSH scale path.",
)
def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERIES)
    return sim_ops.cosine_topk(emb, queries, dims=_DIMS, k=_K).select(
        "query_id", "neighbor_id", "cosine", "rank"
    )


@register(
    "cosine_topk_lsh",
    _LSH_ORACLE,
    "ANN top-5 via random-hyperplane LSH (8 md5-derived +-1 planes): "
    "bucket equi-join replaces the cross product; exact cosine re-rank "
    "within the bucket. Approximate recall, deterministic output.",
)
def cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERIES)
    return sim_ops.cosine_topk_lsh(emb, queries, dims=_DIMS, k=_K, n_planes=_N_PLANES).select(
        "query_id", "neighbor_id", "cosine", "rank"
    )
