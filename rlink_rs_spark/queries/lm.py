"""Learned-quality-filter queries: character-bigram LM perplexity scoring
(CCNet-style head/middle/tail bucketing) over `documents`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rlink_rs_spark.operators.ranking import ntile_expr, with_global_rank
from rlink_rs_spark.operators.lm import (
    LM_ALPHABET_SIZE,
    LM_SCALE,
    LM_UNK_LP,
    NORMALIZE_SQL,
    bigram_rows,
    score_documents,
    train_bigram_lut,
)
from rlink_rs_spark.queries.base import register
from rlink_rs_spark.tables import load_table

_NORM = NORMALIZE_SQL.format(col="text")

_LM_ORACLE = f"""
WITH norm AS (
  SELECT doc_id, lang, {_NORM} AS norm FROM documents
),
big AS (
  SELECT doc_id, lang,
         substr(norm, CAST(i AS INT), 2) AS bg,
         substr(norm, CAST(i AS INT), 1) AS pre
  FROM (SELECT doc_id, lang, norm,
               unnest(generate_series(1, length(norm) - 1)) AS i
        FROM norm)
),
train_cnt AS (
  SELECT bg, COUNT(*) AS c FROM big WHERE lang = 'en' GROUP BY bg
),
pre_cnt AS (
  SELECT substr(bg, 1, 1) AS pre, SUM(c) AS pc FROM train_cnt GROUP BY 1
),
lut AS (
  SELECT t.bg,
         CAST(ROUND(LN((t.c + 1.0) / (p.pc + {LM_ALPHABET_SIZE}.0)) * {LM_SCALE}) AS BIGINT) AS lp
  FROM train_cnt t JOIN pre_cnt p ON substr(t.bg, 1, 1) = p.pre
),
pre_lut AS (
  SELECT pre,
         CAST(ROUND(LN(1.0 / (pc + {LM_ALPHABET_SIZE}.0)) * {LM_SCALE}) AS BIGINT) AS lp
  FROM pre_cnt
),
scored AS (
  SELECT b.doc_id, b.lang, COUNT(*) AS n_bigrams,
         SUM(COALESCE(l.lp, pl.lp, {LM_UNK_LP})) AS sum_lp
  FROM big b
  LEFT JOIN lut l ON b.bg = l.bg
  LEFT JOIN pre_lut pl ON b.pre = pl.pre
  GROUP BY 1, 2
)
SELECT doc_id, lang, n_bigrams,
       (-sum_lp) / (n_bigrams * {LM_SCALE}.0) AS nll_per_char,
       CASE NTILE(3) OVER (ORDER BY (-sum_lp) / (n_bigrams * {LM_SCALE}.0), doc_id)
            WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS ppl_bucket
FROM scored
"""


@register(
    "lm_perplexity_filter",
    _LM_ORACLE,
    "CCNet-style learned quality filter: train a smoothed char-bigram LM on "
    "the lang='en' partition, score every document by negative log-likelihood "
    "per character, bucket into head/middle/tail terciles.",
)
def lm_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-on-trusted / score-everything, the canonical corpus-quality
    pipeline (CCNet):

      1. one exchange to build the <=784-row bigram LUT from en docs,
      2. broadcast-join scoring of the full corpus (corpus never shuffles
         for the lookup),
      3. one combinable per-doc aggregate,
      4. tercile bucketing via the distributed exact NTILE
         (operators/ranking.py): a PARALLEL range exchange of the doc
         scores + closed-form tile from the exact global rank -- bit-equal
         to the oracle's NTILE(3) at every scale, with no single-partition
         WindowExec (the r6 VERDICT's global-sort finding).

    Log-probs live as integer micro-nats inside the LUT (rounded before any
    reassociative sum), so the DuckDB oracle value-hash matches exactly."""
    docs = load_table(spark, sf_dir, "documents")
    # the exploded bigram frame feeds BOTH the training branch (en subset,
    # materialized first for the broadcast LUT) and the scoring branch --
    # cache() so the normalize+explode pass over the corpus runs once
    bigrams = bigram_rows(docs).cache()
    lut, pre_lut = train_bigram_lut(bigrams.where(F.col("lang") == "en"))
    scored = score_documents(bigrams, lut, pre_lut)
    ranked = with_global_rank(scored, [F.col("nll_per_char"), F.col("doc_id")])
    tile = F.expr(ntile_expr("_grank", "_gtotal", 3))
    return ranked.select(
        "doc_id",
        "lang",
        "n_bigrams",
        "nll_per_char",
        F.when(tile == 1, "head")
        .when(tile == 2, "middle")
        .otherwise("tail")
        .alias("ppl_bucket"),
    )
